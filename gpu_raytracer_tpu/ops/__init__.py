"""Device-side compute: jitted JAX/Pallas wavefront stages (reference layer L5,
Src/CUDA/ — re-designed, not translated).

Every CUDA `__global__` kernel in the reference becomes a pure function over
SoA jnp arrays here; global device state (`__device__`/`__constant__`
globals resolved by cuModuleGetGlobal) becomes an explicit SceneBuffers pytree
argument; atomic queue compaction becomes masked lanes + sort/scan.
"""
