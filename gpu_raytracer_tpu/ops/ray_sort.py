"""Ray reordering for traversal coherence (the TPU answer to the
reference's persistent-threads/dynamic-fetch load balancing,
/root/reference/Src/CUDA/Raytracing/BVH8.h:109-111, and the wavefront
material-queue idea, Pathtracer.cu:426-462).

The block-synchronous wide kernel (ops/pallas_wide.py) traverses a shared
node set per (8,128) ray tile, so its cost scales with the UNION of the
tile's per-ray working sets. Primary rays arrive pre-tiled by screen
position and are cheap; diffuse bounce rays from one tile fan out over the
hemisphere and blow the union up (~25x measured on Sponza). Sorting each
bounce wavefront by (direction octant | origin Morton) re-clusters rays
that will traverse the same subtrees, and pushes dead lanes to the tail —
all-dead tiles drain in a handful of pops, which doubles as free wavefront
compaction.
"""

from __future__ import annotations

import jax.numpy as jnp


def _spread3(x):
    """Spread the low 10 bits of x so there are two zero bits between each
    (classic Morton bit interleave, vectorized on uint32)."""
    x = x.astype(jnp.uint32) & 0x3FF
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def morton30(p, lo, hi):
    """(R, 3) points -> 30-bit Morton codes within [lo, hi]."""
    scale = 1023.0 / jnp.maximum(hi - lo, 1e-20)
    q = jnp.clip((p - lo) * scale, 0.0, 1023.0).astype(jnp.uint32)
    return (_spread3(q[:, 0]) << 2) | (_spread3(q[:, 1]) << 1) | _spread3(q[:, 2])


def ray_sort_order(ray_o, ray_d, t_max, scene_lo, scene_hi):
    """Sort permutation clustering rays for traversal coherence.

    Key = [dead:1 | direction octant:3 | origin Morton:30] — dead rays
    (t_max <= 0) sort to the tail so trailing tiles are all-dead.
    Returns (order, inverse) permutations."""
    R = ray_o.shape[0]
    octant = ((ray_d[:, 0] < 0).astype(jnp.uint32) * 4
              + (ray_d[:, 1] < 0).astype(jnp.uint32) * 2
              + (ray_d[:, 2] < 0).astype(jnp.uint32))
    # [dead:1 | octant:3 | morton:28] — morton's top 28 bits keep spatial
    # locality; the dead bit pushes masked lanes past every live ray.
    key = (octant << 28) | (morton30(ray_o, scene_lo, scene_hi) >> 2)
    key = jnp.where(t_max > 0.0, key, jnp.uint32(0x80000000))
    order = jnp.argsort(key)
    inv = jnp.zeros(R, jnp.int32).at[order].set(
        jnp.arange(R, dtype=jnp.int32))
    return order, inv


def trace_sorted(trace_fn, ray_o, ray_d, t_max, scene_lo, scene_hi):
    """Run `trace_fn(o, d, t_max)` on coherence-sorted rays and un-sort the
    result pytree (a NamedTuple of (R,) fields or a single (R,) array).

    Permutations apply through ONE packed row gather per direction: TPU
    gathers are start-latency bound per ROW, not per byte (ops/vec.py), so
    gathering a (R, 7) [o|d|tmax] pack costs one latency instead of
    three, and the (R, K) result pack one instead of K. Int fields ride
    as f32 lanes — exact for |v| <= 2^24, which covers leaf/tri/instance
    ids (buffers._pack_wide_merged caps P below 2^24)."""
    order, inv = ray_sort_order(ray_o, ray_d, t_max, scene_lo, scene_hi)
    packed = jnp.concatenate([ray_o, ray_d, t_max[:, None]], axis=1)
    sp = packed[order]
    out = trace_fn(sp[:, 0:3], sp[:, 3:6], sp[:, 6])
    if hasattr(out, "_fields"):
        fields = list(out)
        rp = jnp.stack([f.astype(jnp.float32) for f in fields], axis=1)
        up = rp[inv]
        return type(out)(*(up[:, i].astype(f.dtype)
                           for i, f in enumerate(fields)))
    return out[inv]
