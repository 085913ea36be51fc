"""Block-synchronous wide-BVH kernel vs. the XLA while_loop path.

Runs in interpret mode on the CPU backend; the Mosaic lowering is exercised
on hardware by bench.py. The wide tree differs from the BVH2, so traversal
ORDER differs — hits are compared by t/position, with exact tri equality
only demanded at a high match rate (coplanar duplicates may tie)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gpu_raytracer_tpu.config import CPUConfig, ReconstructionFilter
from gpu_raytracer_tpu.ops import pallas_wide as pwd
from gpu_raytracer_tpu.ops.buffers import build_scene_buffers
from gpu_raytracer_tpu.ops.camera_rays import generate_primary_rays
from gpu_raytracer_tpu.ops.traverse import trace_any_tlas, trace_closest_tlas
from gpu_raytracer_tpu.scene import Scene

CORNELL = "/root/reference/Data/cornellbox/scene.xml"
INSTANCING = "/root/reference/Data/instancing/scene.xml"


def _wave(scene_file, W=48, H=48):
    scene = Scene.from_config(CPUConfig(scene_filenames=[scene_file]))
    scene.film_width, scene.film_height = W, H
    scene.camera.resize(W, H)
    bufs = build_scene_buffers(scene)
    camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
    pix = jnp.arange(W * H, dtype=jnp.int32)
    o, d = generate_primary_rays(camera, pix, W, 0, ReconstructionFilter.BOX)
    tmax = jnp.full((W * H,), np.inf, jnp.float32)
    return bufs, o, d, tmax


@pytest.fixture(scope="module")
def cornell_wave():
    return _wave(CORNELL)


@pytest.fixture(scope="module")
def instancing_wave():
    """Synthetic shared-BLAS scene (the reference instancing fixture's
    lucy.obj is not bundled): two icospheres at +/-x, different scales +
    a rotated third — exercises instance rows, RESTORE, and transforms."""
    from gpu_raytracer_tpu.assets import geometry
    from gpu_raytracer_tpu.scene.sky import Sky
    from gpu_raytracer_tpu.scene.types import Material

    scene = Scene()
    sphere = geometry.sphere(np.eye(4, dtype=np.float32), num_subdivisions=2)
    mesh = scene.add_mesh_data(sphere, "sphere")
    red = scene.add_material(Material(name="red",
                                      diffuse=np.array([0.8, 0.1, 0.1], np.float32)))
    a = scene.add_instance("a", mesh, red)
    a.position = np.array([-2.0, 0.0, 0.0], np.float32)
    b = scene.add_instance("b", mesh, red)
    b.position = np.array([2.0, 0.0, 0.0], np.float32)
    b.scale = 0.5
    c = scene.add_instance("c", mesh, red)
    c.position = np.array([0.0, 1.5, 0.0], np.float32)
    c.scale = 1.4
    scene.update()
    scene.sky = Sky.constant([1.0, 1.0, 1.0], 2, 2)
    bufs = build_scene_buffers(scene)

    W = H = 40
    xs = np.linspace(-3.5, 3.5, W, dtype=np.float32)
    ys = np.linspace(-2.0, 3.2, H, dtype=np.float32)
    gx, gy = np.meshgrid(xs, ys)
    o = np.stack([gx.ravel(), gy.ravel(), np.full(W * H, 6.0, np.float32)], -1)
    d = np.tile(np.array([[0.01, -0.01, -1.0]], np.float32), (W * H, 1))
    tmax = jnp.full((W * H,), np.inf, jnp.float32)
    return bufs, jnp.asarray(o), jnp.asarray(d), tmax


def _check_matches(bufs, o, d, tmax):
    nodes, tris, insts = bufs["nodes"], bufs["tris"], bufs["instances"]
    ref = trace_closest_tlas(nodes, tris, insts, o, d, tmax)
    assert bufs.get("wide") is not None
    out = pwd.trace_closest_wide(*bufs["wide"], o, d, tmax, interpret=True)
    pm = bufs.get("wide_prim_map")
    if pm is not None:
        # Flattened static tables (buffers._pack_wide_merged) return prim
        # ids; unpack (inst, tri) like the integrators do.
        code = pm[jnp.maximum(out.tri, 0)]
        ok = out.tri >= 0
        out = out._replace(tri=jnp.where(ok, code & 0x3FFFFF, out.tri),
                           inst=jnp.where(ok, code >> 22, out.inst))

    rtri, wtri = np.asarray(ref.tri), np.asarray(out.tri)
    hit_r, hit_w = rtri >= 0, wtri >= 0
    np.testing.assert_array_equal(hit_r, hit_w)
    both = hit_r
    np.testing.assert_allclose(np.asarray(out.t)[both], np.asarray(ref.t)[both],
                               rtol=1e-4)
    assert np.mean(rtri[both] == wtri[both]) > 0.995
    same = both & (rtri == wtri)
    np.testing.assert_array_equal(np.asarray(out.inst)[same],
                                  np.asarray(ref.inst)[same])
    np.testing.assert_allclose(np.asarray(out.u)[same], np.asarray(ref.u)[same],
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.v)[same], np.asarray(ref.v)[same],
                               atol=1e-3)


def test_matches_xla_cornell(cornell_wave):
    _check_matches(*cornell_wave)


def test_matches_xla_instancing(instancing_wave):
    _check_matches(*instancing_wave)


def test_any_hit_matches(cornell_wave):
    bufs, o, d, _ = cornell_wave
    nodes, tris, insts = bufs["nodes"], bufs["tris"], bufs["instances"]
    # Bounded shadow rays: half the scene scale.
    tmax = jnp.full(o.shape[:1], 1.5, jnp.float32)
    ref = trace_any_tlas(nodes, tris, insts, o, d, tmax)
    out = pwd.trace_any_wide(*bufs["wide"], o, d, tmax, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_finite_tmax_respected(cornell_wave):
    bufs, o, d, _ = cornell_wave
    short = jnp.full(o.shape[:1], 1e-3, jnp.float32)
    out = pwd.trace_closest_wide(*bufs["wide"], o, d, short, interpret=True)
    assert np.all(np.asarray(out.tri) == -1)
    assert np.all(np.isinf(np.asarray(out.t)))


def test_supports_gate():
    assert pwd.supports(1000, 1000)
    assert not pwd.supports(200_000, 200_000)
