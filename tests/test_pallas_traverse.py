"""Pallas whole-loop traversal kernel vs. the XLA while_loop path.

Runs the kernel in interpret mode (tests force the CPU backend); the real
Mosaic lowering is exercised on hardware by bench.py / the TPU perf logs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpu_raytracer_tpu.config import CPUConfig, ReconstructionFilter
from gpu_raytracer_tpu.ops import pallas_traverse as ptv
from gpu_raytracer_tpu.ops.buffers import build_scene_buffers
from gpu_raytracer_tpu.ops.camera_rays import generate_primary_rays
from gpu_raytracer_tpu.ops.traverse import trace_closest_tlas
from gpu_raytracer_tpu.scene import Scene

CORNELL = "/root/reference/Data/cornellbox/scene.xml"


@pytest.fixture(scope="module")
def cornell_wave():
    W = H = 64
    scene = Scene.from_config(CPUConfig(scene_filenames=[CORNELL]))
    scene.film_width, scene.film_height = W, H
    scene.camera.resize(W, H)
    bufs = build_scene_buffers(scene)
    camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
    pix = jnp.arange(W * H, dtype=jnp.int32)
    o, d = generate_primary_rays(camera, pix, W, 0, ReconstructionFilter.BOX)
    tmax = jnp.full((W * H,), np.inf, jnp.float32)
    return bufs, o, d, tmax


def test_supports_gate():
    assert ptv.supports(100, 100, 8)
    assert not ptv.supports(ptv.MAX_TABLE_BYTES // 64, 10, 1)


def test_matches_xla_traversal(cornell_wave):
    bufs, o, d, tmax = cornell_wave
    nodes, tris, insts = bufs["nodes"], bufs["tris"], bufs["instances"]
    ref = trace_closest_tlas(nodes, tris, insts, o, d, tmax)
    nm, im, tm = ptv.pack_tables(nodes, tris, insts)
    out = ptv.trace_closest_pallas(nm, im, tm, o, d, tmax, interpret=True)

    rtri, ptri = np.asarray(ref.tri), np.asarray(out.tri)
    assert np.mean(rtri == ptri) == 1.0
    both = rtri >= 0
    np.testing.assert_allclose(np.asarray(out.t)[both], np.asarray(ref.t)[both],
                               rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(out.inst), np.asarray(ref.inst))
    # Barycentrics agree where hit.
    np.testing.assert_allclose(np.asarray(out.u)[both], np.asarray(ref.u)[both],
                               atol=1e-3)


def test_finite_tmax_respected(cornell_wave):
    bufs, o, d, _ = cornell_wave
    nodes, tris, insts = bufs["nodes"], bufs["tris"], bufs["instances"]
    nm, im, tm = ptv.pack_tables(nodes, tris, insts)
    short = jnp.full(o.shape[:1], 1e-3, jnp.float32)
    out = ptv.trace_closest_pallas(nm, im, tm, o, d, short, interpret=True)
    assert np.all(np.asarray(out.tri) == -1)
    assert np.all(np.isinf(np.asarray(out.t)))
