"""TLAS/BLAS instancing tests: shared BLAS under different transforms,
per-frame TLAS refresh, transformed-normal shading (BASELINE.json config #3)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gpu_raytracer_tpu.assets import geometry  # noqa: E402
from gpu_raytracer_tpu.config import GPUConfig  # noqa: E402
from gpu_raytracer_tpu.core import transform as xf  # noqa: E402
from gpu_raytracer_tpu.integrators.pathtracer import Pathtracer, render_wave  # noqa: E402
from gpu_raytracer_tpu.ops.buffers import build_scene_buffers, refresh_tlas  # noqa: E402
from gpu_raytracer_tpu.ops.traverse import trace_closest_tlas  # noqa: E402
from gpu_raytracer_tpu.scene import Scene  # noqa: E402
from gpu_raytracer_tpu.scene.sky import Sky  # noqa: E402
from gpu_raytracer_tpu.scene.types import Material, MaterialType  # noqa: E402


def _two_sphere_scene():
    """One icosphere BLAS shared by two instances at +/- x, different scales."""
    scene = Scene()
    sphere = geometry.sphere(np.eye(4, dtype=np.float32), num_subdivisions=2)
    mesh = scene.add_mesh_data(sphere, "sphere")
    red = scene.add_material(Material(name="red", diffuse=np.array([0.8, 0.1, 0.1], np.float32)))
    blue = scene.add_material(Material(name="blue", diffuse=np.array([0.1, 0.1, 0.8], np.float32)))

    a = scene.add_instance("a", mesh, red)
    a.position = np.array([-2.0, 0.0, 0.0], np.float32)
    a.scale = 1.0
    b = scene.add_instance("b", mesh, blue)
    b.position = np.array([2.0, 0.0, 0.0], np.float32)
    b.scale = 0.5
    scene.update()
    scene.sky = Sky.constant([1.0, 1.0, 1.0], 2, 2)
    scene.finalize()
    scene.check_materials()
    return scene


class TestSharedBLAS:
    def test_one_blas_two_instances(self):
        scene = _two_sphere_scene()
        bufs = build_scene_buffers(scene)
        # One mesh data -> one BLAS; both instances point at the same root.
        roots = np.asarray(bufs["instances"]["blas_root"])
        assert roots[0] == roots[1]

        # Rays at each sphere hit the correct instance at the right distance.
        o = jnp.asarray([[-2.0, 0.0, 5.0], [2.0, 0.0, 5.0], [0.0, 0.0, 5.0]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, -1.0]] * 3, jnp.float32)
        hit = trace_closest_tlas(bufs["nodes"], bufs["tris"], bufs["instances"],
                                 o, d, jnp.full(3, jnp.inf))
        t = np.asarray(hit.t)
        inst = np.asarray(hit.inst)
        assert inst[0] == 0 and inst[1] == 1
        # Icosphere radius slightly < 1 (inscribed); scaled instance hits later.
        assert t[0] == pytest.approx(4.05, abs=0.1)     # radius ~0.95
        assert t[1] == pytest.approx(4.52, abs=0.1)     # radius ~0.48
        assert inst[2] == -1  # gap between spheres

    def test_scaled_instance_t_is_world_parameterized(self):
        scene = _two_sphere_scene()
        bufs = build_scene_buffers(scene)
        o = jnp.asarray([[2.0, 0.0, 5.0]], jnp.float32)
        # Unnormalized direction: t must still be in units of |d|.
        d = jnp.asarray([[0.0, 0.0, -2.0]], jnp.float32)
        hit = trace_closest_tlas(bufs["nodes"], bufs["tris"], bufs["instances"],
                                 o, d, jnp.full(1, jnp.inf))
        assert float(hit.t[0]) == pytest.approx(4.52 / 2.0, abs=0.06)

    def test_transformed_normals_in_shading(self):
        """Rotating an instance must rotate its shading normals: render the
        sphere top-down and check radiance symmetry holds (normals sane)."""
        scene = _two_sphere_scene()
        bufs = build_scene_buffers(scene)
        config = GPUConfig(num_bounces=2, enable_nee=False)
        W = 16
        scene.camera.position = np.array([-2.0, 0.0, 4.0], np.float32)
        scene.camera.resize(W, W)
        scene.camera.update(0.0)
        cam = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
        idx = jnp.arange(W * W, dtype=jnp.int32)
        acc = np.zeros((W * W, 3), np.float64)
        for s in range(8):
            acc += np.asarray(render_wave(bufs, cam, idx, s, config, W, 0, False))
        img = (acc / 8).reshape(W, W, 3)
        center = img[W // 2 - 2:W // 2 + 2, W // 2 - 2:W // 2 + 2]
        assert center.mean() > 0.05  # lit sphere, mostly red
        assert center[..., 0].mean() > 2.0 * center[..., 2].mean()


class TestTLASRefresh:
    def test_moving_instance_changes_hits(self):
        scene = _two_sphere_scene()
        bufs = build_scene_buffers(scene)
        o = jnp.asarray([[0.0, 0.0, 5.0]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
        hit0 = trace_closest_tlas(bufs["nodes"], bufs["tris"], bufs["instances"],
                                  o, d, jnp.full(1, jnp.inf))
        assert int(hit0.inst[0]) == -1  # gap

        # Move instance 0 into the ray's path and refresh the TLAS in place.
        scene.instances[0].position = np.array([0.0, 0.0, 0.0], np.float32)
        scene.instances[0].update()
        bufs2 = refresh_tlas(bufs, scene)
        # Shapes unchanged -> no re-jit.
        assert bufs2["nodes"]["min"].shape == bufs["nodes"]["min"].shape
        hit1 = trace_closest_tlas(bufs2["nodes"], bufs2["tris"], bufs2["instances"],
                                  o, d, jnp.full(1, jnp.inf))
        assert int(hit1.inst[0]) == 0
        assert float(hit1.t[0]) == pytest.approx(4.05, abs=0.1)

    def test_async_update_matches_sync(self):
        """update_async (host re-pack on a worker, overlapping the device;
        reference: the non-blocking memory stream, Integrator.cpp:212,278)
        must land the same buffers as the synchronous path."""
        scene = _two_sphere_scene()
        pt = Pathtracer(scene, gpu_config=GPUConfig(num_bounces=2))
        pt.init_device()
        pt.render()
        scene.instances[1].position = np.array([3.0, 0.0, 0.0], np.float32)
        scene.instances[1].update()
        pt.invalidated.scene = True
        pt.update_async()
        assert getattr(pt, "_pending_buffers", None) is not None
        pt.render()  # joins the future before dispatch
        assert pt._pending_buffers is None
        a = pt.framebuffer().copy()

        scene2 = _two_sphere_scene()
        pt2 = Pathtracer(scene2, gpu_config=GPUConfig(num_bounces=2))
        pt2.init_device()
        pt2.render()
        scene2.instances[1].position = np.array([3.0, 0.0, 0.0], np.float32)
        scene2.instances[1].update()
        pt2.invalidated.scene = True
        pt2.update()
        pt2.render()
        np.testing.assert_allclose(a, pt2.framebuffer(), atol=1e-6)

    def test_integrator_invalidation_path(self):
        scene = _two_sphere_scene()
        pt = Pathtracer(scene, gpu_config=GPUConfig(num_bounces=2))
        pt.init_device()
        pt.render()
        assert pt.sample_index == 1
        # Scene edit -> invalidated.scene -> TLAS refresh + accumulation reset.
        scene.instances[1].position = np.array([3.0, 0.0, 0.0], np.float32)
        scene.instances[1].update()
        pt.invalidated.scene = True
        pt.update()
        assert pt.sample_index == 0
        pt.render()
        assert np.isfinite(pt.framebuffer()).all()


class TestInstancingSceneFixture:
    def test_reference_instancing_scene_loads_and_builds(self, reference_data):
        import os

        from gpu_raytracer_tpu.config import CPUConfig

        path = os.path.join(reference_data, "instancing", "scene.xml")
        scene = Scene.from_config(CPUConfig(scene_filenames=[path]))
        # lucy.obj is not bundled; the scene still has floor/room/light OBJs.
        assert len(scene.mesh_datas) >= 1
        bufs = build_scene_buffers(scene)
        assert bufs["nodes"]["min"].shape[0] > len(scene.instances)
