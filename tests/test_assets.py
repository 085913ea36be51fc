"""Loader tests against the reference's bundled Data/ fixtures (SURVEY.md §4)."""

import os
import textwrap

import numpy as np
import pytest

from gpu_raytracer_tpu.assets import geometry, obj
from gpu_raytracer_tpu.config import CPUConfig
from gpu_raytracer_tpu.scene import Scene
from gpu_raytracer_tpu.scene.types import MaterialType, TriangleData


class TestGeometry:
    def test_rectangle_unit(self):
        tris = geometry.rectangle(np.eye(4, dtype=np.float32))
        assert len(tris) == 2
        box = tris.aabb()
        np.testing.assert_allclose(box.min, [-1, -1, 0])
        np.testing.assert_allclose(box.max, [1, 1, 0])
        np.testing.assert_allclose(tris.normals.reshape(-1, 3), [[0, 0, 1]] * 6)

    def test_cube_area(self):
        tris = geometry.cube(np.eye(4, dtype=np.float32))
        assert len(tris) == 12
        e1 = tris.positions[:, 1] - tris.positions[:, 0]
        e2 = tris.positions[:, 2] - tris.positions[:, 0]
        area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1).sum()
        assert area == pytest.approx(24.0)  # 6 faces * 2*2

    def test_sphere_radius(self):
        tris = geometry.sphere(np.eye(4, dtype=np.float32), num_subdivisions=3)
        radii = np.linalg.norm(tris.positions.reshape(-1, 3), axis=-1)
        np.testing.assert_allclose(radii, 1.0, atol=1e-5)

    def test_disk_and_cylinder(self):
        d = geometry.disk(np.eye(4, dtype=np.float32), num_segments=16)
        assert len(d) == 16
        c = geometry.cylinder(np.eye(4, dtype=np.float32), num_segments=8)
        assert len(c) == 16


class TestOBJ:
    def test_simple_obj(self, tmp_path):
        path = tmp_path / "tri.obj"
        path.write_text(textwrap.dedent("""\
            v 0 0 0
            v 1 0 0
            v 0 1 0
            v 1 1 0
            vt 0 0
            vt 1 0
            vt 0 1
            vn 0 0 1
            f 1/1/1 2/2/1 3/3/1
            f 2/2/1 4/1/1 3/3/1
        """))
        tris = obj.load(str(path))
        assert len(tris) == 2
        np.testing.assert_allclose(tris.normals.reshape(-1, 3), [[0, 0, 1]] * 6)

    def test_negative_indices_and_fan(self, tmp_path):
        path = tmp_path / "quad.obj"
        path.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf -4 -3 -2 -1\n")
        tris = obj.load(str(path))
        assert len(tris) == 2  # fan triangulation of the quad

    def test_reference_instancing_objs(self, reference_data):
        tris = obj.load(os.path.join(reference_data, "instancing", "floor.obj"))
        assert len(tris) >= 2


class TestPLY:
    def test_ascii_ply(self, tmp_path):
        path = tmp_path / "tri.ply"
        path.write_text(textwrap.dedent("""\
            ply
            format ascii 1.0
            element vertex 3
            property float x
            property float y
            property float z
            element face 1
            property list uchar int vertex_indices
            end_header
            0 0 0
            1 0 0
            0 1 0
            3 0 1 2
        """))
        from gpu_raytracer_tpu.assets import ply

        tris = ply.load(str(path))
        assert len(tris) == 1
        np.testing.assert_allclose(tris.positions[0, 1], [1, 0, 0])

    def test_binary_ply_roundtrip(self, tmp_path):
        import struct

        header = textwrap.dedent("""\
            ply
            format binary_little_endian 1.0
            element vertex 3
            property float x
            property float y
            property float z
            element face 1
            property list uchar uint vertex_indices
            end_header
        """).encode()
        body = b"".join(struct.pack("<3f", *v) for v in [(0, 0, 0), (2, 0, 0), (0, 2, 0)])
        body += struct.pack("<B3I", 3, 0, 1, 2)
        path = tmp_path / "tri_bin.ply"
        path.write_bytes(header + body)
        from gpu_raytracer_tpu.assets import ply

        tris = ply.load(str(path))
        assert len(tris) == 1
        np.testing.assert_allclose(tris.positions[0, 1], [2, 0, 0])


class TestTriangleData:
    def test_normal_fixup(self):
        pos = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
        zero_normals = np.zeros((1, 3, 3), np.float32)
        tris = TriangleData(pos, zero_normals)
        np.testing.assert_allclose(tris.normals[0], [[0, 0, 1]] * 3, atol=1e-6)

    def test_concatenate_select(self):
        a = TriangleData(np.zeros((2, 3, 3), np.float32))
        b = TriangleData(np.ones((3, 3, 3), np.float32))
        cat = TriangleData.concatenate([a, b])
        assert len(cat) == 5
        sel = cat.select(np.array([0, 4]))
        assert len(sel) == 2


class TestMitsubaScenes:
    def test_cornellbox(self, reference_data):
        cfg = CPUConfig(scene_filenames=[os.path.join(reference_data, "cornellbox", "scene.xml")])
        scene = Scene.from_config(cfg)
        assert len(scene.instances) == 8
        assert scene.triangle_count() == 36
        assert scene.film_width == 1024 and scene.film_height == 1024
        assert scene.has_lights and scene.has_diffuse
        light_mats = [m for m in scene.materials if m.type == MaterialType.LIGHT]
        assert len(light_mats) == 1
        np.testing.assert_allclose(light_mats[0].emission, [17, 12, 4])
        # Camera: at (0,1,6.8) looking towards -z (into the box)
        np.testing.assert_allclose(scene.camera.position, [0, 1, 6.8], atol=1e-6)
        from gpu_raytracer_tpu.core import transform as xf

        fwd = xf.quat_rotate(scene.camera.rotation, np.array([0, 0, -1], np.float32))
        np.testing.assert_allclose(fwd, [0, 0, -1], atol=1e-5)

    def test_instancing_scene_shares_blas(self, reference_data):
        path = os.path.join(reference_data, "instancing", "scene.xml")
        if not os.path.exists(os.path.join(reference_data, "instancing", "lucy.obj")):
            pytest.skip("lucy.obj not bundled")
        cfg = CPUConfig(scene_filenames=[path])
        scene = Scene.from_config(cfg)
        # Many instances, far fewer unique mesh datas.
        assert len(scene.instances) > len(scene.mesh_datas)
