"""Mitsuba 0.x XML scene loader (reference: Src/Assets/Mitsuba/MitsubaLoader.cpp).

Parses the same subset the reference supports: materials (diffuse,
roughdiffuse, conductor, roughconductor, plastic, roughplastic, phong,
thindielectric, dielectric, roughdielectric, difftrans; nested twosided/mask/
bumpmap/coating peeled to the innermost BSDF; named-IOR table), homogeneous
media, shapes (obj/ply/serialized/hair + analytic rectangle/cube/disk/
cylinder/sphere), shapegroup/instance, sensors (perspective/thinlens + film
size), integrator maxDepth, emitters (area/envmap/point), and recursive
<include>. Mitsuba 2 files are rejected.

Python's xml.etree replaces the reference's hand-written XMLParser; the
loader's job here is purely the semantic mapping onto the scene graph.
"""

from __future__ import annotations

import copy
import os
import xml.etree.ElementTree as ET
from typing import Dict, Optional, Tuple

import numpy as np

from gpu_raytracer_tpu.assets import geometry, obj
from gpu_raytracer_tpu.core import transform as xf
from gpu_raytracer_tpu.scene.types import Material, MaterialType, Medium

# Mitsuba 0.5 documentation page 58 (same table as the reference).
KNOWN_IORS = {
    "vacuum": 1.0, "helium": 1.00004, "hydrogen": 1.00013, "air": 1.00028,
    "carbon dioxide": 1.00045, "water": 1.3330, "acetone": 1.36,
    "ethanol": 1.361, "carbon tetrachloride": 1.461, "glycerol": 1.4729,
    "benzene": 1.501, "silicone oil": 1.52045, "bromine": 1.661,
    "water ice": 1.31, "fused quartz": 1.458, "pyrex": 1.470,
    "acrylic glass": 1.49, "polypropylene": 1.49, "bk7": 1.5046,
    "sodium chloride": 1.544, "amber": 1.55, "pet": 1.575, "diamond": 2.419,
}

_WRAPPER_BSDFS = ("twosided", "mask", "bumpmap", "coating")
_PRIMITIVES = ("rectangle", "cube", "disk", "cylinder", "sphere")


def load(filename: str, scene) -> None:
    """Populate `scene` (gpu_raytracer_tpu.scene.scene.Scene) from a Mitsuba XML."""
    tree = ET.parse(filename)
    root = tree.getroot()
    if root.tag != "scene":
        scene_node = root.find("scene")
        if scene_node is None:
            raise ValueError(f"{filename}: no <scene> tag")
        root = scene_node

    version = root.get("version", "0.5.0")
    major = int(version.split(".")[0])
    if major >= 2:
        raise ValueError(f"{filename}: Mitsuba 2 files are not supported")

    ctx = _Context(scene=scene, path=os.path.dirname(os.path.abspath(filename)))
    _walk(root, ctx)


def _join(path: str, rel: str) -> str:
    """Join with Windows-backslash normalization (Sponza's scene.xml uses
    'textures\\\\lion.tga' style relative paths)."""
    return os.path.join(path, rel.replace("\\", "/"))


class _Context:
    def __init__(self, scene, path: str):
        self.scene = scene
        self.path = path
        self.material_map: Dict[str, int] = {}
        self.texture_map: Dict[str, int] = {}
        self.shape_group_map: Dict[str, Tuple[int, int]] = {}


# ---------------------------------------------------------------------------
# Low-level value helpers
# ---------------------------------------------------------------------------

def _child_by_name(node, name: str):
    for child in node:
        if child.get("name") == name:
            return child
    return None


def _child_float(node, name: str, default: float) -> float:
    child = _child_by_name(node, name)
    return float(child.get("value")) if child is not None else default


def _child_int(node, name: str, default: int) -> int:
    child = _child_by_name(node, name)
    return int(child.get("value")) if child is not None else default


def _parse_vec(text: str) -> np.ndarray:
    parts = text.replace(",", " ").split()
    vals = [float(p) for p in parts]
    if len(vals) == 1:
        vals = vals * 3
    return np.asarray(vals[:3], np.float32)


def _child_vec(node, name: str, default) -> np.ndarray:
    child = _child_by_name(node, name)
    if child is None:
        return np.asarray(default, np.float32)
    return _parse_vec(child.get("value"))


def _gamma_to_linear(v: np.ndarray) -> np.ndarray:
    return np.where(v <= 0.04045, v / 12.92, ((v + 0.055) / 1.055) ** 2.4).astype(np.float32)


# ---------------------------------------------------------------------------
# Transforms (reference: MitsubaLoader.cpp parse_transform_matrix)
# ---------------------------------------------------------------------------

def _parse_transform_matrix(node) -> np.ndarray:
    """Accumulate <transform> children into a 4x4; later children apply after
    earlier ones (left-multiplication, matching the reference)."""
    world = np.eye(4, dtype=np.float32)
    transform = node.find("transform")
    if transform is None:
        return world
    for op in transform:
        m = np.eye(4, dtype=np.float32)
        if op.tag == "matrix":
            vals = [float(v) for v in op.get("value").replace(",", " ").split()]
            m = np.asarray(vals, np.float32).reshape(4, 4)
        elif op.tag == "lookat":
            origin = _parse_vec(op.get("origin", "0 0 0"))
            target = _parse_vec(op.get("target", "0 0 -1"))
            up = _parse_vec(op.get("up", "0 1 0"))
            m[:3, :] = xf.compose(
                xf.translate(origin),
                xf.from_quaternion(xf.look_rotation(target - origin, up)),
            )
        elif op.tag == "scale":
            if op.get("value") is not None:
                m[:3, :] = xf.scale(float(op.get("value")))
            else:
                m[:3, :] = xf.scale([float(op.get(a, 1.0)) for a in "xyz"])
        elif op.tag == "rotate":
            axis = np.array([float(op.get(a, 0.0)) for a in "xyz"], np.float32)
            if np.linalg.norm(axis) > 0:
                angle = np.radians(float(op.get("angle", 0.0)))
                m[:3, :] = xf.axis_angle(axis, angle)
        elif op.tag == "translate":
            m[:3, :] = xf.translate([float(op.get(a, 0.0)) for a in "xyz"])
        else:
            continue
        world = m @ world
    return world


def _decompose(matrix: np.ndarray, forward=(0, 0, 1)):
    """4x4 -> (position, rotation-quat, uniform scale), the reference's lossy
    TRS decomposition (Src/Math/Matrix4.h:184-194)."""
    position = matrix[:3, 3].astype(np.float32)
    fwd_world = matrix[:3, :3] @ np.asarray(forward, np.float32)
    rotation = xf.look_rotation(fwd_world, np.array([0.0, 1.0, 0.0]))
    row_lengths = np.linalg.norm(matrix[:3, :3], axis=1)
    scale = float(np.cbrt(row_lengths[0] * row_lengths[1] * row_lengths[2]))
    return position, rotation, scale


# ---------------------------------------------------------------------------
# Textures (reference: MitsubaLoader.cpp parse_texture / parse_rgb_or_texture)
# ---------------------------------------------------------------------------

def _parse_texture(node, ctx: _Context, rgb: np.ndarray) -> Tuple[int, np.ndarray]:
    ttype = node.get("type")
    if ttype == "scale":
        sc = _child_by_name(node, "scale")
        if sc is not None:
            if sc.tag == "float":
                rgb = rgb * float(sc.get("value"))
            elif sc.tag == "rgb":
                rgb = rgb * _parse_vec(sc.get("value"))
        inner = node.find("texture")
        if inner is None:
            return -1, rgb
        node, ttype = inner, inner.get("type")

    if ttype == "bitmap":
        rel = _child_by_name(node, "filename").get("value")
        filename = _join(ctx.path, rel)
        handle = ctx.scene.add_texture(filename)
        tid = node.get("id")
        if tid:
            ctx.texture_map[tid] = handle
        return handle, rgb
    return -1, rgb


def _parse_rgb_or_texture(node, name: str, ctx: _Context):
    """Returns (rgb, texture_id)."""
    colour = _child_by_name(node, name)
    if colour is None:
        return np.ones(3, np.float32), -1
    if colour.tag == "rgb":
        return _parse_vec(colour.get("value", "1")), -1
    if colour.tag == "srgb":
        return _gamma_to_linear(_parse_vec(colour.get("value", "1"))), -1
    if colour.tag == "texture":
        tex, rgb = _parse_texture(colour, ctx, np.ones(3, np.float32))
        sc = _child_by_name(colour, "scale")
        if sc is not None:
            rgb = _parse_vec(sc.get("value", "1"))
        return rgb, tex
    if colour.tag == "ref":
        tex = ctx.texture_map.get(colour.get("id"), -1)
        return np.ones(3, np.float32), tex
    return np.ones(3, np.float32), -1


# ---------------------------------------------------------------------------
# Materials
# ---------------------------------------------------------------------------

def _lookup_ior(node, name: str, default: float) -> float:
    child = _child_by_name(node, name)
    if child is None:
        return default
    if child.tag == "string":
        key = child.get("value").lower()
        if key not in KNOWN_IORS:
            raise ValueError(f"index of refraction not known for {key!r}")
        return KNOWN_IORS[key]
    return float(child.get("value"))


def _parse_material(node, ctx: _Context) -> int:
    """Parse the material for a shape (or a top-level <bsdf>); returns a
    material id. Mirrors reference parse_material including wrapper peeling."""
    scene = ctx.scene

    if node.tag != "bsdf":
        emitter = node.find("emitter")
        if emitter is not None:
            mat = Material(name="emitter", type=MaterialType.LIGHT,
                           emission=_child_vec(emitter, "radiance", [1, 1, 1]))
            return scene.add_material(mat)
        ref = node.find("ref")
        if ref is not None:
            mid = ctx.material_map.get(ref.get("id"))
            if mid is not None:
                return mid
            return 0  # default material
        bsdf = node.find("bsdf")
        if bsdf is None:
            return 0
    else:
        bsdf = node

    name = bsdf.get("id")
    inner = bsdf
    inner_type = inner.get("type")
    while inner_type in _WRAPPER_BSDFS:
        child = inner.find("bsdf")
        if child is None:
            ref = inner.find("ref")
            if ref is not None:
                return ctx.material_map.get(ref.get("id"), 0)
            return 0
        inner = child
        inner_type = inner.get("type")
        if name is None:
            name = inner.get("id")

    mat = Material(name=name or "Material")

    if inner_type == "diffuse":
        mat.type = MaterialType.DIFFUSE
        mat.diffuse, mat.texture_id = _parse_rgb_or_texture(inner, "reflectance", ctx)
    elif inner_type in ("conductor", "roughconductor"):
        mat.type = MaterialType.CONDUCTOR
        mat.linear_roughness = (0.0 if inner_type == "conductor"
                                else _child_float(inner, "alpha", 0.5))
        material_str = _child_by_name(inner, "material")
        if material_str is not None and material_str.get("value") == "none":
            mat.eta = np.zeros(3, np.float32)
            mat.k = np.ones(3, np.float32)
        else:
            mat.eta = _child_vec(inner, "eta", [1.33] * 3)
            mat.k = _child_vec(inner, "k", [1.0] * 3)
    elif inner_type in ("plastic", "roughplastic", "roughdiffuse"):
        mat.type = MaterialType.PLASTIC
        mat.diffuse, mat.texture_id = _parse_rgb_or_texture(inner, "diffuseReflectance", ctx)
        mat.linear_roughness = (0.0 if inner_type == "plastic"
                                else _child_float(inner, "alpha", 0.5))
    elif inner_type == "phong":
        mat.type = MaterialType.PLASTIC
        mat.diffuse, mat.texture_id = _parse_rgb_or_texture(inner, "diffuseReflectance", ctx)
        exponent = _child_float(inner, "exponent", 1.0)
        mat.linear_roughness = float((0.5 * exponent + 1.0) ** 0.25)
    elif inner_type in ("thindielectric", "dielectric", "roughdielectric"):
        int_ior = _lookup_ior(inner, "intIOR", 1.33)
        ext_ior = _lookup_ior(inner, "extIOR", 1.0)
        mat.type = MaterialType.DIELECTRIC
        mat.index_of_refraction = int_ior if ext_ior == 0.0 else int_ior / ext_ior
        mat.linear_roughness = (_child_float(inner, "alpha", 0.5)
                                if inner_type == "roughdielectric" else 0.0)
    elif inner_type == "difftrans":
        mat.type = MaterialType.DIFFUSE
        mat.diffuse, mat.texture_id = _parse_rgb_or_texture(inner, "transmittance", ctx)
    else:
        print(f"WARNING: BSDF type {inner_type!r} not supported")
        return 0

    return scene.add_material(mat)


def _parse_medium(node, ctx: _Context) -> int:
    xml_medium = node.find("medium")
    if xml_medium is None:
        return -1
    if xml_medium.get("type") != "homogeneous":
        print(f"WARNING: medium type {xml_medium.get('type')!r} not supported")
        return -1

    sigma_a_node = _child_by_name(xml_medium, "sigmaA")
    sigma_s_node = _child_by_name(xml_medium, "sigmaS")
    sigma_t_node = _child_by_name(xml_medium, "sigmaT")
    albedo_node = _child_by_name(xml_medium, "albedo")

    if sigma_a_node is not None and sigma_s_node is not None:
        sigma_a = _parse_vec(sigma_a_node.get("value"))
        sigma_s = _parse_vec(sigma_s_node.get("value"))
    elif sigma_t_node is not None and albedo_node is not None:
        sigma_t = _parse_vec(sigma_t_node.get("value"))
        albedo = _parse_vec(albedo_node.get("value"))
        sigma_s = albedo * sigma_t
        sigma_a = sigma_t - sigma_s
    else:
        print("WARNING: medium needs (sigmaA, sigmaS) or (sigmaT, albedo)")
        return -1

    scale = _child_float(xml_medium, "scale", 1.0)
    g = 0.0
    phase = xml_medium.find("phase")
    if phase is not None and phase.get("type") == "hg":
        g = _child_float(phase, "g", 0.0)

    medium = Medium.from_sigmas(xml_medium.get("name") or "Medium",
                                scale * sigma_a, scale * sigma_s, g)
    return ctx.scene.add_medium(medium)


# ---------------------------------------------------------------------------
# Shapes
# ---------------------------------------------------------------------------

def _parse_shape(node, ctx: _Context):
    """Returns (mesh_data_id, display_name) or (None, None)."""
    scene = ctx.scene
    stype = node.get("type")

    if stype in ("obj", "ply"):
        rel = _child_by_name(node, "filename").get("value")
        filename = _join(ctx.path, rel)
        if stype == "obj":
            handle = scene.add_mesh_data_from_file(filename, obj.load)
        else:
            from gpu_raytracer_tpu.assets import ply

            handle = scene.add_mesh_data_from_file(filename, ply.load)
        return handle, os.path.basename(filename)

    if stype in _PRIMITIVES:
        transform = _parse_transform_matrix(node)
        if stype == "rectangle":
            tris = geometry.rectangle(transform)
        elif stype == "cube":
            tris = geometry.cube(transform)
        elif stype == "disk":
            tris = geometry.disk(transform)
        elif stype == "cylinder":
            p0 = _child_vec(node, "p0", [0, 0, 0])
            p1 = _child_vec(node, "p1", [0, 0, 1])
            radius = _child_float(node, "radius", 1.0)
            tris = geometry.cylinder(transform, p0, p1, radius)
        else:  # sphere
            radius = _child_float(node, "radius", 1.0)
            center = np.zeros(3, np.float32)
            c = _child_by_name(node, "center")
            if c is not None:
                center = np.array([float(c.get(a, 0.0)) for a in "xyz"], np.float32)
            m = transform @ np.vstack([xf.compose(xf.translate(center), xf.scale(radius)),
                                       [0, 0, 0, 1]]).astype(np.float32)
            tris = geometry.sphere(m)
        return scene.add_mesh_data(tris, name=stype), stype

    if stype == "serialized":
        from gpu_raytracer_tpu.assets import serialized

        rel = _child_by_name(node, "filename").get("value")
        filename = _join(ctx.path, rel)
        shape_index = _child_int(node, "shapeIndex", 0)
        handle = scene.add_mesh_data_from_file(
            filename, lambda f: serialized.load(f, shape_index),
            cache_key=f"{filename}#{shape_index}")
        return handle, f"{rel}_{shape_index}"

    if stype == "hair":
        from gpu_raytracer_tpu.assets import mitshair

        rel = _child_by_name(node, "filename").get("value")
        filename = _join(ctx.path, rel)
        radius = _child_float(node, "radius", 0.0025)
        handle = scene.add_mesh_data_from_file(
            filename, lambda f: mitshair.load(f, radius),
            cache_key=f"{filename}#r{radius}")
        return handle, rel

    print(f"WARNING: shape type {stype!r} not supported")
    return None, None


# ---------------------------------------------------------------------------
# Tree walk
# ---------------------------------------------------------------------------

def _walk(node, ctx: _Context) -> None:
    scene = ctx.scene
    for child in node:
        tag = child.tag
        if tag == "bsdf":
            mid = _parse_material(child, ctx)
            ctx.material_map[scene.materials[mid].name] = mid
        elif tag == "texture":
            _parse_texture(child, ctx, np.ones(3, np.float32))
        elif tag == "shape":
            _walk_shape(child, ctx)
        elif tag == "sensor":
            _parse_sensor(child, ctx)
        elif tag == "integrator":
            scene.integrator_max_depth = _child_int(child, "maxDepth",
                                                    scene.integrator_max_depth or 0) or None
        elif tag == "emitter":
            _parse_top_level_emitter(child, ctx)
        elif tag == "include":
            rel = child.get("filename")
            load(_join(ctx.path, rel), scene)
        else:
            _walk(child, ctx)


def _walk_shape(node, ctx: _Context) -> None:
    scene = ctx.scene
    stype = node.get("type")

    if stype == "shapegroup":
        shape = node.find("shape")
        if shape is None:
            raise ValueError("shapegroup needs a <shape> child")
        mesh_data_id, _ = _parse_shape(shape, ctx)
        material_id = _parse_material(shape, ctx)
        ctx.shape_group_map[node.get("id")] = (mesh_data_id, material_id)
        return

    if stype == "instance":
        ref = node.find("ref")
        if ref is None:
            print("WARNING: instance without ref")
            return
        group = ctx.shape_group_map.get(ref.get("id"))
        if group and group[0] is not None:
            inst = scene.add_instance(ref.get("id"), group[0], group[1])
            pos, rot, scl = _decompose(_parse_transform_matrix(node))
            inst.position, inst.rotation, inst.scale = pos, rot, scl
            inst.update()
        return

    mesh_data_id, name = _parse_shape(node, ctx)
    material_id = _parse_material(node, ctx)
    medium_id = _parse_medium(node, ctx)

    if material_id is not None and medium_id >= 0:
        mat = ctx.scene.materials[material_id]
        if mat.medium_id >= 0 and mat.medium_id != medium_id:
            # Material already used with a different medium: clone it
            # (reference: MitsubaLoader.cpp walk_xml_tree medium handling).
            mat = copy.deepcopy(mat)
            mat.medium_id = medium_id
            material_id = ctx.scene.add_material(mat)
        else:
            mat.medium_id = medium_id

    if mesh_data_id is not None:
        inst = scene.add_instance(name, mesh_data_id, material_id)
        if stype not in _PRIMITIVES:
            # Primitives bake their transform into vertices (reference behavior).
            pos, rot, scl = _decompose(_parse_transform_matrix(node))
            inst.position, inst.rotation, inst.scale = pos, rot, scl
        inst.update()


def _parse_sensor(node, ctx: _Context) -> None:
    scene = ctx.scene
    ctype = node.get("type")
    if ctype in ("perspective", "perspective_rdist", "thinlens"):
        fov = _child_by_name(node, "fov")
        if fov is not None:
            scene.camera.set_fov(np.radians(float(fov.get("value"))))
        if ctype == "perspective":
            scene.camera.aperture_radius = 0.0
        else:
            scene.camera.aperture_radius = _child_float(node, "apertureRadius", 0.05)
            scene.camera.focal_distance = _child_float(node, "focusDistance", 10.0)
        matrix = _parse_transform_matrix(node)
        pos, rot, _ = _decompose(matrix, forward=(0, 0, -1))
        scene.camera.position = pos
        scene.camera.rotation = rot
        scene.camera.update(0.0)
    else:
        print(f"WARNING: camera type {ctype!r} not supported")

    film = node.find("film")
    if film is not None:
        width = _child_int(film, "width", scene.film_width)
        height = _child_int(film, "height", scene.film_height)
        scene.film_width, scene.film_height = width, height
        scene.camera.resize(width, height)


def _parse_top_level_emitter(node, ctx: _Context) -> None:
    scene = ctx.scene
    etype = node.get("type")
    if etype == "area":
        eid = node.get("id")
        if eid:
            mat = Material(name=eid, type=MaterialType.LIGHT,
                           emission=_child_vec(node, "radiance", [1, 1, 1]))
            ctx.material_map[eid] = scene.add_material(mat)
        else:
            print("WARNING: emitter without id not attached to geometry")
    elif etype == "envmap":
        rel = _child_by_name(node, "filename").get("value")
        scene.sky_filename = _join(ctx.path, rel)
    elif etype == "point":
        radius = 1e-4
        m = _parse_transform_matrix(node) @ np.diag([radius, radius, radius, 1.0]).astype(np.float32)
        tris = geometry.sphere(m, num_subdivisions=0)
        mesh_data_id = scene.add_mesh_data(tris, name="PointLight")
        mat = Material(name="PointLight", type=MaterialType.LIGHT,
                       emission=_child_vec(node, "intensity", [1, 1, 1]))
        material_id = scene.add_material(mat)
        inst = scene.add_instance("PointLight", mesh_data_id, material_id)
        inst.update()
    else:
        print(f"WARNING: emitter type {etype!r} not supported")
