"""Blender script: export the active camera as a Mitsuba <transform> block
usable in scene XML files consumed by gpu_raytracer_tpu (assets/mitsuba.py).

Run inside Blender (Scripting tab or `blender -b scene.blend -P
tools/blender_export_camera.py`). Writes `camera.xml` next to the .blend
file (or CWD for unsaved files).

Parity target: /root/reference/Tools/blender_camera.py (same output format:
a row-major 4x4 `toWorld` matrix with Blender's Z-up frame rotated into the
renderer's Y-up frame and the view axis negated to look down -Z).
"""

import math
import os

import bpy
import mathutils


def camera_to_world_matrix(cam_obj) -> mathutils.Matrix:
    """Blender camera world matrix -> renderer toWorld (Y-up, -Z forward)."""
    z_up_to_y_up = mathutils.Matrix.Rotation(math.radians(-90.0), 4, "X")
    return z_up_to_y_up @ cam_obj.matrix_world


def format_transform(matrix: mathutils.Matrix) -> str:
    rows = []
    for r in range(4):
        # Mitsuba cameras look down +Z in their local frame while Blender
        # cameras look down -Z: flip the third column.
        rows.append(f"\t\t{matrix[r][0]} {matrix[r][1]} "
                    f"{-matrix[r][2]} {matrix[r][3]}")
    body = "\n".join(rows)
    return ('<transform name="toWorld">\n'
            '\t<matrix value="\n'
            f"{body}\n"
            '\t"/>\n'
            "</transform>\n")


def main() -> None:
    cam = bpy.context.scene.camera
    if cam is None:
        raise RuntimeError("scene has no active camera")
    out_dir = os.path.dirname(bpy.data.filepath) or os.getcwd()
    out_path = os.path.join(out_dir, "camera.xml")
    with open(out_path, "w") as fh:
        fh.write(format_transform(camera_to_world_matrix(cam)))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
