"""Blender script: export the selected object's edge chains as a Mitsuba
hair file (.mitshair) loadable by gpu_raytracer_tpu/assets/mitshair.py.

Run inside Blender with the hair mesh selected (edges form polylines).
Writes `hair.mitshair` next to the .blend file (or CWD when unsaved).

Parity target: /root/reference/Tools/blender_mitshair.py. Format: one
"x y z" vertex per line, strands separated by blank lines; Blender's Z-up
coordinates are swizzled to the renderer's Y-up frame (x, z, -y).
"""

import os

import bpy


def iter_strands(mesh):
    """Walk the edge list, splitting whenever consecutive edges stop
    chaining (edge_b.start != edge_a.end) — the same strand-break rule the
    mitshair loader expects (blank line = new strand)."""
    strand = []
    prev_end = None
    for edge in mesh.edges:
        a, b = edge.vertices
        if prev_end is not None and a != prev_end:
            strand.append(prev_end)
            yield strand
            strand = []
        strand.append(a)
        prev_end = b
    if prev_end is not None:
        strand.append(prev_end)
    if strand:
        yield strand


def write_mitshair(mesh, path: str) -> int:
    count = 0
    with open(path, "w") as fh:
        first = True
        for strand in iter_strands(mesh):
            if not first:
                fh.write("\n")
            first = False
            for vi in strand:
                co = mesh.vertices[vi].co
                fh.write(f"{co[0]} {co[2]} {-co[1]}\n")
            count += 1
    return count


def main() -> None:
    obj = bpy.context.object
    if obj is None or obj.type != "MESH":
        raise RuntimeError("select a mesh object whose edges form strands")
    out_dir = os.path.dirname(bpy.data.filepath) or os.getcwd()
    out_path = os.path.join(out_dir, "hair.mitshair")
    n = write_mitshair(obj.data, out_path)
    print(f"wrote {out_path} ({n} strands)")


if __name__ == "__main__":
    main()
