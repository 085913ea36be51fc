"""Interactive terminal viewer (reference layer L6: Src/Main.cpp render loop,
Src/Window.* GL blit, Src/Input.* WASD camera, ImGui editor, pixel query).

TPU hosts are headless, so the presentation layer is a truecolor ANSI
terminal renderer (two pixels per character cell via the upper-half-block
glyph) instead of an SDL/GL window. Parity pieces:

  * progressive accumulation with live display
  * WASD/QE + arrow-key free camera with the reference's movement speeds
    (Camera.cpp:44-96); any move invalidates the camera and restarts
    accumulation
  * `p` pixel query at the crosshair: instance / material / depth readout
    (reference: pixel query protocol, Integrator.h:266-277)
  * `r` hot reload: clears jax's compilation cache entry by re-tracing
    (the XLA analog of F5 NVRTC recompile, Main.cpp:177-182)
  * `e`/`d` live material editing via the invalidation protocol
"""

from __future__ import annotations

import os
import select
import sys
import time

import numpy as np

from gpu_raytracer_tpu.core import transform as xf
from gpu_raytracer_tpu.utils.image import hdr_to_ldr
from gpu_raytracer_tpu.utils.profiling import FrameTimer

MOVEMENT_SPEED = 10.0  # reference: Camera.cpp:50
ROTATION_SPEED = 3.0


def _read_keys(timeout: float = 0.0) -> str:
    """Non-blocking key read (raw mode must be enabled by the caller)."""
    keys = ""
    while select.select([sys.stdin], [], [], timeout)[0]:
        keys += sys.stdin.read(1)
        timeout = 0.0
    return keys


def render_to_terminal(hdr: np.ndarray, max_cols: int = 160) -> str:
    """HDR frame -> ANSI truecolor half-block string (2 rows per text line)."""
    ldr = hdr_to_ldr(np.flipud(hdr))
    h, w = ldr.shape[:2]
    step = max(1, (w + max_cols - 1) // max_cols)
    ldr = ldr[::step, ::step]
    if ldr.shape[0] % 2:
        ldr = ldr[:-1]
    top = ldr[0::2]
    bot = ldr[1::2]
    lines = []
    for tr, br in zip(top, bot):
        row = []
        for (r1, g1, b1), (r2, g2, b2) in zip(tr, br):
            row.append(f"\x1b[38;2;{r1};{g1};{b1}m\x1b[48;2;{r2};{g2};{b2}m▀")
        lines.append("".join(row) + "\x1b[0m")
    return "\n".join(lines)


def query_pixel(integrator, x: int, y: int):
    """Trace one primary ray through pixel (x, y) and return the hit record
    plus the world-space geometry the overlay draws: triangle vertices,
    instance AABB, hit point and geometric normal (reference: pixel query
    round trip + on-screen debug draw, Integrator.cpp:483-495 and
    Main.cpp:665-760)."""
    import jax.numpy as jnp

    from gpu_raytracer_tpu.config import ReconstructionFilter
    from gpu_raytracer_tpu.ops.camera_rays import generate_primary_rays
    from gpu_raytracer_tpu.ops.traverse import trace_closest_tlas

    camera = {k: jnp.asarray(v) for k, v in integrator.scene.camera.params().items()}
    idx = jnp.asarray([y * integrator.width + x], jnp.int32)
    o, d = generate_primary_rays(camera, idx, integrator.width, 0,
                                 ReconstructionFilter.BOX)
    hit = trace_closest_tlas(integrator.buffers["nodes"], integrator.buffers["tris"],
                             integrator.buffers["instances"], o, d,
                             jnp.asarray([jnp.inf]))
    inst = int(hit.inst[0])
    if inst < 0:
        return None
    instance = integrator.scene.instances[inst]
    material = integrator.scene.materials[instance.material_id]

    # World-space debug geometry (tiny single-row readbacks).
    tri = int(hit.tri[0])
    tb = integrator.buffers["tris"]
    p0 = np.asarray(tb["p0"][tri])  # object space
    e1 = np.asarray(tb["e1"][tri])
    e2 = np.asarray(tb["e2"][tri])
    T = np.asarray(instance.transform, np.float32).reshape(3, 4)
    verts_obj = np.stack([p0, p0 + e1, p0 + e2])
    tri_world = verts_obj @ T[:, :3].T + T[:, 3]
    n = np.cross(tri_world[1] - tri_world[0], tri_world[2] - tri_world[0])
    n = n / max(np.linalg.norm(n), 1e-20)
    md = integrator.scene.mesh_datas[instance.mesh_data_id]
    box = md.triangles.aabb()
    lo, hi = box.min, box.max
    corners = np.array([[x_, y_, z_] for x_ in (lo[0], hi[0])
                        for y_ in (lo[1], hi[1]) for z_ in (lo[2], hi[2])],
                       np.float32)
    corners_w = corners @ T[:, :3].T + T[:, 3]
    hit_p = (np.asarray(o[0]) + float(hit.t[0]) * np.asarray(d[0]))
    return {
        "instance": inst,
        "instance_name": instance.name,
        "triangle": tri,
        "material": material.name,
        "material_id": instance.material_id,
        "material_type": material.type.name,
        "t": float(hit.t[0]),
        "tri_world": tri_world,
        "aabb_corners": corners_w,
        "hit_p": hit_p,
        "normal": n,
    }


# AABB wireframe edges as corner-index pairs ((x,y,z) bit-coded 0..7).
_AABB_EDGES = [(0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6),
               (5, 7), (0, 4), (1, 5), (2, 6), (3, 7)]


def _project(camera, pts: np.ndarray):
    """World points -> float pixel coords via the ray-gen basis (the exact
    inverse of generate_primary_rays' `dir = bl + x*ax + y*ay`), so the
    overlay lands on the same pixels the renderer hit."""
    basis = np.stack([camera.x_axis_rotated, camera.y_axis_rotated,
                      camera.bottom_left_corner_rotated], axis=1)
    c = np.linalg.solve(basis.astype(np.float64),
                        (pts - camera.position).T).T
    in_front = c[:, 2] > 1e-9
    xy = c[:, :2] / np.maximum(c[:, 2:3], 1e-9)
    return xy, in_front


def _draw_line(img: np.ndarray, p0, p1, color) -> None:
    n = int(min(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]), 1), 4096))
    t = np.linspace(0.0, 1.0, n + 1)
    xs = np.round(p0[0] + (p1[0] - p0[0]) * t).astype(np.int64)
    ys = np.round(p0[1] + (p1[1] - p0[1]) * t).astype(np.int64)
    h, w = img.shape[:2]
    m = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    img[ys[m], xs[m]] = color


def draw_query_overlay(frame: np.ndarray, camera, info: dict) -> np.ndarray:
    """Draw the queried triangle wireframe (yellow), its instance's world
    AABB (cyan) and the hit normal (magenta) into a copy of the HDR frame —
    the terminal analog of the reference's GL debug lines over the render
    (Main.cpp:665-760). Colors are pre-tonemap HDR so ACES saturates them."""
    out = np.array(frame, copy=True)

    def seg(a, b, color):
        xy, ok = _project(camera, np.stack([a, b]))
        if ok.all():  # no near-plane clipping: skip segments behind the eye
            _draw_line(out, xy[0], xy[1], color)

    corners = info["aabb_corners"]
    for i, j in _AABB_EDGES:
        seg(corners[i], corners[j], (0.05, 4.0, 4.0))
    tw = info["tri_world"]
    diag = float(np.linalg.norm(corners.max(0) - corners.min(0)))
    for i in range(3):
        seg(tw[i], tw[(i + 1) % 3], (4.0, 4.0, 0.05))
    seg(info["hit_p"], info["hit_p"] + info["normal"] * 0.1 * max(diag, 1e-3),
        (4.0, 0.05, 4.0))
    return out


def run_viewer(integrator, max_cols: int = 120, target_samples: int = 0) -> None:
    """Progressive interactive loop. Requires a TTY; falls back to a single
    progressive print loop when stdin is not interactive."""
    import termios
    import tty

    interactive = sys.stdin.isatty()
    timer = FrameTimer()
    integrator.init_device()

    qx, qy = integrator.width // 2, integrator.height // 2  # query crosshair
    selected = None  # instance id grabbed with `g` for TRS editing
    overlay = None   # last 'p' query hit, drawn as debug wireframes
    old_attrs = None
    if interactive:
        old_attrs = termios.tcgetattr(sys.stdin)
        tty.setcbreak(sys.stdin.fileno())
    try:
        print("\x1b[2J", end="")  # clear
        while True:
            camera = integrator.scene.camera
            moved = False
            if interactive:
                delta = max(timer.times[-1] if timer.times else 0.05, 1e-3)
                keys = _read_keys()
                if "\x03" in keys or "x" in keys:  # ctrl-c / x: quit
                    break
                fwd = xf.quat_rotate(camera.rotation, np.array([0, 0, -1.0]))
                right = xf.quat_rotate(camera.rotation, np.array([1.0, 0, 0]))
                step = MOVEMENT_SPEED * delta
                for k in keys:
                    if k == "w":
                        camera.position = camera.position + fwd * step; moved = True
                    elif k == "s":
                        camera.position = camera.position - fwd * step; moved = True
                    elif k == "a":
                        camera.position = camera.position - right * step; moved = True
                    elif k == "d":
                        camera.position = camera.position + right * step; moved = True
                    elif k == "q":
                        camera.position = camera.position + np.array([0, step, 0]); moved = True
                    elif k == "e":
                        camera.position = camera.position - np.array([0, step, 0]); moved = True
                    elif k in "jl":  # yaw
                        sign = 1.0 if k == "j" else -1.0
                        camera.rotation = xf.quat_multiply(
                            xf.quat_axis_angle([0, 1, 0], sign * ROTATION_SPEED * delta),
                            camera.rotation)
                        moved = True
                    elif k in "IKJL":  # move the query crosshair
                        qx += 8 * ((k == "L") - (k == "J"))
                        qy += 8 * ((k == "I") - (k == "K"))
                        qx = int(np.clip(qx, 0, integrator.width - 1))
                        qy = int(np.clip(qy, 0, integrator.height - 1))
                        print(f"\x1b[Hcrosshair ({qx}, {qy})\x1b[K")
                    elif k == "p":
                        info = query_pixel(integrator, qx, qy)
                        overlay = info  # drawn until 'P' clears it
                        brief = None if info is None else {
                            k_: info[k_] for k_ in
                            ("instance", "instance_name", "triangle",
                             "material", "material_type", "t")}
                        print(f"\x1b[Hpixel query: {brief}\x1b[K")
                    elif k == "P":
                        overlay = None
                    elif k in "[]+-":
                        # Live material edit at the crosshair via the
                        # invalidation protocol (reference: ImGui editor ->
                        # invalidated_materials, Main.cpp:498-658).
                        info = query_pixel(integrator, qx, qy)
                        if info is not None:
                            m = integrator.scene.materials[info["material_id"]]
                            if k in "[]":
                                m.linear_roughness = float(np.clip(
                                    m.linear_roughness + (0.05 if k == "]" else -0.05),
                                    0.0, 1.0))
                            else:
                                f = 1.25 if k == "+" else 0.8
                                if m.is_light():
                                    m.emission = m.emission * f
                                else:
                                    m.diffuse = np.clip(m.diffuse * f, 0.0, 1.0)
                            integrator.invalidated.materials = True
                            integrator.update(0.0)
                            print(f"\x1b[Hmaterial '{m.name}' edited: "
                                  f"rough={m.linear_roughness:.2f}\x1b[K")
                    elif k == "t":
                        # Live per-stage timing readout (reference: the
                        # GUI's per-kernel event tree, Main.cpp:368-443).
                        from gpu_raytracer_tpu.utils.profiling import (
                            format_stage_times,
                            stage_times,
                        )

                        times = stage_times(integrator, repeats=2)
                        print("\x1b[Hstage times:\x1b[K\n"
                              + format_stage_times(times) + "\x1b[K")
                    elif k in "fFoO":
                        # Live camera lens edits (reference ImGui camera
                        # section, Main.cpp:471-496): f/F focal distance,
                        # o/O aperture radius.
                        if k in "fF":
                            camera.focal_distance = float(np.clip(
                                camera.focal_distance * (1.1 if k == "f" else 0.9),
                                0.05, 1e6))
                        else:
                            camera.aperture_radius = float(np.clip(
                                camera.aperture_radius + (0.01 if k == "o" else -0.01),
                                0.0, 10.0))
                        integrator.invalidated.camera = True
                        integrator.update(0.0)
                        print(f"\x1b[Hlens: focal={camera.focal_distance:.2f}"
                              f" aperture={camera.aperture_radius:.3f}\x1b[K")
                    elif k in "nN" and hasattr(integrator, "gpu_config"):
                        # SVGF filter size (reference ImGui SVGF section,
                        # Main.cpp:520-545): n/N atrous iterations.
                        import dataclasses as _dc

                        g = integrator.gpu_config
                        it = int(np.clip(g.svgf_atrous_iterations
                                         + (1 if k == "n" else -1), 0, 6))
                        integrator.gpu_config = _dc.replace(
                            g, svgf_atrous_iterations=it)
                        integrator.invalidated.gpu_config = True
                        integrator.update(0.0)
                        print(f"\x1b[Hsvgf atrous iterations = {it}\x1b[K")
                    elif k == "g":
                        # Grab the instance under the crosshair for TRS
                        # editing (reference: ImGui scene-graph selection,
                        # Main.cpp:498-658).
                        info = query_pixel(integrator, qx, qy)
                        selected = info["instance"] if info else None
                        name = (integrator.scene.instances[selected].name
                                if selected is not None else "none")
                        print(f"\x1b[Hselected instance: {selected} "
                              f"({name})\x1b[K")
                    elif k in "zZcCvVyYuU" and selected is not None:
                        # Live instance-transform editing via the
                        # transform-only invalidation path: mutates TRS,
                        # then refresh_tlas re-packs the TLAS head +
                        # instance rows with NO re-jit (reference: ImGui
                        # transform widgets -> per-frame build_tlas,
                        # Main.cpp:498-658 -> Integrator.cpp:399-430).
                        inst = integrator.scene.instances[selected]
                        step = MOVEMENT_SPEED * delta * 0.25
                        axis = {"z": 0, "c": 1, "v": 2}.get(k.lower())
                        if axis is not None:
                            sign = 1.0 if k.islower() else -1.0
                            pos = np.array(inst.position, np.float32)
                            pos[axis] += sign * step
                            inst.position = pos
                        elif k in "yY":
                            sign = 1.0 if k == "y" else -1.0
                            inst.rotation = xf.quat_multiply(
                                xf.quat_axis_angle(
                                    [0, 1, 0],
                                    sign * ROTATION_SPEED * delta),
                                inst.rotation)
                        else:  # uU: uniform scale
                            inst.scale = float(np.clip(
                                inst.scale * (1.05 if k == "u" else 1 / 1.05),
                                1e-3, 1e4))
                        inst.update()
                        integrator.invalidated.scene = True
                        # Async TLAS re-pack overlaps the in-flight frame;
                        # accumulation resets unless SVGF covers the edit
                        # (reference policy, Integrator.cpp:432-470).
                        getattr(integrator, "update_async",
                                integrator.update)(delta)
                        print(f"\x1b[Hinstance '{inst.name}' pos="
                              f"{np.round(inst.position, 2)} "
                              f"scale={inst.scale:.2f}\x1b[K")
                    elif k == "r":
                        # Hot reload: rebuild device buffers + re-trace (F5).
                        integrator.init_device()
                if moved:
                    camera.update(0.0)
                    integrator.invalidated.camera = True
                    # Async: transform-edit re-packing overlaps the device
                    # still executing the previous frame's dispatch (AO has
                    # no async path - its update is a full rebuild).
                    getattr(integrator, "update_async",
                            integrator.update)(delta)

            if integrator.gpu_config.enable_svgf:
                integrator.render_frame_denoised()
            else:
                integrator.render()
            timer.tick()
            stats = timer.stats()
            frame = integrator.framebuffer()
            if overlay is not None:
                frame = draw_query_overlay(frame, camera, overlay)
            sys.stdout.write("\x1b[H" + render_to_terminal(frame, max_cols) + "\n")
            sys.stdout.write(
                f"spp {integrator.sample_index}  {stats['avg_ms']:.0f} ms/frame "
                f"({stats['fps']:.1f} fps)  [wasd/qe move, jl turn, IJKL crosshair, "
                f"p query (P clear), g grab, zcv/ZCV move, y/Y turn, u/U scale, "
                f"[]/-+ material, f/o lens, n svgf, t timings, "
                f"r reload, x quit]\x1b[K\n")
            sys.stdout.flush()

            if not interactive and target_samples and \
                    integrator.sample_index >= target_samples:
                break
    finally:
        if old_attrs is not None:
            termios.tcsetattr(sys.stdin, termios.TCSADRAIN, old_attrs)
