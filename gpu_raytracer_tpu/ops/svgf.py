"""SVGF: spatiotemporal variance-guided filtering (Schied et al. 2017;
reference: Src/CUDA/SVGF/SVGF.h — re-designed as fused image-space JAX
stages).

Pipeline per frame (reference SVGF.h:130-609):
  reproject -> [spatial variance while history < 4] -> atrous x N -> finalize

All stages are (H, W) stencil math; neighborhood taps use padded static
slicing (XLA fuses the shifts into one pass per stage). History is an
explicit pytree threaded by the integrator — the functional version of the
reference's ping-pong device buffers.

Direct and indirect illumination are filtered side by side as one (H, W, 8)
tensor block ([direct rgb | indirect rgb | 2 luminance moments]) — the TPU
prefers one fat fused stencil over the reference's separate float4 surfaces.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gpu_raytracer_tpu.ops.sampling import luminance


class SVGFHistory(NamedTuple):
    direct: jnp.ndarray        # (H, W, 3) integrated direct illumination
    indirect: jnp.ndarray      # (H, W, 3)
    moments: jnp.ndarray       # (H, W, 4) mu1/mu2 for direct & indirect luma
    length: jnp.ndarray        # (H, W) frames accumulated
    normal: jnp.ndarray        # (H, W, 3) previous normals
    depth: jnp.ndarray         # (H, W) previous depth
    instance: jnp.ndarray      # (H, W) previous instance ids


def init_history(height: int, width: int) -> SVGFHistory:
    return SVGFHistory(
        direct=jnp.zeros((height, width, 3), jnp.float32),
        indirect=jnp.zeros((height, width, 3), jnp.float32),
        moments=jnp.zeros((height, width, 4), jnp.float32),
        length=jnp.zeros((height, width), jnp.float32),
        normal=jnp.zeros((height, width, 3), jnp.float32),
        depth=jnp.full((height, width), jnp.inf, jnp.float32),
        instance=jnp.full((height, width), -1, jnp.int32),
    )


def _shift(img, dy, dx):
    """Static-offset neighborhood tap with edge clamping."""
    H, W = img.shape[0], img.shape[1]
    pad = [(max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0))] + \
          [(0, 0)] * (img.ndim - 2)
    padded = jnp.pad(img, pad, mode="edge")
    return padded[max(-dy, 0): max(-dy, 0) + H, max(-dx, 0): max(-dx, 0) + W]


# Residual half-window of the gather-free reprojection fetch (below) and
# the largest global integer motion it aligns away per frame.
REPROJECT_WIN = 2
REPROJECT_MAX_SHIFT = 64


def windowed_fetch(img, x0, y0, win=REPROJECT_WIN):
    """Gather-free per-pixel fetch of img[y0, x0] for reprojection.

    A full-screen row gather on TPU is START-LATENCY bound (~50 ns per row
    x 2M pixels ~= 100+ ms at 1080p regardless of row width — measured on
    both the SVGF reproject and the TAA resample, round 4). Reprojection
    targets are ALMOST the identity map: previous-frame positions differ
    from the pixel by sub-pixel jitter + motion. So instead of gathering:

      1. align away the GLOBAL integer motion with one dynamic_slice of an
         edge-padded copy (handles full-screen pans up to
         REPROJECT_MAX_SHIFT px/frame),
      2. resolve the per-pixel RESIDUAL (|r| <= win) with two separable
         shift-select passes ((2*win+1) row views, then (2*win+1) column
         views) — pure HBM-bandwidth stencil work, ~10 ms where the gather
         cost ~100 ms.

    Pixels whose residual exceeds the window return edge-garbage and MUST
    be masked via the returned `in_window`; reprojection treats them as
    history misses (exactly how off-screen or inconsistent taps already
    degrade — during fast rotation/parallax the temporal history is
    semantically stale anyway). Matches the reference's texture-cache
    fetch economics (SVGF.h:130-282) the TPU way.
    Returns (rows (H, W, C) = img[y0, x0], in_window (H, W) bool).
    """
    H, W = img.shape[0], img.shape[1]
    C = img.shape[2]
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    dx = x0 - cols
    dy = y0 - rows_i
    P = REPROJECT_MAX_SHIFT
    # Global alignment = MEDIAN of a subsampled displacement grid. The
    # mean is not robust: pixels with no history (the primary hit was a
    # light source / a miss write position_prev = 0) project to wild
    # off-screen displacements, and ~10% outliers can drag a mean
    # alignment several pixels away from the true pan, emptying the
    # residual window for every real pixel. Any gx keeps the
    # miss-or-exact contract; the median just maximises how many pixels
    # bind. Subsampling (8x8) keeps the sort trivial (32k elements at
    # 1080p) — a pan is global by definition.
    gx = jnp.clip(jnp.round(jnp.median(dx[::8, ::8].astype(jnp.float32))),
                  -P, P).astype(jnp.int32)
    gy = jnp.clip(jnp.round(jnp.median(dy[::8, ::8].astype(jnp.float32))),
                  -P, P).astype(jnp.int32)
    padded = jnp.pad(img, ((P, P), (P, P), (0, 0)), mode="edge")
    aligned = jax.lax.dynamic_slice(padded,
                                    (P + gy, P + gx, jnp.int32(0)),
                                    (H, W, C))
    rx = dx - gx
    ry = dy - gy
    # Miss-or-exact contract: besides the residual window, the READ must
    # stay inside the frame after global alignment. (cols+rx, rows_i+ry)
    # is the aligned-space read position — if it crosses the border, the
    # shifted view would return an edge-clamped NEIGHBOR with ok=True
    # (e.g. a pixel wanting img[5] with residual -2 at column 0 got
    # img[6]). Same for the absolute target (x0, y0): when it is outside
    # the frame the padded copy edge-clamps. Both degrade to history
    # misses instead, exactly like out-of-window motion.
    in_window = ((jnp.abs(rx) <= win) & (jnp.abs(ry) <= win)
                 & (cols + rx >= 0) & (cols + rx < W)
                 & (rows_i + ry >= 0) & (rows_i + ry < H)
                 & (x0 >= 0) & (x0 < W) & (y0 >= 0) & (y0 < H))
    # Direct (2*win+1)^2 shifted-view select. NOT separable into a row
    # pass then a column pass: the row residual varies per pixel, so a
    # column shift of a row-selected intermediate would read a NEIGHBOR
    # pixel's row choice.
    out = _shift(aligned, win, win)  # (a, b) = (-win, -win)
    for a in range(-win, win + 1):
        for b in range(-win, win + 1):
            if a == -win and b == -win:
                continue
            out = jnp.where(((ry == a) & (rx == b))[..., None],
                            _shift(aligned, -a, -b), out)
    return out, in_window


def project_to_screen(points, view_projection, width, height):
    """World points (H, W, 3) -> screen pixel coords (H, W, 2) using the 4x4
    column-vector view-projection (reference: svgf_reproject back-projection)."""
    vp = view_projection
    x = points[..., 0]
    y = points[..., 1]
    z = points[..., 2]
    clip_x = vp[0, 0] * x + vp[0, 1] * y + vp[0, 2] * z + vp[0, 3]
    clip_y = vp[1, 0] * x + vp[1, 1] * y + vp[1, 2] * z + vp[1, 3]
    clip_w = vp[3, 0] * x + vp[3, 1] * y + vp[3, 2] * z + vp[3, 3]
    w = jnp.where(jnp.abs(clip_w) < 1e-8, 1e-8, clip_w)
    ndc_x = clip_x / w
    ndc_y = clip_y / w
    sx = (ndc_x * 0.5 + 0.5) * width
    sy = (ndc_y * 0.5 + 0.5) * height
    return jnp.stack([sx, sy], axis=-1)


@partial(jax.jit, static_argnames=("alpha", "alpha_moments"))
def reproject(frame: dict, history: SVGFHistory, screen_prev,
              alpha: float = 0.1, alpha_moments: float = 0.1):
    """Temporal accumulation (reference: SVGF.h:130-282).

    frame: dict with direct/indirect (H, W, 3), normal, depth, instance.
    screen_prev: (H, W, 2) previous-frame pixel coords of this pixel's
    surface point. Returns (integrated dict, new_history_length, moments).
    """
    H, W = frame["depth"].shape
    direct = frame["direct"]
    indirect = frame["indirect"]

    mu = jnp.stack([
        luminance(direct), luminance(direct) ** 2,
        luminance(indirect), luminance(indirect) ** 2,
    ], axis=-1)

    # 2x2 bilinear taps at the reprojected position, each validated by
    # normal/depth/instance consistency (reference: is_tap_consistent
    # SVGF.h:83-98). TPU gathers are HBM-latency-bound per START, so the
    # naive form (4 taps x 7 history fields = 28 image gathers) costs
    # ~850 ms at 1080p. Instead the WHOLE history packs into one
    # (H, W, 16) image whose 2x2 neighborhood is prebuilt as a 64-channel
    # quad image (4 cheap bandwidth shifts): the entire reproject then
    # needs ONE gather, and each tap selects its quadrant by lane mask.
    # The quad materialization costs ~0.5 GB of sequential HBM traffic
    # (<2 ms at chip bandwidth) — deliberately traded for 3 fewer gathers
    # (~30 ms of start latency EACH at 1080p, measured round 2); the
    # alternative "4 gathers of the bare 16-channel image" pays 4x the
    # start latency to save bandwidth that is not the bottleneck.
    px = screen_prev[..., 0] - 0.5
    py = screen_prev[..., 1] - 0.5
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    fx = px - x0
    fy = py - y0

    hist_img = jnp.concatenate([
        history.direct, history.indirect, history.moments,
        history.length[..., None], history.normal,
        history.depth[..., None],
        history.instance[..., None].astype(jnp.float32),
    ], axis=-1)  # (H, W, 16): moments has 4 channels
    quad = jnp.concatenate([
        hist_img,
        _shift(hist_img, 0, -1),    # (y, x+1)
        _shift(hist_img, -1, 0),    # (y+1, x)
        _shift(hist_img, -1, -1),   # (y+1, x+1)
    ], axis=-1)  # (H, W, 64)
    xb = jnp.clip(x0, 0, W - 2)
    yb = jnp.clip(y0, 0, H - 2)
    # Gather-free reprojection fetch (windowed_fetch): taps whose residual
    # motion exceeds the window count as history misses, like off-screen.
    rows, in_window = windowed_fetch(quad, xb, yb)
    inst_cur = frame["instance"].astype(jnp.float32)

    def tap(xi, yi, wgt):
        in_bounds = ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
                     & in_window)
        slot = jnp.clip(yi - yb, 0, 1) * 2 + jnp.clip(xi - xb, 0, 1)
        f = rows[..., 0:16]
        f = jnp.where((slot == 1)[..., None], rows[..., 16:32], f)
        f = jnp.where((slot == 2)[..., None], rows[..., 32:48], f)
        f = jnp.where((slot == 3)[..., None], rows[..., 48:64], f)
        n_prev = f[..., 11:14]
        z_prev = f[..., 14]
        i_prev = f[..., 15]
        z_prev_c = jnp.where(jnp.isfinite(z_prev), z_prev, jnp.float32(1e30))
        z_cur = frame["depth"]
        consistent = (jnp.sum(n_prev * frame["normal"], axis=-1) > 0.95) \
            & (jnp.abs(z_prev_c - z_cur)
               < 2.0 * jnp.maximum(z_cur * 0.02, 1e-2)) \
            & (i_prev == inst_cur)
        w = jnp.where(in_bounds & consistent, wgt, 0.0)
        return (w, w[..., None] * f[..., 0:3],
                w[..., None] * f[..., 3:6],
                w[..., None] * f[..., 6:10],
                w * f[..., 10])

    taps = [
        tap(x0, y0, (1 - fx) * (1 - fy)),
        tap(x0 + 1, y0, fx * (1 - fy)),
        tap(x0, y0 + 1, (1 - fx) * fy),
        tap(x0 + 1, y0 + 1, fx * fy),
    ]
    w_sum = sum(t[0] for t in taps)
    valid = w_sum > 1e-4
    inv_w = 1.0 / jnp.maximum(w_sum, 1e-4)
    prev_direct = sum(t[1] for t in taps) * inv_w[..., None]
    prev_indirect = sum(t[2] for t in taps) * inv_w[..., None]
    prev_moments = sum(t[3] for t in taps) * inv_w[..., None]
    prev_length = sum(t[4] for t in taps) * inv_w

    length = jnp.where(valid, prev_length + 1.0, 1.0)
    # EMA with alpha clamped by 1/history (reference: SVGF.h:230-240).
    a_c = jnp.maximum(alpha, 1.0 / length)[..., None]
    a_m = jnp.maximum(alpha_moments, 1.0 / length)[..., None]

    int_direct = jnp.where(valid[..., None],
                           prev_direct + a_c * (direct - prev_direct), direct)
    int_indirect = jnp.where(valid[..., None],
                             prev_indirect + a_c * (indirect - prev_indirect), indirect)
    int_moments = jnp.where(valid[..., None],
                            prev_moments + a_m * (mu - prev_moments), mu)

    # Temporal variance estimate once history >= 4 (reference SVGF.h:250-270).
    var_direct = jnp.maximum(int_moments[..., 1] - int_moments[..., 0] ** 2, 0.0)
    var_indirect = jnp.maximum(int_moments[..., 3] - int_moments[..., 2] ** 2, 0.0)

    return {
        "direct": int_direct,
        "indirect": int_indirect,
        "moments": int_moments,
        "length": length,
        "var_direct": var_direct,
        "var_indirect": var_indirect,
    }


# numpy on purpose: module-level jnp constants become leaked tracers when
# the module is first imported inside a jit trace (ops/traverse.py note).
import numpy as _np  # noqa: E402

_GAUSS_3 = _np.asarray([[1.0, 2.0, 1.0], [2.0, 4.0, 2.0],
                        [1.0, 2.0, 1.0]]) / 16.0


def _edge_weights(frame, dy, dx, sigma_z, sigma_n, sigma_l,
                  center_l_direct, center_l_indirect, var_d, var_i, step=1):
    """Shared edge-stopping weights (reference: SVGF.h:100-128)."""
    n_c = frame["normal"]
    z_c = frame["depth"]
    n_q = _shift(frame["normal"], dy, dx)
    z_q = _shift(frame["depth"], dy, dx)

    w_n = jnp.maximum(jnp.sum(n_c * n_q, axis=-1), 0.0) ** sigma_n
    dist = jnp.sqrt(jnp.float32(dy * dy + dx * dx)) * step
    w_z = jnp.exp(-jnp.abs(z_c - z_q)
                  / (sigma_z * jnp.maximum(frame["dz"] * dist, 1e-8)))

    l_d_q = _shift(center_l_direct, dy, dx)
    l_i_q = _shift(center_l_indirect, dy, dx)
    w_l_d = jnp.exp(-jnp.abs(center_l_direct - l_d_q)
                    / (sigma_l * jnp.sqrt(jnp.maximum(var_d, 0.0)) + 1e-8))
    w_l_i = jnp.exp(-jnp.abs(center_l_indirect - l_i_q)
                    / (sigma_l * jnp.sqrt(jnp.maximum(var_i, 0.0)) + 1e-8))

    valid = jnp.isfinite(z_q)
    base = jnp.where(valid, w_n * w_z, 0.0)
    return base * w_l_d, base * w_l_i


@partial(jax.jit, static_argnames=("sigma_z", "sigma_n", "sigma_l"))
def spatial_variance(frame: dict, integrated: dict,
                     sigma_z: float = 4.0, sigma_n: float = 16.0,
                     sigma_l: float = 10.0):
    """7x7 bilateral moment estimate for pixels with history < 4
    (reference: SVGF.h:284-410)."""
    l_d = luminance(integrated["direct"])
    l_i = luminance(integrated["indirect"])

    sum_w_d = jnp.zeros_like(l_d)
    sum_w_i = jnp.zeros_like(l_i)
    m_d = jnp.zeros(l_d.shape + (2,), jnp.float32)
    m_i = jnp.zeros(l_i.shape + (2,), jnp.float32)
    col_d = jnp.zeros_like(integrated["direct"])
    col_i = jnp.zeros_like(integrated["indirect"])

    for dy in range(-3, 4):
        for dx in range(-3, 4):
            w_d, w_i = _edge_weights(frame, dy, dx, sigma_z, sigma_n, sigma_l,
                                     l_d, l_i,
                                     jnp.ones_like(l_d), jnp.ones_like(l_i))
            lq_d = _shift(l_d, dy, dx)
            lq_i = _shift(l_i, dy, dx)
            sum_w_d = sum_w_d + w_d
            sum_w_i = sum_w_i + w_i
            m_d = m_d + w_d[..., None] * jnp.stack([lq_d, lq_d * lq_d], -1)
            m_i = m_i + w_i[..., None] * jnp.stack([lq_i, lq_i * lq_i], -1)
            col_d = col_d + w_d[..., None] * _shift(integrated["direct"], dy, dx)
            col_i = col_i + w_i[..., None] * _shift(integrated["indirect"], dy, dx)

    inv_d = 1.0 / jnp.maximum(sum_w_d, 1e-8)
    inv_i = 1.0 / jnp.maximum(sum_w_i, 1e-8)
    mu_d = m_d * inv_d[..., None]
    mu_i = m_i * inv_i[..., None]
    var_d = jnp.maximum(mu_d[..., 1] - mu_d[..., 0] ** 2, 0.0)
    var_i = jnp.maximum(mu_i[..., 1] - mu_i[..., 0] ** 2, 0.0)

    use_spatial = integrated["length"] < 4.0
    return {
        **integrated,
        "direct": jnp.where(use_spatial[..., None], col_d * inv_d[..., None],
                            integrated["direct"]),
        "indirect": jnp.where(use_spatial[..., None], col_i * inv_i[..., None],
                              integrated["indirect"]),
        "var_direct": jnp.where(use_spatial, var_d, integrated["var_direct"]),
        "var_indirect": jnp.where(use_spatial, var_i, integrated["var_indirect"]),
    }


def _atrous_pass(frame, direct, indirect, var_d, var_i, step: int,
                 sigma_z, sigma_n, sigma_l):
    """One 3x3 box a-trous iteration with hole spacing `step`
    (reference: SVGF.h:416-554; variance pre-blurred 3x3, filtered by w^2)."""
    # 3x3 gaussian pre-blur of variance for the weight computation.
    var_d_b = jnp.zeros_like(var_d)
    var_i_b = jnp.zeros_like(var_i)
    for dy in range(-1, 2):
        for dx in range(-1, 2):
            g = _GAUSS_3[dy + 1, dx + 1]
            var_d_b = var_d_b + g * _shift(var_d, dy, dx)
            var_i_b = var_i_b + g * _shift(var_i, dy, dx)

    l_d = luminance(direct)
    l_i = luminance(indirect)

    sum_w_d = jnp.ones_like(l_d)
    sum_w_i = jnp.ones_like(l_i)
    out_d = direct.astype(jnp.float32)
    out_i = indirect.astype(jnp.float32)
    out_vd = var_d
    out_vi = var_i
    for dy in range(-1, 2):
        for dx in range(-1, 2):
            if dy == 0 and dx == 0:
                continue
            w_d, w_i = _edge_weights(frame, dy * step, dx * step,
                                     sigma_z, sigma_n, sigma_l,
                                     l_d, l_i, var_d_b, var_i_b, step=1)
            out_d = out_d + w_d[..., None] * _shift(direct, dy * step, dx * step)
            out_i = out_i + w_i[..., None] * _shift(indirect, dy * step, dx * step)
            out_vd = out_vd + (w_d ** 2) * _shift(var_d, dy * step, dx * step)
            out_vi = out_vi + (w_i ** 2) * _shift(var_i, dy * step, dx * step)
            sum_w_d = sum_w_d + w_d
            sum_w_i = sum_w_i + w_i

    return (out_d / sum_w_d[..., None], out_i / sum_w_i[..., None],
            out_vd / jnp.maximum(sum_w_d ** 2, 1e-8),
            out_vi / jnp.maximum(sum_w_i ** 2, 1e-8))


@partial(jax.jit, static_argnames=("iterations", "feedback_iteration",
                                   "sigma_z", "sigma_n", "sigma_l"))
def atrous(frame: dict, filtered: dict, iterations: int = 6,
           feedback_iteration: int = 1, sigma_z: float = 4.0,
           sigma_n: float = 16.0, sigma_l: float = 10.0):
    """N a-trous iterations with 2^i spacing. The iteration with step 2^1
    feeds the temporal colour history (reference: SVGF.h:414, 550-553)."""
    direct = filtered["direct"]
    indirect = filtered["indirect"]
    var_d = filtered["var_direct"]
    var_i = filtered["var_indirect"]
    feedback = (direct, indirect)
    for i in range(iterations):
        direct, indirect, var_d, var_i = _atrous_pass(
            frame, direct, indirect, var_d, var_i, 1 << i,
            sigma_z, sigma_n, sigma_l)
        if i == feedback_iteration:
            feedback = (direct, indirect)
    return direct, indirect, feedback


def finalize(direct, indirect, albedo, modulate: bool = True):
    """(direct + indirect) re-modulated by primary albedo
    (reference: SVGF.h:559-609)."""
    combined = direct + indirect
    if modulate:
        combined = combined * albedo
    return combined


def svgf_step(frame: dict, history: SVGFHistory, view_projection_prev,
              config, use_pallas: bool = False) -> tuple:
    """Full SVGF frame: returns (filtered colour (H, W, 3), new history).

    `use_pallas` routes the spatial stages (variance estimate + atrous)
    through the fused stencil kernels (ops/pallas_svgf.py) — the TPU analog
    of the reference's svgf_variance/atrous kernels; reproject stays in XLA
    (it is a gather, not a stencil)."""
    H, W = frame["depth"].shape
    screen_prev = project_to_screen(frame["position_prev"],
                                    view_projection_prev, W, H)
    frame = dict(frame)
    # Sanitize sky/miss depth: inf - inf = NaN would poison the edge weights
    # and spread one neighborhood ring per atrous iteration. A large finite
    # sentinel keeps sky-sky weights at 1 and sky-surface weights at 0.
    frame["depth"] = jnp.where(jnp.isfinite(frame["depth"]),
                               frame["depth"], jnp.float32(1e30))
    # Image-space depth gradient for the edge-stopping z weight.
    dz_x = jnp.abs(_shift(frame["depth"], 0, 1) - frame["depth"])
    dz_y = jnp.abs(_shift(frame["depth"], 1, 0) - frame["depth"])
    frame["dz"] = jnp.clip(jnp.maximum(dz_x, dz_y), 1e-4, 1e20)

    integrated = reproject(frame, history, screen_prev,
                           config.svgf_alpha_colour, config.svgf_alpha_moments)
    from gpu_raytracer_tpu.ops.pallas_svgf import supports_width

    if (use_pallas and supports_width(W)
            and (1 << max(config.svgf_atrous_iterations - 1, 0)) <= 32):
        from gpu_raytracer_tpu.ops.pallas_svgf import svgf_spatial_pallas

        direct, indirect, (fb_direct, fb_indirect) = svgf_spatial_pallas(
            frame, integrated, config.svgf_atrous_iterations, 1,
            config.svgf_sigma_z, config.svgf_sigma_n, config.svgf_sigma_l,
            spatial_variance=config.enable_spatial_variance)
    else:
        if config.enable_spatial_variance:
            integrated = spatial_variance(frame, integrated,
                                          config.svgf_sigma_z,
                                          config.svgf_sigma_n,
                                          config.svgf_sigma_l)
        direct, indirect, (fb_direct, fb_indirect) = atrous(
            frame, integrated, config.svgf_atrous_iterations, 1,
            config.svgf_sigma_z, config.svgf_sigma_n, config.svgf_sigma_l)

    colour = finalize(direct, indirect, frame["albedo"], config.modulate_albedo)

    new_history = SVGFHistory(
        direct=fb_direct,
        indirect=fb_indirect,
        moments=integrated["moments"],
        length=integrated["length"],
        normal=frame["normal"],
        depth=frame["depth"],
        instance=frame["instance"],
    )
    return colour, new_history
