"""Fused Pallas stencil kernels for the SVGF spatial stages
(reference: /root/reference/Src/CUDA/SVGF/SVGF.h:284-554 — svgf_variance and
the atrous iterations run as small stencil kernels with shared-memory tiles).

The XLA forms in ops/svgf.py express each of the ~50 taps per stage as a
pad+slice over every participating channel image; at 1080p that is hundreds
of (H, W) HBM round trips per frame when XLA's fusion gives up. These
kernels make the cost stencil-shaped by construction:

  * all channels pack into TWO channel-major images — a per-frame GUIDE
    [normal xyz | depth | dz] and a per-pass DYN [direct rgb | indirect rgb
    | var_d | var_i] — padded with 32/64-pixel edge margins so every tap of
    every pass is a STATIC in-VMEM slice (no gather, no per-tap pad);
  * the grid walks 64-row bands; each step reads band j and j+1 of both
    images (the 32-row halo lives inside the two-block window since
    TH=64 >= 32 + max step 32), computes all taps + edge-stopping weights
    in VMEM, and writes one output band — each input row is read at most
    twice per pass, each output row written once: speed-of-light for a
    bandwidth-bound stencil;
  * the a-trous hole spacing `step` is a static kernel parameter, so the 6
    iterations compile 6 specialized stencils, exactly like the reference's
    `step_size` constant.

Layouts are channel-major (C, H, W): W rides the 128-lane axis, H the
sublanes, and per-channel slices are contiguous (8, 128) tiles.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH = 64          # rows per band; >= HALO + max atrous step (32)
HALO = 32        # row margin; also max supported tap offset
WMARGIN = 64     # column margin each side (>= 32, keeps W padded to 128)

# Test hook: CPU-backend tests flip this to run through the interpreter.
FORCE_INTERPRET = False

# Scoped-VMEM cap passed to the stencil kernels (raised from the 16 MB
# default: the unrolled 49-tap bodies keep many live band-sized
# temporaries and OOMed on chip at the default, commit 677e4c8).
VMEM_CAP = 120 * 1024 * 1024


def supports_width(width: int) -> bool:
    """Does a frame of this width fit the stencil kernels' VMEM budget?

    The double-buffered input windows alone are 2 bands x (5 guide + 8
    dyn) channels x TH rows x padded width x 4 B; with the output band and
    ~24 band temporaries the working set must stay under VMEM_CAP — at
    ~8K wide (Wp ~ 8300) the windows alone exceed it and compilation
    fails, so callers must take the XLA path instead (ADVICE r3)."""
    wp = -(-width // 128) * 128 + 2 * WMARGIN
    bands = (2 * 2 * (5 + 8) + 8 + 24) * TH * wp * 4
    return bands <= VMEM_CAP

_GAUSS_3 = [[1.0 / 16, 2.0 / 16, 1.0 / 16],
            [2.0 / 16, 4.0 / 16, 2.0 / 16],
            [1.0 / 16, 2.0 / 16, 1.0 / 16]]

_LUM = (0.2126, 0.7152, 0.0722)


def _pow_static(x, p: float):
    """x**p for static p: repeated squaring for small integer exponents
    (bit-parity with jnp.power), exp/log otherwise."""
    ip = int(p)
    if float(ip) == float(p) and 0 < ip <= 64:
        acc = None
        base = x
        e = ip
        while e:
            if e & 1:
                acc = base if acc is None else acc * base
            base = base * base
            e >>= 1
        return acc
    return jnp.exp(p * jnp.log(jnp.maximum(x, 1e-20)))


def _pad_cmajor(img, rows_pad, w):
    """Edge-pad a channel-major (C, H, W) image to the kernel layout:
    (C, rows_pad, ceil(W/128)*128 + 2*WMARGIN) with a HALO-row top margin."""
    C, H, W = img.shape
    wc = -W % 128
    return jnp.pad(img, ((0, 0), (HALO, rows_pad - HALO - H),
                         (WMARGIN, wc + WMARGIN)), mode="edge")


def _grid_dims(H, W):
    G = -(-H // TH)
    rows_pad = (G + 1) * TH
    Wc = -(-W // 128) * 128
    return G, rows_pad, Wc


def _weights(dy, dx, step, g, d, z_c, dz_c, n_c, l_dc, l_ic, den_d, den_i,
             sigma_z, sigma_n, Wc, r0):
    """Edge-stopping weights for tap (dy*step, dx*step) (SVGF.h:100-128 /
    ops/svgf._edge_weights). `den_*` are the luminance-sigma denominators
    (they differ between the variance and atrous stages)."""
    oy, ox = dy * step, dx * step

    def tap(img, c):
        return img[c, r0 + oy: r0 + oy + TH,
                   WMARGIN + ox: WMARGIN + ox + Wc]

    n_q0, n_q1, n_q2 = tap(g, 0), tap(g, 1), tap(g, 2)
    z_q = tap(g, 3)
    ndot = n_c[0] * n_q0 + n_c[1] * n_q1 + n_c[2] * n_q2
    w_n = _pow_static(jnp.maximum(ndot, 0.0), sigma_n)
    dist = float((oy * oy + ox * ox) ** 0.5)
    w_z = jnp.exp(-jnp.abs(z_c - z_q) / (sigma_z * jnp.maximum(
        dz_c * dist, 1e-8)))

    l_dq = _LUM[0] * tap(d, 0) + _LUM[1] * tap(d, 1) + _LUM[2] * tap(d, 2)
    l_iq = _LUM[0] * tap(d, 3) + _LUM[1] * tap(d, 4) + _LUM[2] * tap(d, 5)
    w_l_d = jnp.exp(-jnp.abs(l_dc - l_dq) / den_d)
    w_l_i = jnp.exp(-jnp.abs(l_ic - l_iq) / den_i)

    base = w_n * w_z
    return base * w_l_d, base * w_l_i


def _open_window(g0, g1, d0, d1):
    g = jnp.concatenate([g0[...], g1[...]], axis=1)   # (5, 2*TH, Wp)
    d = jnp.concatenate([d0[...], d1[...]], axis=1)   # (8, 2*TH, Wp)
    return g, d


def _center(img, c, Wc, r0):
    return img[c, r0: r0 + TH, WMARGIN: WMARGIN + Wc]


def _atrous_kernel(step, sigma_z, sigma_n, sigma_l, Wc,
                   g0, g1, d0, d1, out):
    """One fused a-trous iteration (SVGF.h:416-554): 3x3 box with hole
    spacing `step`, variance 3x3-pre-blurred for the weights and filtered
    by w^2."""
    r0 = HALO
    g, d = _open_window(g0, g1, d0, d1)

    dir_c = [_center(d, c, Wc, r0) for c in range(3)]
    ind_c = [_center(d, c, Wc, r0) for c in range(3, 6)]
    vd_c = _center(d, 6, Wc, r0)
    vi_c = _center(d, 7, Wc, r0)
    n_c = [_center(g, c, Wc, r0) for c in range(3)]
    z_c = _center(g, 3, Wc, r0)
    dz_c = _center(g, 4, Wc, r0)

    # 3x3 gaussian pre-blur of the variance (weights only).
    vd_b = jnp.zeros_like(vd_c)
    vi_b = jnp.zeros_like(vi_c)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            w = _GAUSS_3[dy + 1][dx + 1]
            vd_b += w * d[6, r0 + dy: r0 + dy + TH,
                          WMARGIN + dx: WMARGIN + dx + Wc]
            vi_b += w * d[7, r0 + dy: r0 + dy + TH,
                          WMARGIN + dx: WMARGIN + dx + Wc]

    l_dc = _LUM[0] * dir_c[0] + _LUM[1] * dir_c[1] + _LUM[2] * dir_c[2]
    l_ic = _LUM[0] * ind_c[0] + _LUM[1] * ind_c[1] + _LUM[2] * ind_c[2]
    den_d = sigma_l * jnp.sqrt(jnp.maximum(vd_b, 0.0)) + 1e-8
    den_i = sigma_l * jnp.sqrt(jnp.maximum(vi_b, 0.0)) + 1e-8

    sum_w_d = jnp.ones_like(l_dc)
    sum_w_i = jnp.ones_like(l_ic)
    out_d = list(dir_c)
    out_i = list(ind_c)
    out_vd = vd_c
    out_vi = vi_c
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            w_d, w_i = _weights(dy, dx, step, g, d, z_c, dz_c, n_c,
                                l_dc, l_ic, den_d, den_i,
                                sigma_z, sigma_n, Wc, r0)
            oy, ox = dy * step, dx * step

            def tap(c):
                return d[c, r0 + oy: r0 + oy + TH,
                         WMARGIN + ox: WMARGIN + ox + Wc]

            for c in range(3):
                out_d[c] = out_d[c] + w_d * tap(c)
                out_i[c] = out_i[c] + w_i * tap(3 + c)
            out_vd = out_vd + (w_d * w_d) * tap(6)
            out_vi = out_vi + (w_i * w_i) * tap(7)
            sum_w_d = sum_w_d + w_d
            sum_w_i = sum_w_i + w_i

    inv_d = 1.0 / sum_w_d
    inv_i = 1.0 / sum_w_i
    for c in range(3):
        out[c] = out_d[c] * inv_d
        out[3 + c] = out_i[c] * inv_i
    out[6] = out_vd / jnp.maximum(sum_w_d * sum_w_d, 1e-8)
    out[7] = out_vi / jnp.maximum(sum_w_i * sum_w_i, 1e-8)


def _variance_kernel(sigma_z, sigma_n, sigma_l, Wc, g0, g1, d0, d1, out):
    """7x7 bilateral moment estimate + filtered colour (SVGF.h:284-410).
    Luminance-sigma denominator is the constant sigma_l (the XLA form
    passes unit variance here). Outputs [col_d rgb | col_i rgb |
    var_d | var_i], already normalized."""
    r0 = HALO
    g, d = _open_window(g0, g1, d0, d1)

    dir_c = [_center(d, c, Wc, r0) for c in range(3)]
    n_c = [_center(g, c, Wc, r0) for c in range(3)]
    z_c = _center(g, 3, Wc, r0)
    dz_c = _center(g, 4, Wc, r0)
    l_dc = _LUM[0] * dir_c[0] + _LUM[1] * dir_c[1] + _LUM[2] * dir_c[2]
    ind_c = [_center(d, c, Wc, r0) for c in range(3, 6)]
    l_ic = _LUM[0] * ind_c[0] + _LUM[1] * ind_c[1] + _LUM[2] * ind_c[2]
    den = sigma_l * 1.0 + 1e-8

    sum_w_d = jnp.zeros_like(l_dc)
    sum_w_i = jnp.zeros_like(l_ic)
    m_d1 = jnp.zeros_like(l_dc)
    m_d2 = jnp.zeros_like(l_dc)
    m_i1 = jnp.zeros_like(l_ic)
    m_i2 = jnp.zeros_like(l_ic)
    col_d = [jnp.zeros_like(l_dc) for _ in range(3)]
    col_i = [jnp.zeros_like(l_ic) for _ in range(3)]
    for dy in range(-3, 4):
        for dx in range(-3, 4):
            w_d, w_i = _weights(dy, dx, 1, g, d, z_c, dz_c, n_c,
                                l_dc, l_ic, den, den,
                                sigma_z, sigma_n, Wc, r0)

            def tap(c):
                return d[c, r0 + dy: r0 + dy + TH,
                         WMARGIN + dx: WMARGIN + dx + Wc]

            l_dq = _LUM[0] * tap(0) + _LUM[1] * tap(1) + _LUM[2] * tap(2)
            l_iq = _LUM[0] * tap(3) + _LUM[1] * tap(4) + _LUM[2] * tap(5)
            sum_w_d = sum_w_d + w_d
            sum_w_i = sum_w_i + w_i
            m_d1 = m_d1 + w_d * l_dq
            m_d2 = m_d2 + w_d * l_dq * l_dq
            m_i1 = m_i1 + w_i * l_iq
            m_i2 = m_i2 + w_i * l_iq * l_iq
            for c in range(3):
                col_d[c] = col_d[c] + w_d * tap(c)
                col_i[c] = col_i[c] + w_i * tap(3 + c)

    inv_d = 1.0 / jnp.maximum(sum_w_d, 1e-8)
    inv_i = 1.0 / jnp.maximum(sum_w_i, 1e-8)
    mu_d1 = m_d1 * inv_d
    mu_i1 = m_i1 * inv_i
    for c in range(3):
        out[c] = col_d[c] * inv_d
        out[3 + c] = col_i[c] * inv_i
    out[6] = jnp.maximum(m_d2 * inv_d - mu_d1 * mu_d1, 0.0)
    out[7] = jnp.maximum(m_i2 * inv_i - mu_i1 * mu_i1, 0.0)


def _run_stencil(kernel_fn, guide_p, dyn_p, G, Wc, interpret):
    """Launch a banded stencil: two-block windows of guide+dyn in, one
    (8, TH, Wc) band out per grid step."""
    Wp = guide_p.shape[2]

    def spec(channels, offset):
        return pl.BlockSpec((channels, TH, Wp),
                            lambda j, o=offset: (0, j + o, 0),
                            memory_space=pltpu.VMEM)

    def body(g0, g1, d0, d1, out_ref):
        out = [None] * 8
        kernel_fn(Wc, g0, g1, d0, d1, out)
        for c in range(8):
            out_ref[c] = out[c]

    out = pl.pallas_call(
        body,
        grid=(G,),
        in_specs=[spec(guide_p.shape[0], 0), spec(guide_p.shape[0], 1),
                  spec(dyn_p.shape[0], 0), spec(dyn_p.shape[0], 1)],
        out_specs=pl.BlockSpec((8, TH, Wc), lambda j: (0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, G * TH, Wc), jnp.float32),
        # The unrolled 49-tap bodies keep many live band-sized temporaries;
        # the default 16 MB scoped-vmem cap OOMs even at small widths. Size
        # the cap to the working set: 2x double-buffered input windows +
        # output band + ~24 band temporaries.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_CAP,
        ),
        interpret=interpret,
    )(guide_p, guide_p, dyn_p, dyn_p)
    return out


def pack_guide(normal, depth, dz, rows_pad):
    """(H, W, 3)+(H, W)x2 -> padded channel-major guide image."""
    g = jnp.concatenate([jnp.moveaxis(normal, -1, 0),
                         depth[None], dz[None]], axis=0)
    return _pad_cmajor(g, rows_pad, depth.shape[1])


def pack_dyn(direct, indirect, var_d, var_i, rows_pad):
    d = jnp.concatenate([jnp.moveaxis(direct, -1, 0),
                         jnp.moveaxis(indirect, -1, 0),
                         var_d[None], var_i[None]], axis=0)
    return _pad_cmajor(d, rows_pad, var_d.shape[1])


def _unpack(out, H, W):
    direct = jnp.moveaxis(out[0:3, :H, :W], 0, -1)
    indirect = jnp.moveaxis(out[3:6, :H, :W], 0, -1)
    return direct, indirect, out[6, :H, :W], out[7, :H, :W]


@partial(jax.jit, static_argnames=("iterations", "feedback_iteration",
                                   "sigma_z", "sigma_n", "sigma_l",
                                   "spatial_variance", "interpret"))
def svgf_spatial_pallas(frame, integrated, iterations: int = 6,
                        feedback_iteration: int = 1, sigma_z: float = 4.0,
                        sigma_n: float = 16.0, sigma_l: float = 10.0,
                        spatial_variance: bool = True, interpret: bool = False):
    """Fused spatial SVGF: [7x7 variance estimate where history < 4] +
    N a-trous iterations. Drop-in for ops/svgf.spatial_variance + atrous
    (same inputs/outputs); reproject stays in XLA (it is a gather, not a
    stencil). Returns (direct, indirect, (fb_direct, fb_indirect))."""
    if (1 << max(iterations - 1, 0)) > HALO:
        raise ValueError(f"atrous step 2^{iterations - 1} exceeds the "
                         f"kernel halo {HALO}; use the XLA path")
    if not supports_width(frame["depth"].shape[1]):
        raise ValueError("frame width exceeds the stencil kernels' "
                         "scoped-vmem budget; use the XLA path "
                         "(pallas_svgf.supports_width)")
    interpret = interpret or FORCE_INTERPRET
    H, W = frame["depth"].shape
    G, rows_pad, Wc = _grid_dims(H, W)
    guide_p = pack_guide(frame["normal"], frame["depth"], frame["dz"],
                         rows_pad)

    direct = integrated["direct"]
    indirect = integrated["indirect"]
    var_d = integrated["var_direct"]
    var_i = integrated["var_indirect"]

    if spatial_variance:
        dyn_p = pack_dyn(direct, indirect, var_d, var_i, rows_pad)
        out = _run_stencil(partial(_variance_kernel, sigma_z, sigma_n,
                                   sigma_l),
                           guide_p, dyn_p, G, Wc, interpret)
        sp_d, sp_i, sp_vd, sp_vi = _unpack(out, H, W)
        use_sp = integrated["length"] < 4.0
        direct = jnp.where(use_sp[..., None], sp_d, direct)
        indirect = jnp.where(use_sp[..., None], sp_i, indirect)
        var_d = jnp.where(use_sp, sp_vd, var_d)
        var_i = jnp.where(use_sp, sp_vi, var_i)

    feedback = (direct, indirect)
    for i in range(iterations):
        dyn_p = pack_dyn(direct, indirect, var_d, var_i, rows_pad)
        out = _run_stencil(partial(_atrous_kernel, 1 << i, sigma_z, sigma_n,
                                   sigma_l),
                           guide_p, dyn_p, G, Wc, interpret)
        direct, indirect, var_d, var_i = _unpack(out, H, W)
        if i == feedback_iteration:
            feedback = (direct, indirect)
    return direct, indirect, feedback
