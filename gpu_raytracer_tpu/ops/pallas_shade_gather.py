"""Scene-scale fused shade megakernel with GATHERED per-lane inputs.

The SMEM megakernel (ops/pallas_shade.py) fuses the whole per-bounce shade
stage but is gated to scenes whose triangle/instance tables fit SMEM and
that have no textures and a constant sky. This kernel removes every one of
those gates by splitting the work the TPU-native way:

  * XLA pre-stage (integrators/pathtracer.py bounce_body, fused branch):
    everything that needs a GATHER — the (T, 32) shade-row fetch, instance
    transforms, hit interpolation, ray-cone texture taps, equirect sky
    sample, and the low-discrepancy draws — runs as XLA ops, which lower
    row gathers at HBM-latency-per-start cost (ops/vec.py findings).
  * this kernel: ALL the remaining per-bounce math — sky/emissive MIS adds,
    russian roulette, shading frame, albedo fold, NEE light pick + full
    4-BSDF eval, shadow-ray setup, BSDF sampling, throughput update — fused
    into ONE Mosaic program instead of the ~150 XLA fusions (each paying a
    kernel launch + HBM round trips of (R,) wavefront state).

Materials + Kulla-Conty curves + lights stay in SMEM (tiny tables,
select-scan by per-lane material id); triangle-sized tables never enter the
kernel. Works at ANY scene size, with textures and image skies — this is
the path the reference's material kernels run for every scene
(/root/reference/Src/CUDA/Pathtracer.cu:465-773).

SMEM table layouts (packed by ops/buffers.py `_pack_shade_gather`):
  mat_tbl (16, M): [0] type, [1:4] emission, [4:7] diffuse, [7] roughness,
                   [8] ior, [9:12] eta, [12:15] k
  kc_tbl  (32, M): per-material Kulla-Conty curves (bake_material_curves)
  lgt_tbl (16, L): [0] cdf, [1:4] p0 WORLD, [4:7] e1 WORLD, [7:10] e2 WORLD,
                   [10:13] emission  (pre-transformed, refreshed with the
                   TLAS on scene edits — no triangle/instance fetch needed)
  params  (4, 1):  [0] bounce (traced), [1] num_bounces, [2] total_weight

The kernel only ever runs for bounces >= 1 (bounce 0 stays on the XLA body:
G-buffer AOVs, anisotropic texture gradients and demodulation are
bounce-0-only and statically peeled), so russian roulette is always armed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpu_raytracer_tpu.ops.pallas_shade import (
    _EPS,
    _MAT_DIFFUSE,
    _MAT_LIGHT,
    _fetch,
    _norm3,
    _offset,
    bsdf_sample_dispatch,
    make_lane_materials,
    nee_eval_dispatch,
)

BLOCK = 1024
SHAPE = (8, 128)

# SMEM budget for mat/kc/light tables (v5e SMEM is ~1 MB/core; the traversal
# kernels keep their own stacks there).
MAX_TABLE_BYTES = 600_000

# Test hook: CPU-backend tests flip this to run through the interpreter.
FORCE_INTERPRET = False


def supports_gather_shade(mat_types, num_mats: int, num_lights: int,
                          has_media: bool) -> bool:
    """Gate: the 5 core material types, tables within SMEM. Media scenes
    ARE supported since round 4: medium distance sampling stays in the XLA
    pre-stage (per-lane math over a 3-row sigma table — no gathers worth
    fusing), scattered lanes enter the kernel dead, and the integrator
    merges the HG continuation back using the kernel's is_transmission
    output for the medium-id handoff (reference handles media in the same
    wavefront, Pathtracer.cu:252-325)."""
    import numpy as np

    from gpu_raytracer_tpu.scene.types import MaterialType

    types = set(int(t) for t in np.asarray(mat_types))
    ok_types = {int(MaterialType.LIGHT), int(MaterialType.DIFFUSE),
                int(MaterialType.PLASTIC), int(MaterialType.DIELECTRIC),
                int(MaterialType.CONDUCTOR)}
    if not types.issubset(ok_types):
        return False
    del has_media  # supported; parameter kept for call-site clarity
    table_bytes = 4 * (48 * num_mats + 16 * max(num_lights, 1) + 4)
    return table_bytes <= MAX_TABLE_BYTES


def _kernel(enable_nee, enable_mis, enable_rr, demod,
            params_ref, mat_tbl, kc_tbl, lgt_tbl,
            t_ref, mid_ref, ent_ref,
            px_ref, py_ref, pz_ref,
            gnx_ref, gny_ref, gnz_ref,
            snx_ref, sny_ref, snz_ref,
            txr_ref, txg_ref, txb_ref,
            skr_ref, skg_ref, skb_ref,
            dx_ref, dy_ref, dz_ref,
            tpx_ref, tpy_ref, tpz_ref,
            alive_ref, pnee_ref, lpdf_ref,
            r5_ref, r0_ref, r1_ref, r2_ref, f0_ref, f1_ref, r3_ref, r4_ref,
            rrx_ref, rry_ref, rrz_ref,
            radx_o, rady_o, radz_o,
            nox_o, noy_o, noz_o, ndx_o, ndy_o, ndz_o,
            ntx_o, nty_o, ntz_o, nalive_o, nnee_o, nlpdf_o,
            sox_o, soy_o, soz_o, sdx_o, sdy_o, sdz_o, stmax_o,
            ilx_o, ily_o, ilz_o, ntrans_o):
    M = mat_tbl.shape[1]
    L = lgt_tbl.shape[1]

    bounce = params_ref[0, 0]
    num_bounces = params_ref[1, 0]
    total_weight = params_ref[2, 0]

    t = t_ref[0]
    mid = mid_ref[0]
    entering = ent_ref[0] != 0
    px, py, pz = px_ref[0], py_ref[0], pz_ref[0]
    gnx, gny, gnz = gnx_ref[0], gny_ref[0], gnz_ref[0]
    snx, sny, snz = snx_ref[0], sny_ref[0], snz_ref[0]
    tex_r, tex_g, tex_b = txr_ref[0], txg_ref[0], txb_ref[0]
    sky_r, sky_g, sky_b = skr_ref[0], skg_ref[0], skb_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    tpx, tpy, tpz = tpx_ref[0], tpy_ref[0], tpz_ref[0]
    active = alive_ref[0] != 0
    prev_nee = pnee_ref[0] != 0
    last_pdf = lpdf_ref[0]
    r5 = r5_ref[0]
    r0 = r0_ref[0]
    r1, r2 = r1_ref[0], r2_ref[0]
    f0, f1 = f0_ref[0], f1_ref[0]
    r3, r4 = r3_ref[0], r4_ref[0]

    radx = jnp.zeros(SHAPE, jnp.float32)
    rady = jnp.zeros(SHAPE, jnp.float32)
    radz = jnp.zeros(SHAPE, jnp.float32)

    # ---- sky on miss (pre-sampled per lane; Pathtracer.cu:328-343) ----
    missed = active & (mid < 0)
    radx = radx + jnp.where(missed, tpx * sky_r, 0.0)
    rady = rady + jnp.where(missed, tpy * sky_g, 0.0)
    radz = radz + jnp.where(missed, tpz * sky_b, 0.0)
    active = active & ~missed

    mi = jnp.maximum(mid, 0)
    mv = _fetch(mat_tbl, mi, list(range(15)), M, active)
    mtype = mv[0].astype(jnp.int32)
    em_r, em_g, em_b = mv[1], mv[2], mv[3]
    al_r = mv[4] * tex_r
    al_g = mv[5] * tex_g
    al_b = mv[6] * tex_b
    rough = mv[7]
    ior = jnp.maximum(mv[8], 1.0001)
    kc = _fetch(kc_tbl, mi, list(range(32)), kc_tbl.shape[1], active)

    # ---- emissive hit with MIS (reference Pathtracer.cu:354-421) ----
    is_light = active & (mtype == _MAT_LIGHT)
    lum = 0.2126 * em_r + 0.7152 * em_g + 0.0722 * em_b
    cos_l = jnp.abs(dx * gnx + dy * gny + dz * gnz)
    lpdf_here = lum * t * t / jnp.maximum(cos_l * total_weight, 1e-20)
    pdf_ok = jnp.isfinite(lpdf_here) & (lpdf_here > 0)
    if enable_nee:
        full = ~prev_nee
        if enable_mis:
            w = (last_pdf * last_pdf
                 / jnp.maximum(last_pdf * last_pdf
                               + lpdf_here * lpdf_here, 1e-20))
            mis_w = jnp.where(full, 1.0, jnp.where(pdf_ok, w, 0.0))
        else:
            mis_w = jnp.where(full, 1.0, 0.0)
    else:
        mis_w = jnp.ones(SHAPE, jnp.float32)
    radx = radx + jnp.where(is_light, tpx * em_r * mis_w, 0.0)
    rady = rady + jnp.where(is_light, tpy * em_g * mis_w, 0.0)
    radz = radz + jnp.where(is_light, tpz * em_b * mis_w, 0.0)
    active = active & ~is_light

    # ---- bounce cap + russian roulette (always armed: bounce >= 1) ----
    active = active & (bounce < num_bounces - 1)
    if enable_rr:
        if demod:
            bas_x = tpx * rrx_ref[0]
            bas_y = tpy * rry_ref[0]
            bas_z = tpz * rrz_ref[0]
        else:
            bas_x, bas_y, bas_z = tpx, tpy, tpz
        survival = jnp.clip(jnp.maximum(bas_x, jnp.maximum(bas_y, bas_z)),
                            0.0, 1.0)
        active = active & (r5 <= survival)
        inv_s = 1.0 / jnp.maximum(survival, 1e-8)
        tpx = tpx * inv_s
        tpy = tpy * inv_s
        tpz = tpz * inv_s

    # ---- shading frame (Duff branchless ONB about the shading normal) ----
    sgn = jnp.where(snz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sgn + snz)
    b = snx * sny * a
    tx, ty, tz = 1.0 + sgn * snx * snx * a, sgn * b, -sgn * snx
    bx, by, bz = b, sgn + sny * sny * a, -sny
    wix = -(dx * tx + dy * ty + dz * tz)
    wiy = -(dx * bx + dy * by + dz * bz)
    wiz = -(dx * snx + dy * sny + dz * snz)
    active = active & (wiz > 0.0)

    eta3 = (mv[9], mv[10], mv[11])
    k3 = (mv[12], mv[13], mv[14])
    mlane = make_lane_materials(mtype, (al_r, al_g, al_b), rough, ior,
                                eta3, k3, kc, entering)
    is_diffuse = mlane["is_diffuse"]
    can_nee = mlane["can_nee"]

    # Diffuse folds albedo into throughput at the hit (reference calc_albedo).
    fold = active & is_diffuse
    tpx = jnp.where(fold, tpx * al_r, tpx)
    tpy = jnp.where(fold, tpy * al_g, tpy)
    tpz = jnp.where(fold, tpz * al_b, tpz)

    # ---- NEE shadow-ray setup (reference Pathtracer.cu:466-555; light
    # geometry is PRE-TRANSFORMED world space in lgt_tbl) ----
    stmax = jnp.zeros(SHAPE, jnp.float32)
    sox = soy = soz = jnp.zeros(SHAPE, jnp.float32)
    sdx = jnp.ones(SHAPE, jnp.float32)
    sdy = sdz = jnp.zeros(SHAPE, jnp.float32)
    ilx = ily = ilz = jnp.zeros(SHAPE, jnp.float32)
    if enable_nee:
        def cdf_body(j, k):
            return k + (r0 > lgt_tbl[0, j]).astype(jnp.int32)
        k = jax.lax.fori_loop(0, L - 1, cdf_body, jnp.zeros(SHAPE, jnp.int32))
        lk = _fetch(lgt_tbl, k, list(range(1, 13)), L, active)
        lp0x, lp0y, lp0z = lk[0], lk[1], lk[2]
        le1x, le1y, le1z = lk[3], lk[4], lk[5]
        le2x, le2y, le2z = lk[6], lk[7], lk[8]
        lem_r, lem_g, lem_b = lk[9], lk[10], lk[11]
        # Heitz low-distortion square->triangle map.
        flip2 = r2 > r1
        lu = jnp.where(flip2, 0.5 * r1, r1 - 0.5 * r2)
        lv = jnp.where(flip2, r2 - 0.5 * r1, 0.5 * r2)
        lpx = lp0x + lu * le1x + lv * le2x
        lpy = lp0y + lu * le1y + lv * le2y
        lpz = lp0z + lu * le1z + lv * le2z
        lgnx = le1y * le2z - le1z * le2y
        lgny = le1z * le2x - le1x * le2z
        lgnz = le1x * le2y - le1y * le2x
        lgnx, lgny, lgnz = _norm3(lgnx, lgny, lgnz)

        sox, soy, soz = _offset(px, py, pz, lpx - px, lpy - py, lpz - pz,
                                gnx, gny, gnz)
        lpx, lpy, lpz = _offset(lpx, lpy, lpz, sox - lpx, soy - lpy,
                                soz - lpz, lgnx, lgny, lgnz)
        tlx, tly, tlz = lpx - sox, lpy - soy, lpz - soz
        dist = jnp.sqrt(jnp.maximum(tlx * tlx + tly * tly + tlz * tlz, 0.0))
        inv_d = 1.0 / jnp.maximum(dist, 1e-20)
        sdx, sdy, sdz = tlx * inv_d, tly * inv_d, tlz * inv_d

        cos_light = jnp.abs(sdx * lgnx + sdy * lgny + sdz * lgnz)
        lox = sdx * tx + sdy * ty + sdz * tz
        loy = sdx * bx + sdy * by + sdz * bz
        loz = sdx * snx + sdy * sny + sdz * snz

        (ev_r, ev_g, ev_b), ev_pdf, ev_ok = nee_eval_dispatch(
            mlane, (wix, wiy, wiz), (lox, loy, loz))

        llum = 0.2126 * lem_r + 0.7152 * lem_g + 0.0722 * lem_b
        light_pdf = (llum * dist * dist
                     / jnp.maximum(cos_light * total_weight, 1e-20))
        lp_ok = jnp.isfinite(light_pdf) & (light_pdf > 1e-20)
        if enable_mis:
            w_nee = (light_pdf * light_pdf
                     / jnp.maximum(light_pdf * light_pdf + ev_pdf * ev_pdf,
                                   1e-20))
        else:
            w_nee = jnp.ones(SHAPE, jnp.float32)
        scale = w_nee / jnp.maximum(light_pdf, 1e-20)
        ilx = tpx * ev_r * lem_r * scale
        ily = tpy * ev_g * lem_g * scale
        ilz = tpz * ev_b * lem_b * scale
        want = active & can_nee & ev_ok & lp_ok & (cos_light > 1e-6)
        stmax = jnp.where(want, dist - 2.0 * _EPS, 0.0)

    # ---- BSDF sample -> continuation ray ----
    (ox_s, oy_s, oz_s), pdf, (mul_r, mul_g, mul_b), valid = \
        bsdf_sample_dispatch(mlane, (wix, wiy, wiz), f0, f1, r3, r4)

    # Dielectric transmission = sampled direction below the surface in the
    # local frame (bsdf.py is_transmission; drives medium-id transitions).
    is_trans = mlane["is_diel"] & (oz_s < 0.0)

    active = active & valid
    tpx = jnp.where(active, tpx * mul_r, tpx)
    tpy = jnp.where(active, tpy * mul_g, tpy)
    tpz = jnp.where(active, tpz * mul_b, tpz)
    ndx = ox_s * tx + oy_s * bx + oz_s * snx
    ndy = ox_s * ty + oy_s * by + oz_s * sny
    ndz = ox_s * tz + oy_s * bz + oz_s * snz
    ndx, ndy, ndz = _norm3(ndx, ndy, ndz)
    nx2, ny2, nz2 = _offset(px, py, pz, ndx, ndy, ndz, gnx, gny, gnz)

    nox_o[0] = nx2
    noy_o[0] = ny2
    noz_o[0] = nz2
    ndx_o[0] = ndx
    ndy_o[0] = ndy
    ndz_o[0] = ndz
    ntx_o[0] = tpx
    nty_o[0] = tpy
    ntz_o[0] = tpz
    nalive_o[0] = active.astype(jnp.int32)
    nnee_o[0] = (can_nee.astype(jnp.int32) if enable_nee
                 else jnp.zeros(SHAPE, jnp.int32))
    nlpdf_o[0] = pdf
    radx_o[0] = radx
    rady_o[0] = rady
    radz_o[0] = radz
    sox_o[0] = sox
    soy_o[0] = soy
    soz_o[0] = soz
    sdx_o[0] = sdx
    sdy_o[0] = sdy
    sdz_o[0] = sdz
    stmax_o[0] = stmax
    ilx_o[0] = ilx
    ily_o[0] = ily
    ilz_o[0] = ilz
    ntrans_o[0] = is_trans.astype(jnp.int32)


@partial(jax.jit, static_argnames=("enable_nee", "enable_mis", "enable_rr",
                                   "demod", "interpret"))
def shade_scene_pallas(tables, params_vec, lanes,
                       enable_nee=True, enable_mis=True, enable_rr=True,
                       demod=False, interpret=False):
    """Run the fused shade stage on gathered per-lane inputs.

    `tables` is buffers["shade_gather"] (mat_tbl, kc_tbl, lgt_tbl);
    `params_vec` a traced (4,) f32 [bounce, num_bounces, total_weight, 0];
    `lanes` a dict of (R,)/(R, 3) arrays:
      t, mat_id (i32, -1 on miss), entering (bool), point (R, 3),
      geom_n (R, 3) FLIPPED, shading_n (R, 3) FLIPPED, tex_mul (R, 3)
      texture albedo multiplier (ones when untextured), sky (R, 3)
      pre-sampled sky radiance, ray_d (R, 3), throughput (R, 3),
      alive (bool), prev_allow_nee (bool), last_pdf,
      draws r5 r0 r1 r2 f0 f1 r3 r4, and rr_albedo (R, 3) when demod.
    Returns the same dict as pallas_shade.shade_diffuse_pallas, except
    ray_o/ray_d/alive are RAW kernel outputs (caller selects vs old state).
    """
    interpret = interpret or FORCE_INTERPRET
    mat_tbl, kc_tbl, lgt_tbl = tables
    R = lanes["t"].shape[0]
    pad = (-R) % BLOCK

    def p1(x, fill=0.0):
        if pad:
            return jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
        return x

    G = (R + pad) // BLOCK

    def tile(x):
        return x.reshape(G, 8, 128)

    def t3(x):
        return [tile(p1(x[:, c])) for c in range(3)]

    block = lambda: pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)

    rr = lanes.get("rr_albedo")
    if rr is None:
        rr = jnp.ones((R, 3), jnp.float32)

    ins = [params_vec.reshape(4, 1), mat_tbl, kc_tbl, lgt_tbl,
           tile(p1(lanes["t"])),
           tile(p1(lanes["mat_id"].astype(jnp.int32), -1)),
           tile(p1(lanes["entering"].astype(jnp.int32))),
           *t3(lanes["point"]), *t3(lanes["geom_n"]), *t3(lanes["shading_n"]),
           *t3(lanes["tex_mul"]), *t3(lanes["sky"]), *t3(lanes["ray_d"]),
           *t3(lanes["throughput"]),
           tile(p1(lanes["alive"].astype(jnp.int32))),
           tile(p1(lanes["prev_allow_nee"].astype(jnp.int32))),
           tile(p1(lanes["last_pdf"], 1.0)),
           tile(p1(lanes["r5"])), tile(p1(lanes["r0"])),
           tile(p1(lanes["r1"])), tile(p1(lanes["r2"])),
           tile(p1(lanes["f0"])), tile(p1(lanes["f1"])),
           tile(p1(lanes["r3"])), tile(p1(lanes["r4"])),
           *t3(rr)]

    f32 = jax.ShapeDtypeStruct((G, 8, 128), jnp.float32)
    i32 = jax.ShapeDtypeStruct((G, 8, 128), jnp.int32)
    out_shape = [f32] * 3 + [f32] * 6 + [f32] * 3 + [i32, i32, f32] + \
        [f32] * 7 + [f32] * 3 + [i32]

    outs = pl.pallas_call(
        partial(_kernel, enable_nee, enable_mis, enable_rr, demod),
        grid=(G,),
        in_specs=[smem()] * 4 + [block()] * (len(ins) - 4),
        out_specs=[block()] * len(out_shape),
        out_shape=out_shape,
        interpret=interpret,
    )(*ins)

    n = R + pad

    def up(x):
        return x.reshape(n)[:R]

    (radx, rady, radz, nox, noy, noz, ndx, ndy, ndz, ntx, nty, ntz,
     nalive, nnee, nlpdf, sox, soy, soz, sdx, sdy, sdz, stmax,
     ilx, ily, ilz, ntrans) = [up(o) for o in outs]
    return {
        "radiance_add": jnp.stack([radx, rady, radz], axis=-1),
        "ray_o": jnp.stack([nox, noy, noz], axis=-1),
        "ray_d": jnp.stack([ndx, ndy, ndz], axis=-1),
        "throughput": jnp.stack([ntx, nty, ntz], axis=-1),
        "alive": nalive != 0,
        "prev_allow_nee": nnee != 0,
        "last_pdf": nlpdf,
        "shadow_o": jnp.stack([sox, soy, soz], axis=-1),
        "shadow_d": jnp.stack([sdx, sdy, sdz], axis=-1),
        "shadow_tmax": stmax,
        "illumination": jnp.stack([ilx, ily, ilz], axis=-1),
        "is_transmission": ntrans != 0,
    }
