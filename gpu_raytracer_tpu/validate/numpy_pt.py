"""Independent brute-force numpy path tracer.

A from-the-math reimplementation of the light-transport contract the
production pipeline implements (reference behavior: Pathtracer.cu:122-773)
used as an UNBIASED cross-check of the whole JAX pipeline: traversal,
NEE+MIS weights, BSDF sampling, bounce-cap semantics and accumulation.
Nothing here is shared with the production code path: intersection is
brute-force over all triangles, sampling is numpy's Philox stream, and the
BSDFs are written from the standard formulas (GGX/VNDF, exact conductor
Fresnel). Agreement is asserted by tests/test_independent.py at
image-RMSE level on a converged mixed-BSDF frame.

Conventions mirrored from the production integrator (same integral, not
the same estimator):
  * `num_bounces` camera-path segments; emissive hits terminate a path;
    NEE is skipped on the last bounce (pathtracer.py bounce cap).
  * lights are two-sided (|cos|) and sampled proportional to
    area x luminance with solid-angle pdf lum * t^2 / (|cos| * W_total).
  * BSDF "value" convention includes the outgoing cosine.
  * multiple-scattering compensation (Kulla-Conty) is intentionally NOT
    implemented — the test scene keeps conductor roughness low where the
    compensation term is < 1%.
"""
from __future__ import annotations

import numpy as np

_EPS = 1e-4


def _normalize(v):
    return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


def _luminance(rgb):
    return 0.212671 * rgb[..., 0] + 0.715160 * rgb[..., 1] + 0.072169 * rgb[..., 2]


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------

def intersect_all(p0, e1, e2, ray_o, ray_d, t_max):
    """Brute-force Moller-Trumbore of R rays against all T triangles.

    Returns (t, tri) with tri = -1 on miss. O(R*T) vectorized numpy."""
    R = ray_o.shape[0]
    # (R, T, 3) broadcasting
    pvec = np.cross(ray_d[:, None, :], e2[None, :, :])
    det = np.einsum("tk,rtk->rt", e1, pvec)
    inv_det = np.where(np.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = ray_o[:, None, :] - p0[None, :, :]
    u = np.einsum("rtk,rtk->rt", tvec, pvec) * inv_det
    qvec = np.cross(tvec, e1[None, :, :])
    v = np.einsum("rk,rtk->rt", ray_d, qvec) * inv_det
    t = np.einsum("tk,rtk->rt", e2, qvec) * inv_det
    ok = ((np.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
          & (t > _EPS) & (t < t_max[:, None]))
    t = np.where(ok, t, np.inf)
    tri = np.argmin(t, axis=1).astype(np.int32)
    tbest = t[np.arange(R), tri]
    tri = np.where(np.isfinite(tbest), tri, -1)
    return np.where(np.isfinite(tbest), tbest, np.inf), tri


def occluded_any(p0, e1, e2, ray_o, ray_d, t_max):
    t, tri = intersect_all(p0, e1, e2, ray_o, ray_d, t_max)
    return tri >= 0


# ---------------------------------------------------------------------------
# sampling / frames
# ---------------------------------------------------------------------------

def _onb(n):
    """Build an orthonormal basis around each (R,3) normal (Duff et al.)."""
    s = np.where(n[:, 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[:, 2])
    b = n[:, 0] * n[:, 1] * a
    t1 = np.stack([1.0 + s * n[:, 0] * n[:, 0] * a, s * b, -s * n[:, 0]], axis=1)
    t2 = np.stack([b, s + n[:, 1] * n[:, 1] * a, -n[:, 1]], axis=1)
    return t1, t2


def _to_world(n, v_local):
    t1, t2 = _onb(n)
    return (v_local[:, 0:1] * t1 + v_local[:, 1:2] * t2 + v_local[:, 2:3] * n)


def _to_local(n, v_world):
    t1, t2 = _onb(n)
    return np.stack([np.einsum("rk,rk->r", v_world, t1),
                     np.einsum("rk,rk->r", v_world, t2),
                     np.einsum("rk,rk->r", v_world, n)], axis=1)


def _cosine_sample(u1, u2):
    r = np.sqrt(u1)
    phi = 2.0 * np.pi * u2
    x, y = r * np.cos(phi), r * np.sin(phi)
    z = np.sqrt(np.maximum(1.0 - u1, 0.0))
    return np.stack([x, y, z], axis=1), np.maximum(z, 1e-20) / np.pi


def _ggx_d(m, alpha):
    c2 = np.maximum(m[:, 2], 0.0) ** 2
    denom = c2 * (alpha * alpha - 1.0) + 1.0
    return np.where(m[:, 2] > 0.0,
                    alpha * alpha / np.maximum(np.pi * denom * denom, 1e-20),
                    0.0)


def _ggx_lambda(w, alpha):
    c = np.clip(np.abs(w[:, 2]), 1e-6, 1.0)
    s2 = 1.0 - c * c
    return 0.5 * (np.sqrt(1.0 + alpha * alpha * s2 / (c * c)) - 1.0)


def _ggx_g1(w, alpha):
    return 1.0 / (1.0 + _ggx_lambda(w, alpha))


def _ggx_g2(wi, wo, alpha):
    return 1.0 / (1.0 + _ggx_lambda(wi, alpha) + _ggx_lambda(wo, alpha))


def _vndf_sample(wi, alpha, u1, u2):
    """Heitz 2018 visible-normal sampling (local frame, wi.z > 0)."""
    vh = _normalize(np.stack([alpha * wi[:, 0], alpha * wi[:, 1], wi[:, 2]],
                             axis=1))
    lensq = vh[:, 0] ** 2 + vh[:, 1] ** 2
    inv = 1.0 / np.sqrt(np.maximum(lensq, 1e-20))
    t1 = np.where((lensq > 1e-12)[:, None],
                  np.stack([-vh[:, 1] * inv, vh[:, 0] * inv,
                            np.zeros_like(inv)], axis=1),
                  np.tile(np.array([1.0, 0.0, 0.0]), (wi.shape[0], 1)))
    t2 = np.cross(vh, t1)
    r = np.sqrt(u1)
    phi = 2.0 * np.pi * u2
    p1 = r * np.cos(phi)
    p2 = r * np.sin(phi)
    s = 0.5 * (1.0 + vh[:, 2])
    p2 = (1.0 - s) * np.sqrt(np.maximum(1.0 - p1 * p1, 0.0)) + s * p2
    p3 = np.sqrt(np.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
    nh = p1[:, None] * t1 + p2[:, None] * t2 + p3[:, None] * vh
    m = _normalize(np.stack([alpha * nh[:, 0], alpha * nh[:, 1],
                             np.maximum(nh[:, 2], 1e-6)], axis=1))
    return m


def _vndf_pdf(wi, m, alpha):
    g1 = _ggx_g1(wi, alpha)
    d = _ggx_d(m, alpha)
    im = np.maximum(np.einsum("rk,rk->r", wi, m), 0.0)
    return g1 * d * im / np.maximum(wi[:, 2], 1e-20)


def _fresnel_conductor(cos_i, eta, k):
    """Exact per-channel conductor Fresnel; cos_i (R,), eta/k (R,3)."""
    c = np.clip(cos_i, 0.0, 1.0)[:, None]
    c2 = c * c
    s2 = 1.0 - c2
    e2 = eta ** 2
    k2 = k ** 2
    t0 = e2 - k2 - s2
    a2b2 = np.sqrt(np.maximum(t0 * t0 + 4.0 * e2 * k2, 0.0))
    t1 = a2b2 + c2
    a = np.sqrt(np.maximum(0.5 * (a2b2 + t0), 0.0))
    t2 = 2.0 * a * c
    rs = (t1 - t2) / np.maximum(t1 + t2, 1e-20)
    t3 = c2 * a2b2 + s2 * s2
    t4 = t2 * s2
    rp = rs * (t3 - t4) / np.maximum(t3 + t4, 1e-20)
    return np.clip(0.5 * (rs + rp), 0.0, 1.0)


# ---------------------------------------------------------------------------
# integrator
# ---------------------------------------------------------------------------

class NumpyScene:
    """Triangle soup + per-triangle material for the brute-force integrator.

    mats: dict with per-triangle arrays
      kind     (T,) int: 0=diffuse, 1=conductor, 2=light
      albedo   (T,3), emission (T,3), roughness (T,),
      eta/k    (T,3)  conductor Fresnel parameters
    """

    def __init__(self, p0, e1, e2, mats):
        self.p0 = np.asarray(p0, np.float64)
        self.e1 = np.asarray(e1, np.float64)
        self.e2 = np.asarray(e2, np.float64)
        self.mats = {k: np.asarray(v, np.float64) for k, v in mats.items()}
        n = np.cross(self.e1, self.e2)
        self.double_area = np.linalg.norm(n, axis=1)
        self.face_n = n / np.maximum(self.double_area[:, None], 1e-20)
        em = self.mats["emission"]
        self.light_ids = np.nonzero(self.mats["kind"] == 2)[0]
        lw = _luminance(em[self.light_ids]) * 0.5 * self.double_area[self.light_ids]
        self.light_weights = lw
        self.total_light_weight = float(lw.sum())


def _sample_lights(sc: NumpyScene, rng, R):
    """Pick light tri ~ area*luminance, uniform point on it.

    Returns (point, normal, emission, pdf_area_lum) where the solid-angle
    pdf at a shading point is pdf = lum * t^2 / (|cos| * W_total) — the
    same density the production integrator uses."""
    probs = sc.light_weights / sc.light_weights.sum()
    pick = rng.choice(len(sc.light_ids), size=R, p=probs)
    tri = sc.light_ids[pick]
    u1, u2 = rng.random(R), rng.random(R)
    su = np.sqrt(u1)
    b1, b2 = 1.0 - su, u2 * su
    p = sc.p0[tri] + b1[:, None] * sc.e1[tri] + b2[:, None] * sc.e2[tri]
    return p, sc.face_n[tri], sc.mats["emission"][tri]


def _light_pdf_solid(sc: NumpyScene, emission, dist, cos_l):
    return (_luminance(emission) * dist * dist
            / np.maximum(np.abs(cos_l) * sc.total_light_weight, 1e-20))


def _power_heuristic(pdf_a, pdf_b):
    a2 = pdf_a * pdf_a
    return a2 / np.maximum(a2 + pdf_b * pdf_b, 1e-20)


def _bsdf_eval(sc, tri, n, wi_w, wo_w):
    """f(wi,wo) * cos(wo) per channel + the solid-angle pdf of sampling
    wo from wi with this material's sampler. Local-frame math."""
    kind = sc.mats["kind"][tri]
    wi = _to_local(n, wi_w)
    wo = _to_local(n, wo_w)
    R = len(tri)
    val = np.zeros((R, 3))
    pdf = np.zeros(R)
    cos_o = wo[:, 2]

    dm = (kind == 0) & (cos_o > 0.0) & (wi[:, 2] > 0.0)
    if dm.any():
        alb = sc.mats["albedo"][tri[dm]]
        val[dm] = alb * (cos_o[dm, None] / np.pi)
        pdf[dm] = cos_o[dm] / np.pi

    cm = (kind == 1) & (cos_o > 0.0) & (wi[:, 2] > 0.0)
    if cm.any():
        t = tri[cm]
        alpha = np.maximum(sc.mats["roughness"][t] ** 2, 1e-6)
        wic, woc = wi[cm], wo[cm]
        m = _normalize(wic + woc)
        d = _ggx_d(m, alpha)
        g2 = _ggx_g2(wic, woc, alpha)
        om = np.maximum(np.einsum("rk,rk->r", woc, m), 0.0)
        f = _fresnel_conductor(om, sc.mats["eta"][t], sc.mats["k"][t])
        spec = f * (d * g2 / np.maximum(4.0 * wic[:, 2], 1e-20))[:, None]
        val[cm] = spec  # already times cos_o via G2/denominator form
        pdf[cm] = _vndf_pdf(wic, m, alpha) / np.maximum(4.0 * om, 1e-20)
    return val, pdf


def _bsdf_sample(sc, tri, n, wi_w, rng):
    """Sample wo for each lane; returns (wo_world, pdf, value*cos)."""
    kind = sc.mats["kind"][tri]
    wi = _to_local(n, wi_w)
    R = len(tri)
    wo = np.zeros((R, 3))
    pdf = np.zeros(R)
    u1, u2 = rng.random(R), rng.random(R)

    dm = kind == 0
    if dm.any():
        w, p = _cosine_sample(u1[dm], u2[dm])
        wo[dm] = w
        pdf[dm] = p

    cm = kind == 1
    if cm.any():
        t = tri[cm]
        alpha = np.maximum(sc.mats["roughness"][t] ** 2, 1e-6)
        wic = wi[cm]
        m = _vndf_sample(wic, alpha, u1[cm], u2[cm])
        im = np.einsum("rk,rk->r", wic, m)
        w = 2.0 * im[:, None] * m - wic
        wo[cm] = w
        pdf[cm] = _vndf_pdf(wic, m, alpha) / np.maximum(4.0 * np.abs(im), 1e-20)

    wo_w = _to_world(n, wo)
    val, pdf_e = _bsdf_eval(sc, tri, n, wi_w, wo_w)
    ok = (wo[:, 2] > 1e-6) & (pdf > 1e-12)
    return wo_w, np.where(ok, pdf, 0.0), val, ok


def render(sc: NumpyScene, camera: dict, width: int, height: int,
           spp: int, num_bounces: int, seed: int = 0,
           enable_nee: bool = True) -> np.ndarray:
    """Render (H, W, 3) with box-filter AA; float64 accumulation."""
    rng = np.random.default_rng(seed)
    cam_pos = np.asarray(camera["position"], np.float64)
    blc = np.asarray(camera["bottom_left_corner"], np.float64)
    xa = np.asarray(camera["x_axis"], np.float64)
    ya = np.asarray(camera["y_axis"], np.float64)
    R = width * height
    px = np.arange(R) % width
    py = np.arange(R) // width
    acc = np.zeros((R, 3))

    for s in range(spp):
        jx, jy = rng.random(R), rng.random(R)
        d = _normalize(blc[None, :] + (px + jx)[:, None] * xa[None, :]
                       + (py + jy)[:, None] * ya[None, :])
        o = np.tile(cam_pos, (R, 1))
        throughput = np.ones((R, 3))
        radiance = np.zeros((R, 3))
        alive = np.ones(R, bool)
        prev_bsdf_pdf = np.zeros(R)  # 0 => primary/delta: emissive weight 1

        for b in range(num_bounces):
            idx = np.nonzero(alive)[0]
            if idx.size == 0:
                break
            t, tri = intersect_all(sc.p0, sc.e1, sc.e2, o[idx], d[idx],
                                   np.full(idx.size, np.inf))
            miss = tri < 0
            alive[idx[miss]] = False  # black sky
            hidx = idx[~miss]
            if hidx.size == 0:
                break
            htri = tri[~miss]
            ht = t[~miss]
            hp = o[hidx] + ht[:, None] * d[hidx]
            n = sc.face_n[htri]
            front = np.einsum("rk,rk->r", n, d[hidx]) < 0.0
            n = np.where(front[:, None], n, -n)

            kind = sc.mats["kind"][htri]
            is_light = kind == 2
            if is_light.any():
                em = sc.mats["emission"][htri[is_light]]
                li = hidx[is_light]
                pb = prev_bsdf_pdf[li]
                cos_l = np.abs(np.einsum("rk,rk->r",
                                         sc.face_n[htri[is_light]],
                                         d[li]))
                pl = _light_pdf_solid(sc, em, ht[is_light], cos_l)
                w = np.where(pb > 0.0, _power_heuristic(pb, pl), 1.0) \
                    if enable_nee else np.ones(len(li))
                radiance[li] += throughput[li] * em * w[:, None]
                alive[li] = False

            if b == num_bounces - 1:
                break  # bounce cap: no NEE from the last bounce
            sidx = hidx[~is_light]
            if sidx.size == 0:
                continue
            stri = htri[~is_light]
            sp = hp[~is_light]
            sn = n[~is_light]
            wi_w = -d[sidx]

            if enable_nee and sc.total_light_weight > 0.0:
                lp, ln, lem = _sample_lights(sc, rng, sidx.size)
                to_l = lp - sp
                dist = np.linalg.norm(to_l, axis=1)
                wl = to_l / np.maximum(dist[:, None], 1e-20)
                cos_l = np.einsum("rk,rk->r", ln, -wl)
                pdf_l = _light_pdf_solid(sc, lem, dist, cos_l)
                fval, pdf_b = _bsdf_eval(sc, stri, sn, wi_w, wl)
                cand = (np.abs(cos_l) > 1e-6) & (pdf_l > 0) & (fval.sum(1) > 0)
                if cand.any():
                    occ = occluded_any(sc.p0, sc.e1, sc.e2,
                                       sp[cand] + sn[cand] * _EPS,
                                       wl[cand],
                                       dist[cand] * (1.0 - 1e-3))
                    w_mis = _power_heuristic(pdf_l[cand], pdf_b[cand])
                    contrib = (throughput[sidx[cand]] * fval[cand]
                               * lem[cand]
                               * (w_mis / np.maximum(pdf_l[cand], 1e-20))[:, None])
                    contrib[occ] = 0.0
                    radiance[sidx[cand]] += contrib

            wo_w, pdf, val, ok = _bsdf_sample(sc, stri, sn, wi_w, rng)
            throughput[sidx] *= np.where(
                ok[:, None], val / np.maximum(pdf, 1e-20)[:, None], 0.0)
            o[sidx] = sp + sn * _EPS
            d[sidx] = wo_w
            prev_bsdf_pdf[sidx] = pdf
            alive[sidx] = ok
            dead = sidx[~ok]
            alive[dead] = False
        acc += radiance

    img = (acc / spp).reshape(height, width, 3)
    return img
