"""Per-sublane gang traversal kernel vs. the XLA while_loop oracle.

Runs in interpret mode on the CPU backend (the Mosaic lowering is exercised
on hardware by bench.py). Hits are compared by t with exact tri equality at
a high match rate — the gang kernel's traversal order differs, so coplanar
duplicate triangles may tie differently. u/v are intentionally zero (the
shade stage recomputes them; see ops/pallas_gang.py docstring)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gpu_raytracer_tpu.ops import pallas_gang as pg
from gpu_raytracer_tpu.ops.traverse import trace_any_tlas, trace_closest_tlas

from tests.test_pallas_wide import cornell_wave, instancing_wave  # noqa: F401


def _check_matches(bufs, o, d, tmax, tri_match=0.995, flat=False):
    nodes, tris, insts = bufs["nodes"], bufs["tris"], bufs["instances"]
    ref = trace_closest_tlas(nodes, tris, insts, o, d, tmax)
    assert bufs.get("wide") is not None
    if flat:
        assert bufs.get("wide_prim_map") is not None
    out = pg.trace_closest_gang(*bufs["wide"], o, d, tmax, flat=flat,
                                interpret=True)
    pm = bufs.get("wide_prim_map")
    if pm is not None:
        code = pm[jnp.maximum(out.tri, 0)]
        ok = out.tri >= 0
        out = out._replace(tri=jnp.where(ok, code & 0x3FFFFF, out.tri),
                           inst=jnp.where(ok, code >> 22, out.inst))

    rtri, wtri = np.asarray(ref.tri), np.asarray(out.tri)
    hit_r, hit_w = rtri >= 0, wtri >= 0
    np.testing.assert_array_equal(hit_r, hit_w)
    both = hit_r
    np.testing.assert_allclose(np.asarray(out.t)[both],
                               np.asarray(ref.t)[both], rtol=1e-4)
    assert np.mean(rtri[both] == wtri[both]) > tri_match
    same = both & (rtri == wtri)
    np.testing.assert_array_equal(np.asarray(out.inst)[same],
                                  np.asarray(ref.inst)[same])


def test_matches_xla_cornell(cornell_wave):  # noqa: F811
    _check_matches(*cornell_wave)


def test_matches_xla_instancing(instancing_wave):  # noqa: F811
    _check_matches(*instancing_wave)


def test_any_hit_matches(cornell_wave):  # noqa: F811
    bufs, o, d, _ = cornell_wave
    nodes, tris, insts = bufs["nodes"], bufs["tris"], bufs["instances"]
    tmax = jnp.full(o.shape[:1], 1.5, jnp.float32)
    ref = trace_any_tlas(nodes, tris, insts, o, d, tmax)
    out = pg.trace_any_gang(*bufs["wide"], o, d, tmax, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_finite_tmax_respected(cornell_wave):  # noqa: F811
    bufs, o, d, _ = cornell_wave
    short = jnp.full(o.shape[:1], 1e-3, jnp.float32)
    out = pg.trace_closest_gang(*bufs["wide"], o, d, short, interpret=True)
    assert np.all(np.asarray(out.tri) == -1)
    assert np.all(np.isinf(np.asarray(out.t)))


def test_flat_matches_xla_cornell(cornell_wave):  # noqa: F811
    """Leaf-postponing FLAT kernel (merged tables, no instance rows)."""
    _check_matches(*cornell_wave, flat=True)


def test_flat_incoherent_wave_matches(cornell_wave):  # noqa: F811
    bufs, _, _, _ = cornell_wave
    rng = np.random.default_rng(11)
    R = 2048
    o = jnp.asarray(rng.uniform(-1.0, 1.0, (R, 3)).astype(np.float32))
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tmax = jnp.full((R,), np.inf, jnp.float32)
    _check_matches(bufs, o, d, tmax, tri_match=0.98, flat=True)


def test_flat_any_hit_matches(cornell_wave):  # noqa: F811
    bufs, o, d, _ = cornell_wave
    nodes, tris, insts = bufs["nodes"], bufs["tris"], bufs["instances"]
    tmax = jnp.full(o.shape[:1], 1.5, jnp.float32)
    ref = trace_any_tlas(nodes, tris, insts, o, d, tmax)
    out = pg.trace_any_gang(*bufs["wide"], o, d, tmax, flat=True,
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_flat_deep_tree_matches_mixed_kernel():
    """Sibling-cursor entries on a DEEP merged tree (1500-tri soup, many
    stacked entry levels): the flat kernel must return bit-identical hits
    to the mixed gang kernel, whose traversal the brute-force oracle tests
    cover. Exercises multi-level entry push/consume/drop and the packed
    leaf-queue nibbles beyond cornell's shallow tree."""
    from gpu_raytracer_tpu.bvh import wide as wide_mod
    from gpu_raytracer_tpu.bvh.sah import build_bvh2
    from gpu_raytracer_tpu.scene.types import TriangleData

    rng = np.random.default_rng(5)
    n = 1500
    p0 = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.08, (n, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.08, (n, 3)).astype(np.float32)
    world = np.stack([p0, p0 + e1, p0 + e2], axis=1)
    bvh = build_bvh2(TriangleData(world), max_leaf_size=wide_mod.LEAF_CAP)
    wideb = wide_mod.collapse_wide(bvh)
    geo = np.concatenate([world[:, 0], world[:, 1] - world[:, 0],
                          world[:, 2] - world[:, 0]], axis=-1)
    packed = wide_mod.pack_wide_merged(wideb, bvh.indices,
                                       geo[bvh.indices].astype(np.float32))
    assert packed["entry_stack"] >= 4  # actually deep
    nodes = jnp.asarray(packed["nodes"])
    rows = jnp.asarray(packed["rows"])

    R = 2048
    o = jnp.asarray(rng.uniform(-1.5, 1.5, (R, 3)).astype(np.float32))
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tmax = jnp.full((R,), np.inf, jnp.float32)

    ref = pg.trace_closest_gang(nodes, rows, o, d, tmax, interpret=True)
    out = pg.trace_closest_gang(nodes, rows, o, d, tmax, flat=True,
                                interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.tri), np.asarray(out.tri))
    both = np.asarray(ref.tri) >= 0
    assert both.mean() > 0.1  # the wave genuinely hits
    np.testing.assert_array_equal(np.asarray(ref.t)[both],
                                  np.asarray(out.t)[both])

    # Any-hit agreement on finite shadow-style rays.
    tshort = jnp.full((R,), 1.0, jnp.float32)
    ra = pg.trace_any_gang(nodes, rows, o, d, tshort, interpret=True)
    oa = pg.trace_any_gang(nodes, rows, o, d, tshort, flat=True,
                           interpret=True)
    np.testing.assert_array_equal(np.asarray(ra), np.asarray(oa))


def test_incoherent_wave_matches(cornell_wave):  # noqa: F811
    """Random origins/directions: gangs pop DIFFERENT entry types in the
    same iteration (node/leaf/instance mixes) — the masked-phase paths."""
    bufs, _, _, _ = cornell_wave
    rng = np.random.default_rng(7)
    R = 2048
    o = jnp.asarray(rng.uniform(-1.0, 1.0, (R, 3)).astype(np.float32))
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tmax = jnp.full((R,), np.inf, jnp.float32)
    # t matched on every hit lane above; random waves hit more coplanar
    # duplicate pairs (cornell's overlapping box/wall quads), where a
    # different traversal order legitimately returns the twin triangle.
    _check_matches(bufs, o, d, tmax, tri_match=0.98)
