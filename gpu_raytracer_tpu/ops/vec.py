"""Scalarized vec3 helpers for the traversal hot loops.

TPU tiling: a (R, 3) or (R, 12) float array tiles as T(8,128) with only
3/128 (or 12/128) of each lane row used, and slicing its minor dimension
costs millions of cycles of relayout (measured via compiled-HLO
estimated_cycles — one (R,12)->12x(R,1) slice fusion was 7.3M cycles).
Flat (R,) arrays tile perfectly. So the hot loops represent vectors as
TUPLES of three (R,) arrays and tables as component-major (C, N) matrices
whose row slices are contiguous (N,) gather sources.
"""

from __future__ import annotations

import jax.numpy as jnp


def v3(x, y, z):
    return (x, y, z)


def v3_add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def v3_sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def v3_scale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def v3_dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def v3_cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def v3_where(mask, a, b):
    return (jnp.where(mask, a[0], b[0]),
            jnp.where(mask, a[1], b[1]),
            jnp.where(mask, a[2], b[2]))


def v3_from_rows(mat, ti):
    """mat: (3, N) component-major table; ti: (R,) -> tuple of (R,)."""
    return (mat[0][ti], mat[1][ti], mat[2][ti])


def v3_stack(a):
    """tuple -> (R, 3) for interface boundaries outside the hot loop."""
    return jnp.stack(a, axis=-1)


def v3_unstack(arr):
    """(R, 3) -> tuple of (R,)."""
    return (arr[..., 0], arr[..., 1], arr[..., 2])


def affine12_point(cols, idx, p):
    """cols: (12, I) component-major affine table; idx: (R,); p: tuple."""
    m = [cols[j][idx] for j in range(12)]
    return (m[0] * p[0] + m[1] * p[1] + m[2] * p[2] + m[3],
            m[4] * p[0] + m[5] * p[1] + m[6] * p[2] + m[7],
            m[8] * p[0] + m[9] * p[1] + m[10] * p[2] + m[11])


def affine12_dir(cols, idx, d):
    m = [cols[j][idx] for j in range(12)]
    return (m[0] * d[0] + m[1] * d[1] + m[2] * d[2],
            m[4] * d[0] + m[5] * d[1] + m[6] * d[2],
            m[8] * d[0] + m[9] * d[1] + m[10] * d[2])


def fetch_rows(table, idx):
    """(N, C) table + (R,) indices -> (R, C) rows.

    TPU gathers are HBM-latency-bound per START, not per byte: one wide-row
    gather replaces C per-column gathers at ~10x less cost (measured 960x544
    lanes over a 262k-row table: 24 columns 175 ms vs one (N, 32) row gather
    16.7 ms). For tiny tables the one-hot MXU matmul is cheaper still
    (384-row table: 104 / 12.5 / 3.4 ms for columns / row gather / one-hot).
    """
    n = table.shape[0]
    if n <= 1024:
        oh = (idx[:, None] == jnp.arange(n, dtype=idx.dtype)[None, :])
        return oh.astype(table.dtype) @ table
    return table[idx]
