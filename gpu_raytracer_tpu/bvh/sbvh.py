"""SBVH: spatial-split BVH builder (Stich et al. 2009; reference:
Src/BVH/Builders/SBVHBuilder.cpp + BVHPartitions.cpp:74-283).

Per node the object split is always evaluated; when the best object split's
children overlap by more than `sbvh_alpha` of the root area, binned spatial
splits are evaluated on all three axes and the cheaper wins. Straddling
references are either duplicated into both children or "unsplit" to one side
when that is SAH-cheaper (Stich's 3-way comparison, reference
SBVHBuilder.cpp:200-242).

Bin bounds and straddler split boxes use REAL triangle-plane clipping
(reference BVHPartitions.cpp:74-283): the clipped polygon's AABB is taken
directly as the hull of {vertices inside the slab} + {edge/plane
intersection points} — exact for a convex polygon against an axis slab and
fully vectorizable, no polygon construction needed. Each clip re-clips the
ORIGINAL triangle and intersects with the reference's carried box (which
encodes earlier clips on other axes), matching the reference's scheme.
Bin count 64 vs the reference's 256 for host-build speed.

Output is a standard BVH2 whose `indices` may contain DUPLICATE primitive
ids (spatial splits reference the same triangle from both sides) — exactly
like the reference, whose BVHs also stop being permutations after SBVH.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from gpu_raytracer_tpu.bvh.types import BVH2
from gpu_raytracer_tpu.core.aabb import cumulative_union, half_area

NUM_BINS = 64


def clipped_tri_aabb(verts: np.ndarray, axis: int, lo: float, hi: float):
    """AABB of each triangle clipped to the axis slab [lo, hi].

    verts: (M, 3, 3). Returns (mins (M, 3), maxs (M, 3)); empty clips yield
    inverted boxes (min > max). Exact: the clipped convex polygon's extreme
    points are the in-slab vertices plus edge-plane intersections
    (reference: BVHPartitions.cpp triangle clipping, 74-283)."""
    M = verts.shape[0]
    mins = np.full((M, 3), np.inf, np.float32)
    maxs = np.full((M, 3), -np.inf, np.float32)

    x = verts[:, :, axis]
    inside = (x >= lo) & (x <= hi)  # (M, 3)
    for k in range(3):
        keep = inside[:, k]
        v = verts[:, k]
        sel = np.where(keep[:, None], v, np.inf)
        mins = np.minimum(mins, sel)
        sel = np.where(keep[:, None], v, -np.inf)
        maxs = np.maximum(maxs, sel)

    for a, b in ((0, 1), (1, 2), (2, 0)):
        va, vb = verts[:, a], verts[:, b]
        xa, xb = x[:, a], x[:, b]
        dx = xb - xa
        safe = np.where(np.abs(dx) < 1e-30, 1e-30, dx)
        for plane in (lo, hi):
            t = (plane - xa) / safe
            crosses = ((xa - plane) * (xb - plane) < 0.0) & (np.abs(dx) >= 1e-30)
            p = va + t[:, None] * (vb - va)
            p[:, axis] = plane  # kill the interpolation residue on the axis
            sel = np.where(crosses[:, None], p, np.inf)
            mins = np.minimum(mins, sel)
            sel = np.where(crosses[:, None], p, -np.inf)
            maxs = np.maximum(maxs, sel)
    return mins, maxs


@dataclass
class SBVHBuilder:
    sah_cost_node: float = 4.0
    sah_cost_leaf: float = 1.0
    sbvh_alpha: float = 1e-4  # overlap/root-area threshold (Config.h:58)
    max_leaf_size: int = 1

    def build(self, triangles) -> BVH2:
        prim_min, prim_max = triangles.aabbs()
        self._positions = np.asarray(triangles.positions, np.float32)
        T = prim_min.shape[0]
        self._root_area = float(half_area(prim_min.min(0)[None], prim_max.max(0)[None])[0])

        # references: (prim id, clipped aabb)
        ref_prim = np.arange(T, dtype=np.int32)
        ref_min = prim_min.astype(np.float32).copy()
        ref_max = prim_max.astype(np.float32).copy()

        self._node_min, self._node_max = [], []
        self._node_left, self._node_count = [], []
        self._indices = []

        root = self._emit(ref_min.min(axis=0), ref_max.max(axis=0))
        self._build_into(root, ref_prim, ref_min, ref_max, depth=0)
        return BVH2(
            node_min=np.asarray(self._node_min, np.float32),
            node_max=np.asarray(self._node_max, np.float32),
            node_left=np.asarray(self._node_left, np.int32),
            node_count=np.asarray(self._node_count, np.int32),
            node_axis=np.zeros(len(self._node_left), np.int8),
            indices=np.asarray(self._indices, np.int32),
        )

    # -- node emission -------------------------------------------------------

    def _emit(self, mn, mx) -> int:
        self._node_min.append(mn)
        self._node_max.append(mx)
        self._node_left.append(0)
        self._node_count.append(0)
        return len(self._node_left) - 1

    def _make_leaf(self, node, ref_prim):
        self._node_left[node] = len(self._indices)
        self._node_count[node] = len(ref_prim)
        self._indices.extend(ref_prim.tolist())

    # -- recursion ------------------------------------------------------------

    def _build_into(self, node, ref_prim, ref_min, ref_max, depth) -> None:
        """Fill an already-emitted node. Children are reserved as ADJACENT
        slots before recursing so right == left + 1 always holds."""
        n = len(ref_prim)
        mn = ref_min.min(axis=0)
        mx = ref_max.max(axis=0)

        if n <= self.max_leaf_size or depth > 64:
            self._make_leaf(node, ref_prim)
            return

        obj = self._object_split(ref_prim, ref_min, ref_max)
        spa = None
        if obj is not None:
            overlap = np.minimum(obj["l_max"], obj["r_max"]) - \
                np.maximum(obj["l_min"], obj["r_min"])
            if np.all(overlap > 0):
                lap = float(half_area(np.maximum(obj["l_min"], obj["r_min"])[None],
                                      np.minimum(obj["l_max"], obj["r_max"])[None])[0])
                if lap / max(self._root_area, 1e-20) > self.sbvh_alpha:
                    spa = self._spatial_split(ref_prim, ref_min, ref_max, mn, mx)
        else:
            spa = self._spatial_split(ref_prim, ref_min, ref_max, mn, mx)

        best = obj
        if spa is not None and (best is None or spa["cost"] < best["cost"]):
            best = spa

        leaf_cost = self.sah_cost_leaf * n * half_area(mn[None], mx[None])[0]
        if best is None or (n <= self.max_leaf_size and leaf_cost <= best["cost"]):
            self._make_leaf(node, ref_prim)
            return

        self._node_count[node] = 0
        left = self._emit(best["lmin"].min(axis=0), best["lmax"].max(axis=0))
        self._emit(best["rmin"].min(axis=0), best["rmax"].max(axis=0))
        self._node_left[node] = left
        self._build_into(left, best["lp"], best["lmin"], best["lmax"], depth + 1)
        self._build_into(left + 1, best["rp"], best["rmin"], best["rmax"], depth + 1)

    # -- object split (full sweep over reference AABBs) -----------------------

    def _object_split(self, ref_prim, ref_min, ref_max):
        n = len(ref_prim)
        centroids = 0.5 * (ref_min + ref_max)
        best = None
        for axis in range(3):
            order = np.argsort(centroids[:, axis], kind="stable")
            mins = ref_min[order]
            maxs = ref_max[order]
            lmin, lmax = cumulative_union(mins, maxs)
            rmin, rmax = cumulative_union(mins, maxs, reverse=True)
            sa_l = half_area(lmin[:-1], lmax[:-1])
            sa_r = half_area(rmin[1:], rmax[1:])
            counts = np.arange(1, n, dtype=np.float64)
            cost = sa_l * counts + sa_r * (n - counts)
            i = int(np.argmin(cost))
            if best is None or cost[i] < best["cost"]:
                k = i + 1
                best = {
                    "cost": float(cost[i]),
                    "lp": ref_prim[order[:k]], "lmin": mins[:k], "lmax": maxs[:k],
                    "rp": ref_prim[order[k:]], "rmin": mins[k:], "rmax": maxs[k:],
                    "l_min": lmin[i], "l_max": lmax[i],
                    "r_min": rmin[i + 1], "r_max": rmax[i + 1],
                }
        return best

    # -- binned spatial split with AABB chopping ------------------------------

    def _spatial_split(self, ref_prim, ref_min, ref_max, node_min, node_max):
        n = len(ref_prim)
        best = None
        for axis in range(3):
            lo = float(node_min[axis])
            hi = float(node_max[axis])
            if hi - lo < 1e-12:
                continue
            scale = NUM_BINS / (hi - lo)
            b0 = np.clip(((ref_min[:, axis] - lo) * scale).astype(np.int32),
                         0, NUM_BINS - 1)
            b1 = np.clip(((ref_max[:, axis] - lo) * scale).astype(np.int32),
                         0, NUM_BINS - 1)

            # Chopped per-bin bounds + entry/exit counts.
            bin_min = np.full((NUM_BINS, 3), np.inf, np.float32)
            bin_max = np.full((NUM_BINS, 3), -np.inf, np.float32)
            enters = np.zeros(NUM_BINS, np.int64)
            exits = np.zeros(NUM_BINS, np.int64)
            np.add.at(enters, b0, 1)
            np.add.at(exits, b1, 1)
            for b in range(NUM_BINS):
                spans = (b0 <= b) & (b1 >= b)
                if not spans.any():
                    continue
                plane_lo = lo + b / scale
                plane_hi = lo + (b + 1) / scale
                # Triangle-plane clip (not AABB chop): exact per-bin hulls,
                # intersected with the carried ref box (earlier clips).
                cmn, cmx = clipped_tri_aabb(
                    self._positions[ref_prim[spans]], axis, plane_lo, plane_hi)
                cmn = np.maximum(cmn, ref_min[spans])
                cmx = np.minimum(cmx, ref_max[spans])
                ok = np.all(cmn <= cmx, axis=1)
                if not ok.any():
                    continue
                bin_min[b] = np.minimum(bin_min[b], cmn[ok].min(axis=0))
                bin_max[b] = np.maximum(bin_max[b], cmx[ok].max(axis=0))

            lmin, lmax = cumulative_union(bin_min, bin_max)
            rmin, rmax = cumulative_union(bin_min, bin_max, reverse=True)
            n_l = np.cumsum(enters)[:-1]
            n_r = n - np.cumsum(exits)[:-1]
            sa_l = half_area(lmin[:-1], lmax[:-1])
            sa_r = half_area(rmin[1:], rmax[1:])
            with np.errstate(invalid="ignore"):
                cost = np.where((n_l > 0) & (n_r > 0),
                                sa_l * n_l + sa_r * n_r, np.inf)
            i = int(np.argmin(cost))
            if not np.isfinite(cost[i]):
                continue
            if best is None or cost[i] < best["cost"]:
                best = {"cost": float(cost[i]), "axis": axis, "bin": i,
                        "lo": lo, "scale": scale,
                        "l_box": (lmin[i], lmax[i]), "r_box": (rmin[i + 1], rmax[i + 1]),
                        "n_l": int(n_l[i]), "n_r": int(n_r[i])}
        if best is None:
            return None

        # Partition with reference unsplitting (Stich 3-way comparison).
        axis = best["axis"]
        plane = best["lo"] + (best["bin"] + 1) / best["scale"]
        fully_left = ref_max[:, axis] <= plane
        fully_right = ref_min[:, axis] >= plane
        straddle = ~fully_left & ~fully_right

        l_min, l_max = best["l_box"]
        r_min, r_max = best["r_box"]
        sa_l = float(half_area(l_min[None], l_max[None])[0])
        sa_r = float(half_area(r_min[None], r_max[None])[0])
        n_l, n_r = best["n_l"], best["n_r"]

        lp, lmins, lmaxs = [ref_prim[fully_left]], [ref_min[fully_left]], [ref_max[fully_left]]
        rp, rmins, rmaxs = [ref_prim[fully_right]], [ref_min[fully_right]], [ref_max[fully_right]]

        for i in np.nonzero(straddle)[0]:
            rmn, rmx = ref_min[i], ref_max[i]
            # Cost of keeping the duplicate split vs unsplitting to one side.
            c_split = sa_l * n_l + sa_r * n_r
            grow_l = np.minimum(l_min, rmn), np.maximum(l_max, rmx)
            grow_r = np.minimum(r_min, rmn), np.maximum(r_max, rmx)
            c_left = float(half_area(grow_l[0][None], grow_l[1][None])[0]) * n_l \
                + sa_r * (n_r - 1)
            c_right = sa_l * (n_l - 1) \
                + float(half_area(grow_r[0][None], grow_r[1][None])[0]) * n_r
            if c_split <= c_left and c_split <= c_right:
                tri = self._positions[ref_prim[i]][None]
                clmn, clmx = clipped_tri_aabb(tri, axis, -np.inf, plane)
                crmn, crmx = clipped_tri_aabb(tri, axis, plane, np.inf)
                clmn = np.maximum(clmn[0], rmn); clmx = np.minimum(clmx[0], rmx)
                crmn = np.maximum(crmn[0], rmn); crmx = np.minimum(crmx[0], rmx)
                # The clip can come up empty on one side (the ref box
                # straddles the plane, the triangle does not): unsplit there.
                if np.any(clmn > clmx):
                    rp.append(ref_prim[i:i + 1]); rmins.append(crmn[None]); rmaxs.append(crmx[None])
                    n_l -= 1
                elif np.any(crmn > crmx):
                    lp.append(ref_prim[i:i + 1]); lmins.append(clmn[None]); lmaxs.append(clmx[None])
                    n_r -= 1
                else:
                    lp.append(ref_prim[i:i + 1]); lmins.append(clmn[None]); lmaxs.append(clmx[None])
                    rp.append(ref_prim[i:i + 1]); rmins.append(crmn[None]); rmaxs.append(crmx[None])
            elif c_left <= c_right:
                lp.append(ref_prim[i:i + 1]); lmins.append(rmn[None]); lmaxs.append(rmx[None])
                l_min, l_max = grow_l
                n_r -= 1
            else:
                rp.append(ref_prim[i:i + 1]); rmins.append(rmn[None]); rmaxs.append(rmx[None])
                r_min, r_max = grow_r
                n_l -= 1

        out_lp = np.concatenate(lp)
        out_rp = np.concatenate(rp)
        if len(out_lp) == 0 or len(out_rp) == 0:
            return None
        return {
            "cost": best["cost"],
            "lp": out_lp, "lmin": np.concatenate(lmins), "lmax": np.concatenate(lmaxs),
            "rp": out_rp, "rmin": np.concatenate(rmins), "rmax": np.concatenate(rmaxs),
        }
