"""Paged wide-BVH packing for the beyond-VMEM streaming traversal
(ops/pallas_stream.py).

The reference streams CWBVH nodes from GPU DRAM per traversal iteration, so
any scene size runs at full speed (/root/reference/Src/CUDA/Raytracing/
BVH8.h:19-27, 113-274). A TPU kernel cannot gather per-ray from HBM, so the
streaming design is coarser, built on the observation that a wide-BVH
traversal touches a CONTIGUOUS subtree once a ray descends far enough:

  * the top of the tree — every node whose subtree is larger than one page —
    stays VMEM-resident exactly like the wide/gang kernels' tables;
  * each remaining subtree becomes part of a fixed-size PAGE (first-fit
    bin packing of subtrees, DFS order for locality) stored in a single
    (num_pages, page_rows, 128) HBM array;
  * resident child refs that cross the cut become PORTALS: the resident-pass
    kernel records (portal id, entry t) per lane instead of descending, and
    the round driver (ops/pallas_stream.py) sorts rays by portal and DMAs
    each tile's page into VMEM before finishing the traversal there.

Row encodings (everything f32, exact below 2^24):
  unified LOCAL index space per table (resident or one page): row v >= 0 is
  a wide-node row, ref <= -2 a leaf row at unified index -(ref+2);
  ref == -1 empty. Resident tables add portals: -(2 + PORTAL_BASE + pid).
  Node/leaf row payloads are identical to bvh/wide.py's merged layout.

Gate/scope: the streaming path covers the MERGED static-scene flattening
(world-space tris, no instance rows) — the configuration the >100 MB scenes
(San Miguel/Bistro class) actually hit; dynamic multi-BLAS scenes that big
fall back to the XLA path as before.
"""

from __future__ import annotations

import numpy as np

from gpu_raytracer_tpu.bvh.wide import LEAF_CAP, ROW, WideBVH, max_stack

PORTAL_BASE = 1 << 22   # leaf indices must stay below this (f32-exact refs)
PAGE_ROWS = 4096        # 2 MiB pages (4096 x 512 B)


def _all_leaf_rows(wide: WideBVH, id_map, tri_geo_world_leaf) -> np.ndarray:
    """All merged-layout leaf rows, vectorized (pack_wide_merged layout)."""
    firsts = wide.leaf_first
    counts = wide.leaf_count
    rows = np.zeros((max(wide.num_leaves, 1), ROW), np.float32)
    rows[: wide.num_leaves, 0] = counts.astype(np.float32)
    for j in range(int(counts.max(initial=0))):
        m = counts > j
        rows[: wide.num_leaves][m, 1 + j] = \
            id_map[firsts[m] + j].astype(np.float32)
        rows[: wide.num_leaves][m, 16 + j * 9: 16 + j * 9 + 9] = \
            tri_geo_world_leaf[firsts[m] + j]
    return rows


def _subtree_rows(wide: WideBVH, root: int, leaf_row_fn) -> np.ndarray:
    """Serialize the subtree at `root` into unified-local-index rows:
    nodes in DFS preorder first, then every referenced leaf row in parent
    emission order. Child refs are rewritten to local indices. Returns
    (rows, num_node_rows)."""
    rows: list = []
    # First pass: assign local ids in DFS preorder.
    local: dict = {}
    order: list = []
    stack = [root]
    while stack:
        n = stack.pop()
        local[n] = None
        order.append(n)
        for c in range(7, -1, -1):
            r = int(wide.child_ref[n][c])
            if r >= 0:
                stack.append(r)
    # Layout: interleave node + its leaf rows in emission order.
    out_rows: list = []

    def alloc(row):
        out_rows.append(row)
        return len(out_rows) - 1

    # Reserve node slots in DFS order first so child node refs are known
    # after a single pass: emit nodes, then patch.
    for n in order:
        local[n] = alloc(np.zeros(ROW, np.float32))
    for n in order:
        row = out_rows[local[n]]
        row[0:48] = wide.bounds[n]
        refs = np.full(8, -1.0, np.float32)
        for c in range(8):
            r = int(wide.child_ref[n][c])
            if r >= 0:
                refs[c] = float(local[r])
            elif r <= -2:
                lid = -r - 2
                rid = alloc(leaf_row_fn(lid))
                refs[c] = float(-(rid + 2))
        row[48:56] = refs
    return np.asarray(out_rows, np.float32), len(order)


def pack_wide_stream(wide: WideBVH, id_map: np.ndarray,
                     tri_geo_world_leaf: np.ndarray,
                     page_rows: int = PAGE_ROWS) -> dict | None:
    """Partition a merged static-scene wide BVH into resident tables +
    fixed-size pages. Returns None when the whole tree fits in one page
    (streaming would be pure overhead — use the resident kernels)."""
    N = wide.num_nodes
    child_ref = wide.child_ref.astype(np.int64)

    leaf_rows = _all_leaf_rows(wide, id_map, tri_geo_world_leaf)

    def leaf_row_fn(lid):
        return leaf_rows[lid]

    # Subtree row cost (node row + leaf rows), children ids > parent id.
    cost = np.ones(N, np.int64)
    for i in range(N - 1, -1, -1):
        for r in child_ref[i]:
            if r >= 0:
                cost[i] += cost[r]
            elif r <= -2:
                cost[i] += 1
    if cost[0] <= page_rows:
        return None

    # Cut: resident = nodes with subtree > page_rows; portals = maximal
    # subtrees <= page_rows.
    portal_roots: list = []
    resident: list = []
    stack = [0]
    while stack:
        n = stack.pop()
        resident.append(n)
        for r in child_ref[n]:
            if r >= 0:
                if cost[r] <= page_rows:
                    portal_roots.append(int(r))
                else:
                    stack.append(int(r))

    # First-fit bin packing of portal subtrees into pages (DFS discovery
    # order keeps neighboring subtrees in the same page).
    pages: list = []          # list of lists of (portal_id, rows)
    page_fill: list = []
    portal_page = np.zeros(len(portal_roots), np.int32)
    portal_root_local = np.zeros(len(portal_roots), np.int32)
    for pid, root in enumerate(portal_roots):
        sub, n_nodes = _subtree_rows(wide, root, leaf_row_fn)
        n = sub.shape[0]
        assert n <= page_rows, (n, page_rows)
        target = -1
        for gi in range(len(pages)):
            if page_fill[gi] + n <= page_rows:
                target = gi
                break
        if target < 0:
            pages.append([])
            page_fill.append(0)
            target = len(pages) - 1
        portal_page[pid] = target
        portal_root_local[pid] = page_fill[target]
        pages[target].append((sub, n_nodes))
        page_fill[target] += n

    page_arr = np.zeros((len(pages), page_rows, ROW), np.float32)
    for gi, subs in enumerate(pages):
        ofs = 0
        for sub, n_nodes in subs:
            n = sub.shape[0]
            shifted = sub.copy()
            # Only NODE rows carry child refs at [48:56]; leaf rows keep
            # triangle geometry there.
            refs = shifted[:n_nodes, 48:56]
            internal = refs >= 0
            leaf = refs <= -2
            refs[internal] += ofs
            refs[leaf] -= ofs
            page_arr[gi, ofs:ofs + n] = shifted
            ofs += n

    # Resident table: nodes in `resident` order + their direct leaf rows,
    # unified local indices; cut children become portal refs.
    res_local = {n: i for i, n in enumerate(resident)}
    portal_of_root = {r: i for i, r in enumerate(portal_roots)}
    out_rows: list = []

    def alloc(row):
        out_rows.append(row)
        return len(out_rows) - 1

    for n in resident:
        alloc(np.zeros(ROW, np.float32))  # node slot at res_local order?
    # res_local indices must match out_rows slots: they do (loop above).
    for i, n in enumerate(resident):
        row = out_rows[i]
        row[0:48] = wide.bounds[n]
        refs = np.full(8, -1.0, np.float32)
        for c in range(8):
            r = int(child_ref[n][c])
            if r >= 0:
                if r in portal_of_root:
                    refs[c] = float(-(2 + PORTAL_BASE + portal_of_root[r]))
                else:
                    refs[c] = float(res_local[r])
            elif r <= -2:
                rid = alloc(leaf_row_fn(-r - 2))
                assert rid < PORTAL_BASE
                refs[c] = float(-(rid + 2))
        row[48:56] = refs
    resident_arr = np.asarray(out_rows, np.float32)

    return {
        "resident": resident_arr,
        "pages": page_arr,
        "portal_page": portal_page,
        "portal_root": portal_root_local,
        "page_rows": page_rows,
        "max_stack": max_stack(wide),
    }
