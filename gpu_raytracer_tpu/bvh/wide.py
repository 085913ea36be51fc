"""Wide (8-ary) BVH flattening for the block-synchronous Pallas traversal
kernel (ops/pallas_wide.py).

The reference's hottest kernel is the CWBVH (BVH8) traversal
(/root/reference/Src/CUDA/Raytracing/BVH8.h:113-274) over Ylitie-style
compressed 80-byte nodes (/root/reference/Src/BVH/Converters/
BVH8Converter.cpp:210-335). On TPU the design constraints are different:

- Mosaic has no per-lane gather, so the kernel traverses BLOCK-synchronously:
  one shared node per iteration, fetched as a single dynamically-indexed ROW
  of a VMEM-resident table and broadcast to all 1024 lanes. Row loads need
  the minor dimension to be the native 128-lane axis, so a node row is 128
  f32 — byte quantization would buy nothing (the row is the granularity),
  and plain f32 child bounds skip the decode ALU cost entirely.
- Why the reference's 80-byte quantized node was NOT replicated (a measured
  deviation, not an omission): packing 4 byte-quantized nodes per 128-lane
  row is possible (static quarter-row selects + shift/mask decode), but the
  VMEM ceiling it would raise is set by LEAF rows, not nodes — packed
  Sponza is 9,485 node rows (4.6 MB) vs 30,618 fat-leaf rows (15.0 MB), so
  a 4x node shrink saves only ~18% of table bytes while adding decode ALU
  to the scalar-bound node phase of every kernel sharing the format.
  Triangle geometry itself must stay f32 (the reference's does too); the
  actual beyond-VMEM answer is the paged streaming path (bvh/stream.py),
  which serves ANY scene size loss-free.
- v5e VMEM is ~128 MB with vmem_limit_bytes raised, so Sponza-scale tables
  (~30-60 MB) are fully VMEM-resident; scenes beyond the budget fall back to
  the paged streaming tables (or the XLA while_loop path).

Node row layout ((N, 128) f32), child slot c in 0..7:
  [c*6 .. c*6+6)   child AABB (lo.x, lo.y, lo.z, hi.x, hi.y, hi.z)
  [48 + c]         child ref: >= 0 wide-node id | -1 empty | <= -2 leaf row
                   id encoded as -(row + 2)
Leaf row layout ((L, 128) f32):
  slot 0: count > 0 -> triangle leaf with `count` tris (<= LEAF_CAP)
     [1 + j]             leaf-order global triangle id (for shading lookups)
     [16 + j*9 .. +9)    p0 | e1 | e2 in object space
  slot 0: -1 -> TLAS instance leaf
     [1]                  instance id
     [2 .. 14)            3x4 inverse transform (row-major 12)
     [14]                 BLAS wide-root node id

The greedy 2->8 collapse mirrors the reference's BVH4Converter strategy
(seed with both children, repeatedly expand the internal child with the
largest surface area) rather than the full Ylitie DP — the DP's objective
targets the byte-compressed format's leaf encoding, which does not exist
here. BVH2 leaves (<= LEAF_SIZE tris from the standard build pipeline,
including collapse) map 1:1 to leaf rows, so the wide structure reuses the
disk-cached BVH2s.
"""

from __future__ import annotations

import numpy as np

from gpu_raytracer_tpu.bvh.types import BVH2
from gpu_raytracer_tpu.core.aabb import half_area

WIDTH = 8
LEAF_CAP = 12  # keep in sync with ops/pallas_wide.LEAF_CAP (kernel unroll)
#                        row capacity allows up to 12 (16 + 12*9 = 124 <= 128)
ROW = 128

# child-ref encoding
EMPTY = -1.0


class WideBVH:
    """Flat wide-BVH arrays in LOCAL index space (node 0 = root)."""

    def __init__(self, nodes: np.ndarray, child_ref: np.ndarray,
                 leaf_first: np.ndarray, leaf_count: np.ndarray):
        # nodes: (N, 48) child bounds; child_ref: (N, 8) int32
        #   (>=0 node, -1 empty, <= -2 -> local leaf id -(v+2))
        # leaf_first/leaf_count: (L,) slices into the SOURCE bvh2 leaf order
        self.bounds = nodes
        self.child_ref = child_ref
        self.leaf_first = leaf_first
        self.leaf_count = leaf_count

    @property
    def num_nodes(self) -> int:
        return int(self.bounds.shape[0])

    @property
    def num_leaves(self) -> int:
        return int(self.leaf_first.shape[0])


def collapse_wide(bvh: BVH2, width: int = WIDTH) -> WideBVH:
    """Greedy `width`-wide collapse of a flat BVH2 (any leaf size).

    Children of a wide node are chosen by repeatedly expanding the internal
    candidate with the largest surface area until `width` slots are filled
    (reference BVH4Converter.cpp:3-148 uses the same greedy rule for 4-wide).
    `--bvh qbvh` packs width 4 into the same 8-slot device rows (the honest
    4-wide layout; empty slots never push)."""
    node_min, node_max = bvh.node_min, bvh.node_max
    node_left, node_count = bvh.node_left, bvh.node_count
    sa = half_area(node_min, node_max)

    bounds_out: list = []
    refs_out: list = []
    leaf_first: list = []
    leaf_count: list = []

    def leaf_id(b2: int) -> int:
        leaf_first.append(int(node_left[b2]))
        leaf_count.append(int(node_count[b2]))
        return len(leaf_first) - 1

    # Root special case: BVH2 with a leaf root.
    if node_count[0] > 0:
        bounds = np.zeros(48, np.float32)
        refs = np.full(8, EMPTY, np.float32)
        bounds[0:3] = node_min[0]
        bounds[3:6] = node_max[0]
        refs[0] = float(-(leaf_id(0) + 2))
        return WideBVH(np.asarray([bounds]), np.asarray([refs], np.float32),
                       np.asarray(leaf_first, np.int32),
                       np.asarray(leaf_count, np.int32))

    # Iterative emission, parent rows patched after children are allocated.
    bounds_np: list = []
    refs_np: list = []

    def alloc() -> int:
        bounds_np.append(np.zeros(48, np.float32))
        refs_np.append(np.full(8, EMPTY, np.float32))
        return len(bounds_np) - 1

    root_out = alloc()
    work = [(0, root_out)]
    while work:
        b2, out_id = work.pop()
        # Greedy cut: expand largest-SA internal member until `width` wide.
        members = [int(node_left[b2]), int(node_left[b2]) + 1]
        while len(members) < width:
            best, best_sa = -1, -1.0
            for m in members:
                if node_count[m] == 0 and sa[m] > best_sa:
                    best, best_sa = m, float(sa[m])
            if best < 0:
                break
            members.remove(best)
            members.append(int(node_left[best]))
            members.append(int(node_left[best]) + 1)

        row_b = bounds_np[out_id]
        row_r = refs_np[out_id]
        for c, m in enumerate(members):
            row_b[c * 6 + 0: c * 6 + 3] = node_min[m]
            row_b[c * 6 + 3: c * 6 + 6] = node_max[m]
            if node_count[m] > 0:
                row_r[c] = float(-(leaf_id(m) + 2))
            else:
                child_out = alloc()
                row_r[c] = float(child_out)
                work.append((m, child_out))

    return WideBVH(np.asarray(bounds_np, np.float32),
                   np.asarray(refs_np, np.float32),
                   np.asarray(leaf_first, np.int32),
                   np.asarray(leaf_count, np.int32))


def estimate_table_bytes(num_bvh2_nodes: int, num_tris: int,
                         num_instances: int) -> int:
    """Heuristic pre-gate for the VMEM footprint of the packed wide tables,
    used to skip build work for scenes that obviously won't fit. NOT a hard
    upper bound (a skewed greedy cut can emit more than nodes/3 wide nodes);
    `ops/pallas_wide.supports()` re-checks the exact packed sizes, so an
    undershoot here only wastes build time, never correctness."""
    wide_nodes = max(num_bvh2_nodes // 3, 1) + num_instances
    leaf_rows = num_tris + num_instances + 1
    return (wide_nodes + leaf_rows) * ROW * 4


def max_stack(wide: WideBVH, leaf_g=None, node_only: bool = False) -> int:
    """Worst-case stack height the block-synchronous kernel can reach while
    traversing this wide tree (ops/pallas_wide.py pops one entry and pushes
    up to 8 per iteration; pushes past STACK_DEPTH are silently dropped, so
    the packer must verify the tree fits).

    g(node) = entries above the pop point while the subtree runs; for an
    internal node with m children the worst case is the deepest child popped
    while all m-1 siblings still sit below it. `leaf_g` gives the per-leaf
    continuation cost (0 for triangle rows; TLAS instance rows push RESTORE +
    BLAS root and then run the BLAS subtree). Returns 1 + g(root) — the root
    itself is pushed before the loop starts.

    `node_only=True` bounds the FLAT leaf-postponing traversal order
    (ops/pallas_gang._gang_flat_kernel): leaf children go to the bounded
    leaf queue, so only interior children occupy the stack. Node pop order
    is identical to the mixed order with leaves filtered out, so this
    bound is exact for that kernel (and always <= the mixed bound —
    pack_wide_merged asserts it rather than assuming it)."""
    n = wide.num_nodes
    g = np.zeros(n, np.int64)
    if leaf_g is None:
        leaf_g = np.zeros(wide.num_leaves, np.int64)
    # child_ref >= 0 means child node ids are > parent id (alloc order), so a
    # reverse sweep is a valid post-order.
    for i in range(n - 1, -1, -1):
        refs = wide.child_ref[i]
        child_g = []
        for r in refs:
            r = int(r)
            if r >= 0:
                child_g.append(int(g[r]))
            elif r <= -2 and not node_only:
                child_g.append(int(leaf_g[-r - 2]))
        m = len(child_g)
        g[i] = max(m, (m - 1) + max(child_g)) if m else 0
    return 1 + int(g[0]) if n else 1


def pack_wide_scene(blas_wides: list, tri_bases: list,
                    tlas_bvh2: BVH2, instances: dict,
                    tri_geo: np.ndarray) -> dict:
    """Aggregate TLAS + all BLAS wide BVHs into the unified device tables.

    blas_wides: one WideBVH per unique MeshData (object space)
    tri_bases:  global leaf-order triangle base per mesh
    tlas_bvh2:  1-instance-leaf BVH2 over instance world AABBs; its
                "triangle" indices are instance ids
    instances:  {"inv": (I, 12) inverse transforms,
                 "mesh_of_inst": (I,) mesh-data id}
    tri_geo:    (T, 9) leaf-order [p0|e1|e2] object-space geometry
    """
    inv = np.asarray(instances["inv"], np.float32).reshape(-1, 12)
    mesh_of_inst = np.asarray(instances["mesh_of_inst"], np.int32)

    wides = blas_wides
    wtlas = collapse_wide(tlas_bvh2)

    # Worst-case kernel stack: TLAS tree with each instance leaf continuing
    # into RESTORE + its BLAS subtree (see max_stack).
    blas_g = np.asarray([max_stack(w) - 1 for w in wides], np.int64)
    tlas_inst = tlas_bvh2.indices[wtlas.leaf_first]
    leaf_g = np.maximum(2, 1 + blas_g[mesh_of_inst[tlas_inst]]) \
        if wides else np.full(wtlas.num_leaves, 2, np.int64)
    required_stack = max_stack(wtlas, leaf_g)

    # --- global layout: nodes [TLAS][BLAS0][BLAS1]...; leaf rows
    # [TLAS instance rows][BLAS0 tri rows]... ---
    node_base = [wtlas.num_nodes]
    row_base = [wtlas.num_leaves]
    for w in wides[:-1] if wides else []:
        node_base.append(node_base[-1] + w.num_nodes)
        row_base.append(row_base[-1] + w.num_leaves)

    total_nodes = node_base[-1] + (wides[-1].num_nodes if wides else 0)
    total_rows = row_base[-1] + (wides[-1].num_leaves if wides else 0)

    nodes = np.zeros((total_nodes, ROW), np.float32)
    rows = np.zeros((total_rows, ROW), np.float32)

    def emit_nodes(w: WideBVH, nbase: int, rbase: int):
        n = w.num_nodes
        nodes[nbase:nbase + n, 0:48] = w.bounds
        ref = w.child_ref.copy()
        internal = ref >= 0
        leaf = ref <= -2
        ref[internal] += nbase
        ref[leaf] = -((-ref[leaf] - 2) + rbase) - 2
        nodes[nbase:nbase + n, 48:56] = ref

    # TLAS nodes + instance rows (TLAS build uses 1-instance leaves).
    emit_nodes(wtlas, 0, 0)
    assert np.all(wtlas.leaf_count == 1), "TLAS wide path needs 1-inst leaves"
    inst_ids = tlas_bvh2.indices[wtlas.leaf_first]
    tr = np.arange(wtlas.num_leaves)
    rows[tr, 0] = -1.0
    rows[tr, 1] = inst_ids.astype(np.float32)
    rows[tr, 2:14] = inv[inst_ids]
    rows[tr, 14] = np.asarray(node_base, np.float32)[mesh_of_inst[inst_ids]] \
        if wides else 0.0

    # BLAS nodes + triangle rows (vectorized over leaves per mesh).
    for mi, w in enumerate(wides):
        emit_nodes(w, node_base[mi], row_base[mi])
        firsts = tri_bases[mi] + w.leaf_first
        counts = w.leaf_count
        assert counts.max(initial=0) <= LEAF_CAP
        out = row_base[mi] + np.arange(w.num_leaves)
        rows[out, 0] = counts.astype(np.float32)
        for j in range(int(counts.max(initial=0))):
            m = counts > j
            rows[out[m], 1 + j] = (firsts[m] + j).astype(np.float32)
            rows[out[m], 16 + j * 9: 16 + j * 9 + 9] = tri_geo[firsts[m] + j]

    return {"nodes": nodes, "rows": rows, "max_stack": int(required_stack)}


def _assert_sibling_contiguous(child_ref: np.ndarray) -> None:
    """Verify collapse_wide's allocation invariant the flat gang kernel's
    sibling-cursor entries rely on: per node, interior-child ids (and leaf
    row ids) are base + rank-in-slot-order."""
    ref = np.asarray(child_ref)
    if ref.dtype != np.int64 and ref.dtype != np.int32:
        ref = ref.astype(np.int64)
    big = np.int64(1) << 40
    is_n = ref >= 0
    rank_n = np.cumsum(is_n, axis=1) - is_n
    base_n = np.min(np.where(is_n, ref, big), axis=1)
    assert np.all(~is_n | (ref == base_n[:, None] + rank_n)), \
        "wide node interior children not sibling-contiguous"
    lid = -ref - 2
    is_l = ref <= -2
    rank_l = np.cumsum(is_l, axis=1) - is_l
    base_l = np.min(np.where(is_l, lid, big), axis=1)
    assert np.all(~is_l | (lid == base_l[:, None] + rank_l)), \
        "wide node leaf rows not sibling-contiguous"


def _wide_depth(child_ref: np.ndarray) -> int:
    """Max root-to-node depth of the wide tree (child ids > parent ids, so
    one forward sweep suffices)."""
    ref = np.asarray(child_ref).astype(np.int64)
    n = ref.shape[0]
    depth = np.zeros(n, np.int64)
    for i in range(n):
        kids = ref[i][ref[i] >= 0]
        if kids.size:
            depth[kids] = depth[i] + 1
    return int(depth.max(initial=0)) + 1


def pack_wide_merged(wide: WideBVH, id_map: np.ndarray,
                     tri_geo_world_leaf: np.ndarray) -> dict:
    """Pack ONE world-space wide BVH over the whole scene (static-scene
    flattening): node 0 is the traversal root, leaf rows carry the GLOBAL
    aggregated leaf-order triangle ids via `id_map` (the merged build's
    indices permutation), so every shading table keeps working unchanged.
    No TLAS / instance rows / RESTORE transitions at all — the kernel's
    cur_inst stays -1 and callers remap hit.inst through a (T,) tri->
    instance table. ~10% faster bounce traversal than the multi-BLAS
    tables on Sponza and one less indirection per tile."""
    nodes = np.zeros((wide.num_nodes, ROW), np.float32)
    rows = np.zeros((max(wide.num_leaves, 1), ROW), np.float32)
    nodes[:, 0:48] = wide.bounds
    ref = wide.child_ref.copy()
    leaf = ref <= -2
    # node refs stay as-is (base 0); leaf refs re-point at our row layout.
    nodes[:, 48:56] = ref

    firsts = wide.leaf_first
    counts = wide.leaf_count
    assert counts.max(initial=0) <= LEAF_CAP
    out = np.arange(wide.num_leaves)
    rows[out, 0] = counts.astype(np.float32)
    for j in range(int(counts.max(initial=0))):
        m = counts > j
        ids = id_map[firsts[m] + j]
        rows[out[m], 1 + j] = ids.astype(np.float32)
        rows[out[m], 16 + j * 9: 16 + j * 9 + 9] = \
            tri_geo_world_leaf[firsts[m] + j]
    # The flat gang kernel clamps node pushes at STACK_DEPTH as a belt;
    # make its safety a CHECKED pack-time property, not an argument: the
    # node-only (leaf-postponing) occupancy bound must be covered by the
    # mixed bound the packer advertises (advisor round-4 finding).
    ms_mixed = max_stack(wide)
    ms_flat = max_stack(wide, node_only=True)
    assert ms_flat <= ms_mixed, (ms_flat, ms_mixed)
    # Sibling-cursor invariants for the flat gang kernel
    # (ops/pallas_gang._gang_flat_kernel): every node's interior children
    # (and leaf rows) occupy CONSECUTIVE ids in slot order, and the packed
    # entry stack holds at most one live entry per ancestor, so tree
    # depth + 1 bounds its occupancy.
    _assert_sibling_contiguous(wide.child_ref)
    depth = _wide_depth(wide.child_ref)
    return {"nodes": nodes, "rows": rows, "max_stack": ms_mixed,
            "max_stack_flat": ms_flat, "entry_stack": depth + 1}
