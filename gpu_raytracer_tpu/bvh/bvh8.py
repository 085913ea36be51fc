"""CWBVH / BVH8: compressed 8-wide BVH (Ylitie et al. 2017; reference:
Src/BVH/Converters/BVH8Converter.cpp + device node format Src/BVH/BVH.h:42-80).

Pipeline: a 1-triangle-leaf BVH2 is converted by the Ylitie dynamic program
(`calculate_cost` fills a 7-entry decision table per node: leaf of <= 3 tris /
internal 8-wide / distribute), children are greedily assigned to octant slots
maximising centroid-direction agreement, child AABBs are quantized to bytes
with per-node power-of-two scales stored as IEEE exponents, and triangles are
emitted in DFS order.

SoA device-friendly layout (the reference packs 80-byte AoS nodes; same
information here):
  p         (N, 3) f32   node origin (quantization anchor)
  e         (N, 3) u8    per-axis IEEE exponent of the byte scale
  imask     (N,)  u8     internal-child mask
  child_base(N,)  i32    first child node index
  tri_base  (N,)  i32    first triangle index
  meta      (N, 8) u8    per-slot: 0 = empty; internal: (1<<5) | (24+slot);
                         leaf: unary-count<<5 | relative tri offset
  q_lo/q_hi (N, 8, 3) u8 quantized child slabs
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from gpu_raytracer_tpu.bvh.types import BVH2
from gpu_raytracer_tpu.core.aabb import half_area

C_NODE = 1.0
C_PRIM = 0.3
P_MAX = 3          # max triangles in a BVH8 leaf (reference: cost table)
INVALID = -1


@dataclass
class BVH8:
    p: np.ndarray
    e: np.ndarray
    imask: np.ndarray
    child_base: np.ndarray
    tri_base: np.ndarray
    meta: np.ndarray
    q_lo: np.ndarray
    q_hi: np.ndarray
    indices: np.ndarray  # triangle order (DFS; may duplicate for SBVH input)

    @property
    def num_nodes(self) -> int:
        return self.p.shape[0]

    def decode_children(self, node: int):
        """Dequantized child AABBs -> (mins (8,3), maxs (8,3), valid (8,))
        (reference: BVH8.h:29-107 byte AABB decode)."""
        scale = np.ldexp(np.ones(3, np.float32), self.e[node].astype(np.int32) - 127)
        lo = self.p[node] + self.q_lo[node].astype(np.float32) * scale
        hi = self.p[node] + self.q_hi[node].astype(np.float32) * scale
        valid = self.meta[node] != 0
        return lo, hi, valid


def convert_bvh8(bvh: BVH2, triangles_centroid=None) -> BVH8:
    """Ylitie DP conversion of a 1-triangle-leaf BVH2."""
    n = bvh.num_nodes
    assert np.all(bvh.node_count[bvh.node_count > 0] == 1), \
        "BVH8 conversion needs 1-triangle leaves (skip collapse, reference " \
        "AssetManager.cpp:85-87)"

    sa = half_area(bvh.node_min, bvh.node_max).astype(np.float64)

    # --- cost table: cost[i][j] = min cost of subtree i when its root may
    # occupy j in 1..7 'slots' of its parent (Ylitie section 4;
    # reference calculate_cost BVH8Converter.cpp:24-117) ---
    cost = np.full((n, 8), np.inf)
    decision = np.zeros((n, 8), np.int8)   # 0=leaf, 1=internal, 2=distribute
    dist_left = np.zeros((n, 8), np.int8)  # distribute split: slots to left
    tri_count = np.where(bvh.node_count > 0, 1, 0).astype(np.int64)

    for i in range(n - 1, -1, -1):
        if bvh.node_count[i] > 0:
            for j in range(1, 8):
                cost[i, j] = C_PRIM * sa[i]
                decision[i, j] = 0
            continue
        l = int(bvh.node_left[i])
        r = l + 1
        tri_count[i] = tri_count[l] + tri_count[r]

        # pure distribute costs: children share j slots (j >= 2)
        dist_cost = np.full(8, np.inf)
        dist_k = np.ones(8, np.int8)
        for j in range(2, 8):
            for k in range(1, j):
                c = cost[l, k] + cost[r, j - k]
                if c < dist_cost[j]:
                    dist_cost[j] = c
                    dist_k[j] = k

        # 1 slot: internal 8-wide node (children distributed over 7 slots)
        # vs whole-subtree leaf when <= P_MAX triangles
        c_internal = dist_cost[7] + C_NODE * sa[i]
        cost[i, 1] = c_internal
        decision[i, 1] = 1
        if tri_count[i] <= P_MAX:
            c_leaf = C_PRIM * sa[i] * tri_count[i]
            if c_leaf < cost[i, 1]:
                cost[i, 1] = c_leaf
                decision[i, 1] = 0

        # j >= 2 slots: best of distributing over j slots or reusing the
        # (j-1)-slot decision (reference seeds cost_distribute with the
        # previous slot count's decision, BVH8Converter.cpp calculate_cost —
        # without it every multi-slot offer is forced to distribute even when
        # one internal node is cheaper).
        for j in range(2, 8):
            if dist_cost[j] < cost[i, j - 1]:
                cost[i, j] = dist_cost[j]
                decision[i, j] = 2
                dist_left[i, j] = dist_k[j]
            else:
                cost[i, j] = cost[i, j - 1]
                decision[i, j] = decision[i, j - 1]
                dist_left[i, j] = dist_left[i, j - 1]

    # --- recursive emission ---
    p_out, e_out, imask_out = [], [], []
    child_base_out, tri_base_out = [], []
    meta_out, qlo_out, qhi_out = [], [], []
    indices_out = []

    def collect(node, j, out):
        d = decision[node, j]
        if d == 2:
            k = int(dist_left[node, j])
            l = int(bvh.node_left[node])
            collect(l, k, out)
            collect(l + 1, j - k, out)
        else:
            out.append((node, d))

    def collect_leaf_tris(node, out):
        if bvh.node_count[node] > 0:
            out.append(int(bvh.indices[int(bvh.node_left[node])]))
        else:
            l = int(bvh.node_left[node])
            collect_leaf_tris(l, out)
            collect_leaf_tris(l + 1, out)

    def alloc() -> int:
        p_out.append(np.zeros(3, np.float32))
        e_out.append(np.zeros(3, np.uint8))
        imask_out.append(0)
        child_base_out.append(0)
        tri_base_out.append(0)
        meta_out.append(np.zeros(8, np.uint8))
        qlo_out.append(np.zeros((8, 3), np.uint8))
        qhi_out.append(np.zeros((8, 3), np.uint8))
        return len(p_out) - 1

    # Iterative emission: a node's internal children occupy a CONTIGUOUS id
    # block in slot order (traversal addresses child_base + popcount(slots<s),
    # reference BVH8.h:19-27).
    root_id = alloc()
    work = [(0, root_id)]
    while work:
        node, my_id = work.pop()
        children = []
        collect(node, 7, children)  # [(bvh2 node, decision 0|1)]
        assert 1 <= len(children) <= 8

        # Greedy octant ordering (reference BVH8Converter.cpp:148-208).
        center = 0.5 * (bvh.node_min[node] + bvh.node_max[node])
        slots = [None] * 8
        scores = []
        for ci, (c, d) in enumerate(children):
            v = 0.5 * (bvh.node_min[c] + bvh.node_max[c]) - center
            for sl in range(8):
                direction = np.array([1 if sl & 1 else -1,
                                      1 if sl & 2 else -1,
                                      1 if sl & 4 else -1], np.float32)
                scores.append((-float(np.dot(v, direction)), ci, sl))
        scores.sort()
        assigned_child, assigned_slot = set(), set()
        for _, ci, sl in scores:
            if ci in assigned_child or sl in assigned_slot:
                continue
            slots[sl] = children[ci]
            assigned_child.add(ci)
            assigned_slot.add(sl)
            if len(assigned_child) == len(children):
                break

        # Quantization grid (reference collapse BVH8Converter.cpp:210-270).
        mn = bvh.node_min[node].astype(np.float64)
        mx = bvh.node_max[node].astype(np.float64)
        denom = 1.0 / (2.0 ** 8 - 1.0)
        e = np.ceil(np.log2(np.maximum((mx - mn) * denom, 1e-38)))
        e = np.clip(e + 127.0, 1.0, 254.0).astype(np.uint8)
        scale = np.ldexp(np.ones(3), e.astype(np.int32) - 127)
        inv_scale = 1.0 / scale

        p_out[my_id] = mn.astype(np.float32)
        e_out[my_id] = e
        tri_base_out[my_id] = len(indices_out)

        internal_children = []
        num_tris_local = 0
        for sl in range(8):
            entry = slots[sl]
            if entry is None:
                continue
            c, d = entry
            qlo = np.floor((bvh.node_min[c] - mn) * inv_scale)
            qhi = np.ceil((bvh.node_max[c] - mn) * inv_scale)
            qlo_out[my_id][sl] = np.clip(qlo, 0, 255).astype(np.uint8)
            qhi_out[my_id][sl] = np.clip(qhi, 0, 255).astype(np.uint8)
            if d == 1:
                imask_out[my_id] |= (1 << sl)
                internal_children.append((sl, c))
                meta_out[my_id][sl] = (1 << 5) | (24 + sl)
            else:
                tris = []
                collect_leaf_tris(c, tris)
                assert 1 <= len(tris) <= P_MAX
                unary = ((1 << len(tris)) - 1) << 5
                meta_out[my_id][sl] = unary | num_tris_local
                indices_out.extend(tris)
                num_tris_local += len(tris)

        if internal_children:
            base = len(p_out)
            child_base_out[my_id] = base
            for k, (sl, c) in enumerate(internal_children):
                alloc()
            for k, (sl, c) in enumerate(internal_children):
                work.append((c, base + k))


    return BVH8(
        p=np.asarray(p_out, np.float32),
        e=np.asarray(e_out, np.uint8),
        imask=np.asarray(imask_out, np.uint8),
        child_base=np.asarray(child_base_out, np.int32),
        tri_base=np.asarray(tri_base_out, np.int32),
        meta=np.asarray(meta_out, np.uint8),
        q_lo=np.asarray(qlo_out, np.uint8),
        q_hi=np.asarray(qhi_out, np.uint8),
        indices=np.asarray(indices_out, np.int32),
    )

def traverse_bvh8(bvh8: BVH8, origin, direction, p0, e1, e2, t_max=np.inf):
    """Host oracle traversal (test-only; the device path uses the streamed
    bitmask formulation). Triangle arrays must be in bvh8.indices order."""
    from gpu_raytracer_tpu.bvh.cpu_trace import intersect_tris_brute

    inv = 1.0 / np.where(np.abs(direction) > 1e-20, direction,
                         np.where(direction >= 0, 1e-20, -1e-20))
    best_t, best_tri = float(t_max), -1
    stack = [0]
    while stack:
        node = stack.pop()
        lo, hi, valid = bvh8.decode_children(node)
        t0 = (lo - origin) * inv
        t1 = (hi - origin) * inv
        near = np.minimum(t0, t1).max(axis=-1)
        far = np.maximum(t0, t1).min(axis=-1)
        hit = valid & (near <= far) & (far > 0) & (np.maximum(near, 0) < best_t)
        meta = bvh8.meta[node]
        for sl in np.nonzero(hit)[0]:
            m = int(meta[sl])
            if m & 0b11100000 and (m & 0b00011111) >= 24:  # internal child
                # child index = child_base + popcount of imask bits below slot
                below = int(bvh8.imask[node]) & ((1 << sl) - 1)
                stack.append(int(bvh8.child_base[node]) + bin(below).count("1"))
            else:  # leaf: unary count in high bits, offset in low bits
                count = bin(m >> 5).count("1")
                first = int(bvh8.tri_base[node]) + (m & 0b00011111)
                for i in range(first, first + count):
                    t, _, _, _ = intersect_tris_brute(
                        origin, direction, p0[i:i + 1], e1[i:i + 1], e2[i:i + 1],
                        best_t)
                    if t < best_t:
                        best_t, best_tri = t, i
    return best_t, best_tri
