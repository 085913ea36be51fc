"""Bittner 2013 insertion-based BVH optimization (reference:
Src/BVH/BVHOptimizer.cpp — batch node removal + branch-and-bound
re-insertion, driven by an inefficiency measure, bounded by time/batch
budgets from the CLI's -O/--opt-time/--opt-batches flags).

Operates on a 1-primitive-leaf BVH2 (run before collapsing, like the
reference pipeline (S)BVH2 -> optimize -> collapse -> convert,
Src/Assets/AssetManager.cpp:57-95).
"""

from __future__ import annotations

import heapq
import time
from dataclasses import dataclass

import numpy as np

from gpu_raytracer_tpu.bvh.types import BVH2
from gpu_raytracer_tpu.core.aabb import half_area


def _sa(mn, mx):
    d = np.maximum(mx - mn, 0.0)
    return float(d[0] * d[1] + d[1] * d[2] + d[2] * d[0])


@dataclass
class _Tree:
    """Linked-node working form."""

    parent: np.ndarray
    left: np.ndarray       # -1 for leaves
    right: np.ndarray
    prim: np.ndarray       # leaf primitive id, -1 for internal
    mn: np.ndarray
    mx: np.ndarray

    @staticmethod
    def from_bvh(bvh: BVH2) -> "_Tree":
        n = bvh.num_nodes
        parent = np.full(n, -1, np.int32)
        left = np.full(n, -1, np.int32)
        right = np.full(n, -1, np.int32)
        prim = np.full(n, -1, np.int32)
        for i in range(n):
            if bvh.node_count[i] == 0:
                l = int(bvh.node_left[i])
                left[i], right[i] = l, l + 1
                parent[l] = i
                parent[l + 1] = i
            else:
                assert bvh.node_count[i] == 1, "optimizer needs 1-prim leaves"
                prim[i] = bvh.indices[int(bvh.node_left[i])]
        return _Tree(parent, left, right, prim,
                     bvh.node_min.copy(), bvh.node_max.copy())

    def refit_up(self, node: int) -> None:
        while node != -1:
            l, r = self.left[node], self.right[node]
            if l != -1:
                self.mn[node] = np.minimum(self.mn[l], self.mn[r])
                self.mx[node] = np.maximum(self.mx[l], self.mx[r])
            node = self.parent[node]

    def to_bvh(self, root: int, num_prims: int) -> BVH2:
        """Re-emit as flat DFS-ordered BVH2 with 1-prim leaves."""
        node_min, node_max, node_left, node_count = [], [], [], []
        indices = []

        def emit(n):
            out = len(node_left)
            node_min.append(self.mn[n])
            node_max.append(self.mx[n])
            node_left.append(0)
            node_count.append(0)
            return out

        out_root = emit(root)
        stack = [(root, out_root)]
        while stack:
            n, out = stack.pop()
            if self.left[n] == -1:
                node_left[out] = len(indices)
                node_count[out] = 1
                indices.append(int(self.prim[n]))
                continue
            lo = emit(self.left[n])
            emit(self.right[n])
            node_left[out] = lo
            stack.append((self.right[n], lo + 1))
            stack.append((self.left[n], lo))

        return BVH2(
            node_min=np.asarray(node_min, np.float32),
            node_max=np.asarray(node_max, np.float32),
            node_left=np.asarray(node_left, np.int32),
            node_count=np.asarray(node_count, np.int32),
            node_axis=np.zeros(len(node_left), np.int8),
            indices=np.asarray(indices, np.int32),
        )


def _find_reinsertion(tree: _Tree, root: int, node_mn, node_mx) -> int:
    """Branch-and-bound search for the insertion sibling minimising induced
    cost (reference: BVHOptimizer.cpp find_reinsertion:110-130)."""
    best_cost = np.inf
    best_node = root
    node_sa = _sa(node_mn, node_mx)
    heap = [(0.0, root)]
    while heap:
        induced, cand = heapq.heappop(heap)
        if induced + node_sa >= best_cost:
            break
        union_mn = np.minimum(tree.mn[cand], node_mn)
        union_mx = np.maximum(tree.mx[cand], node_mx)
        direct = _sa(union_mn, union_mx)
        total = induced + direct
        if total < best_cost:
            best_cost = total
            best_node = cand
        if tree.left[cand] != -1:
            child_induced = induced + direct - _sa(tree.mn[cand], tree.mx[cand])
            if child_induced + node_sa < best_cost:
                heapq.heappush(heap, (child_induced, int(tree.left[cand])))
                heapq.heappush(heap, (child_induced, int(tree.right[cand])))
    return best_node


def optimize(bvh: BVH2, max_batches: int = 1000, max_time_ms: int = 60_000,
             batch_fraction: float = 0.01, p_stagnant: int = 5,
             p_terminate: int = 10, seed: int = 0) -> BVH2:
    """Optimize a 1-prim-leaf BVH2; returns a new BVH2 with SAH cost <= input.
    Node selection follows the reference: inefficiency-sorted batches,
    switching to random selection after `p_stagnant` stagnant batches,
    terminating after `p_terminate` (BVHOptimizer.cpp:73-107, 394-398)."""
    if bvh.num_nodes < 7:
        return bvh
    tree = _Tree.from_bvh(bvh)
    num_prims = bvh.num_prims
    n = bvh.num_nodes
    root = 0
    rng = np.random.default_rng(seed)

    def total_cost() -> float:
        sa = half_area(tree.mn, tree.mx)
        internal = tree.left != -1
        return float(sa[internal].sum())

    best_cost = total_cost()
    stagnant = 0
    use_random = False
    t0 = time.time()

    batch_size = max(int(n * batch_fraction), 8)
    for batch in range(max_batches):
        if (time.time() - t0) * 1000.0 > max_time_ms:
            break

        internal = np.nonzero((tree.left != -1) & (np.arange(n) != root))[0]
        # Exclude root's children (removal surgery needs a grandparent).
        internal = internal[tree.parent[internal] != -1]
        internal = internal[tree.parent[internal] != root]
        if len(internal) == 0:
            break
        if use_random:
            chosen = rng.choice(internal, size=min(batch_size, len(internal)),
                                replace=False)
        else:
            sa = half_area(tree.mn[internal], tree.mx[internal])
            sa_l = half_area(tree.mn[tree.left[internal]], tree.mx[tree.left[internal]])
            sa_r = half_area(tree.mn[tree.right[internal]], tree.mx[tree.right[internal]])
            # Bittner inefficiency: area cost x min-child imbalance x sum.
            eps = 1e-12
            m_sum = 2.0 * sa / np.maximum(sa_l + sa_r, eps)
            m_min = sa / np.maximum(np.minimum(sa_l, sa_r), eps)
            m_area = sa
            measure = m_sum * m_min * m_area
            order = np.argsort(-measure)
            chosen = internal[order[:batch_size]]

        for node in chosen:
            node = int(node)
            parent = int(tree.parent[node])
            if parent == -1 or tree.parent[parent] == -1:
                continue  # structure changed under us this batch
            if tree.left[node] == -1:
                continue
            grand = int(tree.parent[parent])
            sibling = int(tree.left[parent]) if int(tree.right[parent]) == node \
                else int(tree.right[parent])
            # Remove `node` (with its subtree) and its parent: sibling
            # replaces parent under grand.
            if int(tree.left[grand]) == parent:
                tree.left[grand] = sibling
            else:
                tree.right[grand] = sibling
            tree.parent[sibling] = grand
            tree.refit_up(grand)

            # Reinsert the removed subtree next to the best sibling; the
            # freed `parent` slot becomes the new internal node.
            target = _find_reinsertion(tree, root, tree.mn[node], tree.mx[node])
            if target == root:
                tparent = -1
            else:
                tparent = int(tree.parent[target])
            new_int = parent
            tree.left[new_int] = target
            tree.right[new_int] = node
            tree.parent[target] = new_int
            tree.parent[node] = new_int
            if tparent == -1:
                # target was the root: new internal becomes root
                tree.parent[new_int] = -1
                root = new_int
            else:
                if int(tree.left[tparent]) == target:
                    tree.left[tparent] = new_int
                else:
                    tree.right[tparent] = new_int
                tree.parent[new_int] = tparent
            tree.mn[new_int] = np.minimum(tree.mn[target], tree.mn[node])
            tree.mx[new_int] = np.maximum(tree.mx[target], tree.mx[node])
            tree.refit_up(tree.parent[new_int] if tparent != -1 else new_int)

        cost = total_cost()
        if cost < best_cost - 1e-6:
            best_cost = cost
            stagnant = 0
            use_random = False
        else:
            stagnant += 1
            if stagnant >= p_terminate:
                break
            if stagnant >= p_stagnant:
                use_random = True

    return tree.to_bvh(root, num_prims)
