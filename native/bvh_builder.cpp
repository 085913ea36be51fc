// Native BVH construction library (C ABI, loaded via ctypes).
//
// The reference implements its whole BVH toolchain in C++ (Src/BVH/*); the
// TPU framework keeps host-side construction native too for Sponza-scale
// scenes where the pure-Python builder is ~100x slower. Same algorithm
// family as gpu_raytracer_tpu/bvh/sah.py + collapse.py:
//   * full-sweep (non-binned) SAH object splits over 3 pre-sorted axes,
//     partitions maintained with a going-left bitmask (reference:
//     Src/BVH/Builders/SAHBuilder.cpp, BVHPartitions.cpp:8-72)
//   * bottom-up SAH leaf collapsing to a bounded leaf size (reference:
//     Src/BVH/BVHCollapser.cpp) emitted in the same BFS sibling-adjacent
//     layout as the Python collapser so outputs are interchangeable.
//
// Output layout matches bvh/types.py BVH2: node_min/max (N,3) f32,
// node_left/count (N,) i32, indices (T,) i32 with DFS-contiguous leaf runs.

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <queue>
#include <vector>

namespace {

struct Vec3 {
    float x, y, z;
};

static inline Vec3 vmin(const Vec3& a, const Vec3& b) {
    return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
static inline Vec3 vmax(const Vec3& a, const Vec3& b) {
    return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}
static inline float half_area(const Vec3& mn, const Vec3& mx) {
    float dx = std::max(mx.x - mn.x, 0.0f);
    float dy = std::max(mx.y - mn.y, 0.0f);
    float dz = std::max(mx.z - mn.z, 0.0f);
    return dx * dy + dy * dz + dz * dx;
}

struct Builder {
    const Vec3* prim_min;
    const Vec3* prim_max;
    int num_prims;
    float cost_node;
    float cost_leaf;

    std::vector<float> node_min;   // 3 * N
    std::vector<float> node_max;
    std::vector<int32_t> node_left;
    std::vector<int32_t> node_count;
    std::vector<int32_t> indices;

    std::vector<uint8_t> going_left;   // scratch, per prim
    std::vector<float> sweep_area;     // scratch, suffix areas

    int alloc_node() {
        node_min.insert(node_min.end(), {0, 0, 0});
        node_max.insert(node_max.end(), {0, 0, 0});
        node_left.push_back(0);
        node_count.push_back(0);
        return (int)node_left.size() - 1;
    }

    void set_aabb(int node, const Vec3& mn, const Vec3& mx) {
        node_min[3 * node + 0] = mn.x;
        node_min[3 * node + 1] = mn.y;
        node_min[3 * node + 2] = mn.z;
        node_max[3 * node + 0] = mx.x;
        node_max[3 * node + 1] = mx.y;
        node_max[3 * node + 2] = mx.z;
    }

    // Build over three centroid-sorted index arrays, [begin, end) ranges of
    // the shared axis arrays. Sorted order is maintained through partitions.
    void build(int node, std::vector<int32_t> axes[3], int depth) {
        const std::vector<int32_t>& ids = axes[0];
        int n = (int)ids.size();

        Vec3 mn = prim_min[ids[0]], mx = prim_max[ids[0]];
        for (int i = 1; i < n; i++) {
            mn = vmin(mn, prim_min[ids[i]]);
            mx = vmax(mx, prim_max[ids[i]]);
        }
        set_aabb(node, mn, mx);

        if (n == 1) {
            node_left[node] = (int)indices.size();
            node_count[node] = 1;
            indices.push_back(ids[0]);
            return;
        }

        // Full SAH sweep on all three axes.
        int best_axis = -1, best_index = -1;
        double best_cost = DBL_MAX;
        for (int axis = 0; axis < 3; axis++) {
            const std::vector<int32_t>& order = axes[axis];
            sweep_area.resize(n);
            // suffix union areas
            Vec3 smn = prim_min[order[n - 1]], smx = prim_max[order[n - 1]];
            sweep_area[n - 1] = half_area(smn, smx);
            for (int i = n - 2; i >= 0; i--) {
                smn = vmin(smn, prim_min[order[i]]);
                smx = vmax(smx, prim_max[order[i]]);
                sweep_area[i] = half_area(smn, smx);
            }
            Vec3 pmn = prim_min[order[0]], pmx = prim_max[order[0]];
            for (int i = 0; i < n - 1; i++) {
                pmn = vmin(pmn, prim_min[order[i]]);
                pmx = vmax(pmx, prim_max[order[i]]);
                double cost = half_area(pmn, pmx) * double(i + 1)
                            + sweep_area[i + 1] * double(n - i - 1);
                if (cost < best_cost) {
                    best_cost = cost;
                    best_axis = axis;
                    best_index = i + 1;
                }
            }
        }

        // Stable partition of all three sorted orders by the winning split.
        for (int i = 0; i < best_index; i++) going_left[axes[best_axis][i]] = 1;
        for (int i = best_index; i < n; i++) going_left[axes[best_axis][i]] = 0;

        std::vector<int32_t> left_axes[3], right_axes[3];
        for (int axis = 0; axis < 3; axis++) {
            left_axes[axis].reserve(best_index);
            right_axes[axis].reserve(n - best_index);
            for (int32_t id : axes[axis]) {
                (going_left[id] ? left_axes[axis] : right_axes[axis]).push_back(id);
            }
            axes[axis].clear();
            axes[axis].shrink_to_fit();
        }

        int left = alloc_node();
        alloc_node();  // right = left + 1
        node_left[node] = left;
        node_count[node] = 0;
        build(left, left_axes, depth + 1);
        build(left + 1, right_axes, depth + 1);
    }
};

// Bottom-up SAH collapse + BFS re-emit (mirrors bvh/collapse.py).
struct Collapser {
    const Builder& b;
    int max_leaf_size;
    float cost_node, cost_leaf;

    std::vector<int64_t> subtree_count;
    std::vector<double> cost;
    std::vector<uint8_t> collapse_here;
    std::vector<int64_t> first_index;

    void run(std::vector<float>& out_min, std::vector<float>& out_max,
             std::vector<int32_t>& out_left, std::vector<int32_t>& out_count) {
        int n = (int)b.node_left.size();
        subtree_count.assign(n, 0);
        cost.assign(n, 0.0);
        collapse_here.assign(n, 0);
        first_index.assign(n, 0);

        for (int i = n - 1; i >= 0; i--) {
            float sa = half_area(
                {b.node_min[3 * i], b.node_min[3 * i + 1], b.node_min[3 * i + 2]},
                {b.node_max[3 * i], b.node_max[3 * i + 1], b.node_max[3 * i + 2]});
            if (b.node_count[i] > 0) {
                subtree_count[i] = b.node_count[i];
                cost[i] = sa * cost_leaf * b.node_count[i];
                collapse_here[i] = 1;
                first_index[i] = b.node_left[i];
            } else {
                int l = b.node_left[i];
                subtree_count[i] = subtree_count[l] + subtree_count[l + 1];
                double cost_internal = sa * cost_node + cost[l] + cost[l + 1];
                double cost_as_leaf = sa * cost_leaf * double(subtree_count[i]);
                first_index[i] = first_index[l];
                if (subtree_count[i] <= max_leaf_size && cost_as_leaf <= cost_internal) {
                    cost[i] = cost_as_leaf;
                    collapse_here[i] = 1;
                } else {
                    cost[i] = cost_internal;
                }
            }
        }

        auto emit = [&](int node_id) -> int {
            int out_id = (int)out_left.size();
            for (int c = 0; c < 3; c++) {
                out_min.push_back(b.node_min[3 * node_id + c]);
                out_max.push_back(b.node_max[3 * node_id + c]);
            }
            if (collapse_here[node_id]) {
                out_left.push_back((int32_t)first_index[node_id]);
                out_count.push_back((int32_t)subtree_count[node_id]);
            } else {
                out_left.push_back(0);
                out_count.push_back(0);
            }
            return out_id;
        };

        int root_out = emit(0);
        std::queue<std::pair<int, int>> queue;  // (left_in, parent_out)
        if (!collapse_here[0]) queue.push({b.node_left[0], root_out});
        while (!queue.empty()) {
            auto [left_in, parent_out] = queue.front();
            queue.pop();
            int left_out = emit(left_in);
            emit(left_in + 1);
            out_left[parent_out] = left_out;
            for (int k = 0; k < 2; k++) {
                int child_in = left_in + k;
                if (!collapse_here[child_in]) {
                    queue.push({b.node_left[child_in], left_out + k});
                }
            }
        }
    }
};

}  // namespace

extern "C" {

// Returns the number of nodes written, or -1 on error. Caller allocates
// out arrays for the worst case (2*num_prims - 1 nodes).
int build_sah_bvh(const float* aabb_min, const float* aabb_max,
                  const float* centroids, int num_prims,
                  float cost_node, float cost_leaf, int max_leaf_size,
                  float* out_node_min, float* out_node_max,
                  int32_t* out_node_left, int32_t* out_node_count,
                  int32_t* out_indices) {
    if (num_prims <= 0) return -1;

    Builder b;
    b.prim_min = reinterpret_cast<const Vec3*>(aabb_min);
    b.prim_max = reinterpret_cast<const Vec3*>(aabb_max);
    b.num_prims = num_prims;
    b.cost_node = cost_node;
    b.cost_leaf = cost_leaf;
    b.going_left.assign(num_prims, 0);

    size_t max_nodes = size_t(2) * num_prims;
    b.node_min.reserve(3 * max_nodes);
    b.node_max.reserve(3 * max_nodes);
    b.node_left.reserve(max_nodes);
    b.node_count.reserve(max_nodes);
    b.indices.reserve(num_prims);

    std::vector<int32_t> axes[3];
    const Vec3* cents = reinterpret_cast<const Vec3*>(centroids);
    for (int axis = 0; axis < 3; axis++) {
        axes[axis].resize(num_prims);
        std::iota(axes[axis].begin(), axes[axis].end(), 0);
        const float* c = centroids;
        std::stable_sort(axes[axis].begin(), axes[axis].end(),
                         [c, axis](int32_t a, int32_t bb) {
                             return c[3 * a + axis] < c[3 * bb + axis];
                         });
    }
    (void)cents;

    b.alloc_node();
    b.build(0, axes, 0);

    // Collapse into the final bounded-leaf layout.
    Collapser col{b, max_leaf_size, cost_node, cost_leaf, {}, {}, {}, {}};
    std::vector<float> cmin, cmax;
    std::vector<int32_t> cleft, ccount;
    cmin.reserve(b.node_min.size());
    cmax.reserve(b.node_max.size());
    cleft.reserve(b.node_left.size());
    ccount.reserve(b.node_count.size());
    col.run(cmin, cmax, cleft, ccount);

    int n = (int)cleft.size();
    std::memcpy(out_node_min, cmin.data(), sizeof(float) * cmin.size());
    std::memcpy(out_node_max, cmax.data(), sizeof(float) * cmax.size());
    std::memcpy(out_node_left, cleft.data(), sizeof(int32_t) * cleft.size());
    std::memcpy(out_node_count, ccount.data(), sizeof(int32_t) * ccount.size());
    std::memcpy(out_indices, b.indices.data(), sizeof(int32_t) * b.indices.size());
    return n;
}

}  // extern "C"
