// Grid A* planner — native core for the host-side global planner.
//
// The reference vendors a pure-Python A* (robotmpcs/global_planner/a_star.py)
// that walks the occupancy grid with a heapq frontier; it is the only
// sequential, latency-sensitive host-side component of the framework (run
// once per episode, reference examples/boxer_example_global.py:203-207).
// This C++ implementation provides the same search (4/8-connectivity,
// occupancy-probability soft cost) over a row-major float grid, exported
// with a C ABI for ctypes.
//
// Build: make -C native   (produces libastar.so)

#include <cmath>
#include <cstdint>
#include <queue>
#include <vector>

namespace {

struct Node {
  float f;        // cost-to-come + heuristic
  float g;        // cost-to-come
  int32_t idx;    // flattened cell index
  int32_t parent; // flattened parent index (set into came_from on visit)
  bool operator>(const Node& o) const { return f > o.f; }
};

inline float dist2d(int x0, int y0, int x1, int y1) {
  const float dx = static_cast<float>(x1 - x0);
  const float dy = static_cast<float>(y1 - y0);
  return std::sqrt(dx * dx + dy * dy);
}

}  // namespace

extern "C" {

// Plans a path on a row-major occupancy grid of shape (height, width) where
// grid[y * width + x] is an occupancy probability in [0, 1].
//
//   occupancy_threshold: cells with value >= threshold are blocked.
//   connectivity: 4 or 8.
//   occupancy_cost_factor: soft cost added per step, proportional to the
//     destination cell's occupancy probability (reference a_star.py:112-114).
//   out_path: caller-allocated buffer of 2 * max_len int32 receiving
//     interleaved (x, y) pairs from start to goal.
//
// Returns the number of path nodes written, 0 if no path exists, or a
// negative error code (-1 invalid args, -2 start blocked, -3 goal blocked,
// -4 path longer than max_len).
int32_t astar_plan(const float* grid, int32_t height, int32_t width,
                   float occupancy_threshold, int32_t start_x, int32_t start_y,
                   int32_t goal_x, int32_t goal_y, int32_t connectivity,
                   float occupancy_cost_factor, int32_t* out_path,
                   int32_t max_len) {
  if (grid == nullptr || out_path == nullptr || height <= 0 || width <= 0)
    return -1;
  if (start_x < 0 || start_x >= width || start_y < 0 || start_y >= height)
    return -1;
  if (goal_x < 0 || goal_x >= width || goal_y < 0 || goal_y >= height)
    return -1;
  if (connectivity != 4 && connectivity != 8) return -1;

  auto blocked = [&](int32_t x, int32_t y) {
    return grid[y * width + x] >= occupancy_threshold;
  };
  if (blocked(start_x, start_y)) return -2;
  if (blocked(goal_x, goal_y)) return -3;

  const int32_t n_cells = height * width;
  const int32_t start = start_y * width + start_x;
  const int32_t goal = goal_y * width + goal_x;

  std::vector<uint8_t> visited(n_cells, 0);
  std::vector<int32_t> came_from(n_cells, -1);
  std::priority_queue<Node, std::vector<Node>, std::greater<Node>> front;

  const float kSqrt2 = std::sqrt(2.0f);
  const int n_moves = (connectivity == 4) ? 4 : 8;
  const int32_t mdx[8] = {1, 0, -1, 0, 1, -1, -1, 1};
  const int32_t mdy[8] = {0, 1, 0, -1, 1, 1, -1, -1};
  const float mcost[8] = {1, 1, 1, 1, kSqrt2, kSqrt2, kSqrt2, kSqrt2};

  front.push({dist2d(start_x, start_y, goal_x, goal_y), 0.0f, start, start});
  bool found = false;

  // Lazy-deletion A*: a node may be pushed multiple times; the first pop is
  // its best cost-to-come, at which point its parent is fixed.
  while (!front.empty()) {
    Node cur = front.top();
    front.pop();
    if (visited[cur.idx]) continue;
    visited[cur.idx] = 1;
    came_from[cur.idx] = cur.parent;
    if (cur.idx == goal) {
      found = true;
      break;
    }
    const int32_t cx = cur.idx % width;
    const int32_t cy = cur.idx / width;
    for (int m = 0; m < n_moves; ++m) {
      const int32_t nx2 = cx + mdx[m];
      const int32_t ny2 = cy + mdy[m];
      if (nx2 < 0 || nx2 >= width || ny2 < 0 || ny2 >= height) continue;
      const int32_t nidx = ny2 * width + nx2;
      if (visited[nidx] || blocked(nx2, ny2)) continue;
      const float soft = grid[nidx] * occupancy_cost_factor;
      const float g = cur.g + mcost[m] + soft;
      const float f = g + dist2d(nx2, ny2, goal_x, goal_y) + soft;
      front.push({f, g, nidx, cur.idx});
    }
  }

  if (!found) return 0;

  std::vector<int32_t> rev;
  for (int32_t cur = goal; cur != start; cur = came_from[cur]) {
    rev.push_back(cur);
    if (static_cast<int32_t>(rev.size()) > n_cells) return -1;  // cycle guard
  }
  rev.push_back(start);
  const int32_t n = static_cast<int32_t>(rev.size());
  if (n > max_len) return -4;
  for (int32_t i = 0; i < n; ++i) {
    const int32_t idx = rev[n - 1 - i];
    out_path[2 * i] = idx % width;      // x
    out_path[2 * i + 1] = idx / width;  // y
  }
  return n;
}

}  // extern "C"
