// Exact maximum-clique solver (branch & bound with greedy-coloring bounds).
//
// Native replacement for the PMC C library the reference calls through
// ctypes (Experiments/utils/max_clique.py:9-40, used by the SM/PMC baseline
// scripts and TEASER's PMC_EXACT inlier selection). Algorithm: Tomita-style
// MCQ — vertices ordered by degeneracy, greedy coloring gives the pruning
// bound at every branch.
//
// C ABI (ctypes):
//   int max_clique(const uint8_t* adj, int n, int* out_clique, double time_budget_sec)
//     adj:        row-major n*n adjacency (0/1), diagonal ignored
//     out_clique: caller-allocated buffer of n ints; filled with the clique
//                 vertex ids; return value = clique size (0 on error)
//     time_budget_sec: soft wall-clock cap; on expiry the best clique found
//                 so far is returned (mirrors the reference's TEASER
//                 FAIL_TOLERANT 10 s watchdog semantics,
//                 Experiments/algorithms/TEASER_plus_plus.py:16-59).
#include <algorithm>
#include <chrono>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

using Clock = std::chrono::steady_clock;

struct Solver {
  int n;
  const uint8_t* adj;
  std::vector<int> best;
  std::vector<int> current;
  Clock::time_point deadline;
  bool timed_out = false;

  bool connected(int a, int b) const { return adj[(size_t)a * n + b] != 0; }

  // Greedy coloring of candidate set R; returns vertices ordered so that
  // color numbers are non-decreasing (classic MCQ bound ordering).
  void color_sort(const std::vector<int>& R, std::vector<int>& order,
                  std::vector<int>& colors) const {
    order.clear();
    colors.clear();
    std::vector<std::vector<int>> classes;
    for (int v : R) {
      bool placed = false;
      for (size_t c = 0; c < classes.size() && !placed; ++c) {
        bool clash = false;
        for (int u : classes[c]) {
          if (connected(u, v)) { clash = true; break; }
        }
        if (!clash) { classes[c].push_back(v); placed = true; }
      }
      if (!placed) classes.push_back({v});
    }
    for (size_t c = 0; c < classes.size(); ++c) {
      for (int v : classes[c]) {
        order.push_back(v);
        colors.push_back((int)c + 1);
      }
    }
  }

  void expand(std::vector<int>& R) {
    if (Clock::now() > deadline) { timed_out = true; return; }
    std::vector<int> order, colors;
    color_sort(R, order, colors);
    for (int i = (int)order.size() - 1; i >= 0; --i) {
      if ((int)current.size() + colors[i] <= (int)best.size()) return;
      int v = order[i];
      current.push_back(v);
      std::vector<int> next;
      for (int j = 0; j < i; ++j) {
        if (connected(order[j], v)) next.push_back(order[j]);
      }
      if (next.empty()) {
        if (current.size() > best.size()) best = current;
      } else {
        expand(next);
        if (timed_out) { current.pop_back(); return; }
      }
      current.pop_back();
    }
  }
};

}  // namespace

extern "C" int max_clique(const uint8_t* adj, int n, int* out_clique,
                          double time_budget_sec) {
  if (n <= 0 || adj == nullptr || out_clique == nullptr) return 0;
  Solver s;
  s.n = n;
  s.adj = adj;
  s.deadline = Clock::now() +
               std::chrono::microseconds((int64_t)(time_budget_sec * 1e6));

  // Degeneracy-style initial order: repeatedly take the max-degree vertex.
  std::vector<int> R(n);
  std::vector<int> deg(n, 0);
  for (int i = 0; i < n; ++i) {
    R[i] = i;
    for (int j = 0; j < n; ++j) {
      if (j != i && adj[(size_t)i * n + j]) deg[i]++;
    }
  }
  std::sort(R.begin(), R.end(), [&](int a, int b) { return deg[a] > deg[b]; });

  s.expand(R);
  for (size_t i = 0; i < s.best.size(); ++i) out_clique[i] = s.best[i];
  return (int)s.best.size();
}
