// graphcore — native graph runtime for roadmap queries.
//
// The reference delegated all graph algorithms to networkx (Python):
// shortest paths for plan() (resolution.py:483-489), connected components
// for solve()'s subgraph step (resolution.py:372-376), BFS neighborhoods
// for the expansion solver (solver.py:261-282). Those run host-side in this
// framework too (graphs are tiny next to the device arrays), but on the
// 5000-100k node roadmaps the pure-Python versions start to show up in
// profiles; this C++ core gives the host the same treatment the device
// compute got.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in the image). Graphs
// arrive as CSR arrays (indptr/indices/weights), the same representation
// the .npz roadmaps store.

#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

extern "C" {

// Dijkstra shortest path on CSR. Writes the path (node ids, source first)
// into out_path (capacity out_cap); returns path length, 0 if unreachable,
// -1 on capacity overflow.
int64_t graphcore_dijkstra(
    const int64_t* indptr, const int64_t* indices, const float* weights,
    int64_t n_nodes, int64_t source, int64_t target,
    int64_t* out_path, int64_t out_cap) {
  std::vector<float> dist(n_nodes, -1.0f);
  std::vector<int64_t> prev(n_nodes, -1);
  using QE = std::pair<float, int64_t>;
  std::priority_queue<QE, std::vector<QE>, std::greater<QE>> pq;
  dist[source] = 0.0f;
  pq.push({0.0f, source});
  while (!pq.empty()) {
    auto [d, u] = pq.top();
    pq.pop();
    if (u == target) break;
    if (d > dist[u] && dist[u] >= 0.0f) continue;
    for (int64_t e = indptr[u]; e < indptr[u + 1]; ++e) {
      int64_t v = indices[e];
      float nd = d + weights[e];
      if (dist[v] < 0.0f || nd < dist[v]) {
        dist[v] = nd;
        prev[v] = u;
        pq.push({nd, v});
      }
    }
  }
  if (dist[target] < 0.0f) return 0;
  std::vector<int64_t> rev;
  for (int64_t at = target; at != -1; at = prev[at]) rev.push_back(at);
  if ((int64_t)rev.size() > out_cap) return -1;
  for (size_t i = 0; i < rev.size(); ++i) out_path[i] = rev[rev.size() - 1 - i];
  return (int64_t)rev.size();
}

// Unweighted BFS hop distances from `source` to every node (-1 unreachable).
void graphcore_bfs_distances(
    const int64_t* indptr, const int64_t* indices, int64_t n_nodes,
    int64_t source, int64_t* out_dist) {
  for (int64_t i = 0; i < n_nodes; ++i) out_dist[i] = -1;
  std::queue<int64_t> q;
  out_dist[source] = 0;
  q.push(source);
  while (!q.empty()) {
    int64_t u = q.front();
    q.pop();
    for (int64_t e = indptr[u]; e < indptr[u + 1]; ++e) {
      int64_t v = indices[e];
      if (out_dist[v] < 0) {
        out_dist[v] = out_dist[u] + 1;
        q.push(v);
      }
    }
  }
}

// Connected-component labels (0..k-1) over the whole graph.
int64_t graphcore_components(
    const int64_t* indptr, const int64_t* indices, int64_t n_nodes,
    int64_t* out_labels) {
  for (int64_t i = 0; i < n_nodes; ++i) out_labels[i] = -1;
  int64_t label = 0;
  std::vector<int64_t> stack;
  for (int64_t s = 0; s < n_nodes; ++s) {
    if (out_labels[s] >= 0) continue;
    stack.push_back(s);
    out_labels[s] = label;
    while (!stack.empty()) {
      int64_t u = stack.back();
      stack.pop_back();
      for (int64_t e = indptr[u]; e < indptr[u + 1]; ++e) {
        int64_t v = indices[e];
        if (out_labels[v] < 0) {
          out_labels[v] = label;
          stack.push_back(v);
        }
      }
    }
    ++label;
  }
  return label;
}

// k-layer BFS neighborhood of `source` (excluding source). Returns count,
// -1 on overflow.
int64_t graphcore_k_layers(
    const int64_t* indptr, const int64_t* indices, int64_t n_nodes,
    int64_t source, int64_t k, int64_t* out_nodes, int64_t out_cap) {
  std::vector<int64_t> dist(n_nodes, -1);
  std::queue<int64_t> q;
  dist[source] = 0;
  q.push(source);
  int64_t count = 0;
  while (!q.empty()) {
    int64_t u = q.front();
    q.pop();
    if (dist[u] >= k) continue;
    for (int64_t e = indptr[u]; e < indptr[u + 1]; ++e) {
      int64_t v = indices[e];
      if (dist[v] < 0) {
        dist[v] = dist[u] + 1;
        if (count >= out_cap) return -1;
        out_nodes[count++] = v;
        q.push(v);
      }
    }
  }
  return count;
}

}  // extern "C"
