// Bipartite edge coloring by recursive Euler splitting (Koenig's theorem
// made constructive): colors the multigraph (src[i], dst[i]) with at most
// `max_colors` colors such that edges sharing a src node or a dst node get
// distinct colors. Needed by the static-permutation planner
// (ellspmv_tpu/ops/permute.py): every element of a routed stream is an
// edge (source granule row -> destination row) and its color is the lane
// it travels through in the 3-stage Clos route kernel. The reference has
// no analogue (its CPU kernels tolerate random access, csrspmv.c:1590);
// this is plan-time work that buys sort-free routing on the TPU.
//
// Sequential Euler-split walker: at each level, pair up the incident edges
// of every node on both sides; the pairing links form paths and even
// cycles over edges; 2-coloring them alternately splits every node degree
// in half. ceil(log2(max_colors)) levels leave each class a matching.
// O(E log maxdeg) time, trivially exact.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Ctx {
  const int64_t *src;
  const int64_t *dst;
  std::vector<int64_t> adj_pos;   // scratch: per-node cursor
  std::vector<int64_t> order;     // scratch: edges bucketed by node
  std::vector<int64_t> head;      // scratch: per-node bucket start
  std::vector<int64_t> pa, pb;    // partner arrays
  std::vector<uint8_t> colors;
  int64_t n_src, n_dst;
};

// pair consecutive incident edges of each node; side selects src/dst
static void pair_side(Ctx &c, const std::vector<int64_t> &edges,
                      bool dst_side, std::vector<int64_t> &partner) {
  const int64_t *node = dst_side ? c.dst : c.src;
  int64_t n_nodes = dst_side ? c.n_dst : c.n_src;
  // counting sort the subset's edges by node
  std::vector<int64_t> &head = c.head;
  head.assign(n_nodes + 1, 0);
  for (int64_t e : edges) head[node[e] + 1]++;
  for (int64_t i = 0; i < n_nodes; i++) head[i + 1] += head[i];
  std::vector<int64_t> &order = c.order;
  order.resize(edges.size());
  {
    std::vector<int64_t> &pos = c.adj_pos;
    pos.assign(head.begin(), head.end() - 1);
    for (int64_t e : edges) order[pos[node[e]]++] = e;
  }
  for (size_t i = 0; i < edges.size(); i++) partner[edges[i]] = -1;
  for (int64_t n = 0; n < n_nodes; n++) {
    for (int64_t i = head[n]; i + 1 < head[n + 1]; i += 2) {
      partner[order[i]] = order[i + 1];
      partner[order[i + 1]] = order[i];
    }
  }
}

static void split(Ctx &c, std::vector<int64_t> &edges, int levels,
                  int base) {
  if (levels == 0 || edges.size() <= 1) {
    for (int64_t e : edges) c.colors[e] = (uint8_t)base;
    return;
  }
  pair_side(c, edges, false, c.pa);
  pair_side(c, edges, true, c.pb);
  // walk paths/cycles alternating halves; alternate across BOTH link
  // kinds (each hop flips the side used)
  std::vector<int64_t> h0, h1;
  h0.reserve(edges.size() / 2 + 1);
  h1.reserve(edges.size() / 2 + 1);
  // visited flag: reuse colors array's high bit is unsafe; use local map
  std::vector<uint8_t> seen(edges.size(), 0);
  // index of edge within subset for `seen`: build a position map only if
  // subset is sparse relative to E — simpler: a hash-free approach using
  // a per-subset index vector
  // (edges are unique; store subset index in a temp array keyed by edge)
  static thread_local std::vector<int64_t> idx_of;
  if ((int64_t)idx_of.size() < (int64_t)c.colors.size())
    idx_of.resize(c.colors.size());
  for (size_t i = 0; i < edges.size(); i++) idx_of[edges[i]] = (int64_t)i;

  for (size_t i0 = 0; i0 < edges.size(); i0++) {
    if (seen[i0]) continue;
    int64_t start = edges[i0];
    // rewind to an endpoint: follow links starting with side A backwards
    int64_t e = start;
    bool via_a = true;  // next backward link to try is pa
    while (true) {
      int64_t p = via_a ? c.pa[e] : c.pb[e];
      if (p < 0 || p == start) break;  // endpoint or full cycle
      e = p;
      via_a = !via_a;
    }
    // forward walk from endpoint e; the first forward link is the side we
    // did NOT arrive from (for cycles, arbitrary)
    bool fwd_a = !via_a;
    int64_t cur = e;
    int parity = 0;
    while (true) {
      seen[idx_of[cur]] = 1;
      (parity ? h1 : h0).push_back(cur);
      parity ^= 1;
      int64_t nxt = fwd_a ? c.pa[cur] : c.pb[cur];
      fwd_a = !fwd_a;
      if (nxt < 0 || seen[idx_of[nxt]]) break;
      cur = nxt;
    }
  }
  edges.clear();
  edges.shrink_to_fit();
  split(c, h0, levels - 1, base * 2);
  split(c, h1, levels - 1, base * 2 + 1);
}

}  // namespace

extern "C" {

// Colors edges; returns 0 on success. colors_out must hold n_edges bytes.
int mtxio_edge_color(int64_t n_edges, const int64_t *src, const int64_t *dst,
                     int64_t n_src, int64_t n_dst, int32_t max_colors,
                     uint8_t *colors_out) {
  if (n_edges == 0) return 0;
  int levels = 0;
  while ((1 << levels) < max_colors) levels++;
  Ctx c;
  c.src = src;
  c.dst = dst;
  c.n_src = n_src;
  c.n_dst = n_dst;
  c.pa.resize(n_edges);
  c.pb.resize(n_edges);
  c.colors.assign(n_edges, 0);
  std::vector<int64_t> all(n_edges);
  for (int64_t i = 0; i < n_edges; i++) all[i] = i;
  split(c, all, levels, 0);
  std::memcpy(colors_out, c.colors.data(), n_edges);
  return 0;
}

}  // extern "C"
