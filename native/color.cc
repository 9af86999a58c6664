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
//
// Tuned for single-core plan-build cost (VERDICT r2 item 4: stream plan
// build was edge-coloring-bound):
// - every recursion subset carries COMPACTED local edge arrays, so the
//   partner chase and pairing work in a dense [0, m) index space — from
//   the second level down the working set halves each level and quickly
//   becomes cache-resident (the old global-id version chased pointers
//   across the full-E arrays at every depth);
// - int32 ids and int32 node values halve the traffic;
// - endpoint-first walks plus a cycle sweep (the old rewind pass visited
//   every path twice);
// - per-node counting sort switches to comparison sort when the subset is
//   much smaller than the node space (the counting-sort head clear was
//   O(n_nodes) per subset, dominating deep levels).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Ctx {
  std::vector<int32_t> head;      // scratch: per-node bucket start
  std::vector<uint8_t> colors;
  int64_t n_src, n_dst;
};

// pair consecutive incident edges of each node; edges are the LOCAL ids
// 0..m-1 and `node[i]` their node on this side. partner[i] = -1 or local.
static void pair_side(Ctx &c, const std::vector<int32_t> &node,
                      int64_t n_nodes, std::vector<int32_t> &partner) {
  const size_t m = node.size();
  partner.assign(m, -1);
  if (m * 8 >= (size_t)n_nodes) {
    std::vector<int32_t> &head = c.head;
    head.assign(n_nodes + 1, 0);
    for (size_t i = 0; i < m; i++) head[node[i] + 1]++;
    for (int64_t i = 0; i < n_nodes; i++) head[i + 1] += head[i];
    std::vector<int32_t> order(m);
    {
      std::vector<int32_t> pos(head.begin(), head.end() - 1);
      for (size_t i = 0; i < m; i++) order[pos[node[i]]++] = (int32_t)i;
    }
    size_t i = 0;
    while (i < m) {
      size_t j = i;
      const int32_t nd = node[order[i]];
      while (j < m && node[order[j]] == nd) j++;
      for (size_t t = i; t + 1 < j; t += 2) {
        partner[order[t]] = order[t + 1];
        partner[order[t + 1]] = order[t];
      }
      i = j;
    }
  } else {
    // comparison sort on (node, local id) — node-space free
    std::vector<std::pair<int32_t, int32_t>> kv(m);
    for (size_t i = 0; i < m; i++) kv[i] = {node[i], (int32_t)i};
    std::sort(kv.begin(), kv.end());
    size_t i = 0;
    while (i < m) {
      size_t j = i;
      while (j < m && kv[j].first == kv[i].first) j++;
      for (size_t t = i; t + 1 < j; t += 2) {
        partner[kv[t].second] = kv[t + 1].second;
        partner[kv[t + 1].second] = kv[t].second;
      }
      i = j;
    }
  }
}

static void split(Ctx &c, std::vector<int32_t> ids,
                  std::vector<int32_t> lsrc, std::vector<int32_t> ldst,
                  int levels, int base) {
  const size_t m = ids.size();
  if (levels == 0 || m <= 1) {
    for (int32_t e : ids) c.colors[e] = (uint8_t)base;
    return;
  }
  std::vector<int32_t> pa, pb;
  pair_side(c, lsrc, c.n_src, pa);
  pair_side(c, ldst, c.n_dst, pb);

  std::vector<int32_t> h0, h1;      // LOCAL ids of the two halves
  h0.reserve(m / 2 + 1);
  h1.reserve(m / 2 + 1);
  std::vector<uint8_t> seen(m, 0);

  // pass 1: walk paths from their endpoints (an endpoint edge misses a
  // partner on one side)
  for (size_t s = 0; s < m; s++) {
    if (seen[s]) continue;
    const bool no_a = pa[s] < 0, no_b = pb[s] < 0;
    if (!no_a && !no_b) continue;           // interior edge or cycle
    bool fwd_a = no_a ? false : true;       // follow the side that exists
    int32_t cur = (int32_t)s;
    int parity = 0;
    while (true) {
      seen[cur] = 1;
      (parity ? h1 : h0).push_back(cur);
      parity ^= 1;
      const int32_t nxt = fwd_a ? pa[cur] : pb[cur];
      fwd_a = !fwd_a;
      if (nxt < 0 || seen[nxt]) break;
      cur = nxt;
    }
  }
  // pass 2: the rest are even cycles — start anywhere, direction is free
  for (size_t s = 0; s < m; s++) {
    if (seen[s]) continue;
    bool fwd_a = true;
    int32_t cur = (int32_t)s;
    int parity = 0;
    while (true) {
      seen[cur] = 1;
      (parity ? h1 : h0).push_back(cur);
      parity ^= 1;
      const int32_t nxt = fwd_a ? pa[cur] : pb[cur];
      fwd_a = !fwd_a;
      if (nxt < 0 || seen[nxt]) break;
      cur = nxt;
    }
  }
  pa.clear(); pa.shrink_to_fit();
  pb.clear(); pb.shrink_to_fit();
  seen.clear(); seen.shrink_to_fit();

  // compact each half's edge arrays so the next level works densely
  auto compact = [&](const std::vector<int32_t> &h, int lv, int b) {
    std::vector<int32_t> cids(h.size()), cs(h.size()), cd(h.size());
    for (size_t i = 0; i < h.size(); i++) {
      cids[i] = ids[h[i]];
      cs[i] = lsrc[h[i]];
      cd[i] = ldst[h[i]];
    }
    split(c, std::move(cids), std::move(cs), std::move(cd), lv, b);
  };
  compact(h0, levels - 1, base * 2);
  h0.clear(); h0.shrink_to_fit();
  compact(h1, levels - 1, base * 2 + 1);
}

}  // namespace

extern "C" {

// Colors edges; returns 0 on success. colors_out must hold n_edges bytes.
int mtxio_edge_color(int64_t n_edges, const int32_t *src, const int32_t *dst,
                     int64_t n_src, int64_t n_dst, int32_t max_colors,
                     uint8_t *colors_out) {
  if (n_edges == 0) return 0;
  if (n_edges > INT32_MAX) return 1;     // int32 edge ids internally
  if (n_src > INT32_MAX || n_dst > INT32_MAX) return 1;
  int levels = 0;
  while ((1 << levels) < max_colors) levels++;
  Ctx c;
  c.n_src = n_src;
  c.n_dst = n_dst;
  c.colors.assign(n_edges, 0);
  std::vector<int32_t> ids(n_edges);
  std::vector<int32_t> ls(src, src + n_edges), ld(dst, dst + n_edges);
  for (int64_t i = 0; i < n_edges; i++) ids[i] = (int32_t)i;
  split(c, std::move(ids), std::move(ls), std::move(ld), levels, 0);
  std::memcpy(colors_out, c.colors.data(), n_edges);
  return 0;
}

}  // extern "C"
