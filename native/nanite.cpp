// chord_tpu native asset pipeline: meshlet clustering + Nanite-style
// cluster-LOD hierarchy builder.
//
// TPU-native equivalent of the reference's offline geometry pipeline
// (reference: source/asset/nanite_builder.cpp — meshopt clusterize ->
// METIS group -> merge -> meshopt_simplify -> split loop (GMSS) with
// monotonic DAG error propagation; vendored meshoptimizer). This is an
// independent implementation: Morton-order greedy clustering, heaviest-
// shared-edge greedy grouping (in place of METIS), and a quadric-error
// (Garland-Heckbert, subset placement) simplifier with locked group
// boundaries so LOD transitions are crack-free.
//
// Exposed via a plain C ABI (ctypes from Python) — the reference builds
// this layer in C++ for throughput and so do we; it runs at asset-import
// time on the host (SURVEY.md §2 note: CPU-heavy offline tooling in C++).
//
// Build: make -C native  ->  libchordnative.so

#include <algorithm>
#include <array>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <queue>
#include <set>
#include <unordered_map>
#include <unordered_set>
#include <deque>
#include <vector>

namespace {

constexpr int kMaxTris = 128;    // shader/base.h:430 analog (raster window)
constexpr int kMaxVerts = 255;   // shader/base.h:429 analog
constexpr int kMaxLods = 12;     // shader/base.h:431 analog
constexpr float kMinReduce = 0.8f;   // accept only >=20% reduction

struct V3 {
  float x, y, z;
  V3 operator-(const V3& o) const { return {x - o.x, y - o.y, z - o.z}; }
  V3 operator+(const V3& o) const { return {x + o.x, y + o.y, z + o.z}; }
  V3 operator*(float s) const { return {x * s, y * s, z * s}; }
};
inline float dot(const V3& a, const V3& b) {
  return a.x * b.x + a.y * b.y + a.z * b.z;
}
inline V3 cross(const V3& a, const V3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
          a.x * b.y - a.y * b.x};
}
inline float length(const V3& a) { return std::sqrt(dot(a, a)); }

// ---------------------------------------------------------------------
// Morton codes (3x21 bit)
// ---------------------------------------------------------------------
inline uint64_t spread3(uint64_t v) {
  v &= 0x1fffff;
  v = (v | (v << 32)) & 0x1f00000000ffffull;
  v = (v | (v << 16)) & 0x1f0000ff0000ffull;
  v = (v | (v << 8)) & 0x100f00f00f00f00full;
  v = (v | (v << 4)) & 0x10c30c30c30c30c3ull;
  v = (v | (v << 2)) & 0x1249249249249249ull;
  return v;
}

// ---------------------------------------------------------------------
// Meshlet output record (matches the Python MeshletData fields)
// ---------------------------------------------------------------------
struct MeshletRec {
  int tri_offset;     // into the output index stream (triangle units)
  int tri_count;
  float sphere[4];
  float cone[4];      // axis.xyz + cutoff
  float lod_error;        // error of the geometry this cluster represents
  float parent_error;     // error of the coarser replacement (inf = root)
  float lod_sphere[4];    // projection sphere for own error
  float parent_sphere[4]; // projection sphere for parent error
  int lod_level;
};

struct Builder {
  const float* pos;
  int n_verts;
  std::vector<int> out_indices;        // reordered triangle index stream
  std::vector<MeshletRec> meshlets;

  V3 p(int i) const { return {pos[3 * i], pos[3 * i + 1], pos[3 * i + 2]}; }

  // Ritter-ish bounding sphere of a vertex set.
  void boundingSphere(const std::vector<int>& verts, float out[4]) const {
    V3 lo = {FLT_MAX, FLT_MAX, FLT_MAX}, hi = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
    for (int v : verts) {
      V3 q = p(v);
      lo = {std::min(lo.x, q.x), std::min(lo.y, q.y), std::min(lo.z, q.z)};
      hi = {std::max(hi.x, q.x), std::max(hi.y, q.y), std::max(hi.z, q.z)};
    }
    V3 c = (lo + hi) * 0.5f;
    float r2 = 0.f;
    for (int v : verts) {
      V3 d = p(v) - c;
      r2 = std::max(r2, dot(d, d));
    }
    out[0] = c.x; out[1] = c.y; out[2] = c.z; out[3] = std::sqrt(r2);
  }

  // Pack a triangle list (Morton-sorted) into meshlets; returns the ids of
  // meshlets created. `lod_error` and `level` fill the LOD fields.
  std::vector<int> packMeshlets(std::vector<std::array<int, 3>> tris,
                                float lod_error, int level,
                                const float* lod_sphere /*or null*/) {
    // sort by morton of centroid
    V3 lo = {FLT_MAX, FLT_MAX, FLT_MAX}, hi = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
    std::vector<V3> cent(tris.size());
    for (size_t t = 0; t < tris.size(); ++t) {
      V3 c = (p(tris[t][0]) + p(tris[t][1]) + p(tris[t][2])) * (1.f / 3.f);
      cent[t] = c;
      lo = {std::min(lo.x, c.x), std::min(lo.y, c.y), std::min(lo.z, c.z)};
      hi = {std::max(hi.x, c.x), std::max(hi.y, c.y), std::max(hi.z, c.z)};
    }
    V3 ext = hi - lo;
    ext.x = std::max(ext.x, 1e-12f);
    ext.y = std::max(ext.y, 1e-12f);
    ext.z = std::max(ext.z, 1e-12f);
    std::vector<std::pair<uint64_t, int>> order(tris.size());
    for (size_t t = 0; t < tris.size(); ++t) {
      uint64_t qx = (uint64_t)((cent[t].x - lo.x) / ext.x * 2097151.f);
      uint64_t qy = (uint64_t)((cent[t].y - lo.y) / ext.y * 2097151.f);
      uint64_t qz = (uint64_t)((cent[t].z - lo.z) / ext.z * 2097151.f);
      order[t] = {spread3(qx) | (spread3(qy) << 1) | (spread3(qz) << 2),
                  (int)t};
    }
    std::sort(order.begin(), order.end());

    std::vector<int> created;
    std::unordered_set<int> seen;
    int count = 0;
    int start_tri = (int)out_indices.size() / 3;

    auto flush = [&](int end_excl) {
      if (count == 0) return;
      MeshletRec rec{};
      rec.tri_offset = start_tri;
      rec.tri_count = count;
      std::vector<int> verts(seen.begin(), seen.end());
      boundingSphere(verts, rec.sphere);
      // normal cone
      V3 axis = {0, 0, 0};
      std::vector<V3> fns;
      for (int t = start_tri; t < start_tri + count; ++t) {
        V3 a = p(out_indices[3 * t]), b = p(out_indices[3 * t + 1]),
           c = p(out_indices[3 * t + 2]);
        V3 fn = cross(b - a, c - a);
        float l = length(fn);
        if (l > 1e-20f) { fn = fn * (1.f / l); fns.push_back(fn); axis = axis + fn; }
      }
      float al = length(axis);
      if (al > 1e-12f && !fns.empty()) {
        axis = axis * (1.f / al);
        float min_dot = 1.f;
        for (const V3& f : fns) min_dot = std::min(min_dot, dot(f, axis));
        rec.cone[0] = axis.x; rec.cone[1] = axis.y; rec.cone[2] = axis.z;
        rec.cone[3] = min_dot > 0.f
            ? std::sqrt(std::max(0.f, 1.f - min_dot * min_dot)) : 1.f;
      } else {
        rec.cone[3] = 1.f;
      }
      rec.lod_error = lod_error;
      rec.parent_error = 3e38f;   // set when grouped at the next level
      if (lod_sphere) memcpy(rec.lod_sphere, lod_sphere, 4 * sizeof(float));
      else memcpy(rec.lod_sphere, rec.sphere, 4 * sizeof(float));
      memcpy(rec.parent_sphere, rec.lod_sphere, 4 * sizeof(float));
      rec.lod_level = level;
      created.push_back((int)meshlets.size());
      meshlets.push_back(rec);
      seen.clear();
      count = 0;
      start_tri = (int)out_indices.size() / 3;
    };

    for (auto& [_, ti] : order) {
      auto& tr = tris[ti];
      int newv = 0;
      for (int k = 0; k < 3; ++k) newv += seen.count(tr[k]) ? 0 : 1;
      if (count >= kMaxTris ||
          (count > 0 && (int)seen.size() + newv > kMaxVerts)) {
        flush(0);
      }
      for (int k = 0; k < 3; ++k) {
        out_indices.push_back(tr[k]);
        seen.insert(tr[k]);
      }
      ++count;
    }
    flush(0);
    return created;
  }
};

// ---------------------------------------------------------------------
// Quadric-error simplification (subset placement, locked boundaries)
// ---------------------------------------------------------------------
struct Quadric {
  // symmetric 4x4: a2 ab ac ad | b2 bc bd | c2 cd | d2
  double q[10] = {0};
  void addPlane(double a, double b, double c, double d, double w) {
    q[0] += w * a * a; q[1] += w * a * b; q[2] += w * a * c; q[3] += w * a * d;
    q[4] += w * b * b; q[5] += w * b * c; q[6] += w * b * d;
    q[7] += w * c * c; q[8] += w * c * d;
    q[9] += w * d * d;
  }
  void add(const Quadric& o) { for (int i = 0; i < 10; ++i) q[i] += o.q[i]; }
  double eval(double x, double y, double z) const {
    return q[0]*x*x + 2*q[1]*x*y + 2*q[2]*x*z + 2*q[3]*x +
           q[4]*y*y + 2*q[5]*y*z + 2*q[6]*y +
           q[7]*z*z + 2*q[8]*z + q[9];
  }
};

struct SimplifyResult {
  std::vector<std::array<int, 3>> tris;
  float error;        // max sqrt(quadric) introduced (world units)
};

// Simplify `tris` (indices into pos) to <= target_tris. Vertices in
// `locked` never move. Subset placement (collapse to an endpoint).
SimplifyResult simplifyGroup(const float* pos,
                             std::vector<std::array<int, 3>> tris,
                             const std::unordered_set<int>& locked,
                             int target_tris) {
  auto P = [&](int i) {
    return V3{pos[3 * i], pos[3 * i + 1], pos[3 * i + 2]};
  };
  // per-vertex quadrics
  std::unordered_map<int, Quadric> quad;
  std::unordered_map<int, std::vector<int>> vert_tris;
  for (size_t t = 0; t < tris.size(); ++t) {
    V3 a = P(tris[t][0]), b = P(tris[t][1]), c = P(tris[t][2]);
    V3 n = cross(b - a, c - a);
    float area2 = length(n);
    if (area2 > 1e-20f) {
      n = n * (1.f / area2);
      double d = -(double)dot(n, a);
      for (int k = 0; k < 3; ++k)
        quad[tris[t][k]].addPlane(n.x, n.y, n.z, d, area2 * 0.5);
    }
    for (int k = 0; k < 3; ++k) vert_tris[tris[t][k]].push_back((int)t);
  }

  std::vector<char> dead(tris.size(), 0);
  std::unordered_map<int, int> remap;   // collapsed vertex -> target
  auto find = [&](int v) {
    while (remap.count(v)) v = remap[v];
    return v;
  };

  int live = (int)tris.size();
  float max_err = 0.f;

  struct Cand { double cost; int vsrc, vdst; };
  auto cmp = [](const Cand& a, const Cand& b) { return a.cost > b.cost; };
  std::priority_queue<Cand, std::vector<Cand>, decltype(cmp)> heap(cmp);

  auto pushEdges = [&](int t) {
    for (int k = 0; k < 3; ++k) {
      int v0 = find(tris[t][k]);
      int v1 = find(tris[t][(k + 1) % 3]);
      if (v0 == v1) continue;
      // try both directions (collapse src into dst)
      for (int dir = 0; dir < 2; ++dir) {
        int s = dir ? v1 : v0, d = dir ? v0 : v1;
        if (locked.count(s)) continue;      // locked vertices never move
        V3 dp = P(d);
        Quadric qq = quad[s];
        qq.add(quad[d]);
        double cost = qq.eval(dp.x, dp.y, dp.z);
        heap.push({cost, s, d});
      }
    }
  };
  for (size_t t = 0; t < tris.size(); ++t) pushEdges((int)t);

  while (live > target_tris && !heap.empty()) {
    Cand c = heap.top();
    heap.pop();
    int s = find(c.vsrc), d = find(c.vdst);
    if (s != c.vsrc || d != c.vdst || s == d) continue;   // stale
    if (locked.count(s)) continue;
    // collapse s -> d
    Quadric merged = quad[s];
    merged.add(quad[d]);
    V3 dp = P(d);
    double cost = merged.eval(dp.x, dp.y, dp.z);
    if (cost > c.cost * 1.5 + 1e-12) {      // stale cost; re-push
      heap.push({cost, s, d});
      continue;
    }
    remap[s] = d;
    quad[d] = merged;
    max_err = std::max(max_err, (float)std::sqrt(std::max(0.0, cost)));
    // update triangles touching s
    auto& ts = vert_tris[s];
    auto& td = vert_tris[d];
    for (int t : ts) {
      if (dead[t]) continue;
      int a = find(tris[t][0]), b = find(tris[t][1]), e = find(tris[t][2]);
      if (a == b || b == e || a == e) {
        dead[t] = 1;
        --live;
      } else {
        td.push_back(t);
        pushEdges(t);
      }
    }
  }

  SimplifyResult r;
  r.error = max_err;
  std::set<std::array<int, 3>> uniq;
  for (size_t t = 0; t < tris.size(); ++t) {
    if (dead[t]) continue;
    std::array<int, 3> tr = {find(tris[t][0]), find(tris[t][1]),
                             find(tris[t][2])};
    if (tr[0] == tr[1] || tr[1] == tr[2] || tr[0] == tr[2]) continue;
    r.tris.push_back(tr);
  }
  return r;
}

// ---------------------------------------------------------------------
// Grouping: greedy heaviest-shared-edge merging into groups of <= 4
// (the reference uses METIS graph partitioning, nanite_builder.cpp:14-16)
// ---------------------------------------------------------------------
std::vector<std::vector<int>> groupMeshlets(
    const Builder& b, const std::vector<int>& ids) {
  // adjacency weights = shared (undirected) edge count between meshlets
  std::unordered_map<uint64_t, int> edge_owner;  // edge -> meshlet id idx
  std::map<std::pair<int, int>, int> weight;
  for (size_t mi = 0; mi < ids.size(); ++mi) {
    const MeshletRec& m = b.meshlets[ids[mi]];
    for (int t = m.tri_offset; t < m.tri_offset + m.tri_count; ++t) {
      for (int k = 0; k < 3; ++k) {
        int v0 = b.out_indices[3 * t + k];
        int v1 = b.out_indices[3 * t + (k + 1) % 3];
        uint64_t key = v0 < v1 ? ((uint64_t)v0 << 32) | (uint32_t)v1
                               : ((uint64_t)v1 << 32) | (uint32_t)v0;
        auto it = edge_owner.find(key);
        if (it == edge_owner.end()) {
          edge_owner[key] = (int)mi;
        } else if (it->second != (int)mi) {
          int lo_ = std::min((int)mi, it->second);
          int hi_ = std::max((int)mi, it->second);
          weight[{lo_, hi_}]++;
        }
      }
    }
  }
  // two rounds of greedy matching: meshlets -> pairs -> quads
  int n = (int)ids.size();
  std::vector<int> parent(n);
  for (int i = 0; i < n; ++i) parent[i] = i;
  std::vector<std::vector<int>> groups;
  std::vector<char> used(n, 0);
  std::vector<std::tuple<int, int, int>> edges;   // (-w, a, b)
  for (auto& [pr, w] : weight) edges.push_back({-w, pr.first, pr.second});
  std::sort(edges.begin(), edges.end());

  std::vector<std::vector<int>> partial;   // pairs (or singletons)
  {
    std::vector<char> taken(n, 0);
    for (auto& [nw, a, bidx] : edges) {
      if (!taken[a] && !taken[bidx]) {
        taken[a] = taken[bidx] = 1;
        partial.push_back({a, bidx});
      }
    }
    for (int i = 0; i < n; ++i)
      if (!taken[i]) partial.push_back({i});
  }
  // pair the pairs by summed weights
  int m2 = (int)partial.size();
  std::map<std::pair<int, int>, int> w2;
  {
    std::vector<int> owner(n, -1);
    for (int g = 0; g < m2; ++g)
      for (int x : partial[g]) owner[x] = g;
    for (auto& [pr, w] : weight) {
      int ga = owner[pr.first], gb = owner[pr.second];
      if (ga != gb) {
        w2[{std::min(ga, gb), std::max(ga, gb)}] += w;
      }
    }
  }
  std::vector<std::tuple<int, int, int>> e2;
  for (auto& [pr, w] : w2) e2.push_back({-w, pr.first, pr.second});
  std::sort(e2.begin(), e2.end());
  std::vector<char> taken2(m2, 0);
  for (auto& [nw, a, bidx] : e2) {
    if (!taken2[a] && !taken2[bidx]) {
      taken2[a] = taken2[bidx] = 1;
      std::vector<int> g = partial[a];
      g.insert(g.end(), partial[bidx].begin(), partial[bidx].end());
      groups.push_back(g);
    }
  }
  for (int g = 0; g < m2; ++g)
    if (!taken2[g]) groups.push_back(partial[g]);
  // map local indices back to meshlet ids
  for (auto& g : groups)
    for (auto& x : g) x = ids[x];
  return groups;
}

}  // namespace

extern "C" {

// Build the full cluster-LOD hierarchy.
// Outputs (caller-allocated, capacities in *_cap):
//   out_indices     int32[idx_cap*3]   reordered+simplified index stream
//   out_meshlets    float/int mixed via parallel arrays below
// Returns 0 on success, -1 if capacities are too small.
int chord_nanite_build(
    const float* positions, int n_verts,
    const int* indices, int n_tris,
    int build_lods,                     // 0 = meshlets only (LOD0)
    // outputs
    int* out_indices, int idx_cap_tris,
    int* out_tri_offset, int* out_tri_count, int* out_lod_level,
    float* out_sphere, float* out_cone,
    float* out_lod_error, float* out_parent_error,
    float* out_lod_sphere, float* out_parent_sphere,
    int meshlet_cap,
    int* out_n_meshlets, int* out_n_tris_total) {
  Builder b;
  b.pos = positions;
  b.n_verts = n_verts;

  std::vector<std::array<int, 3>> tris(n_tris);
  for (int t = 0; t < n_tris; ++t)
    tris[t] = {indices[3 * t], indices[3 * t + 1], indices[3 * t + 2]};

  std::vector<int> cur = b.packMeshlets(std::move(tris), 0.f, 0, nullptr);

  if (build_lods) {
    for (int level = 1; level < kMaxLods && cur.size() > 1; ++level) {
      auto groups = groupMeshlets(b, cur);
      std::vector<int> next;
      for (auto& g : groups) {
        if (g.size() < 2) continue;   // singleton: stays a root for now
        // merge group triangles
        std::vector<std::array<int, 3>> gtris;
        std::unordered_map<int, int> edge_count;
        std::vector<int> gverts;
        for (int mid : g) {
          const MeshletRec& m = b.meshlets[mid];
          for (int t = m.tri_offset; t < m.tri_offset + m.tri_count; ++t)
            gtris.push_back({b.out_indices[3 * t], b.out_indices[3 * t + 1],
                             b.out_indices[3 * t + 2]});
        }
        // boundary lock: vertices of edges used exactly once in the group
        std::unordered_map<uint64_t, int> ec;
        for (auto& tr : gtris)
          for (int k = 0; k < 3; ++k) {
            int v0 = tr[k], v1 = tr[(k + 1) % 3];
            uint64_t key = v0 < v1 ? ((uint64_t)v0 << 32) | (uint32_t)v1
                                   : ((uint64_t)v1 << 32) | (uint32_t)v0;
            ec[key]++;
          }
        std::unordered_set<int> locked;
        for (auto& [key, cnt] : ec)
          if (cnt == 1) {
            locked.insert((int)(key >> 32));
            locked.insert((int)(key & 0xffffffffu));
          }

        int target = (int)gtris.size() / 2;
        SimplifyResult sr = simplifyGroup(positions, gtris, locked, target);
        if ((float)sr.tris.size() > kMinReduce * (float)gtris.size())
          continue;   // not enough reduction; group stays as roots

        // group error: monotonic over children (nanite_builder GMSS rule)
        float child_max = 0.f;
        for (int mid : g)
          child_max = std::max(child_max, b.meshlets[mid].lod_error);
        float group_error = std::max(sr.error, child_max);

        // group sphere over all group vertices
        std::vector<int> vset;
        {
          std::unordered_set<int> vs;
          for (auto& tr : gtris)
            for (int k = 0; k < 3; ++k) vs.insert(tr[k]);
          vset.assign(vs.begin(), vs.end());
        }
        float gsphere[4];
        b.boundingSphere(vset, gsphere);

        // children: parent error + sphere
        for (int mid : g) {
          b.meshlets[mid].parent_error = group_error;
          memcpy(b.meshlets[mid].parent_sphere, gsphere, 4 * sizeof(float));
        }
        // parents: the simplified geometry as new meshlets
        std::vector<int> parents =
            b.packMeshlets(std::move(sr.tris), group_error, level, gsphere);
        next.insert(next.end(), parents.begin(), parents.end());
      }
      if (next.empty()) break;
      cur = std::move(next);
    }
  }

  if ((int)b.meshlets.size() > meshlet_cap ||
      (int)b.out_indices.size() / 3 > idx_cap_tris)
    return -1;

  memcpy(out_indices, b.out_indices.data(),
         b.out_indices.size() * sizeof(int));
  for (size_t i = 0; i < b.meshlets.size(); ++i) {
    const MeshletRec& m = b.meshlets[i];
    out_tri_offset[i] = m.tri_offset;
    out_tri_count[i] = m.tri_count;
    out_lod_level[i] = m.lod_level;
    memcpy(out_sphere + 4 * i, m.sphere, 4 * sizeof(float));
    memcpy(out_cone + 4 * i, m.cone, 4 * sizeof(float));
    out_lod_error[i] = m.lod_error;
    out_parent_error[i] = m.parent_error;
    memcpy(out_lod_sphere + 4 * i, m.lod_sphere, 4 * sizeof(float));
    memcpy(out_parent_sphere + 4 * i, m.parent_sphere, 4 * sizeof(float));
  }
  *out_n_meshlets = (int)b.meshlets.size();
  *out_n_tris_total = (int)b.out_indices.size() / 3;
  return 0;
}

// Area-weighted vertex normals (asset-import helper; the reference does
// this + mikktspace tangents in C++, asset_gltf_helper.cpp).
void chord_vertex_normals(const float* positions, int n_verts,
                          const int* indices, int n_tris, float* out) {
  std::vector<double> acc(3 * (size_t)n_verts, 0.0);
  for (int t = 0; t < n_tris; ++t) {
    int i0 = indices[3 * t], i1 = indices[3 * t + 1], i2 = indices[3 * t + 2];
    V3 a = {positions[3 * i0], positions[3 * i0 + 1], positions[3 * i0 + 2]};
    V3 b = {positions[3 * i1], positions[3 * i1 + 1], positions[3 * i1 + 2]};
    V3 c = {positions[3 * i2], positions[3 * i2 + 1], positions[3 * i2 + 2]};
    V3 fn = cross(b - a, c - a);
    for (int k : {i0, i1, i2}) {
      acc[3 * k] += fn.x;
      acc[3 * k + 1] += fn.y;
      acc[3 * k + 2] += fn.z;
    }
  }
  for (int v = 0; v < n_verts; ++v) {
    double x = acc[3 * v], y = acc[3 * v + 1], z = acc[3 * v + 2];
    double l = std::sqrt(x * x + y * y + z * z);
    if (l < 1e-20) { x = 0; y = 1; z = 0; l = 1; }
    out[3 * v] = (float)(x / l);
    out[3 * v + 1] = (float)(y / l);
    out[3 * v + 2] = (float)(z / l);
  }
}

// ---------------------------------------------------------------------
// 8-wide BVH over leaf bounding spheres.
// TPU-native analog of the reference's cluster-group BVH
// (reference: source/asset/nanite_builder.cpp:77-313 — 8 children per
// node via 2x2x2 longest-axis median splits, <=14 levels, flatten with
// subtree counts, struct shader/gltf.h:16-24 GPUBVHNode). Divergence:
// the reference flattens BREADTH-first and traverses via the children
// indices; we flatten DEPTH-first pre-order so the subtree count doubles
// as a skip pointer — a branch-free linear scan (miss => i += count[i])
// suits a vector machine better than a per-ray work queue. Both the
// children indices and the counts are emitted, so either traversal works.

namespace {

struct BvhTmp {
  float sph[4];
  int child[8];
  int leaf_id;    // >= 0 for leaves
};

void sphereOfSpheres(const float* spheres, const std::vector<int>& ids,
                     float out[4]) {
  double cx = 0, cy = 0, cz = 0;
  for (int i : ids) {
    cx += spheres[4 * i];
    cy += spheres[4 * i + 1];
    cz += spheres[4 * i + 2];
  }
  double n = std::max<size_t>(ids.size(), 1);
  cx /= n; cy /= n; cz /= n;
  double r = 0;
  for (int i : ids) {
    double dx = spheres[4 * i] - cx, dy = spheres[4 * i + 1] - cy,
           dz = spheres[4 * i + 2] - cz;
    r = std::max(r, std::sqrt(dx * dx + dy * dy + dz * dz) +
                        spheres[4 * i + 3]);
  }
  out[0] = (float)cx; out[1] = (float)cy; out[2] = (float)cz;
  out[3] = (float)r;
}

int buildBvhNode(const float* spheres, std::vector<int> elems,
                 std::vector<BvhTmp>& nodes, int level) {
  int idx = (int)nodes.size();
  nodes.push_back({});
  BvhTmp& stub = nodes[idx];
  sphereOfSpheres(spheres, elems, stub.sph);
  for (int k = 0; k < 8; ++k) stub.child[k] = -1;
  stub.leaf_id = -1;
  if (elems.size() == 1) {
    nodes[idx].leaf_id = elems[0];
    return idx;
  }
  // 2x2x2 median splits on x, then y, then z (nanite_builder.cpp:102-200
  // longest-axis behavior approximated by fixed axis order — adequate
  // for near-isotropic scene distributions and deterministic)
  auto median_split = [&](std::vector<int>& ids, int axis,
                          std::vector<int>& lo, std::vector<int>& hi) {
    std::sort(ids.begin(), ids.end(), [&](int a, int b) {
      return spheres[4 * a + axis] < spheres[4 * b + axis];
    });
    size_t mid = ids.size() / 2;
    lo.assign(ids.begin(), ids.begin() + mid);
    hi.assign(ids.begin() + mid, ids.end());
  };
  std::vector<int> half[2], quad[4], oct[8];
  median_split(elems, 0, half[0], half[1]);
  for (int h = 0; h < 2; ++h)
    median_split(half[h], 1, quad[2 * h], quad[2 * h + 1]);
  for (int q = 0; q < 4; ++q)
    median_split(quad[q], 2, oct[2 * q], oct[2 * q + 1]);
  int nchild = 0;
  for (int k = 0; k < 8; ++k) {
    if (oct[k].empty()) continue;
    int c;
    if (level + 1 >= 14 && oct[k].size() > 1) {
      // level cap: degenerate to a leaf per element chained as children
      // (cannot happen for < 8^14 elements, kept for safety)
      c = buildBvhNode(spheres, {oct[k][0]}, nodes, level + 1);
    } else {
      c = buildBvhNode(spheres, std::move(oct[k]), nodes, level + 1);
    }
    nodes[idx].child[nchild++] = c;
  }
  return idx;
}

// DFS pre-order re-flatten with subtree counts (children of a node are
// its immediate successors' subtrees, contiguous).
int reflatten(const std::vector<BvhTmp>& nodes, int src,
              float* out_sphere, int* out_children, int* out_count,
              int* out_leaf, int& cursor) {
  int dst = cursor++;
  memcpy(out_sphere + 4 * dst, nodes[src].sph, 4 * sizeof(float));
  out_leaf[dst] = nodes[src].leaf_id;
  int count = 1;
  int nchild = 0;
  int kids[8];
  for (int k = 0; k < 8; ++k) kids[k] = -1;
  for (int k = 0; k < 8; ++k) {
    int c = nodes[src].child[k];
    if (c < 0) continue;
    kids[nchild++] = reflatten(nodes, c, out_sphere, out_children,
                               out_count, out_leaf, cursor);
  }
  for (int k = 0; k < 8; ++k) out_children[8 * dst + k] = kids[k];
  for (int k = 0; k < nchild; ++k) count += out_count[kids[k]];
  out_count[dst] = count;
  return dst;
}

}  // namespace

// Build an 8-wide BVH over n leaf spheres (float4 xyzr each).
// Outputs per node: sphere (4f), children (8 ints, -1 pad), subtree node
// count (skip pointer in DFS order), leaf element id (-1 internal).
// Returns 0 on success, -1 if node_cap too small.
int chord_bvh_build(const float* spheres, int n,
                    float* out_sphere, int* out_children,
                    int* out_count, int* out_leaf,
                    int node_cap, int* out_n_nodes) {
  if (n <= 0) { *out_n_nodes = 0; return 0; }
  std::vector<BvhTmp> nodes;
  nodes.reserve(2 * (size_t)n);
  std::vector<int> all(n);
  for (int i = 0; i < n; ++i) all[i] = i;
  buildBvhNode(spheres, std::move(all), nodes, 0);
  if ((int)nodes.size() > node_cap) return -1;
  int cursor = 0;
  reflatten(nodes, 0, out_sphere, out_children, out_count, out_leaf,
            cursor);
  *out_n_nodes = cursor;
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------
// The job system lives in native/jobsys.cpp (work-stealing pool with
// dependency graphs); the batch driver below runs on it through
// chord_parallel_for.
// ---------------------------------------------------------------------

#include <atomic>

extern "C" {

// chord_parallel_for is defined in jobsys.cpp
typedef void (*chord_for_fn)(int i, void* user);
void chord_parallel_for(int n, chord_for_fn fn, void* user);

// Batch Nanite build: meshes packed back-to-back; per-mesh outputs are
// written into per-mesh slices (caller precomputes capacities).
int chord_nanite_build_batch(
    int n_meshes,
    const float* const* positions, const int* n_verts,
    const int* const* indices, const int* n_tris,
    int build_lods,
    int* const* out_indices, const int* idx_caps,
    int* const* out_tri_offset, int* const* out_tri_count,
    int* const* out_lod_level,
    float* const* out_sphere, float* const* out_cone,
    float* const* out_lod_error, float* const* out_parent_error,
    float* const* out_lod_sphere, float* const* out_parent_sphere,
    const int* meshlet_caps,
    int* out_n_meshlets, int* out_n_tris_total) {
  std::atomic<int> rc{0};
  struct Ctx {
    int n_meshes;
    const float* const* positions; const int* n_verts;
    const int* const* indices; const int* n_tris;
    int build_lods;
    int* const* out_indices; const int* idx_caps;
    int* const* out_tri_offset; int* const* out_tri_count;
    int* const* out_lod_level;
    float* const* out_sphere; float* const* out_cone;
    float* const* out_lod_error; float* const* out_parent_error;
    float* const* out_lod_sphere; float* const* out_parent_sphere;
    const int* meshlet_caps;
    int* out_n_meshlets; int* out_n_tris_total;
    std::atomic<int>* rc;
  } ctx{n_meshes, positions, n_verts, indices, n_tris, build_lods,
        out_indices, idx_caps, out_tri_offset, out_tri_count, out_lod_level,
        out_sphere, out_cone, out_lod_error, out_parent_error,
        out_lod_sphere, out_parent_sphere, meshlet_caps,
        out_n_meshlets, out_n_tris_total, &rc};
  chord_parallel_for(
      n_meshes,
      [](int i, void* user) {
        Ctx* c = (Ctx*)user;
        int r = chord_nanite_build(
            c->positions[i], c->n_verts[i], c->indices[i], c->n_tris[i],
            c->build_lods, c->out_indices[i], c->idx_caps[i],
            c->out_tri_offset[i], c->out_tri_count[i], c->out_lod_level[i],
            c->out_sphere[i], c->out_cone[i], c->out_lod_error[i],
            c->out_parent_error[i], c->out_lod_sphere[i],
            c->out_parent_sphere[i], c->meshlet_caps[i],
            &c->out_n_meshlets[i], &c->out_n_tris_total[i]);
        if (r != 0) c->rc->store(r);
      },
      &ctx);
  return rc.load();
}

}  // extern "C"
