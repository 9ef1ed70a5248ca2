// Native geometry kernels for garmentdreamer_tpu (host-side mesh processing).
//
// TPU-native replacements for the reference's host geometry dependencies:
//  * decimate()       -- quadric-error-metric edge-collapse simplification
//                        (replaces pymeshlab/kiui decimate_mesh used at
//                        reference deformer/utils/io.py:25-36, target 40k faces,
//                        preserveboundary=True)
//  * remesh()         -- Botsch-Kobbelt incremental isotropic remeshing:
//                        split/collapse/flip/tangential-smooth + projection to
//                        the input surface (replaces gpytoolbox.remesh_botsch
//                        used at reference deformation.py:279)
//  * marching_cubes() -- scalar-grid isosurface extraction (replaces the
//                        skimage/meshudf Cython extraction, reference
//                        meshudf/_marching_cubes_lewiner_cy.pyx)
//
// C ABI over raw buffers; Python binds via ctypes (see ../geometry.py).
// All algorithms operate on manifold-with-boundary triangle meshes.

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <map>
#include <queue>
#include <set>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

struct V3 {
  double x = 0, y = 0, z = 0;
  V3() = default;
  V3(double a, double b, double c) : x(a), y(b), z(c) {}
  V3 operator+(const V3& o) const { return {x + o.x, y + o.y, z + o.z}; }
  V3 operator-(const V3& o) const { return {x - o.x, y - o.y, z - o.z}; }
  V3 operator*(double s) const { return {x * s, y * s, z * s}; }
  double dot(const V3& o) const { return x * o.x + y * o.y + z * o.z; }
  V3 cross(const V3& o) const {
    return {y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x};
  }
  double norm() const { return std::sqrt(dot(*this)); }
  V3 normalized() const {
    double n = norm();
    return n > 1e-30 ? (*this) * (1.0 / n) : V3();
  }
};

using Face = std::array<int, 3>;

uint64_t ekey(int a, int b) {
  if (a > b) std::swap(a, b);
  return (uint64_t(uint32_t(a)) << 32) | uint32_t(b);
}

// ---------------------------------------------------------------------------
// Symmetric 4x4 quadric (10 coefficients)
// ---------------------------------------------------------------------------
struct Quadric {
  double a[10] = {0};  // xx xy xz xw yy yz yw zz zw ww
  void addPlane(const V3& n, double d, double w = 1.0) {
    double v[4] = {n.x, n.y, n.z, d};
    int k = 0;
    for (int i = 0; i < 4; i++)
      for (int j = i; j < 4; j++) a[k++] += w * v[i] * v[j];
  }
  Quadric operator+(const Quadric& o) const {
    Quadric q;
    for (int i = 0; i < 10; i++) q.a[i] = a[i] + o.a[i];
    return q;
  }
  double eval(const V3& p) const {
    const double x = p.x, y = p.y, z = p.z;
    return a[0] * x * x + 2 * a[1] * x * y + 2 * a[2] * x * z + 2 * a[3] * x +
           a[4] * y * y + 2 * a[5] * y * z + 2 * a[6] * y + a[7] * z * z +
           2 * a[8] * z + a[9];
  }
  // solve for the minimizer; returns false if near-singular
  bool minimizer(V3* out) const {
    double m[9] = {a[0], a[1], a[2], a[1], a[4], a[5], a[2], a[5], a[7]};
    double b[3] = {-a[3], -a[6], -a[8]};
    // Cramer with det check
    double det = m[0] * (m[4] * m[8] - m[5] * m[7]) -
                 m[1] * (m[3] * m[8] - m[5] * m[6]) +
                 m[2] * (m[3] * m[7] - m[4] * m[6]);
    if (std::fabs(det) < 1e-12) return false;
    double inv = 1.0 / det;
    out->x = inv * (b[0] * (m[4] * m[8] - m[5] * m[7]) -
                    m[1] * (b[1] * m[8] - m[5] * b[2]) +
                    m[2] * (b[1] * m[7] - m[4] * b[2]));
    out->y = inv * (m[0] * (b[1] * m[8] - m[5] * b[2]) -
                    b[0] * (m[3] * m[8] - m[5] * m[6]) +
                    m[2] * (m[3] * b[2] - b[1] * m[6]));
    out->z = inv * (m[0] * (m[4] * b[2] - b[1] * m[7]) -
                    m[1] * (m[3] * b[2] - b[1] * m[6]) +
                    b[0] * (m[3] * m[7] - m[4] * m[6]));
    return true;
  }
};

// ---------------------------------------------------------------------------
// Editable mesh with adjacency
// ---------------------------------------------------------------------------
struct EditMesh {
  std::vector<V3> verts;
  std::vector<Face> faces;                 // dead faces marked {-1,-1,-1}
  std::vector<std::vector<int>> vfaces;    // vertex -> incident face ids
  std::vector<char> vdead;

  void build(const double* v, int64_t nv, const int32_t* f, int64_t nf) {
    verts.resize(nv);
    for (int64_t i = 0; i < nv; i++) verts[i] = {v[3 * i], v[3 * i + 1], v[3 * i + 2]};
    faces.resize(nf);
    vfaces.assign(nv, {});
    vdead.assign(nv, 0);
    for (int64_t i = 0; i < nf; i++) {
      faces[i] = {f[3 * i], f[3 * i + 1], f[3 * i + 2]};
      for (int k = 0; k < 3; k++) vfaces[faces[i][k]].push_back((int)i);
    }
  }
  bool faceAlive(int fi) const { return faces[fi][0] >= 0; }
  V3 faceNormal(int fi) const {
    const Face& F = faces[fi];
    return (verts[F[1]] - verts[F[0]]).cross(verts[F[2]] - verts[F[0]]);
  }
  int liveFaceCount() const {
    int c = 0;
    for (auto& F : faces)
      if (F[0] >= 0) c++;
    return c;
  }
  static bool faceHas(const Face& F, int v) {
    return F[0] == v || F[1] == v || F[2] == v;
  }
  void neighbors(int v, std::unordered_set<int>* out) const {
    for (int fi : vfaces[v]) {
      if (!faceAlive(fi) || !faceHas(faces[fi], v)) continue;  // skip stale
      for (int k = 0; k < 3; k++)
        if (faces[fi][k] != v) out->insert(faces[fi][k]);
    }
  }
  // number of live faces containing edge (a,b)
  int edgeFaceCount(int a, int b) const {
    int c = 0;
    for (int fi : vfaces[a]) {
      if (!faceAlive(fi) || !faceHas(faces[fi], a)) continue;
      if (faceHas(faces[fi], b)) c++;
    }
    return c;
  }
  void compact(std::vector<double>* vout, std::vector<int32_t>* fout) const {
    std::vector<int> remap(verts.size(), -1);
    for (size_t fi = 0; fi < faces.size(); fi++) {
      if (!faceAlive((int)fi)) continue;
      for (int k = 0; k < 3; k++) remap[faces[fi][k]] = 0;
    }
    int nv = 0;
    for (size_t i = 0; i < verts.size(); i++)
      if (remap[i] == 0) remap[i] = nv++;
    vout->resize(3 * nv);
    for (size_t i = 0; i < verts.size(); i++) {
      if (remap[i] < 0) continue;
      (*vout)[3 * remap[i]] = verts[i].x;
      (*vout)[3 * remap[i] + 1] = verts[i].y;
      (*vout)[3 * remap[i] + 2] = verts[i].z;
    }
    for (auto& F : faces) {
      if (F[0] < 0) continue;
      fout->push_back(remap[F[0]]);
      fout->push_back(remap[F[1]]);
      fout->push_back(remap[F[2]]);
    }
  }
};

// link condition: collapsing (a,b) keeps the complex manifold iff the shared
// neighborhood of a and b equals the opposite vertices of the faces on (a,b)
bool linkOk(const EditMesh& m, int a, int b) {
  std::unordered_set<int> na, nb;
  m.neighbors(a, &na);
  m.neighbors(b, &nb);
  std::unordered_set<int> opp;
  for (int fi : m.vfaces[a]) {
    if (!m.faceAlive(fi)) continue;
    const Face& F = m.faces[fi];
    if (!EditMesh::faceHas(F, a) || !EditMesh::faceHas(F, b)) continue;
    for (int k = 0; k < 3; k++)
      if (F[k] != a && F[k] != b) opp.insert(F[k]);
  }
  int shared = 0;
  for (int v : na)
    if (nb.count(v)) {
      shared++;
      if (!opp.count(v)) return false;
    }
  return shared == (int)opp.size();
}

// do faces around `a` flip orientation when a moves to `p`? (excluding faces
// that die in a collapse with b; pass b=-1 for a pure move)
bool wouldFlip(const EditMesh& m, int a, int b, const V3& p) {
  for (int fi : m.vfaces[a]) {
    if (!m.faceAlive(fi)) continue;
    const Face& F = m.faces[fi];
    if (!EditMesh::faceHas(F, a)) continue;  // stale adjacency entry
    if (b >= 0 && (F[0] == b || F[1] == b || F[2] == b)) continue;
    V3 v0 = m.verts[F[0]], v1 = m.verts[F[1]], v2 = m.verts[F[2]];
    V3 n0 = (v1 - v0).cross(v2 - v0);
    V3 w0 = F[0] == a ? p : v0, w1 = F[1] == a ? p : v1, w2 = F[2] == a ? p : v2;
    V3 n1 = (w1 - w0).cross(w2 - w0);
    if (n0.dot(n1) <= 0) return true;
  }
  return false;
}

// perform collapse b -> a with a moved to p; kills shared faces
void collapseEdge(EditMesh& m, int a, int b, const V3& p) {
  m.verts[a] = p;
  for (int fi : m.vfaces[b]) {
    if (!m.faceAlive(fi)) continue;
    Face& F = m.faces[fi];
    if (!EditMesh::faceHas(F, b)) continue;  // stale adjacency entry
    bool hasA = F[0] == a || F[1] == a || F[2] == a;
    if (hasA) {
      F = {-1, -1, -1};
    } else {
      for (int k = 0; k < 3; k++)
        if (F[k] == b) F[k] = a;
      m.vfaces[a].push_back(fi);
    }
  }
  m.vfaces[b].clear();
  m.vdead[b] = 1;
}

// ---------------------------------------------------------------------------
// decimate: quadric edge collapse
// ---------------------------------------------------------------------------
struct PQItem {
  double cost;
  int a, b;
  uint64_t stampA, stampB;
  bool operator<(const PQItem& o) const { return cost > o.cost; }
};

void boundaryEdges(const EditMesh& m, std::vector<std::pair<int, int>>* out) {
  std::unordered_map<uint64_t, int> count;
  for (size_t fi = 0; fi < m.faces.size(); fi++) {
    if (!m.faceAlive((int)fi)) continue;
    const Face& F = m.faces[fi];
    for (int k = 0; k < 3; k++) count[ekey(F[k], F[(k + 1) % 3])]++;
  }
  for (size_t fi = 0; fi < m.faces.size(); fi++) {
    if (!m.faceAlive((int)fi)) continue;
    const Face& F = m.faces[fi];
    for (int k = 0; k < 3; k++) {
      int a = F[k], b = F[(k + 1) % 3];
      if (count[ekey(a, b)] == 1) out->push_back({a, b});
    }
  }
}

void decimateImpl(EditMesh& m, int targetFaces) {
  const int nv = (int)m.verts.size();
  std::vector<Quadric> Q(nv);
  for (size_t fi = 0; fi < m.faces.size(); fi++) {
    const Face& F = m.faces[fi];
    V3 n = m.faceNormal((int)fi);
    double area = 0.5 * n.norm();
    if (area < 1e-30) continue;
    V3 un = n.normalized();
    double d = -un.dot(m.verts[F[0]]);
    for (int k = 0; k < 3; k++) Q[F[k]].addPlane(un, d, area);
  }
  // boundary constraint planes (preserveboundary): perpendicular to the
  // incident face through the boundary edge, heavily weighted
  std::vector<std::pair<int, int>> bedges;
  boundaryEdges(m, &bedges);
  std::vector<char> onBoundary(nv, 0);
  for (auto& e : bedges) {
    onBoundary[e.first] = onBoundary[e.second] = 1;
    V3 ev = (m.verts[e.second] - m.verts[e.first]);
    // find the single face containing this edge for its normal
    V3 fn;
    for (int fi : m.vfaces[e.first]) {
      if (!m.faceAlive(fi)) continue;
      const Face& F = m.faces[fi];
      if (!EditMesh::faceHas(F, e.first)) continue;
      if (EditMesh::faceHas(F, e.second)) {
        fn = m.faceNormal(fi);
        break;
      }
    }
    V3 n = ev.cross(fn).normalized();
    double d = -n.dot(m.verts[e.first]);
    double w = ev.dot(ev) * 100.0;
    Q[e.first].addPlane(n, d, w);
    Q[e.second].addPlane(n, d, w);
  }

  std::vector<uint64_t> stamp(nv, 0);
  std::priority_queue<PQItem> pq;
  auto pushEdge = [&](int a, int b) {
    if (m.vdead[a] || m.vdead[b]) return;
    Quadric q = Q[a] + Q[b];
    V3 p;
    double cost;
    if (q.minimizer(&p)) {
      cost = q.eval(p);
    } else {
      V3 mid = (m.verts[a] + m.verts[b]) * 0.5;
      double ca = q.eval(m.verts[a]), cb = q.eval(m.verts[b]), cm = q.eval(mid);
      if (ca <= cb && ca <= cm) { p = m.verts[a]; cost = ca; }
      else if (cb <= cm) { p = m.verts[b]; cost = cb; }
      else { p = mid; cost = cm; }
    }
    pq.push({cost, a, b, stamp[a], stamp[b]});
  };

  std::unordered_set<uint64_t> seen;
  for (auto& F : m.faces)
    for (int k = 0; k < 3; k++) {
      int a = F[k], b = F[(k + 1) % 3];
      if (seen.insert(ekey(a, b)).second) pushEdge(std::min(a, b), std::max(a, b));
    }

  int live = m.liveFaceCount();
  while (live > targetFaces && !pq.empty()) {
    PQItem it = pq.top();
    pq.pop();
    int a = it.a, b = it.b;
    if (m.vdead[a] || m.vdead[b]) continue;
    if (stamp[a] != it.stampA || stamp[b] != it.stampB) continue;
    if (!linkOk(m, a, b)) continue;
    Quadric q = Q[a] + Q[b];
    V3 p;
    if (!q.minimizer(&p)) p = (m.verts[a] + m.verts[b]) * 0.5;
    if (onBoundary[a] && !onBoundary[b]) p = m.verts[a];
    if (onBoundary[b] && !onBoundary[a]) p = m.verts[b];
    if (wouldFlip(m, a, b, p) || wouldFlip(m, b, a, p)) continue;
    int before = m.edgeFaceCount(a, b);
    collapseEdge(m, a, b, p);
    live -= before;
    Q[a] = q;
    onBoundary[a] = onBoundary[a] || onBoundary[b];
    stamp[a]++;
    std::unordered_set<int> nb;
    m.neighbors(a, &nb);
    for (int v : nb) pushEdge(std::min(a, v), std::max(a, v));
  }
}

// ---------------------------------------------------------------------------
// closest-point projection onto the ORIGINAL surface (for remesh)
// ---------------------------------------------------------------------------
struct TriSoup {
  std::vector<V3> v0, e0, e1;  // v0 + barycentric edges
  // uniform grid accel
  double cell = 1;
  V3 lo;
  int nx = 1, ny = 1, nz = 1;
  std::vector<std::vector<int>> cells;

  void build(const std::vector<V3>& verts, const std::vector<Face>& faces) {
    V3 hi(-1e300, -1e300, -1e300);
    lo = {1e300, 1e300, 1e300};
    double totalArea = 0;
    for (auto& F : faces) {
      if (F[0] < 0) continue;
      v0.push_back(verts[F[0]]);
      e0.push_back(verts[F[1]] - verts[F[0]]);
      e1.push_back(verts[F[2]] - verts[F[0]]);
      totalArea += 0.5 * e0.back().cross(e1.back()).norm();
      for (int k = 0; k < 3; k++) {
        const V3& p = verts[F[k]];
        lo = {std::min(lo.x, p.x), std::min(lo.y, p.y), std::min(lo.z, p.z)};
        hi = {std::max(hi.x, p.x), std::max(hi.y, p.y), std::max(hi.z, p.z)};
      }
    }
    int n = (int)v0.size();
    if (n == 0) return;
    cell = std::max(std::sqrt(totalArea / n) * 2.0, 1e-6);
    nx = std::max(1, (int)((hi.x - lo.x) / cell) + 1);
    ny = std::max(1, (int)((hi.y - lo.y) / cell) + 1);
    nz = std::max(1, (int)((hi.z - lo.z) / cell) + 1);
    // cap grid size
    while ((int64_t)nx * ny * nz > 8'000'000) {
      cell *= 2;
      nx = std::max(1, (int)((hi.x - lo.x) / cell) + 1);
      ny = std::max(1, (int)((hi.y - lo.y) / cell) + 1);
      nz = std::max(1, (int)((hi.z - lo.z) / cell) + 1);
    }
    cells.assign((size_t)nx * ny * nz, {});
    for (int t = 0; t < n; t++) {
      V3 a = v0[t], b = v0[t] + e0[t], c = v0[t] + e1[t];
      V3 tlo = {std::min({a.x, b.x, c.x}), std::min({a.y, b.y, c.y}),
                std::min({a.z, b.z, c.z})};
      V3 thi = {std::max({a.x, b.x, c.x}), std::max({a.y, b.y, c.y}),
                std::max({a.z, b.z, c.z})};
      int x0 = (int)((tlo.x - lo.x) / cell), x1 = (int)((thi.x - lo.x) / cell);
      int y0 = (int)((tlo.y - lo.y) / cell), y1 = (int)((thi.y - lo.y) / cell);
      int z0 = (int)((tlo.z - lo.z) / cell), z1 = (int)((thi.z - lo.z) / cell);
      for (int x = std::max(0, x0); x <= std::min(nx - 1, x1); x++)
        for (int y = std::max(0, y0); y <= std::min(ny - 1, y1); y++)
          for (int z = std::max(0, z0); z <= std::min(nz - 1, z1); z++)
            cells[(size_t)(x * ny + y) * nz + z].push_back(t);
    }
  }

  static V3 closestOnTri(const V3& p, const V3& a, const V3& ab, const V3& ac) {
    // Ericson, Real-Time Collision Detection 5.1.5
    V3 ap = p - a;
    double d1 = ab.dot(ap), d2 = ac.dot(ap);
    if (d1 <= 0 && d2 <= 0) return a;
    V3 b = a + ab, c = a + ac;
    V3 bp = p - b;
    double d3 = ab.dot(bp), d4 = ac.dot(bp);
    if (d3 >= 0 && d4 <= d3) return b;
    double vc = d1 * d4 - d3 * d2;
    if (vc <= 0 && d1 >= 0 && d3 <= 0) return a + ab * (d1 / (d1 - d3));
    V3 cp = p - c;
    double d5 = ab.dot(cp), d6 = ac.dot(cp);
    if (d6 >= 0 && d5 <= d6) return c;
    double vb = d5 * d2 - d1 * d6;
    if (vb <= 0 && d2 >= 0 && d6 <= 0) return a + ac * (d2 / (d2 - d6));
    double va = d3 * d6 - d5 * d4;
    if (va <= 0 && (d4 - d3) >= 0 && (d5 - d6) >= 0)
      return b + (c - b) * ((d4 - d3) / ((d4 - d3) + (d5 - d6)));
    double denom = 1.0 / (va + vb + vc);
    return a + ab * (vb * denom) + ac * (vc * denom);
  }

  V3 project(const V3& p) const {
    if (v0.empty()) return p;
    int cx = std::min(nx - 1, std::max(0, (int)((p.x - lo.x) / cell)));
    int cy = std::min(ny - 1, std::max(0, (int)((p.y - lo.y) / cell)));
    int cz = std::min(nz - 1, std::max(0, (int)((p.z - lo.z) / cell)));
    double best = 1e300;
    V3 bp = p;
    for (int ring = 0; ring < std::max({nx, ny, nz}); ring++) {
      bool any = false;
      for (int x = std::max(0, cx - ring); x <= std::min(nx - 1, cx + ring); x++)
        for (int y = std::max(0, cy - ring); y <= std::min(ny - 1, cy + ring); y++)
          for (int z = std::max(0, cz - ring); z <= std::min(nz - 1, cz + ring); z++) {
            if (ring > 0 && std::abs(x - cx) != ring && std::abs(y - cy) != ring &&
                std::abs(z - cz) != ring)
              continue;  // only the shell
            for (int t : cells[(size_t)(x * ny + y) * nz + z]) {
              any = true;
              V3 q = closestOnTri(p, v0[t], e0[t], e1[t]);
              double d = (q - p).dot(q - p);
              if (d < best) { best = d; bp = q; }
            }
          }
      // expand until the next ring provably cannot contain a closer point:
      // any triangle in ring r+1 is at least r*cell away from p's cell
      if (best < 1e299) {
        double safe = (double)ring * cell;
        if (best <= safe * safe) break;
      }
      (void)any;
    }
    return bp;
  }
};

// ---------------------------------------------------------------------------
// remesh: Botsch-Kobbelt incremental isotropic remeshing
// ---------------------------------------------------------------------------
struct RemeshMesh {
  std::vector<V3> verts;
  std::vector<Face> faces;

  void edgeMapBuild(std::unordered_map<uint64_t, std::vector<int>>* e2f) const {
    for (size_t fi = 0; fi < faces.size(); fi++) {
      const Face& F = faces[fi];
      if (F[0] < 0) continue;
      for (int k = 0; k < 3; k++)
        (*e2f)[ekey(F[k], F[(k + 1) % 3])].push_back((int)fi);
    }
  }

  void splitLongEdges(double maxLen) {
    std::unordered_map<uint64_t, std::vector<int>> e2f;
    edgeMapBuild(&e2f);
    std::unordered_map<uint64_t, int> midOf;
    std::vector<Face> newFaces;
    for (auto& kv : e2f) {
      int a = (int)(kv.first >> 32), b = (int)(kv.first & 0xffffffff);
      if ((verts[a] - verts[b]).norm() > maxLen) {
        int mid = (int)verts.size();
        verts.push_back((verts[a] + verts[b]) * 0.5);
        midOf[kv.first] = mid;
      }
    }
    if (midOf.empty()) return;
    for (size_t fi = 0; fi < faces.size(); fi++) {
      Face F = faces[fi];
      if (F[0] < 0) continue;
      int m01 = -1, m12 = -1, m20 = -1;
      auto find = [&](int a, int b) {
        auto it = midOf.find(ekey(a, b));
        return it == midOf.end() ? -1 : it->second;
      };
      m01 = find(F[0], F[1]);
      m12 = find(F[1], F[2]);
      m20 = find(F[2], F[0]);
      int cnt = (m01 >= 0) + (m12 >= 0) + (m20 >= 0);
      if (cnt == 0) continue;
      faces[fi] = {-1, -1, -1};
      if (cnt == 3) {
        newFaces.push_back({F[0], m01, m20});
        newFaces.push_back({F[1], m12, m01});
        newFaces.push_back({F[2], m20, m12});
        newFaces.push_back({m01, m12, m20});
      } else if (cnt == 2) {
        // rotate so the un-split edge is (F2,F0)
        while (m20 >= 0) {
          int t = F[0]; F[0] = F[1]; F[1] = F[2]; F[2] = t;
          int tm = m01; m01 = m12; m12 = m20; m20 = tm;
        }
        newFaces.push_back({F[0], m01, F[2]});
        newFaces.push_back({m01, m12, F[2]});
        newFaces.push_back({m01, F[1], m12});
      } else {
        while (m01 < 0) {
          int t = F[0]; F[0] = F[1]; F[1] = F[2]; F[2] = t;
          int tm = m01; m01 = m12; m12 = m20; m20 = tm;
        }
        newFaces.push_back({F[0], m01, F[2]});
        newFaces.push_back({m01, F[1], F[2]});
      }
    }
    for (auto& F : newFaces) faces.push_back(F);
  }

  void compactInto(EditMesh* em) const {
    std::vector<double> v;
    std::vector<int32_t> f;
    for (auto& p : verts) { v.push_back(p.x); v.push_back(p.y); v.push_back(p.z); }
    for (auto& F : faces) {
      if (F[0] < 0) continue;
      f.push_back(F[0]); f.push_back(F[1]); f.push_back(F[2]);
    }
    em->build(v.data(), (int64_t)verts.size(), f.data(), (int64_t)(f.size() / 3));
  }
};

void collapseShortEdges(EditMesh& m, double minLen, double maxLen) {
  std::unordered_set<uint64_t> seen;
  std::vector<std::pair<int, int>> cand;
  for (auto& F : m.faces) {
    if (F[0] < 0) continue;
    for (int k = 0; k < 3; k++) {
      int a = F[k], b = F[(k + 1) % 3];
      if (seen.insert(ekey(a, b)).second) cand.push_back({std::min(a, b), std::max(a, b)});
    }
  }
  for (auto& e : cand) {
    int a = e.first, b = e.second;
    if (m.vdead[a] || m.vdead[b]) continue;
    double len = (m.verts[a] - m.verts[b]).norm();
    if (len >= minLen) continue;
    V3 mid = (m.verts[a] + m.verts[b]) * 0.5;
    // collapsing must not create edges longer than maxLen
    std::unordered_set<int> nb;
    m.neighbors(a, &nb);
    m.neighbors(b, &nb);
    bool ok = true;
    for (int v : nb) {
      if (v == a || v == b) continue;
      if ((m.verts[v] - mid).norm() > maxLen) { ok = false; break; }
    }
    if (!ok || !linkOk(m, a, b)) continue;
    if (wouldFlip(m, a, b, mid) || wouldFlip(m, b, a, mid)) continue;
    collapseEdge(m, a, b, mid);
  }
}

void flipEdges(EditMesh& m) {
  // valence equalization
  std::vector<int> valence(m.verts.size(), 0);
  std::unordered_map<uint64_t, std::vector<int>> e2f;
  for (size_t fi = 0; fi < m.faces.size(); fi++) {
    const Face& F = m.faces[fi];
    if (F[0] < 0) continue;
    for (int k = 0; k < 3; k++) e2f[ekey(F[k], F[(k + 1) % 3])].push_back((int)fi);
  }
  std::vector<char> boundary(m.verts.size(), 0);
  for (auto& kv : e2f)
    if (kv.second.size() == 1) {
      boundary[(int)(kv.first >> 32)] = 1;
      boundary[(int)(kv.first & 0xffffffff)] = 1;
    }
  for (auto& kv : e2f) {
    valence[(int)(kv.first >> 32)]++;
    valence[(int)(kv.first & 0xffffffff)]++;
  }
  auto target = [&](int v) { return boundary[v] ? 4 : 6; };

  for (auto& kv : e2f) {
    if (kv.second.size() != 2) continue;
    int f0 = kv.second[0], f1 = kv.second[1];
    if (m.faces[f0][0] < 0 || m.faces[f1][0] < 0) continue;
    int a = (int)(kv.first >> 32), b = (int)(kv.first & 0xffffffff);
    auto opposite = [&](int fi) {
      for (int k = 0; k < 3; k++) {
        int v = m.faces[fi][k];
        if (v != a && v != b) return v;
      }
      return -1;
    };
    int c = opposite(f0), d = opposite(f1);
    if (c < 0 || d < 0 || c == d) continue;
    // already an edge (c,d)? flipping would create a duplicate
    if (e2f.count(ekey(c, d))) continue;
    auto dev = [&](int v, int delta) {
      return std::abs(valence[v] + delta - target(v));
    };
    int before = dev(a, 0) + dev(b, 0) + dev(c, 0) + dev(d, 0);
    int after = dev(a, -1) + dev(b, -1) + dev(c, 1) + dev(d, 1);
    if (after >= before) continue;
    // geometric sanity: both new faces non-degenerate, no flip vs old normals
    V3 nOld = m.faceNormal(f0) + m.faceNormal(f1);
    // f0 traverses the shared edge as a->b or b->a; flip replaces (a,b)
    // with (c,d) keeping windings: a->b case gives {a,d,c} + {d,b,c}
    bool abOrder = false;
    for (int k = 0; k < 3; k++)
      if (m.faces[f0][k] == a && m.faces[f0][(k + 1) % 3] == b) abOrder = true;
    Face nf0 = abOrder ? Face{a, d, c} : Face{b, d, c};
    Face nf1 = abOrder ? Face{d, b, c} : Face{d, a, c};
    V3 n0 = (m.verts[nf0[1]] - m.verts[nf0[0]]).cross(m.verts[nf0[2]] - m.verts[nf0[0]]);
    V3 n1 = (m.verts[nf1[1]] - m.verts[nf1[0]]).cross(m.verts[nf1[2]] - m.verts[nf1[0]]);
    if (n0.norm() < 1e-30 || n1.norm() < 1e-30) continue;
    if (n0.dot(nOld) <= 0 || n1.dot(nOld) <= 0) continue;
    // commit: rewrite the two faces
    m.faces[f0] = nf0;
    m.faces[f1] = nf1;
    // both new faces contain both c and d; stale vfaces entries for a/b are
    // tolerated by the membership checks in all adjacency queries
    m.vfaces[c].push_back(f0);
    m.vfaces[c].push_back(f1);
    m.vfaces[d].push_back(f0);
    m.vfaces[d].push_back(f1);
    valence[a]--; valence[b]--; valence[c]++; valence[d]++;
  }
}

void tangentialSmooth(EditMesh& m, const TriSoup& proj, double lambda) {
  std::vector<V3> centroid(m.verts.size());
  std::vector<int> deg(m.verts.size(), 0);
  std::unordered_map<uint64_t, int> ecount;
  for (auto& F : m.faces) {
    if (F[0] < 0) continue;
    for (int k = 0; k < 3; k++) ecount[ekey(F[k], F[(k + 1) % 3])]++;
  }
  std::vector<char> boundary(m.verts.size(), 0);
  for (auto& kv : ecount)
    if (kv.second == 1) {
      boundary[(int)(kv.first >> 32)] = 1;
      boundary[(int)(kv.first & 0xffffffff)] = 1;
    }
  std::unordered_set<uint64_t> seen;
  for (auto& F : m.faces) {
    if (F[0] < 0) continue;
    for (int k = 0; k < 3; k++) {
      int a = F[k], b = F[(k + 1) % 3];
      if (!seen.insert(ekey(a, b)).second) continue;
      centroid[a] = centroid[a] + m.verts[b];
      centroid[b] = centroid[b] + m.verts[a];
      deg[a]++; deg[b]++;
    }
  }
  for (size_t v = 0; v < m.verts.size(); v++) {
    if (m.vdead[v] || deg[v] == 0 || boundary[v]) continue;
    V3 c = centroid[v] * (1.0 / deg[v]);
    V3 moved = m.verts[v] + (c - m.verts[v]) * lambda;
    m.verts[v] = proj.project(moved);
  }
}

// ---------------------------------------------------------------------------
// isosurface extraction: marching tetrahedra
//
// Each cell is split into 6 tetrahedra; each tet contributes 0/1/2 triangles
// by direct case analysis -- no lookup tables to transcribe, watertight by
// construction (replaces the reference's Lewiner MC extraction role;
// the UDF pseudo-sign logic lives on the Python side, meshudf.py:23-307).
// ---------------------------------------------------------------------------
void marchingCubesImpl(const float* grid, int nx, int ny, int nz, float level,
                       std::vector<double>* vout, std::vector<int32_t>* fout) {
  auto gval = [&](int x, int y, int z) -> float {
    return grid[(size_t)(x * ny + y) * nz + z];
  };
  // corner ids within a cell
  static const int corner[8][3] = {{0,0,0},{1,0,0},{1,1,0},{0,1,0},
                                   {0,0,1},{1,0,1},{1,1,1},{0,1,1}};
  // 6-tet decomposition of the cube around the 0-6 diagonal
  static const int tets[6][4] = {{0,5,1,6},{0,1,2,6},{0,2,3,6},
                                 {0,3,7,6},{0,7,4,6},{0,4,5,6}};

  std::unordered_map<uint64_t, int> edgeVert;
  auto vid = [&](int64_t i0, int64_t i1, const int* c0, const int* c1) {
    if (i0 > i1) std::swap(i0, i1), std::swap(c0, c1);
    uint64_t key = ((uint64_t)i0 << 32) | (uint64_t)i1;
    auto it = edgeVert.find(key);
    if (it != edgeVert.end()) return it->second;
    float f0 = grid[i0], f1 = grid[i1];
    double t = std::fabs(f1 - f0) > 1e-12 ? (level - f0) / (double)(f1 - f0) : 0.5;
    t = std::min(1.0, std::max(0.0, t));
    int id = (int)(vout->size() / 3);
    vout->push_back(c0[0] + t * (c1[0] - c0[0]));
    vout->push_back(c0[1] + t * (c1[1] - c0[1]));
    vout->push_back(c0[2] + t * (c1[2] - c0[2]));
    edgeVert[key] = id;
    return id;
  };

  int cpos[8][3];
  int64_t cidx[8];
  for (int x = 0; x < nx - 1; x++)
    for (int y = 0; y < ny - 1; y++)
      for (int z = 0; z < nz - 1; z++) {
        float vals[8];
        bool anyIn = false, anyOut = false;
        for (int c = 0; c < 8; c++) {
          cpos[c][0] = x + corner[c][0];
          cpos[c][1] = y + corner[c][1];
          cpos[c][2] = z + corner[c][2];
          cidx[c] = (int64_t)(cpos[c][0] * ny + cpos[c][1]) * nz + cpos[c][2];
          vals[c] = grid[cidx[c]];
          (vals[c] < level ? anyIn : anyOut) = true;
        }
        if (!anyIn || !anyOut) continue;
        for (int t = 0; t < 6; t++) {
          const int* T = tets[t];
          int inside = 0, nin = 0;
          for (int k = 0; k < 3 + 1; k++)
            if (vals[T[k]] < level) { inside |= 1 << k; nin++; }
          if (nin == 0 || nin == 4) continue;
          // local vertex order of the tet: T[0..3]; orientation: triangles
          // are wound so normals point toward increasing field (outside)
          auto emit3 = [&](int a0, int a1, int b0, int b1, int c0, int c1) {
            int va = vid(cidx[a0], cidx[a1], cpos[a0], cpos[a1]);
            int vb = vid(cidx[b0], cidx[b1], cpos[b0], cpos[b1]);
            int vc = vid(cidx[c0], cidx[c1], cpos[c0], cpos[c1]);
            if (va == vb || vb == vc || va == vc) return;
            fout->push_back(va); fout->push_back(vb); fout->push_back(vc);
          };
          // enumerate by which corners are inside
          int in[4], out[4], ni = 0, no = 0;
          for (int k = 0; k < 4; k++)
            (vals[T[k]] < level ? in[ni++] : out[no++]) = T[k];
          if (nin == 1) {
            emit3(in[0], out[0], in[0], out[1], in[0], out[2]);
          } else if (nin == 3) {
            emit3(out[0], in[0], out[0], in[2], out[0], in[1]);
          } else {  // 2-2: quad = two triangles
            int a = in[0], b = in[1], c = out[0], d = out[1];
            int vac = vid(cidx[a], cidx[c], cpos[a], cpos[c]);
            int vad = vid(cidx[a], cidx[d], cpos[a], cpos[d]);
            int vbc = vid(cidx[b], cidx[c], cpos[b], cpos[c]);
            int vbd = vid(cidx[b], cidx[d], cpos[b], cpos[d]);
            if (vac != vad && vad != vbd && vac != vbd) {
              fout->push_back(vac); fout->push_back(vad); fout->push_back(vbd);
            }
            if (vac != vbd && vbd != vbc && vac != vbc) {
              fout->push_back(vac); fout->push_back(vbd); fout->push_back(vbc);
            }
          }
        }
      }
  // NOTE: winding is not globally consistent from the case analysis above;
  // fix it by orienting each triangle against the field gradient.
  for (size_t f = 0; f + 2 < fout->size(); f += 3) {
    int32_t ia = (*fout)[f], ib = (*fout)[f + 1], ic = (*fout)[f + 2];
    V3 a((*vout)[3*ia], (*vout)[3*ia+1], (*vout)[3*ia+2]);
    V3 b((*vout)[3*ib], (*vout)[3*ib+1], (*vout)[3*ib+2]);
    V3 c((*vout)[3*ic], (*vout)[3*ic+1], (*vout)[3*ic+2]);
    V3 n = (b - a).cross(c - a);
    V3 ctr = (a + b + c) * (1.0 / 3.0);
    // central-difference field gradient at the centroid
    auto sample = [&](double px, double py, double pz) -> double {
      int x = std::min(nx - 1, std::max(0, (int)px));
      int y = std::min(ny - 1, std::max(0, (int)py));
      int z = std::min(nz - 1, std::max(0, (int)pz));
      return gval(x, y, z);
    };
    double gx = sample(ctr.x + 1, ctr.y, ctr.z) - sample(ctr.x - 1, ctr.y, ctr.z);
    double gy = sample(ctr.x, ctr.y + 1, ctr.z) - sample(ctr.x, ctr.y - 1, ctr.z);
    double gz = sample(ctr.x, ctr.y, ctr.z + 1) - sample(ctr.x, ctr.y, ctr.z - 1);
    if (n.dot({gx, gy, gz}) < 0) std::swap((*fout)[f + 1], (*fout)[f + 2]);
  }
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------
extern "C" {

void gd_free(void* p) { std::free(p); }

// returns 0 on success; outputs malloc'd buffers
int gd_decimate(const double* verts, int64_t nv, const int32_t* faces, int64_t nf,
                int64_t target_faces, double** out_v, int64_t* out_nv,
                int32_t** out_f, int64_t* out_nf) {
  EditMesh m;
  m.build(verts, nv, faces, nf);
  decimateImpl(m, (int)target_faces);
  std::vector<double> v;
  std::vector<int32_t> f;
  m.compact(&v, &f);
  *out_nv = (int64_t)(v.size() / 3);
  *out_nf = (int64_t)(f.size() / 3);
  *out_v = (double*)std::malloc(v.size() * sizeof(double));
  *out_f = (int32_t*)std::malloc(f.size() * sizeof(int32_t));
  std::memcpy(*out_v, v.data(), v.size() * sizeof(double));
  std::memcpy(*out_f, f.data(), f.size() * sizeof(int32_t));
  return 0;
}

int gd_remesh(const double* verts, int64_t nv, const int32_t* faces, int64_t nf,
              double target_edge_length, int iters, double** out_v,
              int64_t* out_nv, int32_t** out_f, int64_t* out_nf) {
  // projection target = input surface
  EditMesh orig;
  orig.build(verts, nv, faces, nf);
  TriSoup soup;
  soup.build(orig.verts, orig.faces);

  EditMesh m;
  m.build(verts, nv, faces, nf);
  double maxLen = 4.0 / 3.0 * target_edge_length;
  double minLen = 4.0 / 5.0 * target_edge_length;
  for (int it = 0; it < iters; it++) {
    // split (operates on a compact face list)
    RemeshMesh rm;
    rm.verts = m.verts;
    for (auto& F : m.faces)
      if (F[0] >= 0) rm.faces.push_back(F);
    rm.splitLongEdges(maxLen);
    rm.compactInto(&m);
    collapseShortEdges(m, minLen, maxLen);
    flipEdges(m);
    tangentialSmooth(m, soup, 0.5);
  }
  std::vector<double> v;
  std::vector<int32_t> f;
  m.compact(&v, &f);
  *out_nv = (int64_t)(v.size() / 3);
  *out_nf = (int64_t)(f.size() / 3);
  *out_v = (double*)std::malloc(v.size() * sizeof(double));
  *out_f = (int32_t*)std::malloc(f.size() * sizeof(int32_t));
  std::memcpy(*out_v, v.data(), v.size() * sizeof(double));
  std::memcpy(*out_f, f.data(), f.size() * sizeof(int32_t));
  return 0;
}

// Closest-point queries against a triangle mesh (UDF ground truth for the
// autoencoder -- reference AutoEncoder_dgcnn/encdec/preprocess_udf.py samples
// distances with open3d; we use the uniform-grid TriSoup accel).
// out_dist: (n,) distances; out_cp: (n,3) closest surface points.
int gd_closest_points(const double* verts, int64_t nv, const int32_t* faces,
                      int64_t nf, const double* queries, int64_t nq,
                      double* out_dist, double* out_cp) {
  EditMesh m;
  m.build(verts, nv, faces, nf);
  TriSoup soup;
  soup.build(m.verts, m.faces);
  for (int64_t i = 0; i < nq; i++) {
    V3 q(queries[3 * i], queries[3 * i + 1], queries[3 * i + 2]);
    V3 c = soup.project(q);
    out_dist[i] = (c - q).norm();
    out_cp[3 * i] = c.x;
    out_cp[3 * i + 1] = c.y;
    out_cp[3 * i + 2] = c.z;
  }
  return 0;
}

// UDF isosurface: per-cell pseudo-signs from gradient agreement with corner 0
// (the meshudf Lewiner-for-UDF trick, reference meshudf.py / the .pyx:
// corner k gets sign(dot(g_k, g_0)), then a standard extraction runs on the
// pseudo-signed field at level 0). grads: (nx,ny,nz,3) NORMALIZED negative
// udf gradients (pointing toward the surface).
int gd_marching_cubes_udf(const float* udf, const float* grads, int64_t nx,
                          int64_t ny, int64_t nz, double** out_v,
                          int64_t* out_nv, int32_t** out_f, int64_t* out_nf) {
  // pseudo-signed field: each grid point takes sign(dot(g, g_anchor)) where
  // the anchor is the even-parity parent corner of its 2x2x2 block -- the
  // per-block analog of the reference's per-cell corner-0 rule.
  std::vector<float> field((size_t)nx * ny * nz);
  auto G = [&](int64_t i, int k) { return grads[3 * i + k]; };
  for (int x = 0; x < nx; x++)
    for (int y = 0; y < ny; y++)
      for (int z = 0; z < nz; z++) {
        int64_t i = (int64_t)(x * ny + y) * nz + z;
        int64_t i0 = (int64_t)((x & ~1) * ny + (y & ~1)) * nz + (z & ~1);
        double dot = G(i, 0) * G(i0, 0) + G(i, 1) * G(i0, 1) + G(i, 2) * G(i0, 2);
        field[i] = dot >= 0 ? udf[i] : -udf[i];
      }
  std::vector<double> v;
  std::vector<int32_t> f;
  marchingCubesImpl(field.data(), (int)nx, (int)ny, (int)nz, 0.0f, &v, &f);
  *out_nv = (int64_t)(v.size() / 3);
  *out_nf = (int64_t)(f.size() / 3);
  *out_v = (double*)std::malloc(std::max<size_t>(1, v.size()) * sizeof(double));
  *out_f = (int32_t*)std::malloc(std::max<size_t>(1, f.size()) * sizeof(int32_t));
  std::memcpy(*out_v, v.data(), v.size() * sizeof(double));
  std::memcpy(*out_f, f.data(), f.size() * sizeof(int32_t));
  return 0;
}

int gd_marching_cubes(const float* grid, int64_t nx, int64_t ny, int64_t nz,
                      float level, double** out_v, int64_t* out_nv,
                      int32_t** out_f, int64_t* out_nf) {
  std::vector<double> v;
  std::vector<int32_t> f;
  marchingCubesImpl(grid, (int)nx, (int)ny, (int)nz, level, &v, &f);
  *out_nv = (int64_t)(v.size() / 3);
  *out_nf = (int64_t)(f.size() / 3);
  *out_v = (double*)std::malloc(std::max<size_t>(1, v.size()) * sizeof(double));
  *out_f = (int32_t*)std::malloc(std::max<size_t>(1, f.size()) * sizeof(int32_t));
  std::memcpy(*out_v, v.data(), v.size() * sizeof(double));
  std::memcpy(*out_f, f.data(), f.size() * sizeof(int32_t));
  return 0;
}

}  // extern "C"
