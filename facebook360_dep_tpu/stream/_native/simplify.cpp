// Quadric-error-metric mesh decimation (Garland-Heckbert edge collapse).
//
// Native replacement for the reference's render/MeshSimplifier.{h,cpp}
// (652 LoC C++): decimates a disparity mesh to a target triangle budget
// (150k default) before .vtx/.idx packing for 6DoF streaming. The algorithm
// is inherently serial (global min-cost heap), so it stays native C++ behind
// a ctypes boundary rather than being faked in Python.
//
// Exposed C ABI:
//   int simplify_mesh(const float* verts, int nv, const uint32_t* faces,
//                     int nf, int target_faces, float strictness,
//                     int remove_boundary,
//                     float* out_verts, int* out_nv,
//                     uint32_t* out_faces, int* out_nf);
// out buffers must be at least the input sizes; returns 0 on success.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

struct Vec3 {
  double x, y, z;
  Vec3 operator+(const Vec3& o) const { return {x + o.x, y + o.y, z + o.z}; }
  Vec3 operator-(const Vec3& o) const { return {x - o.x, y - o.y, z - o.z}; }
  Vec3 operator*(double s) const { return {x * s, y * s, z * s}; }
  double dot(const Vec3& o) const { return x * o.x + y * o.y + z * o.z; }
  Vec3 cross(const Vec3& o) const {
    return {y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x};
  }
  double norm() const { return std::sqrt(dot(*this)); }
};

// Symmetric 4x4 quadric, upper triangle: q[0..9] =
// a11 a12 a13 a14 a22 a23 a24 a33 a34 a44
struct Quadric {
  double q[10] = {0};
  void addPlane(double a, double b, double c, double d, double w) {
    q[0] += w * a * a;
    q[1] += w * a * b;
    q[2] += w * a * c;
    q[3] += w * a * d;
    q[4] += w * b * b;
    q[5] += w * b * c;
    q[6] += w * b * d;
    q[7] += w * c * c;
    q[8] += w * c * d;
    q[9] += w * d * d;
  }
  Quadric operator+(const Quadric& o) const {
    Quadric r;
    for (int i = 0; i < 10; ++i) r.q[i] = q[i] + o.q[i];
    return r;
  }
  double eval(const Vec3& v) const {
    return q[0] * v.x * v.x + 2 * q[1] * v.x * v.y + 2 * q[2] * v.x * v.z + 2 * q[3] * v.x +
        q[4] * v.y * v.y + 2 * q[5] * v.y * v.z + 2 * q[6] * v.y + q[7] * v.z * v.z +
        2 * q[8] * v.z + q[9];
  }
  // solve for the minimizing position; false if near-singular
  bool optimal(Vec3& out) const {
    const double a = q[0], b = q[1], c = q[2], d = q[4], e = q[5], f = q[7];
    const double det = a * (d * f - e * e) - b * (b * f - c * e) + c * (b * e - c * d);
    if (std::fabs(det) < 1e-12) return false;
    const double inv = 1.0 / det;
    const double bx = -q[3], by = -q[6], bz = -q[8];
    out.x = inv * ((d * f - e * e) * bx + (c * e - b * f) * by + (b * e - c * d) * bz);
    out.y = inv * ((c * e - b * f) * bx + (a * f - c * c) * by + (b * c - a * e) * bz);
    out.z = inv * ((b * e - c * d) * bx + (b * c - a * e) * by + (a * d - b * b) * bz);
    return std::isfinite(out.x) && std::isfinite(out.y) && std::isfinite(out.z);
  }
};

struct Edge {
  double cost;
  int v0, v1;
  uint64_t stamp; // sum of vertex versions at push time (lazy invalidation)
  Vec3 target;
  bool operator>(const Edge& o) const { return cost > o.cost; }
};

} // namespace

extern "C" int simplify_mesh(
    const float* verts_in,
    int nv,
    const uint32_t* faces_in,
    int nf,
    int target_faces,
    float strictness,
    int remove_boundary,
    float* out_verts,
    int* out_nv,
    uint32_t* out_faces,
    int* out_nf) {
  std::vector<Vec3> verts(nv);
  for (int i = 0; i < nv; ++i)
    verts[i] = {verts_in[3 * i], verts_in[3 * i + 1], verts_in[3 * i + 2]};
  std::vector<int> faces(3 * nf);
  for (int i = 0; i < 3 * nf; ++i) faces[i] = int(faces_in[i]);

  std::vector<Quadric> quadrics(nv);
  std::vector<std::vector<int>> vfaces(nv); // incident face ids
  std::vector<char> faceAlive(nf, 1);

  auto faceNormalArea = [&](int f, Vec3& n, double& area) -> bool {
    const Vec3& p0 = verts[faces[3 * f]];
    const Vec3& p1 = verts[faces[3 * f + 1]];
    const Vec3& p2 = verts[faces[3 * f + 2]];
    const Vec3 c = (p1 - p0).cross(p2 - p0);
    const double len = c.norm();
    if (len < 1e-30) return false;
    n = c * (1.0 / len);
    area = 0.5 * len;
    return true;
  };

  // per-edge face counts for boundary detection
  auto edgeKey = [](int a, int b) -> uint64_t {
    if (a > b) std::swap(a, b);
    return (uint64_t(a) << 32) | uint64_t(b);
  };
  std::unordered_set<uint64_t> edges;
  std::vector<uint64_t> edgeList;
  {
    std::unordered_set<uint64_t> seen;
    for (int f = 0; f < nf; ++f) {
      for (int e = 0; e < 3; ++e) {
        const int a = faces[3 * f + e];
        const int b = faces[3 * f + (e + 1) % 3];
        const uint64_t k = edgeKey(a, b);
        if (seen.insert(k).second) edgeList.push_back(k);
      }
    }
  }

  for (int f = 0; f < nf; ++f) {
    Vec3 n;
    double area;
    if (!faceNormalArea(f, n, area)) {
      faceAlive[f] = 0;
      continue;
    }
    const double d = -n.dot(verts[faces[3 * f]]);
    for (int e = 0; e < 3; ++e) {
      const int v = faces[3 * f + e];
      quadrics[v].addPlane(n.x, n.y, n.z, d, area);
      vfaces[v].push_back(f);
    }
  }

  // boundary constraint: count faces per edge; for open edges add a large
  // perpendicular constraint plane so boundaries hold their shape
  if (!remove_boundary) {
    std::unordered_map<uint64_t, int> edgeFaces;
    for (int f = 0; f < nf; ++f) {
      if (!faceAlive[f]) continue;
      for (int e = 0; e < 3; ++e)
        ++edgeFaces[edgeKey(faces[3 * f + e], faces[3 * f + (e + 1) % 3])];
    }
    for (int f = 0; f < nf; ++f) {
      if (!faceAlive[f]) continue;
      Vec3 n;
      double area;
      if (!faceNormalArea(f, n, area)) continue;
      for (int e = 0; e < 3; ++e) {
        const int a = faces[3 * f + e];
        const int b = faces[3 * f + (e + 1) % 3];
        if (edgeFaces[edgeKey(a, b)] != 1) continue; // interior edge
        const Vec3 ev = verts[b] - verts[a];
        Vec3 cn = ev.cross(n); // perpendicular to edge, in face plane
        const double len = cn.norm();
        if (len < 1e-30) continue;
        cn = cn * (1.0 / len);
        const double d = -cn.dot(verts[a]);
        const double w = 1e3 * ev.dot(ev); // strong boundary penalty
        quadrics[a].addPlane(cn.x, cn.y, cn.z, d, w);
        quadrics[b].addPlane(cn.x, cn.y, cn.z, d, w);
      }
    }
  }

  std::vector<uint64_t> version(nv, 0);
  std::vector<char> alive(nv, 1);

  const double penalty = strictness > 0 ? 1.0 / double(strictness) : 1.0;

  std::priority_queue<Edge, std::vector<Edge>, std::greater<Edge>> heap;
  auto pushEdge = [&](int a, int b) {
    if (!alive[a] || !alive[b] || a == b) return;
    const Quadric q = quadrics[a] + quadrics[b];
    Vec3 target;
    double cost;
    if (q.optimal(target)) {
      cost = q.eval(target);
    } else {
      const Vec3 mid = (verts[a] + verts[b]) * 0.5;
      target = mid;
      cost = q.eval(mid);
      const double c0 = q.eval(verts[a]);
      const double c1 = q.eval(verts[b]);
      if (c0 < cost) { cost = c0; target = verts[a]; }
      if (c1 < cost) { cost = c1; target = verts[b]; }
    }
    heap.push({cost * penalty, a, b, version[a] + version[b], target});
  };

  for (uint64_t k : edgeList) pushEdge(int(k >> 32), int(k & 0xffffffffu));

  int liveFaces = 0;
  for (int f = 0; f < nf; ++f) liveFaces += faceAlive[f];

  std::vector<int> remap(nv);
  for (int i = 0; i < nv; ++i) remap[i] = i;
  auto resolve = [&](int v) {
    while (remap[v] != v) v = remap[v] = remap[remap[v]];
    return v;
  };

  while (liveFaces > target_faces && !heap.empty()) {
    Edge e = heap.top();
    heap.pop();
    int a = resolve(e.v0), b = resolve(e.v1);
    if (a == b || !alive[a] || !alive[b]) continue;
    if (version[e.v0] + version[e.v1] != e.stamp) continue; // stale

    // collapse b into a at target position
    verts[a] = e.target;
    quadrics[a] = quadrics[a] + quadrics[b];
    alive[b] = 0;
    remap[b] = a;
    ++version[a];
    ++version[b];

    // update incident faces of b -> a; kill degenerates
    std::vector<int>& fa = vfaces[a];
    for (int f : vfaces[b]) {
      if (!faceAlive[f]) continue;
      int va = resolve(faces[3 * f]), vb = resolve(faces[3 * f + 1]), vc = resolve(faces[3 * f + 2]);
      if (va == vb || vb == vc || va == vc) {
        faceAlive[f] = 0;
        --liveFaces;
      } else {
        fa.push_back(f);
      }
    }

    // re-push edges around a
    std::unordered_set<int> nbrs;
    for (int f : fa) {
      if (!faceAlive[f]) continue;
      for (int i = 0; i < 3; ++i) {
        const int v = resolve(faces[3 * f + i]);
        if (v != a) nbrs.insert(v);
      }
    }
    for (int v : nbrs) pushEdge(a, v);
  }

  // compact output
  std::vector<int> newIndex(nv, -1);
  int outNv = 0;
  for (int f = 0; f < nf; ++f) {
    if (!faceAlive[f]) continue;
    for (int i = 0; i < 3; ++i) {
      const int v = resolve(faces[3 * f + i]);
      if (newIndex[v] < 0) newIndex[v] = outNv++;
    }
  }
  int outNf = 0;
  for (int f = 0; f < nf; ++f) {
    if (!faceAlive[f]) continue;
    for (int i = 0; i < 3; ++i)
      out_faces[3 * outNf + i] = uint32_t(newIndex[resolve(faces[3 * f + i])]);
    ++outNf;
  }
  for (int v = 0; v < nv; ++v) {
    if (newIndex[v] >= 0) {
      out_verts[3 * newIndex[v]] = float(verts[v].x);
      out_verts[3 * newIndex[v] + 1] = float(verts[v].y);
      out_verts[3 * newIndex[v] + 2] = float(verts[v].z);
    }
  }
  *out_nv = outNv;
  *out_nf = outNf;
  return 0;
}
