// fpv4d native host-side data plane.
//
// The reference delegates its host-side heavy lifting to native
// binaries (COLMAP/OpenPose/ffmpeg) and Open3D's C++ core for PLY IO
// and point-cloud handling (global_optimization.py:173-176,
// global_vis.py:68-77). This library is the framework's own native
// equivalent for the pieces on the data path:
//   * binary/ascii PLY vertex reading (scene clouds are up to 1e6+
//     points; Python-side parsing is the bottleneck when feeding the
//     TPU),
//   * voxel-grid downsampling (scene decimation before device upload),
//   * a KD-tree nearest-neighbor (host-side gold checks for the
//     Pallas kernel and CPU-side contact queries).
//
// C ABI, consumed from Python via ctypes (fpv4d/io/native.py).
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <algorithm>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct PlyHeader {
  long vertex_count = 0;
  bool binary = false;
  bool big_endian = false;
  long header_bytes = 0;
  // per-vertex property sizes in bytes; x/y/z offsets within a record
  long record_size = 0;
  long x_off = -1, y_off = -1, z_off = -1;
  // field ordinals of x/y/z among the vertex properties (ascii rows)
  int x_idx = -1, y_idx = -1, z_idx = -1;
  int coord_size = 4;  // float32 or float64
  long x_size = 0, y_size = 0, z_size = 0;
};

long type_size(const std::string &t) {
  if (t == "char" || t == "uchar" || t == "int8" || t == "uint8") return 1;
  if (t == "short" || t == "ushort" || t == "int16" || t == "uint16")
    return 2;
  if (t == "int" || t == "uint" || t == "int32" || t == "uint32" ||
      t == "float" || t == "float32")
    return 4;
  if (t == "double" || t == "float64") return 8;
  return 0;
}

// Parse + VALIDATE the header of an untrusted PLY file. Returns false
// (caller falls back to the pure-Python reader, which raises a clean
// ValueError) on: non-PLY magic, overlong header lines, negative or
// lying vertex counts (declared count exceeding what the file's bytes
// can back — the OOM vector: the Python side allocates
// vertex_count*12 bytes), mixed x/y/z coordinate sizes, offsets
// running past the record, or list properties on vertices.
bool parse_header(FILE *f, PlyHeader *h) {
  char line[1024];
  if (!fgets(line, sizeof line, f)) return false;
  if (strncmp(line, "ply", 3) != 0) return false;
  std::string cur_element;
  bool vertex_seen = false;
  long prop_off = 0;
  int prop_idx = 0;
  while (fgets(line, sizeof line, f)) {
    if (!strchr(line, '\n') && strlen(line) == sizeof line - 1)
      return false;  // header line longer than the buffer: reject
    std::string s(line);
    while (!s.empty() && (s.back() == '\n' || s.back() == '\r'))
      s.pop_back();
    if (s.rfind("format", 0) == 0) {
      h->binary = s.find("binary") != std::string::npos;
      h->big_endian = s.find("big_endian") != std::string::npos;
    } else if (s.rfind("element", 0) == 0) {
      char name[256];
      long count;
      if (sscanf(s.c_str(), "element %255s %ld", name, &count) == 2) {
        if (count < 0) return false;
        cur_element = name;
        if (cur_element == "vertex") {
          h->vertex_count = count;
          vertex_seen = true;
        } else if (!vertex_seen && count > 0) {
          // a non-empty element declared BEFORE the vertex element
          // stores its data first in the file; this reader assumes
          // vertex records start at end_header, so bail to the
          // Python fallback instead of silently parsing that
          // element's bytes as vertices
          return false;
        }
        prop_off = 0;
        prop_idx = 0;
      }
    } else if (s.rfind("property", 0) == 0 && cur_element == "vertex") {
      char t[64], n[64];
      if (sscanf(s.c_str(), "property %63s %63s", t, n) == 2) {
        long sz = type_size(t);
        if (sz == 0) return false;  // list property on vertices: bail
        if (strcmp(n, "x") == 0) {
          h->x_off = prop_off;
          h->x_idx = prop_idx;
          h->x_size = sz;
          h->coord_size = (int)sz;
        } else if (strcmp(n, "y") == 0) {
          h->y_off = prop_off;
          h->y_idx = prop_idx;
          h->y_size = sz;
        } else if (strcmp(n, "z") == 0) {
          h->z_off = prop_off;
          h->z_idx = prop_idx;
          h->z_size = sz;
        }
        prop_off += sz;
        prop_idx++;
        h->record_size = prop_off;
      }
    } else if (s == "end_header") {
      h->header_bytes = ftell(f);
      if (h->x_off < 0 || h->y_off < 0 || h->z_off < 0) return false;
      // mixed-size coordinates would read past the record buffer at
      // the widest offset; demand uniform x/y/z and in-bounds offsets
      if (h->x_size != h->y_size || h->y_size != h->z_size)
        return false;
      if (h->record_size <= 0 ||
          h->x_off + h->coord_size > h->record_size ||
          h->y_off + h->coord_size > h->record_size ||
          h->z_off + h->coord_size > h->record_size)
        return false;
      // the declared count must be backed by actual file bytes
      // (binary: full records; ascii: >= 2 bytes per row is the
      // loosest possible line)
      long data_start = h->header_bytes;
      if (fseek(f, 0, SEEK_END) != 0) return false;
      long file_end = ftell(f);
      if (fseek(f, data_start, SEEK_SET) != 0) return false;
      if (file_end < data_start) return false;
      long avail = file_end - data_start;
      if (h->binary) {
        if (h->vertex_count > avail / h->record_size) return false;
      } else {
        if (h->vertex_count > 0 && h->vertex_count > avail / 2)
          return false;
      }
      return true;
    }
  }
  return false;
}

float read_coord(const unsigned char *p, int size, bool big_endian) {
  if (size == 4) {
    uint32_t v;
    memcpy(&v, p, 4);
    if (big_endian) v = __builtin_bswap32(v);
    float out;
    memcpy(&out, &v, 4);
    return out;
  }
  uint64_t v;
  memcpy(&v, p, 8);
  if (big_endian) v = __builtin_bswap64(v);
  double out;
  memcpy(&out, &v, 8);
  return (float)out;
}

}  // namespace

extern "C" {

// Number of vertices in a PLY file, or -1 on parse failure.
long fpv4d_ply_vertex_count(const char *path) {
  FILE *f = fopen(path, "rb");
  if (!f) return -1;
  PlyHeader h;
  bool ok = parse_header(f, &h);
  fclose(f);
  return ok ? h.vertex_count : -1;
}

// Read up to max_pts vertices into out[3*i..3*i+2]. Returns the number
// read, or -1 on failure.
long fpv4d_ply_read_vertices(const char *path, float *out, long max_pts) {
  FILE *f = fopen(path, "rb");
  if (!f) return -1;
  PlyHeader h;
  if (!parse_header(f, &h)) {
    fclose(f);
    return -1;
  }
  long n = std::min(h.vertex_count, max_pts);
  if (h.binary) {
    std::vector<unsigned char> buf(h.record_size);
    for (long i = 0; i < n; i++) {
      if (fread(buf.data(), 1, h.record_size, f) != (size_t)h.record_size) {
        fclose(f);
        return i;
      }
      out[3 * i + 0] =
          read_coord(buf.data() + h.x_off, h.coord_size, h.big_endian);
      out[3 * i + 1] =
          read_coord(buf.data() + h.y_off, h.coord_size, h.big_endian);
      out[3 * i + 2] =
          read_coord(buf.data() + h.z_off, h.coord_size, h.big_endian);
    }
  } else {
    // ascii: x/y/z are whitespace-separated fields at their property
    // ORDINALS (a file with e.g. nx ny nz before x y z must not read
    // the normals as coordinates)
    char line[4096];
    for (long i = 0; i < n; i++) {
      if (!fgets(line, sizeof line, f)) {
        fclose(f);
        return i;
      }
      if (!strchr(line, '\n') && strlen(line) == sizeof line - 1) {
        // row longer than the buffer: the remainder would be parsed
        // as the NEXT row (silent coordinate corruption when its
        // fields happen to line up numerically) — bail to the
        // Python fallback instead
        fclose(f);
        return i;
      }
      double v[3] = {0, 0, 0};
      int found = 0, field = 0;
      char *save = nullptr;
      for (char *tok = strtok_r(line, " \t\r\n", &save); tok;
           tok = strtok_r(nullptr, " \t\r\n", &save), field++) {
        char *end = nullptr;
        double d = strtod(tok, &end);
        if (end == tok) {  // non-numeric field where a number belongs
          if (field == h.x_idx || field == h.y_idx || field == h.z_idx) {
            fclose(f);
            return i;
          }
          continue;
        }
        if (field == h.x_idx) { v[0] = d; found++; }
        else if (field == h.y_idx) { v[1] = d; found++; }
        else if (field == h.z_idx) { v[2] = d; found++; }
      }
      if (found != 3) {
        fclose(f);
        return i;
      }
      out[3 * i + 0] = (float)v[0];
      out[3 * i + 1] = (float)v[1];
      out[3 * i + 2] = (float)v[2];
    }
  }
  fclose(f);
  return n;
}

// Voxel-grid downsample: average points within each voxel of size
// `voxel`. Returns the number of output points written to out (caller
// allocates >= n points). Order is unspecified but deterministic for a
// given input.
long fpv4d_voxel_downsample(const float *pts, long n, float voxel,
                            float *out) {
  if (voxel <= 0 || n <= 0) return -1;
  struct Acc {
    double x = 0, y = 0, z = 0;
    long cnt = 0;
    long order = 0;
  };
  std::unordered_map<uint64_t, Acc> cells;
  cells.reserve((size_t)n / 4 + 8);
  const double inv = 1.0 / voxel;
  long order = 0;
  for (long i = 0; i < n; i++) {
    int64_t cx = (int64_t)llround(std::floor(pts[3 * i + 0] * inv));
    int64_t cy = (int64_t)llround(std::floor(pts[3 * i + 1] * inv));
    int64_t cz = (int64_t)llround(std::floor(pts[3 * i + 2] * inv));
    uint64_t key = ((uint64_t)(cx & 0x1FFFFF) << 42) |
                   ((uint64_t)(cy & 0x1FFFFF) << 21) |
                   ((uint64_t)(cz & 0x1FFFFF));
    Acc &a = cells[key];
    if (a.cnt == 0) a.order = order++;
    a.x += pts[3 * i];
    a.y += pts[3 * i + 1];
    a.z += pts[3 * i + 2];
    a.cnt++;
  }
  std::vector<const Acc *> sorted(cells.size());
  size_t k = 0;
  for (auto &kv : cells) sorted[k++] = &kv.second;
  std::sort(sorted.begin(), sorted.end(),
            [](const Acc *a, const Acc *b) { return a->order < b->order; });
  long m = 0;
  for (const Acc *a : sorted) {
    out[3 * m + 0] = (float)(a->x / a->cnt);
    out[3 * m + 1] = (float)(a->y / a->cnt);
    out[3 * m + 2] = (float)(a->z / a->cnt);
    m++;
  }
  return m;
}

// ---------------------------------------------------------------------------
// KD-tree (3-d, median split, array-backed)
// ---------------------------------------------------------------------------

struct KdTree {
  std::vector<float> pts;    // [n*3], reordered
  std::vector<long> index;   // original index per reordered point
  std::vector<int> axis;     // split axis per node (-1 = leaf range)
  long n = 0;
  static const long LEAF = 16;

  struct Node {
    long lo, hi;     // point range [lo, hi)
    long left, right;  // child node ids or -1
    int ax;
    float split;
  };
  std::vector<Node> nodes;

  long build(long lo, long hi, float *mins, float *maxs) {
    Node nd;
    nd.lo = lo;
    nd.hi = hi;
    nd.left = nd.right = -1;
    nd.ax = -1;
    nd.split = 0;
    long id = (long)nodes.size();
    nodes.push_back(nd);
    if (hi - lo <= LEAF) return id;
    // widest axis
    float ext[3] = {maxs[0] - mins[0], maxs[1] - mins[1],
                    maxs[2] - mins[2]};
    int ax = 0;
    if (ext[1] > ext[ax]) ax = 1;
    if (ext[2] > ext[ax]) ax = 2;
    long mid = (lo + hi) / 2;
    // median split via nth_element over interleaved storage
    std::vector<long> ids(hi - lo);
    for (long i = lo; i < hi; i++) ids[i - lo] = i;
    std::nth_element(ids.begin(), ids.begin() + (mid - lo), ids.end(),
                     [&](long a, long b) {
                       return pts[3 * a + ax] < pts[3 * b + ax];
                     });
    // apply permutation
    std::vector<float> tmp(3 * (hi - lo));
    std::vector<long> tidx(hi - lo);
    for (long i = 0; i < hi - lo; i++) {
      memcpy(&tmp[3 * i], &pts[3 * ids[i]], 12);
      tidx[i] = index[ids[i]];
    }
    memcpy(&pts[3 * lo], tmp.data(), tmp.size() * 4);
    memcpy(&index[lo], tidx.data(), tidx.size() * 8);

    float split = pts[3 * mid + ax];
    float save_max = maxs[ax], save_min = mins[ax];
    maxs[ax] = split;
    long l = build(lo, mid, mins, maxs);
    maxs[ax] = save_max;
    mins[ax] = split;
    long r = build(mid, hi, mins, maxs);
    mins[ax] = save_min;
    nodes[id].ax = ax;
    nodes[id].split = split;
    nodes[id].left = l;
    nodes[id].right = r;
    return id;
  }

  void query(const float *q, float *best_d, long *best_i, long node) const {
    const Node &nd = nodes[node];
    if (nd.ax < 0) {
      for (long i = nd.lo; i < nd.hi; i++) {
        float dx = q[0] - pts[3 * i], dy = q[1] - pts[3 * i + 1],
              dz = q[2] - pts[3 * i + 2];
        float d = dx * dx + dy * dy + dz * dz;
        if (d < *best_d) {
          *best_d = d;
          *best_i = index[i];
        }
      }
      return;
    }
    float diff = q[nd.ax] - nd.split;
    long near = diff < 0 ? nd.left : nd.right;
    long far = diff < 0 ? nd.right : nd.left;
    query(q, best_d, best_i, near);
    if (diff * diff < *best_d) query(q, best_d, best_i, far);
  }
};

void *fpv4d_kdtree_build(const float *pts, long n) {
  if (n <= 0) return nullptr;
  KdTree *t = new KdTree();
  t->n = n;
  t->pts.assign(pts, pts + 3 * n);
  t->index.resize(n);
  for (long i = 0; i < n; i++) t->index[i] = i;
  float mins[3] = {1e30f, 1e30f, 1e30f}, maxs[3] = {-1e30f, -1e30f, -1e30f};
  for (long i = 0; i < n; i++)
    for (int a = 0; a < 3; a++) {
      mins[a] = std::min(mins[a], pts[3 * i + a]);
      maxs[a] = std::max(maxs[a], pts[3 * i + a]);
    }
  t->build(0, n, mins, maxs);
  return t;
}

void fpv4d_kdtree_free(void *tree) { delete (KdTree *)tree; }

// Nearest neighbor for nq query points: fills dist_sq[nq], idx[nq].
void fpv4d_kdtree_query(const void *tree, const float *q, long nq,
                        float *dist_sq, long *idx) {
  const KdTree *t = (const KdTree *)tree;
  for (long i = 0; i < nq; i++) {
    float best = 1e30f;
    long bi = -1;
    t->query(q + 3 * i, &best, &bi, 0);
    dist_sq[i] = best;
    idx[i] = bi;
  }
}

// ---------------------------------------------------------------------------
// Voxel candidate tables for the contact NN (fpv4d.ops.nn.VoxelGrid)
//
// The Python builder (numpy loop over active cells) takes 1.5-3 s for
// 1e5-5e5-point scenes — a visible chunk of solver construction /
// first-solve latency. Same semantics: per cell, the <= K points of
// its 3x3x3 neighborhood nearest to the cell center, point order
// within a cell = original input order.
// ---------------------------------------------------------------------------

// Phase 1: choose the grid box. Coarsens h by 1.5x until the cell
// count fits max_cells. Writes origin[3], dims[3], h_out[1]; returns
// the cell count (or -1).
long fpv4d_cand_grid_plan(const float *pts, long n, double h,
                          long max_cells, float *origin, long *dims,
                          double *h_out) {
  if (n <= 0 || h <= 0) return -1;
  // untrusted input hardening: a single inf coordinate makes
  // (long)ceil(...) below undefined behavior, an extreme-but-finite
  // extent overflows the signed cell product, and a NaN coordinate is
  // INVISIBLE here (std::min/max drop NaN operands) yet still feeds
  // the fill phase's cell binning with UB casts — any of them would
  // index counts[] with garbage (heap corruption, not a catchable
  // error). Scan every coordinate; reject and let the caller fall
  // back to the numpy builder.
  float mins[3] = {1e30f, 1e30f, 1e30f};
  float maxs[3] = {-1e30f, -1e30f, -1e30f};
  bool finite = true;
  for (long i = 0; i < n; i++)
    for (int a = 0; a < 3; a++) {
      float v = pts[3 * i + a];
      finite &= std::isfinite(v);
      mins[a] = std::min(mins[a], v);
      maxs[a] = std::max(maxs[a], v);
    }
  if (!finite) return -1;
  for (int a = 0; a < 3; a++)
    if ((double)maxs[a] - (double)mins[a] > 1e12)
      return -1;
  for (int a = 0; a < 3; a++) {
    mins[a] -= h;
    maxs[a] += h;
  }
  long d[3];
  for (;;) {
    long prod = 1;
    for (int a = 0; a < 3; a++) {
      // FLOAT division: the numpy builder computes (maxs-mins)/h on
      // f32 arrays (python-float h stays weak), so exact-multiple
      // extents must round identically here — f64 here could give
      // 40.000000000000007 -> dims 41 where numpy's f32 gives 40
      double cells = std::ceil((double)(float)((maxs[a] - mins[a])
                                               / (float)h));
      if (!(cells >= 1)) cells = 1;
      if (cells > 1e15) return -1;      // cast would overflow
      d[a] = (long)cells;
      if (prod > max_cells / std::max(1L, d[a]) + 1) {
        prod = max_cells + 1;           // saturate, no overflow
        break;
      }
      prod *= d[a];
    }
    if (prod <= max_cells) break;
    h *= 1.5;  // double: matches the numpy builder's f64 coarsening
  }
  for (int a = 0; a < 3; a++) {
    origin[a] = mins[a];
    dims[a] = d[a];
  }
  *h_out = h;
  return d[0] * d[1] * d[2];
}

// Phase 2: fill cand_pts [num_cells*K*3] f32 and cand_idx
// [num_cells*K] i32 (-1 = empty slot). Returns 0 or -1.
long fpv4d_cand_grid_fill(const float *pts, long n, const float *origin,
                          const long *dims, double h, long K,
                          float *cand_pts, int *cand_idx) {
  if (n <= 0 || h <= 0 || K <= 0) return -1;
  const long dx = dims[0], dy = dims[1], dz = dims[2];
  const long num_cells = dx * dy * dz;
  memset(cand_pts, 0, sizeof(float) * num_cells * K * 3);
  for (long i = 0; i < num_cells * K; i++) cand_idx[i] = -1;

  // counting sort of points by flat cell id (stable: original order
  // preserved within a cell, matching the numpy builder)
  std::vector<long> cell_of(n);
  std::vector<long> counts(num_cells + 1, 0);
  const float hf = (float)h;
  for (long i = 0; i < n; i++) {
    long c[3];
    for (int a = 0; a < 3; a++) {
      // f32 subtract + f32 DIVIDE, matching numpy's
      // floor((pts - mins) / h) on f32 arrays bit for bit
      long v = (long)std::floor((pts[3 * i + a] - origin[a]) / hf);
      c[a] = std::min(std::max(v, 0L), dims[a] - 1);
    }
    cell_of[i] = (c[0] * dy + c[1]) * dz + c[2];
    counts[cell_of[i] + 1]++;
  }
  std::vector<long> starts(num_cells + 1);
  starts[0] = 0;
  for (long c = 0; c < num_cells; c++) starts[c + 1] = starts[c] + counts[c + 1];
  std::vector<long> order(n);
  {
    std::vector<long> cursor(starts.begin(), starts.end() - 1);
    for (long i = 0; i < n; i++) order[cursor[cell_of[i]]++] = i;
  }

  // active cells = union of 3x3x3 neighborhoods of occupied cells
  std::vector<char> active(num_cells, 0);
  for (long c = 0; c < num_cells; c++) {
    if (starts[c + 1] == starts[c]) continue;
    long cx = c / (dy * dz), cy = (c / dz) % dy, cz = c % dz;
    for (long ox = -1; ox <= 1; ox++) {
      long nx = cx + ox;
      if (nx < 0 || nx >= dx) continue;
      for (long oy = -1; oy <= 1; oy++) {
        long ny = cy + oy;
        if (ny < 0 || ny >= dy) continue;
        for (long oz = -1; oz <= 1; oz++) {
          long nz = cz + oz;
          if (nz < 0 || nz >= dz) continue;
          active[(nx * dy + ny) * dz + nz] = 1;
        }
      }
    }
  }

  std::vector<long> gathered;
  std::vector<std::pair<float, long>> byd;
  for (long c = 0; c < num_cells; c++) {
    if (!active[c]) continue;
    long cx = c / (dy * dz), cy = (c / dz) % dy, cz = c % dz;
    gathered.clear();
    for (long ox = -1; ox <= 1; ox++) {
      long nx = cx + ox;
      if (nx < 0 || nx >= dx) continue;
      for (long oy = -1; oy <= 1; oy++) {
        long ny = cy + oy;
        if (ny < 0 || ny >= dy) continue;
        for (long oz = -1; oz <= 1; oz++) {
          long nz = cz + oz;
          if (nz < 0 || nz >= dz) continue;
          long nc = (nx * dy + ny) * dz + nz;
          for (long k = starts[nc]; k < starts[nc + 1]; k++)
            gathered.push_back(order[k]);
        }
      }
    }
    if (gathered.empty()) continue;
    if ((long)gathered.size() > K) {
      float ctr[3] = {origin[0] + (cx + 0.5f) * h,
                      origin[1] + (cy + 0.5f) * h,
                      origin[2] + (cz + 0.5f) * h};
      byd.clear();
      byd.reserve(gathered.size());
      for (long gi : gathered) {
        float ddx = pts[3 * gi] - ctr[0], ddy = pts[3 * gi + 1] - ctr[1],
              ddz = pts[3 * gi + 2] - ctr[2];
        byd.emplace_back(ddx * ddx + ddy * ddy + ddz * ddz, gi);
      }
      // K smallest in sorted order: partial_sort is O(n log K) vs a
      // full sort's O(n log n) — the selection dominates on dense
      // scenes (ties may order differently than numpy's argsort;
      // both are unstable there)
      std::partial_sort(byd.begin(), byd.begin() + K, byd.end(),
                        [](const std::pair<float, long> &a,
                           const std::pair<float, long> &b) {
                          return a.first < b.first;
                        });
      gathered.clear();
      for (long k = 0; k < K; k++) gathered.push_back(byd[k].second);
    }
    for (size_t k = 0; k < gathered.size(); k++) {
      long gi = gathered[k];
      cand_idx[c * K + (long)k] = (int)gi;
      memcpy(&cand_pts[(c * K + (long)k) * 3], &pts[3 * gi], 12);
    }
  }
  return 0;
}

}  // extern "C"
