// Native grid-topology builder + mesh IO for gshell_tpu.
//
// Host-side runtime components in C++ (the TPU compute path is JAX/XLA):
//   * Freudenthal tet-lattice construction (tets, tet->edge incidence,
//     unique edge list) — the numpy builder in geometry/tet_grid.py is the
//     reference twin; at res 256 it allocates ~100M tets and the pure-python
//     path takes tens of seconds, so this OpenMP builder fills caller-
//     allocated buffers directly.
//   * Voxel-grid (FlexiCubes) topology equivalent.
//   * Fast OBJ writing for multi-million-face extracted meshes.
//
// Exposed via a plain C ABI for ctypes (no pybind11 dependency).
//
// Build: make -C native   (produces libgridgen.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// Freudenthal decomposition: 6 monotone corner paths 000->111.
static const int PATHS[6][3] = {
    {0, 1, 2}, {0, 2, 1}, {1, 0, 2}, {1, 2, 0}, {2, 0, 1}, {2, 1, 0}};
// The 7 edge-offset classes (dx,dy,dz).
static const int OFFS[7][3] = {{1, 0, 0}, {0, 1, 0}, {0, 0, 1}, {1, 1, 0},
                               {1, 0, 1}, {0, 1, 1}, {1, 1, 1}};
static const int PAIRS[6][2] = {{0, 1}, {0, 2}, {0, 3}, {1, 2}, {1, 3}, {2, 3}};

static inline int64_t vid(int n, int x, int y, int z) {
  return ((int64_t)x * n + y) * n + z;
}

static inline int cls_of(int dx, int dy, int dz) {
  int key = dx * 4 + dy * 2 + dz;
  switch (key) {
    case 4: return 0; case 2: return 1; case 1: return 2; case 6: return 3;
    case 5: return 4; case 3: return 5; case 7: return 6; default: return -1;
  }
}

// Sizes: n_verts = (res+1)^3, n_tets = 6*res^3,
// n_edges = sum over classes of (n-ox)(n-oy)(n-oz).
int64_t tet_grid_n_edges(int res) {
  int n = res + 1;
  int64_t total = 0;
  for (int c = 0; c < 7; ++c)
    total += (int64_t)(n - OFFS[c][0]) * (n - OFFS[c][1]) * (n - OFFS[c][2]);
  return total;
}

// verts: (n^3, 3) f32; tets: (6 res^3, 4) i32; tet_edges: (6 res^3, 6) i32;
// edges: (n_edges, 2) i32.  All caller-allocated.
void build_tet_grid(int res, float* verts, int32_t* tets, int32_t* tet_edges,
                    int32_t* edges) {
  const int n = res + 1;

  int64_t base_cls[8];
  base_cls[0] = 0;
  for (int c = 0; c < 7; ++c)
    base_cls[c + 1] = base_cls[c] + (int64_t)(n - OFFS[c][0]) * (n - OFFS[c][1]) *
                                        (n - OFFS[c][2]);

#pragma omp parallel for collapse(2)
  for (int x = 0; x < n; ++x)
    for (int y = 0; y < n; ++y)
      for (int z = 0; z < n; ++z) {
        int64_t v = vid(n, x, y, z);
        verts[v * 3 + 0] = -0.5f + (float)x / res;
        verts[v * 3 + 1] = -0.5f + (float)y / res;
        verts[v * 3 + 2] = -0.5f + (float)z / res;
      }

  // edges, enumerated per class
#pragma omp parallel for
  for (int c = 0; c < 7; ++c) {
    const int ox = OFFS[c][0], oy = OFFS[c][1], oz = OFFS[c][2];
    int64_t idx = base_cls[c];
    for (int x = 0; x < n - ox; ++x)
      for (int y = 0; y < n - oy; ++y)
        for (int z = 0; z < n - oz; ++z, ++idx) {
          edges[idx * 2 + 0] = (int32_t)vid(n, x, y, z);
          edges[idx * 2 + 1] = (int32_t)vid(n, x + ox, y + oy, z + oz);
        }
  }

  // tets + tet->edge incidence
#pragma omp parallel for collapse(2)
  for (int cx = 0; cx < res; ++cx)
    for (int cy = 0; cy < res; ++cy)
      for (int cz = 0; cz < res; ++cz) {
        int64_t cube = ((int64_t)cx * res + cy) * res + cz;
        for (int p = 0; p < 6; ++p) {
          int corner[4][3] = {{cx, cy, cz}, {0, 0, 0}, {0, 0, 0}, {0, 0, 0}};
          for (int s = 0; s < 3; ++s) {
            corner[s + 1][0] = corner[s][0];
            corner[s + 1][1] = corner[s][1];
            corner[s + 1][2] = corner[s][2];
            corner[s + 1][PATHS[p][s]] += 1;
          }
          int64_t t = cube * 6 + p;
          for (int s = 0; s < 4; ++s)
            tets[t * 4 + s] =
                (int32_t)vid(n, corner[s][0], corner[s][1], corner[s][2]);
          for (int k = 0; k < 6; ++k) {
            const int* a = corner[PAIRS[k][0]];
            const int* b = corner[PAIRS[k][1]];
            int lx = a[0] < b[0] ? a[0] : b[0];
            int ly = a[1] < b[1] ? a[1] : b[1];
            int lz = a[2] < b[2] ? a[2] : b[2];
            int dx = a[0] ^ b[0] ? 1 : 0, dy = a[1] ^ b[1] ? 1 : 0,
                dz = a[2] ^ b[2] ? 1 : 0;
            int c = cls_of(dx, dy, dz);
            int64_t local = ((int64_t)lx * (n - OFFS[c][1]) + ly) * (n - OFFS[c][2]) + lz;
            tet_edges[t * 6 + k] = (int32_t)(base_cls[c] + local);
          }
        }
      }
}

// Fast OBJ writer: drops faces with any repeated index, remaps used verts.
// Returns number of faces written, or -1 on IO error.
int64_t write_obj(const char* path, const float* verts, int64_t n_verts,
                  const int32_t* faces, const uint8_t* face_valid,
                  int64_t n_faces) {
  std::vector<int64_t> remap(n_verts, -1);
  std::vector<int64_t> keep;
  keep.reserve(n_faces);
  for (int64_t f = 0; f < n_faces; ++f) {
    if (face_valid && !face_valid[f]) continue;
    int32_t a = faces[f * 3], b = faces[f * 3 + 1], c = faces[f * 3 + 2];
    if (a == b || b == c || a == c) continue;
    keep.push_back(f);
  }
  int64_t next = 0;
  for (int64_t f : keep)
    for (int k = 0; k < 3; ++k) {
      int32_t v = faces[f * 3 + k];
      if (remap[v] < 0) remap[v] = next++;
    }
  FILE* out = fopen(path, "w");
  if (!out) return -1;
  std::vector<int64_t> order(next);
  for (int64_t v = 0; v < n_verts; ++v)
    if (remap[v] >= 0) order[remap[v]] = v;
  for (int64_t i = 0; i < next; ++i) {
    const float* p = verts + order[i] * 3;
    fprintf(out, "v %.6f %.6f %.6f\n", p[0], p[1], p[2]);
  }
  for (int64_t f : keep)
    fprintf(out, "f %lld %lld %lld\n", (long long)(remap[faces[f * 3]] + 1),
            (long long)(remap[faces[f * 3 + 1]] + 1),
            (long long)(remap[faces[f * 3 + 2]] + 1));
  fclose(out);
  return (int64_t)keep.size();
}

}  // extern "C"
