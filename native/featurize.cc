// Native featurization kernels for the host-side PDB→graph pipeline.
//
// The reference delegates these to the external `dssp` C++ binary and
// graphein (README.md:31-35); this library provides the hot inner loop —
// Shrake-Rupley solvent-accessible surface area over all atoms — as a
// cache-friendly O(N·P) kernel with a uniform-grid neighbor search,
// OpenMP-parallel over atoms.  Python fallback: pdb_graph._sasa_numpy.
//
// Build: make -C native   (produces libfeaturize.so, loaded via ctypes)

#include <cmath>
#include <cstdint>
#include <unordered_map>
#include <vector>

namespace {

struct CellKey {
  int64_t v;
  bool operator==(const CellKey& o) const { return v == o.v; }
};

struct CellHash {
  size_t operator()(const CellKey& k) const {
    return std::hash<int64_t>()(k.v);
  }
};

inline CellKey cell_of(double x, double y, double z, double inv) {
  int64_t cx = static_cast<int64_t>(std::floor(x * inv));
  int64_t cy = static_cast<int64_t>(std::floor(y * inv));
  int64_t cz = static_cast<int64_t>(std::floor(z * inv));
  // pack 3×21-bit signed
  auto pack = [](int64_t c) { return (c + (1 << 20)) & 0x1FFFFF; };
  return CellKey{(pack(cx) << 42) | (pack(cy) << 21) | pack(cz)};
}

}  // namespace

extern "C" void shrake_rupley(const double* coords, const double* radii,
                              int n_atoms, int n_points, double* out_areas) {
  // golden-spiral sphere points (matches pdb_graph._sphere_points)
  std::vector<double> sx(n_points), sy(n_points), sz(n_points);
  const double golden = M_PI * (1.0 + std::sqrt(5.0));
  for (int i = 0; i < n_points; ++i) {
    double ii = i + 0.5;
    double phi = std::acos(1.0 - 2.0 * ii / n_points);
    double theta = golden * ii;
    sx[i] = std::cos(theta) * std::sin(phi);
    sy[i] = std::sin(theta) * std::sin(phi);
    sz[i] = std::cos(phi);
  }

  double max_r = 0.0;
  for (int i = 0; i < n_atoms; ++i) max_r = std::max(max_r, radii[i]);
  const double cell = 2.0 * max_r;
  const double inv_cell = 1.0 / cell;

  // uniform grid
  std::unordered_map<CellKey, std::vector<int>, CellHash> grid;
  grid.reserve(n_atoms * 2);
  for (int i = 0; i < n_atoms; ++i) {
    grid[cell_of(coords[3 * i], coords[3 * i + 1], coords[3 * i + 2],
                 inv_cell)]
        .push_back(i);
  }

#pragma omp parallel for schedule(dynamic, 16)
  for (int i = 0; i < n_atoms; ++i) {
    const double xi = coords[3 * i], yi = coords[3 * i + 1],
                 zi = coords[3 * i + 2];
    const double ri = radii[i];

    // gather neighbors from 27 cells
    std::vector<int> nbrs;
    int64_t cx = static_cast<int64_t>(std::floor(xi * inv_cell));
    int64_t cy = static_cast<int64_t>(std::floor(yi * inv_cell));
    int64_t cz = static_cast<int64_t>(std::floor(zi * inv_cell));
    auto pack = [](int64_t c) { return (c + (1 << 20)) & 0x1FFFFF; };
    for (int dx = -1; dx <= 1; ++dx)
      for (int dy = -1; dy <= 1; ++dy)
        for (int dz = -1; dz <= 1; ++dz) {
          CellKey k{(pack(cx + dx) << 42) | (pack(cy + dy) << 21) |
                    pack(cz + dz)};
          auto it = grid.find(k);
          if (it == grid.end()) continue;
          for (int j : it->second) {
            if (j == i) continue;
            double dxx = coords[3 * j] - xi, dyy = coords[3 * j + 1] - yi,
                   dzz = coords[3 * j + 2] - zi;
            double d2 = dxx * dxx + dyy * dyy + dzz * dzz;
            double rr = ri + radii[j];
            if (d2 < rr * rr) nbrs.push_back(j);
          }
        }

    int accessible = 0;
    for (int p = 0; p < n_points; ++p) {
      const double px = xi + sx[p] * ri, py = yi + sy[p] * ri,
                   pz = zi + sz[p] * ri;
      bool buried = false;
      for (int j : nbrs) {
        double dxx = px - coords[3 * j], dyy = py - coords[3 * j + 1],
               dzz = pz - coords[3 * j + 2];
        if (dxx * dxx + dyy * dyy + dzz * dzz <
            radii[j] * radii[j]) {
          buried = true;
          break;
        }
      }
      if (!buried) ++accessible;
    }
    out_areas[i] = 4.0 * M_PI * ri * ri *
                   (static_cast<double>(accessible) / n_points);
  }
}
