// legmov_native — native host runtime for legmov_tpu.
//
// The reference keeps its host runtime in C++ (math_util.cpp binary IO,
// cross_compiled.cu host bridge, octree_util.cu host tree machinery).  The
// TPU framework's host-side hot paths live here: parallel bucket-grid
// construction for 10M+ point terrain maps (the data-loader feeding
// ops/grid.py) and AoS<->SoA layout conversion for the .bin protocol.
// Exposed as a plain C ABI consumed via ctypes (legmov_tpu/native.py).
//
// Build: make -C native   (g++ -O3 -fopenmp -shared -fPIC)

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// Bin pts[n,3] into a dense grid table[n_cells, cap, 3] (sentinel-padded)
// + counts[n_cells].  Two-pass: atomic count, then atomic-slot scatter.
// Grid geometry: cell index = floor((p - origin) / cell), dims = (nx,ny,nz),
// flat = (ix*ny + iy)*nz + iz — identical to ops/grid.py build_grid.
// Returns 0 on success, -1 if any point falls outside dims.
int bucket_grid(const float* pts, int64_t n, const float* origin, float cell,
                const int64_t* dims, float* table, int32_t* counts,
                int64_t cap, float sentinel) {
    const int64_t nx = dims[0], ny = dims[1], nz = dims[2];
    const int64_t n_cells = nx * ny * nz;
    std::atomic<int32_t>* slots =
        reinterpret_cast<std::atomic<int32_t>*>(counts);
    for (int64_t c = 0; c < n_cells; c++) counts[c] = 0;

    const int64_t table_len = n_cells * cap * 3;
#pragma omp parallel for
    for (int64_t i = 0; i < table_len; i++) table[i] = sentinel;

    std::atomic<int> bad(0);
#pragma omp parallel for
    for (int64_t i = 0; i < n; i++) {
        const float* p = pts + i * 3;
        int64_t ix = (int64_t)std::floor((p[0] - origin[0]) / cell);
        int64_t iy = (int64_t)std::floor((p[1] - origin[1]) / cell);
        int64_t iz = (int64_t)std::floor((p[2] - origin[2]) / cell);
        if (ix < 0 || iy < 0 || iz < 0 || ix >= nx || iy >= ny || iz >= nz) {
            bad.store(1, std::memory_order_relaxed);
            continue;
        }
        int64_t flat = (ix * ny + iy) * nz + iz;
        int32_t slot = slots[flat].fetch_add(1, std::memory_order_relaxed);
        if (slot < cap) {
            float* dst = table + (flat * cap + slot) * 3;
            dst[0] = p[0];
            dst[1] = p[1];
            dst[2] = p[2];
        }
    }
    return bad.load() ? -1 : 0;
}

// Max points in any cell for the given geometry (to size `cap`).
int64_t bucket_max_count(const float* pts, int64_t n, const float* origin,
                         float cell, const int64_t* dims, int32_t* counts) {
    const int64_t nx = dims[0], ny = dims[1], nz = dims[2];
    const int64_t n_cells = nx * ny * nz;
    std::atomic<int32_t>* slots =
        reinterpret_cast<std::atomic<int32_t>*>(counts);
    for (int64_t c = 0; c < n_cells; c++) counts[c] = 0;
#pragma omp parallel for
    for (int64_t i = 0; i < n; i++) {
        const float* p = pts + i * 3;
        int64_t ix = (int64_t)std::floor((p[0] - origin[0]) / cell);
        int64_t iy = (int64_t)std::floor((p[1] - origin[1]) / cell);
        int64_t iz = (int64_t)std::floor((p[2] - origin[2]) / cell);
        if (ix < 0 || iy < 0 || iz < 0 || ix >= nx || iy >= ny || iz >= nz)
            continue;
        int64_t flat = (ix * ny + iy) * nz + iz;
        slots[flat].fetch_add(1, std::memory_order_relaxed);
    }
    int64_t mx = 0;
    for (int64_t c = 0; c < n_cells; c++)
        if (counts[c] > mx) mx = counts[c];
    return mx;
}

// CSR build: sort pts[n,3] by cell id (z-fastest flat order) into SoA
// component arrays xs/ys/zs[n] + starts[n_cells+1] prefix offsets — the
// storage consumed by ops/csr_grid.py (12 B/point, no fixed-cap padding).
// Counting sort: atomic per-cell count, exclusive prefix, atomic-slot
// scatter; order within a cell is nondeterministic (cell membership, not
// order, is what the solvers reduce over).  Returns 0, or -1 if any point
// is outside dims.
int csr_grid(const float* pts, int64_t n, const float* origin, float cell,
             const int64_t* dims, float* xs, float* ys, float* zs,
             int32_t* starts /* n_cells+1 */, int32_t* scratch /* n_cells */) {
    const int64_t nx = dims[0], ny = dims[1], nz = dims[2];
    const int64_t n_cells = nx * ny * nz;
    std::atomic<int32_t>* cnt =
        reinterpret_cast<std::atomic<int32_t>*>(scratch);
    for (int64_t c = 0; c < n_cells; c++) scratch[c] = 0;

    std::atomic<int> bad(0);
#pragma omp parallel for
    for (int64_t i = 0; i < n; i++) {
        const float* p = pts + i * 3;
        int64_t ix = (int64_t)std::floor((p[0] - origin[0]) / cell);
        int64_t iy = (int64_t)std::floor((p[1] - origin[1]) / cell);
        int64_t iz = (int64_t)std::floor((p[2] - origin[2]) / cell);
        if (ix < 0 || iy < 0 || iz < 0 || ix >= nx || iy >= ny || iz >= nz) {
            bad.store(1, std::memory_order_relaxed);
            continue;
        }
        cnt[(ix * ny + iy) * nz + iz].fetch_add(1,
                                                std::memory_order_relaxed);
    }
    if (bad.load()) return -1;

    starts[0] = 0;
    for (int64_t c = 0; c < n_cells; c++)
        starts[c + 1] = starts[c] + scratch[c];

    // reuse scratch as per-cell write cursors
    for (int64_t c = 0; c < n_cells; c++) scratch[c] = starts[c];
#pragma omp parallel for
    for (int64_t i = 0; i < n; i++) {
        const float* p = pts + i * 3;
        int64_t ix = (int64_t)std::floor((p[0] - origin[0]) / cell);
        int64_t iy = (int64_t)std::floor((p[1] - origin[1]) / cell);
        int64_t iz = (int64_t)std::floor((p[2] - origin[2]) / cell);
        int64_t flat = (ix * ny + iy) * nz + iz;
        int32_t dst = cnt[flat].fetch_add(1, std::memory_order_relaxed);
        xs[dst] = p[0];
        ys[dst] = p[1];
        zs[dst] = p[2];
    }
    return 0;
}

// [n,3] AoS -> 3x[n] SoA (the .bin component-file layout,
// math_util.cpp:130-170 savef3Arrayto3files).
void aos_to_soa(const float* aos, int64_t n, float* x, float* y, float* z) {
#pragma omp parallel for
    for (int64_t i = 0; i < n; i++) {
        x[i] = aos[i * 3 + 0];
        y[i] = aos[i * 3 + 1];
        z[i] = aos[i * 3 + 2];
    }
}

// 3x[n] SoA -> [n,3] AoS (math_util.cpp:106-128 threeArrays2float3Arr).
void soa_to_aos(const float* x, const float* y, const float* z, int64_t n,
                float* aos) {
#pragma omp parallel for
    for (int64_t i = 0; i < n; i++) {
        aos[i * 3 + 0] = x[i];
        aos[i * 3 + 1] = y[i];
        aos[i * 3 + 2] = z[i];
    }
}

// Sequential sphere-clip deformations (terrain/maps.py clip_to_sphere,
// reference maps.py:173-185 clip2sphere): craters[k] = (cx, cy, cz, r,
// down).  Each point's z evolves through the spheres in order, but
// points are independent — parallel over points, sequential over
// spheres, double math in the exact order of the NumPy loop.
void moon_craters(double* z, const double* xs, const double* ys, int64_t n,
                  const double* craters, int64_t n_craters) {
#pragma omp parallel for
    for (int64_t i = 0; i < n; i++) {
        double zi = z[i];
        const double xi = xs[i], yi = ys[i];
        for (int64_t k = 0; k < n_craters; k++) {
            const double* c = craters + k * 5;
            const double dx = xi - c[0];
            const double dy = yi - c[1];
            const double dz = zi - c[2];
            const double r = c[3];
            const double xy2 = dx * dx + dy * dy;
            if (xy2 + dz * dz <= r * r) {
                const bool down = c[4] > 0.5;
                const double zz = down ? dz : -dz;
                double cap = r * r - xy2;
                if (cap < 0.0) cap = 0.0;
                const double delta = std::sqrt(cap) + zz;
                zi -= down ? delta : -delta;
            }
        }
        z[i] = zi;
    }
}

// Perlin gradient noise on a pixel grid (terrain/perlin.py
// perlin_noise_2d): grad is the (r0+1) x (r1+1) x 2 unit-gradient
// lattice; out[nx, ny] gets the sqrt(2)-normalized 4-corner quintic
// blend.  Corner accumulation order matches the NumPy loop
// ((di, dj) = (0,0), (0,1), (1,0), (1,1)).
void perlin2d(double* out, int64_t nx, int64_t ny, const double* grad,
              int64_t r0, int64_t r1) {
    const int64_t cell0 = nx / r0, cell1 = ny / r1;
    const int64_t gy = r1 + 1;
    const double root2 = std::sqrt(2.0);
#pragma omp parallel for
    for (int64_t i = 0; i < nx; i++) {
        const int64_t i0 = i / cell0;
        const double u = (double)(i % cell0) / (double)cell0;
        const double fu = u * u * u * (u * (6.0 * u - 15.0) + 10.0);
        for (int64_t j = 0; j < ny; j++) {
            const int64_t j0 = j / cell1;
            const double v = (double)(j % cell1) / (double)cell1;
            const double fv = v * v * v * (v * (6.0 * v - 15.0) + 10.0);
            double acc = 0.0;
            for (int di = 0; di < 2; di++) {
                const double wi = di ? fu : 1.0 - fu;
                for (int dj = 0; dj < 2; dj++) {
                    const double wj = dj ? fv : 1.0 - fv;
                    const double* g =
                        grad + ((i0 + di) * gy + (j0 + dj)) * 2;
                    acc += wi * wj *
                           (g[0] * (u - di) + g[1] * (v - dj));
                }
            }
            out[i * ny + j] = root2 * acc;
        }
    }
}

int num_threads() {
#if defined(_OPENMP)
    return omp_get_max_threads();
#else
    return 1;
#endif
}

}  // extern "C"
