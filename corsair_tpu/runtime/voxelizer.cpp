// Host-side data-pipeline runtime: fast voxel quantization + batch collate.
//
// The TPU compute path is JAX/XLA; this library accelerates the host side
// of the data pipeline (the reference leaned on DataLoader worker
// processes + MinkowskiEngine's C++ sparse_quantize for the same job,
// datasets/CategoryDataset.py:179-197, ME.utils.sparse_collate).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <unordered_map>
#include <vector>
#include <thread>

extern "C" {

// Quantize: grid = floor(p / voxel); keep the first point per occupied
// voxel (in original order). Returns number of kept points.
// pts: [n, 3] float32; grid_out: [n, 3] int32; kept_idx_out: [n] int32.
int corsair_voxelize(const float* pts, int n, float voxel,
                     int32_t* grid_out, int32_t* kept_idx_out) {
    std::unordered_map<uint64_t, int> seen;
    seen.reserve(static_cast<size_t>(n) * 2);
    int kept = 0;
    const double inv = 1.0 / static_cast<double>(voxel);
    for (int i = 0; i < n; ++i) {
        const int32_t gx = static_cast<int32_t>(
            std::floor(static_cast<double>(pts[3 * i + 0]) * inv));
        const int32_t gy = static_cast<int32_t>(
            std::floor(static_cast<double>(pts[3 * i + 1]) * inv));
        const int32_t gz = static_cast<int32_t>(
            std::floor(static_cast<double>(pts[3 * i + 2]) * inv));
        // pack with 21 bits per (offset) coordinate
        const uint64_t key =
            ((static_cast<uint64_t>(static_cast<uint32_t>(gx) & 0x1FFFFF))
             << 42) |
            ((static_cast<uint64_t>(static_cast<uint32_t>(gy) & 0x1FFFFF))
             << 21) |
            (static_cast<uint64_t>(static_cast<uint32_t>(gz) & 0x1FFFFF));
        auto it = seen.emplace(key, kept);
        if (it.second) {
            grid_out[3 * kept + 0] = gx;
            grid_out[3 * kept + 1] = gy;
            grid_out[3 * kept + 2] = gz;
            kept_idx_out[kept] = i;
            ++kept;
        }
    }
    return kept;
}

// Batched quantize over `b` clouds laid out contiguously, parallelized
// over host threads. lengths: [b]; pts: concatenated [sum(n), 3].
// Outputs are per-cloud contiguous with the same offsets as the input;
// kept_counts: [b].
void corsair_voxelize_batch(const float* pts, const int32_t* lengths,
                            int b, float voxel, int32_t* grid_out,
                            int32_t* kept_idx_out, int32_t* kept_counts,
                            int n_threads) {
    std::vector<int64_t> offsets(b + 1, 0);
    for (int i = 0; i < b; ++i) offsets[i + 1] = offsets[i] + lengths[i];
    if (n_threads < 1) n_threads = 1;
    std::vector<std::thread> workers;
    auto work = [&](int t) {
        for (int i = t; i < b; i += n_threads) {
            kept_counts[i] = corsair_voxelize(
                pts + 3 * offsets[i], lengths[i], voxel,
                grid_out + 3 * offsets[i], kept_idx_out + offsets[i]);
        }
    };
    for (int t = 0; t < n_threads; ++t) workers.emplace_back(work, t);
    for (auto& w : workers) w.join();
}

// Collate pre-quantized grids into the padded static-capacity layout
// (coords int32 [cap,3] sentinel-filled, batch int32 [cap], valid uint8).
// Returns total rows written or -1 if capacity overflows.
int corsair_collate(const int32_t* grids, const int32_t* lengths, int b,
                    int capacity, int32_t sentinel, int32_t* coords_out,
                    int32_t* batch_out, uint8_t* valid_out) {
    int64_t total = 0;
    for (int i = 0; i < b; ++i) total += lengths[i];
    if (total > capacity) return -1;
    int row = 0;
    int64_t src = 0;
    for (int i = 0; i < b; ++i) {
        std::memcpy(coords_out + 3 * row, grids + 3 * src,
                    sizeof(int32_t) * 3 * lengths[i]);
        for (int j = 0; j < lengths[i]; ++j) {
            batch_out[row + j] = i;
            valid_out[row + j] = 1;
        }
        row += lengths[i];
        src += lengths[i];
    }
    for (int j = row; j < capacity; ++j) {
        coords_out[3 * j] = sentinel;
        coords_out[3 * j + 1] = sentinel;
        coords_out[3 * j + 2] = sentinel;
        batch_out[j] = b;
        valid_out[j] = 0;
    }
    return row;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Host-side kernel-map builder: the C++ twin of core/coordmap.py.
// Builds downsampled coordinate sets and gather tables with hash maps,
// threaded over query blocks — the same job MinkowskiEngine's C++
// coordinate manager does for the reference, feeding the TPU forward
// pass precomputed tables.

namespace {

inline int32_t floordiv(int32_t a, int32_t b) {
    return (a >= 0) ? a / b : -((-a + b - 1) / b);
}

inline uint64_t pack4(int32_t b, int32_t x, int32_t y, int32_t z) {
    return (static_cast<uint64_t>(static_cast<uint16_t>(b)) << 48) |
           (static_cast<uint64_t>(static_cast<uint16_t>(x + 32768)) << 32) |
           (static_cast<uint64_t>(static_cast<uint16_t>(y + 32768)) << 16) |
           static_cast<uint64_t>(static_cast<uint16_t>(z + 32768));
}

}  // namespace

extern "C" {

// Coarsen a coordinate set: unique(floor(c / step) * step) per batch,
// first-occurrence order. Returns count (<= capacity; extra dropped).
int corsair_downsample(const int32_t* coords, const int32_t* batch,
                       int n, int step, int capacity,
                       int32_t* out_coords, int32_t* out_batch) {
    std::unordered_map<uint64_t, int> seen;
    seen.reserve(static_cast<size_t>(n) * 2);
    int kept = 0;
    for (int i = 0; i < n && kept < capacity; ++i) {
        const int32_t cx = floordiv(coords[3 * i], step) * step;
        const int32_t cy = floordiv(coords[3 * i + 1], step) * step;
        const int32_t cz = floordiv(coords[3 * i + 2], step) * step;
        const uint64_t key = pack4(batch[i], cx, cy, cz);
        auto it = seen.emplace(key, kept);
        if (it.second) {
            out_coords[3 * kept] = cx;
            out_coords[3 * kept + 1] = cy;
            out_coords[3 * kept + 2] = cz;
            out_batch[kept] = batch[i];
            ++kept;
        }
    }
    return kept;
}

// Neighbor gather table: out[k * nq + j] = row of (q[j] + off[k]*dilation)
// in the table coordinate set, or miss_value. Threaded over queries.
void corsair_neighbor_table(const int32_t* tcoords, const int32_t* tbatch,
                            int nt, const int32_t* qcoords,
                            const int32_t* qbatch, int nq,
                            const int32_t* offsets, int K, int dilation,
                            int miss_value, int32_t* out, int n_threads) {
    std::unordered_map<uint64_t, int32_t> lut;
    lut.reserve(static_cast<size_t>(nt) * 2);
    for (int i = 0; i < nt; ++i) {
        lut.emplace(pack4(tbatch[i], tcoords[3 * i], tcoords[3 * i + 1],
                          tcoords[3 * i + 2]),
                    i);
    }
    if (n_threads < 1) n_threads = 1;
    auto work = [&](int t) {
        for (int j = t; j < nq; j += n_threads) {
            const int32_t qb = qbatch[j];
            const int32_t qx = qcoords[3 * j];
            const int32_t qy = qcoords[3 * j + 1];
            const int32_t qz = qcoords[3 * j + 2];
            for (int k = 0; k < K; ++k) {
                const uint64_t key = pack4(
                    qb, qx + offsets[3 * k] * dilation,
                    qy + offsets[3 * k + 1] * dilation,
                    qz + offsets[3 * k + 2] * dilation);
                auto it = lut.find(key);
                out[static_cast<int64_t>(k) * nq + j] =
                    (it == lut.end()) ? miss_value : it->second;
            }
        }
    };
    std::vector<std::thread> ws;
    for (int t = 0; t < n_threads; ++t) ws.emplace_back(work, t);
    for (auto& w : ws) w.join();
}

}  // extern "C"
