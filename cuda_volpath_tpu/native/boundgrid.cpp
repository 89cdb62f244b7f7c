// Native bound-grid (majorant/minorant) builder.
//
// Computes, for every voxel of a dense (nz, ny, nx) volume, the min and max
// over a cube window of radius r voxels, as three separable axis sweeps.
// Each 1D sweep uses the van Herk / Gil-Werman algorithm: split the row into
// blocks of the window length, take forward and backward running extrema
// inside each block, and combine two scan values per output — O(N) with
// two passes, no deques, trivially parallel across rows (OpenMP).
//
// This is the scale-up path for very large grids; semantics are identical to
// the numpy log-doubling builder in ops/boundgrid.py (windows clamp at the
// array edges), which remains the default and the test oracle.
//
// Build: make -C cuda_volpath_tpu/native   (produces libboundgrid.so)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

template <typename T, bool kMax>
inline T combine(T a, T b) {
    return kMax ? std::max(a, b) : std::min(a, b);
}

// 1D windowed extrema over a strided row: out[i] = extrema(in[i-r .. i+r]),
// window clamped to [0, n).
template <typename T, bool kMax>
void sweep_row(const T* in, T* out, long n, long stride, long r,
               T* fwd, T* bwd) {
    const T ident = kMax ? std::numeric_limits<T>::lowest()
                         : std::numeric_limits<T>::max();
    const long w = 2 * r + 1;
    // pad past n + r so fwd[i + r] exists for every i without clamping
    const long nblocks = (n + r + w - 1) / w;
    const long padded = nblocks * w;

    // forward scan: running extrema restarting at block boundaries
    for (long b = 0; b < nblocks; ++b) {
        T acc = ident;
        for (long k = 0; k < w; ++k) {
            long i = b * w + k;
            T v = (i < n) ? in[i * stride] : ident;
            acc = combine<T, kMax>(acc, v);
            fwd[i] = acc;
        }
    }
    // backward scan
    for (long b = 0; b < nblocks; ++b) {
        T acc = ident;
        for (long k = w - 1; k >= 0; --k) {
            long i = b * w + k;
            T v = (i < n) ? in[i * stride] : ident;
            acc = combine<T, kMax>(acc, v);
            bwd[i] = acc;
        }
    }
    for (long i = 0; i < n; ++i) {
        const long lo = i - r;
        const long hi = i + r;  // < padded by construction
        // fwd[hi] covers [blockstart(hi) .. hi]; bwd[lo] covers
        // [lo .. blockend(lo)]; the window spans exactly one block length,
        // so their union is exactly the (edge-clamped) window.  When
        // lo < 0 the whole window sits inside block 0 and fwd[hi] alone
        // covers [0 .. hi].
        const T right = fwd[hi];
        out[i * stride] =
            (lo >= 0) ? combine<T, kMax>(bwd[lo], right) : right;
    }
}

template <typename T>
void build(const T* vol, long nx, long ny, long nz, long r, T* out2) {
    const long nxy = nx * ny;
    const long total = nxy * nz;
    std::vector<T> vmax(vol, vol + total), vmin(vol, vol + total);
    std::vector<T> tmp_max(total), tmp_min(total);
    const long w = 2 * r + 1;

    // x sweep (stride 1), then y (stride nx), then z (stride nxy)
    struct Axis { long n, stride, nrows; };
    Axis axes[3] = {{nx, 1, ny * nz}, {ny, nx, nx * nz}, {nz, nxy, nxy}};

    for (int a = 0; a < 3; ++a) {
        const long n = axes[a].n, stride = axes[a].stride;
        const long padded = ((n + r + w - 1) / w) * w;
#pragma omp parallel
        {
            std::vector<T> fwd(padded), bwd(padded);
#pragma omp for
            for (long row = 0; row < axes[a].nrows; ++row) {
                long base;
                if (a == 0) {            // rows are (y,z): base = y*nx + z*nxy
                    base = (row % ny) * nx + (row / ny) * nxy;
                } else if (a == 1) {     // rows are (x,z)
                    base = (row % nx) + (row / nx) * nxy;
                } else {                 // rows are (x,y)
                    base = row;
                }
                sweep_row<T, true>(vmax.data() + base, tmp_max.data() + base,
                                   n, stride, r, fwd.data(), bwd.data());
                sweep_row<T, false>(vmin.data() + base, tmp_min.data() + base,
                                    n, stride, r, fwd.data(), bwd.data());
            }
        }
        vmax.swap(tmp_max);
        vmin.swap(tmp_min);
    }

    for (long i = 0; i < total; ++i) {
        out2[2 * i] = vmax[i];
        out2[2 * i + 1] = vmin[i];
    }
}

// --- coarse multiscale pyramid + leap channel ------------------------------
//
// Mirrors ops/boundgrid.py::build_multiscale_bounds exactly (which remains
// the oracle): block (min,max) reduce by `stride`, then per-scale Chebyshev
// dilation by rc[s] coarse cells, plus the power-of-two distance-to-solid
// leap code as the final channel.

template <typename T, bool kMax>
void dilate3(std::vector<T>& a, long ncx, long ncy, long ncz, long r,
             std::vector<T>& tmp) {
    if (r <= 0) return;
    const long ncxy = ncx * ncy;
    struct Axis { long n, stride, nrows; };
    Axis axes[3] = {{ncx, 1, ncy * ncz}, {ncy, ncx, ncx * ncz},
                    {ncz, ncxy, ncxy}};
    const long w = 2 * r + 1;
    for (int ax = 0; ax < 3; ++ax) {
        const long n = axes[ax].n, stride = axes[ax].stride;
        const long padded = ((n + r + w - 1) / w) * w;
#pragma omp parallel
        {
            std::vector<T> fwd(padded), bwd(padded);
#pragma omp for
            for (long row = 0; row < axes[ax].nrows; ++row) {
                long base;
                if (ax == 0) {
                    base = (row % ncy) * ncx + (row / ncy) * ncxy;
                } else if (ax == 1) {
                    base = (row % ncx) + (row / ncx) * ncxy;
                } else {
                    base = row;
                }
                sweep_row<T, kMax>(a.data() + base, tmp.data() + base,
                                   n, stride, r, fwd.data(), bwd.data());
            }
        }
        a.swap(tmp);
    }
}

template <typename T>
void build_ms(const T* vol, long nx, long ny, long nz, long stride,
              long nscales, const long* rcs, long leap_cap, T* out) {
    const long ncx = (nx + stride - 1) / stride;
    const long ncy = (ny + stride - 1) / stride;
    const long ncz = (nz + stride - 1) / stride;
    const long nc = ncx * ncy * ncz;
    const long chans = 2 * nscales + 1;

    std::vector<T> cmax(nc), cmin(nc);
#pragma omp parallel for
    for (long cz = 0; cz < ncz; ++cz) {
        for (long cy = 0; cy < ncy; ++cy) {
            for (long cx = 0; cx < ncx; ++cx) {
                T mx = std::numeric_limits<T>::lowest();
                T mn = std::numeric_limits<T>::max();
                const long z1 = std::min(nz, (cz + 1) * stride);
                const long y1 = std::min(ny, (cy + 1) * stride);
                const long x1 = std::min(nx, (cx + 1) * stride);
                for (long z = cz * stride; z < z1; ++z)
                    for (long y = cy * stride; y < y1; ++y)
                        for (long x = cx * stride; x < x1; ++x) {
                            T v = vol[x + nx * (y + ny * z)];
                            mx = std::max(mx, v);
                            mn = std::min(mn, v);
                        }
                cmax[cx + ncx * (cy + ncy * cz)] = mx;
                cmin[cx + ncx * (cy + ncy * cz)] = mn;
            }
        }
    }

    std::vector<T> tmp(nc), a(nc), b(nc);
    for (long s = 0; s < nscales; ++s) {
        a = cmax;
        b = cmin;
        dilate3<T, true>(a, ncx, ncy, ncz, rcs[s], tmp);
        dilate3<T, false>(b, ncx, ncy, ncz, rcs[s], tmp);
        for (long i = 0; i < nc; ++i) {
            out[i * chans + 2 * s] = a[i];
            out[i * chans + 2 * s + 1] = b[i];
        }
    }

    // leap code: largest power-of-two Chebyshev radius with no solid inside
    std::vector<T> occ(nc), leap(nc, T(0));
    for (long i = 0; i < nc; ++i) occ[i] = cmax[i] > T(0) ? T(1) : T(0);
    for (long r = 1; r <= leap_cap; r *= 2) {
        a = occ;
        dilate3<T, true>(a, ncx, ncy, ncz, r, tmp);
        bool any_empty = false;
        for (long i = 0; i < nc; ++i) {
            if (a[i] == T(0)) {
                leap[i] = T(std::min<long>(r, leap_cap));
                any_empty = true;
            }
        }
        if (!any_empty) break;
    }
    for (long i = 0; i < nc; ++i) out[i * chans + 2 * nscales] = leap[i];
}

}  // namespace

extern "C" {

void build_multiscale_bounds_u8(const uint8_t* vol, long nx, long ny,
                                long nz, long stride, long nscales,
                                const long* rcs, long leap_cap,
                                uint8_t* out) {
    build_ms<uint8_t>(vol, nx, ny, nz, stride, nscales, rcs, leap_cap, out);
}

void build_multiscale_bounds_f32(const float* vol, long nx, long ny,
                                 long nz, long stride, long nscales,
                                 const long* rcs, long leap_cap,
                                 float* out) {
    build_ms<float>(vol, nx, ny, nz, stride, nscales, rcs, leap_cap, out);
}

void build_bound_grid_u8(const uint8_t* vol, long nx, long ny, long nz,
                         long r, uint8_t* out2) {
    build<uint8_t>(vol, nx, ny, nz, r, out2);
}

void build_bound_grid_f32(const float* vol, long nx, long ny, long nz,
                          long r, float* out2) {
    build<float>(vol, nx, ny, nz, r, out2);
}

}  // extern "C"
