// djbio — native host-side data plane for dj_brdf_tpu.
//
// The reference does its file parsing and map building in C++
// (merl::merl dj_brdf.h:963-983, utia::utia 1039-1059 + normalize
// 1162-1177, utils/dmap2nmap.cpp, utils/nmap2leanmap.cpp); this
// library is the equivalent native layer feeding device arrays:
// single-pass parse + dtype conversion + normalization on the host,
// handing ready-to-upload float32 buffers to the Python/JAX side via
// ctypes. Multithreaded with OpenMP where the image is large enough
// to matter.
//
// build: make (see Makefile; produces libdjbio.so)

#include <cstdio>
#include <cstdint>
#include <cstring>
#include <cmath>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {
constexpr int kMerlThetaH = 90;
constexpr int kMerlThetaD = 90;
constexpr int kMerlPhiD = 180;
constexpr long kMerlCount = 3L * kMerlThetaH * kMerlThetaD * kMerlPhiD;
constexpr long kUtiaCount = 3L * 6 * 48 * 6 * 48;
}  // namespace

extern "C" {

// Returns 0 on success, negative error codes otherwise.
int djbio_load_merl(const char *path, float *out /* kMerlCount */) {
    FILE *f = fopen(path, "rb");
    if (!f) return -1;
    int32_t dims[3];
    if (fread(dims, 4, 3, f) != 3) { fclose(f); return -2; }
    long n = (long)dims[0] * dims[1] * dims[2];
    if (n * 3 != kMerlCount) { fclose(f); return -3; }

    const long chunk = 1 << 16;
    double buf[chunk];
    long done = 0;
    while (done < kMerlCount) {
        long want = kMerlCount - done < chunk ? kMerlCount - done : chunk;
        if ((long)fread(buf, 8, want, f) != want) { fclose(f); return -4; }
        for (long k = 0; k < want; ++k) out[done + k] = (float)buf[k];
        done += want;
    }
    fclose(f);
    return 0;
}

// Returns the number of clamped negative samples (>= 0) so the caller
// can reproduce the reference's per-value warning (dj_brdf.h:1166-1169)
// as an aggregated DJB_LOG count; negative return = error.
int djbio_load_utia(const char *path, float *out /* kUtiaCount */) {
    FILE *f = fopen(path, "rb");
    if (!f) return -1;
    const long chunk = 1 << 16;
    double buf[chunk];
    long done = 0;
    long negatives = 0;
    const float scale = 1.0f / 140.0f;  // dj_brdf.h:1174
    while (done < kUtiaCount) {
        long want = kUtiaCount - done < chunk ? kUtiaCount - done : chunk;
        if ((long)fread(buf, 8, want, f) != want) { fclose(f); return -4; }
        for (long k = 0; k < want; ++k) {
            negatives += buf[k] < 0.0;
            double v = buf[k] < 0.0 ? 0.0 : buf[k];  // clamp, dj_brdf.h:1170
            out[done + k] = (float)(v * scale);
        }
        done += want;
    }
    fclose(f);
    return negatives > 0x7fffffff ? 0x7fffffff : (int)negatives;
}

// displacement (h*w, [0,1]) -> unit normals (h*w*3), central differences
// (utils/dmap2nmap.cpp:13-44); border: 0 = repeat, 1 = clamp.
void djbio_dmap_to_nmap(const float *dmap, int h, int w, float scale,
                        int clamp_border, float *nmap) {
#pragma omp parallel for schedule(static)
    for (int j = 0; j < h; ++j) {
        for (int i = 0; i < w; ++i) {
            auto wrap = [&](int v, int n) {
                if (clamp_border) return v < 0 ? 0 : (v >= n ? n - 1 : v);
                return ((v % n) + n) % n;
            };
            float z_l = dmap[j * w + wrap(i - 1, w)];
            float z_r = dmap[j * w + wrap(i + 1, w)];
            float z_b = dmap[wrap(j + 1, h) * w + i];
            float z_t = dmap[wrap(j - 1, h) * w + i];
            float sx = (float)w * 0.5f * scale * (z_r - z_l);
            float sy = (float)h * 0.5f * scale * (z_t - z_b);
            float inv = 1.0f / sqrtf(1.0f + sx * sx + sy * sy);
            float *px = nmap + 3 * (j * w + i);
            px[0] = -sx * inv;
            px[1] = -sy * inv;
            px[2] = inv;
        }
    }
}

// normal map (h*w*3) -> LEAN moments, 5 planes of h*w
// (utils/nmap2leanmap.cpp:18-54; bias per nmap2leanmap_biased.cpp).
void djbio_nmap_to_lean(const float *nmap, int h, int w,
                        float base_roughness, float bias, float *lean) {
    const long n = (long)h * w;
    const float br2 = 0.5f * base_roughness * base_roughness;
    float *E1 = lean, *E2 = lean + n, *E3 = lean + 2 * n;
    float *E4 = lean + 3 * n, *E5 = lean + 4 * n;
#pragma omp parallel for schedule(static)
    for (long k = 0; k < n; ++k) {
        float nz = nmap[3 * k + 2];
        if (nz < 1e-6f) nz = 1e-6f;
        float sx = -nmap[3 * k + 0] / nz;
        float sy = -nmap[3 * k + 1] / nz;
        E1[k] = sx + bias;
        E2[k] = sy + bias;
        E3[k] = sx * sx + br2;
        E4[k] = sy * sy + br2;
        E5[k] = sx * sy + bias * bias;
    }
}

// one mip level: 2x2 mean of each of the 5 moment planes
void djbio_lean_mip_reduce(const float *lean, int h, int w, float *out) {
    const long n = (long)h * w;
    const int h2 = h / 2, w2 = w / 2;
    const long n2 = (long)h2 * w2;
    for (int p = 0; p < 5; ++p) {
        const float *src = lean + p * n;
        float *dst = out + p * n2;
#pragma omp parallel for schedule(static)
        for (int j = 0; j < h2; ++j)
            for (int i = 0; i < w2; ++i) {
                float s = src[(2 * j) * w + 2 * i]
                        + src[(2 * j) * w + 2 * i + 1]
                        + src[(2 * j + 1) * w + 2 * i]
                        + src[(2 * j + 1) * w + 2 * i + 1];
                dst[j * w2 + i] = 0.25f * s;
            }
    }
}

}  // extern "C"
