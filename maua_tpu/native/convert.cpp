// Host-side hot-path converters for the data loader and renderer.
//
// The reference JIT-compiles CUDA kernels at import (reference:
// op/fused_act.py:11-17); on TPU the device ops are XLA/Pallas, and the
// native code moves to where the host actually burns cycles: image layout /
// dtype conversion between the decoder (uint8 HWC), the training pipeline
// (float32 CHW in [-1,1]) and the video encoder (uint8 HWC). These loops are
// memory-bound; the C implementations are single-pass, cache-friendly, and
// OpenMP-parallel across the batch (production TPU hosts have many cores).
//
// Built at first import by maua_tpu/native/__init__.py (g++ -O3 -shared),
// bound with ctypes; every entry point has a numpy fallback.

#include <cstdint>
#include <cstring>

extern "C" {

// uint8 HWC [h, w, 3] -> float32 CHW [3, h, w], x/127.5 - 1
void hwc_u8_to_chw_f32(const uint8_t* src, float* dst, int64_t n, int64_t h, int64_t w) {
    const int64_t plane = h * w;
#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < n; ++b) {
        const uint8_t* s = src + b * plane * 3;
        float* d = dst + b * plane * 3;
        for (int64_t i = 0; i < plane; ++i) {
            d[i] = (float)s[3 * i] * (1.0f / 127.5f) - 1.0f;
            d[plane + i] = (float)s[3 * i + 1] * (1.0f / 127.5f) - 1.0f;
            d[2 * plane + i] = (float)s[3 * i + 2] * (1.0f / 127.5f) - 1.0f;
        }
    }
}

// float32 CHW [3, h, w] in [-1, 1] -> uint8 HWC [h, w, 3], clamp + (x+1)*127.5
void chw_f32_to_hwc_u8(const float* src, uint8_t* dst, int64_t n, int64_t h, int64_t w) {
    const int64_t plane = h * w;
#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < n; ++b) {
        const float* s = src + b * plane * 3;
        uint8_t* d = dst + b * plane * 3;
        for (int64_t i = 0; i < plane; ++i) {
            for (int64_t c = 0; c < 3; ++c) {
                float v = s[c * plane + i];
                v = v < -1.0f ? -1.0f : (v > 1.0f ? 1.0f : v);
                d[3 * i + c] = (uint8_t)((v + 1.0f) * 127.5f + 0.5f);
            }
        }
    }
}

// horizontal flip of a float32 CHW batch in place (training augmentation)
void flip_chw_f32(float* data, int64_t n, int64_t c, int64_t h, int64_t w) {
#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < n; ++b) {
        for (int64_t ch = 0; ch < c; ++ch) {
            float* plane = data + (b * c + ch) * h * w;
            for (int64_t y = 0; y < h; ++y) {
                float* row = plane + y * w;
                for (int64_t x = 0; x < w / 2; ++x) {
                    float t = row[x];
                    row[x] = row[w - 1 - x];
                    row[w - 1 - x] = t;
                }
            }
        }
    }
}

}  // extern "C"
