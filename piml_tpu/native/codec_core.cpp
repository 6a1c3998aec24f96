// Native scene-codec core: trajectory densification and sparsification.
//
// The v2.2 scene format stores per-pedestrian (x, y, t) triples; the hot part
// of decoding is the O(sum T_i) fill of dense (T, N, 2) arrays plus the
// masked forward differences for velocity/acceleration (the reference does
// this in a per-point Python loop, src/data/data.py:115-156).  This core does
// the same work in C++ at memory bandwidth; Python handles the (pickled)
// container parsing and calls in via ctypes (see native/__init__.py).
//
// Build: make -C piml_tpu/native   (produces libpimlcodec.so)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>

extern "C" {

// points: (K, 3) rows [x, y, frame]; offsets: (N+1) prefix ranges per
// pedestrian.  Outputs are (T, N, 2) / (T, N) row-major float32, with NaN
// marking out-of-frame positions and the reference's mask conventions
// (mask_v drops the final frame of each track, mask_a the final two).
int piml_densify(
    const double* points, const int64_t* offsets,
    int64_t num_steps, int64_t num_peds, double time_unit,
    float* position, float* velocity, float* acceleration,
    float* mask_p, float* mask_v, float* mask_a)
{
    const float nanf32 = std::numeric_limits<float>::quiet_NaN();
    const int64_t TN = num_steps * num_peds;
    for (int64_t i = 0; i < TN; ++i) {
        position[2 * i] = nanf32;
        position[2 * i + 1] = nanf32;
        velocity[2 * i] = 0.f;
        velocity[2 * i + 1] = 0.f;
        acceleration[2 * i] = 0.f;
        acceleration[2 * i + 1] = 0.f;
        mask_p[i] = 0.f;
        mask_v[i] = 0.f;
        mask_a[i] = 0.f;
    }

    // dense position + presence masks
    for (int64_t n = 0; n < num_peds; ++n) {
        const int64_t lo = offsets[n], hi = offsets[n + 1];
        for (int64_t k = lo; k < hi; ++k) {
            const int64_t t = (int64_t)points[3 * k + 2];
            if (t < 0 || t >= num_steps) return -1;
            const int64_t idx = t * num_peds + n;
            position[2 * idx] = (float)points[3 * k];
            position[2 * idx + 1] = (float)points[3 * k + 1];
            mask_p[idx] = 1.f;
            mask_v[idx] = 1.f;
            mask_a[idx] = 1.f;
        }
        if (hi > lo) {
            const int64_t t_last = (int64_t)points[3 * (hi - 1) + 2];
            mask_v[t_last * num_peds + n] = 0.f;
            mask_a[t_last * num_peds + n] = 0.f;
            if (t_last >= 1 && mask_p[(t_last - 1) * num_peds + n] > 0.f)
                mask_a[(t_last - 1) * num_peds + n] = 0.f;
        }
    }

    // forward differences: v[t] = (p[t+1] - p[t]) / dt where mask_v,
    // a[t] = (v[t+1] - v[t]) / dt where mask_a (duplicate last frame)
    const float inv_dt = (float)(1.0 / time_unit);
    for (int64_t t = 0; t < num_steps; ++t) {
        const int64_t t1 = (t + 1 < num_steps) ? t + 1 : t;
        for (int64_t n = 0; n < num_peds; ++n) {
            const int64_t idx = t * num_peds + n;
            if (mask_v[idx] > 0.f) {
                const int64_t idx1 = t1 * num_peds + n;
                velocity[2 * idx] = (position[2 * idx1] - position[2 * idx]) * inv_dt;
                velocity[2 * idx + 1] =
                    (position[2 * idx1 + 1] - position[2 * idx + 1]) * inv_dt;
                if (std::isnan(velocity[2 * idx]) || std::isnan(velocity[2 * idx + 1]))
                    return -2;  // trajectory has a gap — caller must split first
            }
        }
    }
    for (int64_t t = 0; t < num_steps; ++t) {
        const int64_t t1 = (t + 1 < num_steps) ? t + 1 : t;
        for (int64_t n = 0; n < num_peds; ++n) {
            const int64_t idx = t * num_peds + n;
            if (mask_a[idx] > 0.f) {
                const int64_t idx1 = t1 * num_peds + n;
                acceleration[2 * idx] = (velocity[2 * idx1] - velocity[2 * idx]) * inv_dt;
                acceleration[2 * idx + 1] =
                    (velocity[2 * idx1 + 1] - velocity[2 * idx + 1]) * inv_dt;
            }
        }
    }
    return 0;
}

// Inverse: dense → flat (x, y, t) rows per pedestrian.  Caller provides
// points sized (capacity, 3) and offsets (N+1); returns total rows written,
// or -1 if the mask selects more rows than capacity (no write past the end).
int64_t piml_sparsify(
    const float* position, const float* mask_p,
    int64_t num_steps, int64_t num_peds, int64_t capacity,
    double* points, int64_t* offsets)
{
    int64_t k = 0;
    offsets[0] = 0;
    for (int64_t n = 0; n < num_peds; ++n) {
        for (int64_t t = 0; t < num_steps; ++t) {
            const int64_t idx = t * num_peds + n;
            if (mask_p[idx] > 0.f) {
                if (k >= capacity) return -1;
                points[3 * k] = position[2 * idx];
                points[3 * k + 1] = position[2 * idx + 1];
                points[3 * k + 2] = (double)t;
                ++k;
            }
        }
        offsets[n + 1] = k;
    }
    return k;
}

// Shuffled batch index generation (xorshift64*) — the host-side analogue of
// the reference's per-epoch numpy permutation (src/utils/data_loader.py:14).
void piml_shuffled_indices(int64_t n, uint64_t seed, int64_t* out)
{
    for (int64_t i = 0; i < n; ++i) out[i] = i;
    uint64_t s = seed ? seed : 0x9E3779B97F4A7C15ULL;
    for (int64_t i = n - 1; i > 0; --i) {
        s ^= s >> 12; s ^= s << 25; s ^= s >> 27;
        const uint64_t r = s * 0x2545F4914F6CDD1DULL;
        const int64_t j = (int64_t)(r % (uint64_t)(i + 1));
        const int64_t tmp = out[i]; out[i] = out[j]; out[j] = tmp;
    }
}

}  // extern "C"
