// Native kernels for the host-side sequential pieces of the kd-tree codec.
//
// The Δ-seeding sweep (reference encodeNodeEstimate level-order pass,
// VolumeKdTree_recover.cpp:254-267,415-455) carries a running (sum, count)
// scalar state through every node of a level — inherently sequential, so it
// runs here at native speed instead of a Python loop.  Everything else in the
// codec is data-parallel and lives in JAX/NumPy.
//
// Built as a plain shared library, bound via ctypes (no pybind11 dependency).

#include <cstdint>
#include <cmath>
#include <cstddef>

extern "C" {

// Seed one level: truth[n], parent[n] are doubles (exact byte values).
// Writes {sum, count} into out[2].
void seed_level_f64(const double* truth, const double* parent, int64_t n,
                    double* out) {
    double sum = 0.0, count = 0.0;
    for (int64_t i = 0; i < n; ++i) {
        const double t = truth[i];
        const double pe = parent[i];
        const double pd = std::fabs(pe - t);
        const double md = (sum + pd) / (count + 1.0);
        const double none_err = pd;
        const double add_est = md + pe > 255.0 ? 255.0 : pe + md;
        const double add_err = std::fabs(add_est - t);
        const double sub_est = pe - md < 0.0 ? 0.0 : pe - md;
        const double sub_err = std::fabs(sub_est - t);
        double min_err = none_err < add_err ? none_err : add_err;
        min_err = sub_err < min_err ? sub_err : min_err;
        if (min_err == none_err) continue;  // tie order: none beats add/sub
        sum += pd;
        count += 1.0;
    }
    out[0] = sum;
    out[1] = count;
}

// Fused per-level evaluation used by gradient descent: encode every node at a
// fixed integer distance and return the exact sum of squared minimum errors.
// truth/parent are uint8/int32; everything is integer-exact.
// If codes/recon are non-null they are filled.
int64_t encode_level_i32(const uint8_t* truth, const int32_t* parent,
                         int64_t n, int32_t distance,
                         uint8_t* codes, int32_t* recon) {
    int64_t sum_sq = 0;
    for (int64_t i = 0; i < n; ++i) {
        const int32_t t = truth[i];
        const int32_t pe = parent[i];
        const int32_t none_err = pe > t ? pe - t : t - pe;
        int32_t add_est = pe + distance; if (add_est > 255) add_est = 255;
        const int32_t add_err = add_est > t ? add_est - t : t - add_est;
        int32_t sub_est = pe - distance; if (sub_est < 0) sub_est = 0;
        const int32_t sub_err = sub_est > t ? sub_est - t : t - sub_est;
        int32_t min_err = none_err < add_err ? none_err : add_err;
        min_err = sub_err < min_err ? sub_err : min_err;
        uint8_t code;
        int32_t r;
        if (min_err == none_err)      { code = 0; r = pe; }
        else if (min_err == add_err)  { code = 1; r = add_est; }
        else                          { code = 2; r = sub_est; }
        if (codes) codes[i] = code;
        if (recon) recon[i] = r;
        sum_sq += static_cast<int64_t>(min_err) * min_err;
    }
    return sum_sq;
}

}  // extern "C"
