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

// Preorder stack-machine decoder (levelCut, VolumeKdTree_recover.cpp:726-835,
// with frozen-scalar semantics below the cut — see codecs/reference_impl.py).
// The preorder walk is inherently sequential; at native speed it makes
// arbitrary-dimension (non-power-of-two) volumes practical to decode.
extern "C" void decode_preorder_native(
    const uint8_t* preorder, int64_t num_active, const uint8_t* distance_map,
    int64_t X, int64_t Y, int64_t Z, int32_t orig_depth, int32_t max_depth,
    int32_t cut_depth, uint8_t* out) {

    struct Frame {
        int64_t idx;
        int32_t depth;
        int32_t scalar;
        int64_t mn[3];
        int64_t mx[3];
    };
    // stack depth bounded by max_depth + 2
    Frame* stack = new Frame[max_depth + 4];
    int top = 0;
    stack[0] = Frame{0, 0, (int32_t)distance_map[0], {0, 0, 0}, {X, Y, Z}};

    auto child_scalar = [&](int32_t scalar, int code, int32_t parent_depth) {
        const int32_t d = parent_depth + 1;
        if (d > cut_depth) return scalar;
        if (code == 1) {
            int32_t v = scalar + (int32_t)distance_map[d];
            return v > 255 ? 255 : v;
        }
        if (code == 2) {
            int32_t v = scalar - (int32_t)distance_map[d];
            return v < 0 ? 0 : v;
        }
        return scalar;
    };

    auto split_dim = [&](const Frame& f) {
        int64_t ext[3] = {f.mx[0] - f.mn[0], f.mx[1] - f.mn[1], f.mx[2] - f.mn[2]};
        if (ext[0] * ext[1] * ext[2] <= 1) return -1;
        int sd = f.depth % 3;
        int i = 0;
        while (ext[sd] == 1) { ++i; sd = (f.depth + i) % 3; }
        return sd;
    };

    while (top >= 0) {
        Frame f = stack[top];
        const int code = (preorder[f.idx >> 2] >> ((f.idx & 3) * 2)) & 3;
        if (code == 3 || f.depth == max_depth) {
            for (int64_t x = f.mn[0]; x < f.mx[0]; ++x)
                for (int64_t y = f.mn[1]; y < f.mx[1]; ++y)
                    for (int64_t z = f.mn[2]; z < f.mx[2]; ++z)
                        out[x + X * y + X * Y * z] = (uint8_t)f.scalar;
            --top;
            const int64_t nxt = f.idx + 1;
            if (nxt < num_active && top >= 0) {
                Frame p = stack[top];
                --top;
                const int ncode = (preorder[nxt >> 2] >> ((nxt & 3) * 2)) & 3;
                Frame c = p;
                c.idx = nxt;
                c.depth = p.depth + 1;
                c.scalar = child_scalar(p.scalar, ncode, p.depth);
                const int sd = split_dim(p);
                if (sd >= 0) c.mn[sd] = (p.mn[sd] + p.mx[sd]) / 2;
                stack[++top] = c;
            }
        } else {
            if (f.depth >= orig_depth) --top;
            const int64_t nxt = f.idx + 1;
            const int ncode = (preorder[nxt >> 2] >> ((nxt & 3) * 2)) & 3;
            Frame c = f;
            c.idx = nxt;
            c.depth = f.depth + 1;
            c.scalar = child_scalar(f.scalar, ncode, f.depth);
            const int sd = split_dim(f);
            if (sd >= 0) c.mx[sd] = (f.mn[sd] + f.mx[sd]) / 2;
            stack[++top] = c;
        }
    }
    delete[] stack;
}
