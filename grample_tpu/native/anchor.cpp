// Native tier: single-core reference Gibbs sampler + UAI numeric tokenizer.
//
// anchor_gibbs: a faithful single-threaded random-scan single-site Gibbs
// sampler mirroring the reference hot loop (sampler/gibbs-simple.go:163-271
// and sampler/sampler.go:90-174): pick a free variable uniformly; for each
// incident factor evaluate the log table at every value of that variable
// with the rest of the state fixed; stabilize by shifting when the minimum
// log-weight dips below -8; exponentiate; clamp every outcome to >= 1e-6
// relative probability (irreducibility floor, gibbs-simple.go:248-258);
// linear-scan categorical draw; write back and count.
//
// Purpose: the MEASURED single-core baseline anchor demanded by BASELINE.md
// ("the build must first measure the Go reference") — compiled C++ is the
// same performance class as compiled Go, so samples/s from this loop is an
// honest stand-in for the reference binary on the same host.  It is also a
// correctness oracle: its stationary distribution matches the TPU sweep's.
//
// tokenize_f64: whitespace tokenizer for the numeric tail of UAI files
// (the fast path behind grample_tpu/uai/parser.py; reference FieldReader,
// model/reader.go:21-49).

#include <cmath>
#include <cstdint>
#include <chrono>
#include <cstdlib>
#include <random>
#include <vector>

extern "C" {

// Arrays are the var-major "legacy" encoding of grample_tpu.pgm.encode
// (EncodedModel.legacy_arrays): one padding sentinel var at index V with
// card 1 and value 0, so scope padding reads state 0 with stride 0.
double anchor_gibbs(
    int32_t num_vars,                 // V (without sentinel)
    const int32_t* cards,             // [V+1]
    const int32_t* fixed_vals,        // [V+1], -1 = free
    int32_t adj_cap,                  // F
    int32_t scope_cap,                // S
    const int32_t* adj_offset,        // [V+1, F]
    const int32_t* adj_self_stride,   // [V+1, F]
    const uint8_t* adj_mask,          // [V+1, F]
    const int32_t* adj_scope_vars,    // [V+1, F, S]
    const int32_t* adj_scope_strides, // [V+1, F, S]
    const float* tables,              // [T], natural-log space
    int64_t num_samples,
    uint64_t seed,
    int32_t max_card,
    int64_t* out_counts)              // [V+1, max_card], zero-initialized
{
    std::mt19937_64 rng(seed);
    std::uniform_real_distribution<double> unif(0.0, 1.0);

    std::vector<int32_t> free_vars;
    free_vars.reserve(num_vars);
    for (int32_t v = 0; v < num_vars; ++v)
        if (fixed_vals[v] < 0) free_vars.push_back(v);
    const int64_t nfree = (int64_t)free_vars.size();
    if (nfree == 0) return 0.0;

    // uniform init, evidence pinned (gibbs-simple.go:101-112)
    std::vector<int32_t> state(num_vars + 1, 0);
    for (int32_t v = 0; v < num_vars; ++v)
        state[v] = fixed_vals[v] >= 0
                       ? fixed_vals[v]
                       : (int32_t)(unif(rng) * cards[v]);

    std::vector<double> logw(max_card), w(max_card);

    const auto t0 = std::chrono::steady_clock::now();
    for (int64_t it = 0; it < num_samples; ++it) {
        const int32_t v = free_vars[(size_t)(unif(rng) * nfree)];
        const int32_t card = cards[v];
        for (int32_t k = 0; k < card; ++k) logw[k] = 0.0;

        const size_t vrow = (size_t)v * adj_cap;
        for (int32_t j = 0; j < adj_cap; ++j) {
            if (!adj_mask[vrow + j]) continue;
            const size_t frow = (vrow + j) * scope_cap;
            int64_t base = adj_offset[vrow + j];
            for (int32_t s = 0; s < scope_cap; ++s)
                base += (int64_t)state[adj_scope_vars[frow + s]] *
                        adj_scope_strides[frow + s];
            const int64_t sst = adj_self_stride[vrow + j];
            for (int32_t k = 0; k < card; ++k)
                logw[k] += tables[base + k * sst];
        }

        // shift stabilization (gibbs-simple.go:227-237)
        double mn = logw[0];
        for (int32_t k = 1; k < card; ++k) mn = logw[k] < mn ? logw[k] : mn;
        if (mn < -8.0)
            for (int32_t k = 0; k < card; ++k) logw[k] -= mn;

        double tot = 0.0;
        for (int32_t k = 0; k < card; ++k) {
            w[k] = std::exp(logw[k]);
            tot += w[k];
        }
        // >= 1e-6 relative probability floor (gibbs-simple.go:248-258)
        const double floor = tot * 1e-6;
        for (int32_t k = 0; k < card; ++k)
            if (w[k] < floor) {
                tot += floor - w[k];
                w[k] = floor;
            }

        // linear-scan weighted draw (sampler.go:90-130)
        const double u = unif(rng) * tot;
        double acc = 0.0;
        int32_t pick = card - 1;
        for (int32_t k = 0; k < card; ++k) {
            acc += w[k];
            if (u < acc) {
                pick = k;
                break;
            }
        }
        state[v] = pick;
        out_counts[(size_t)v * max_card + pick] += 1;
    }
    const auto t1 = std::chrono::steady_clock::now();
    return std::chrono::duration<double>(t1 - t0).count();
}

// Parse whitespace-separated floating-point tokens from buf[0:len) into
// out[0:cap).  Returns the token count (or -(pos+1) on a malformed token).
int64_t tokenize_f64(const char* buf, int64_t len, double* out, int64_t cap) {
    int64_t n = 0;
    const char* p = buf;
    const char* end = buf + len;
    while (p < end) {
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r'))
            ++p;
        if (p >= end) break;
        if (n >= cap) return -1;
        char* q = nullptr;
        const double val = std::strtod(p, &q);
        if (q == p) return -(int64_t)(p - buf) - 1;
        out[n++] = val;
        p = q;
    }
    return n;
}

}  // extern "C"
