// knox_native — host-side encode/analyze kernels.
//
// The reference implements its encode hot loops in hand-written AVX2/
// AVX512 assembly (/root/reference/internal/encode/{analyze,bitpack}
// + internal/cmp). On the TPU build the DEVICE side of those kernels is
// Pallas/XLA (ops/bitslice.py); this file is the HOST side: the write
// path's bitplane transpose and one-pass analysis, which run on CPU at
// merge/encode time and dominate segment build cost in pure numpy.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image):
//   bitplane_pack   u64 values -> u32 bitplanes  (bit p of row r ->
//                   plane p word r/32 bit r%32)
//   bitplane_unpack inverse (testing/oracle)
//   analyze_u64     min/max/#runs/zigzag-delta width/pack width, one pass
//
// Build: cc -O3 -march=native -shared -fPIC (see native/build.py).

#include <cstdint>
#include <cstring>

extern "C" {

// values[n] -> planes[width][n_pad/32] (n_pad multiple of 32, zeros pad)
void bitplane_pack(const uint64_t* values, int64_t n, int64_t n_pad,
                   int32_t width, uint32_t* planes) {
    const int64_t words = n_pad / 32;
    std::memset(planes, 0, sizeof(uint32_t) * (size_t)width * words);
    for (int64_t w = 0; w < n / 32; ++w) {
        // transpose a 32-row block: gather bit p of 32 values
        uint64_t block[32];
        std::memcpy(block, values + w * 32, sizeof(block));
        for (int32_t p = 0; p < width; ++p) {
            uint32_t acc = 0;
            for (int b = 0; b < 32; ++b)
                acc |= (uint32_t)((block[b] >> p) & 1ull) << b;
            planes[(size_t)p * words + w] = acc;
        }
    }
    const int64_t tail = n % 32;
    if (tail) {
        const int64_t w = n / 32;
        for (int32_t p = 0; p < width; ++p) {
            uint32_t acc = 0;
            for (int64_t b = 0; b < tail; ++b)
                acc |= (uint32_t)((values[w * 32 + b] >> p) & 1ull) << b;
            planes[(size_t)p * words + w] = acc;
        }
    }
}

void bitplane_unpack(const uint32_t* planes, int64_t n, int64_t n_pad,
                     int32_t width, uint64_t* values) {
    const int64_t words = n_pad / 32;
    std::memset(values, 0, sizeof(uint64_t) * (size_t)n);
    for (int64_t i = 0; i < n; ++i) {
        const int64_t w = i / 32, b = i % 32;
        uint64_t v = 0;
        for (int32_t p = 0; p < width; ++p)
            v |= (uint64_t)((planes[(size_t)p * words + w] >> b) & 1u) << p;
        values[i] = v;
    }
}

// One-pass vector analysis (reference internal/encode/analyze).
// out[0]=min out[1]=max out[2]=num_runs out[3]=delta_width(zigzag bits)
// out[4]=pack_width(bits of max-min) out[5]=is_sorted(0/1)
void analyze_u64(const uint64_t* values, int64_t n, uint64_t* out) {
    uint64_t mn = values[0], mx = values[0];
    uint64_t runs = 1, zzmax = 0;
    int sorted = 1;
    for (int64_t i = 1; i < n; ++i) {
        const uint64_t v = values[i];
        if (v < mn) mn = v;
        if (v > mx) mx = v;
        if (v != values[i - 1]) ++runs;
        const uint64_t d = v - values[i - 1];           // mod 2^64
        const int64_t sd = (int64_t)d;
        const uint64_t zz = ((uint64_t)(sd << 1)) ^ (uint64_t)(sd >> 63);
        if (zz > zzmax) zzmax = zz;
        if (sd < 0) sorted = 0;
    }
    out[0] = mn;
    out[1] = mx;
    out[2] = runs;
    uint64_t w = 0;
    while (zzmax >> w && w < 64) ++w;
    out[3] = (n > 1) ? w : 0;
    const uint64_t range = mx - mn;
    w = 0;
    while (range >> w && w < 64) ++w;
    out[4] = w;
    out[5] = (uint64_t)sorted;
}

// Packed u32 bitset -> ascending row indexes (selection vector).
// Returns count; idx must have room for popcount.
int64_t bitset_indexes(const uint32_t* words, int64_t n_words,
                       uint32_t base, uint32_t* idx) {
    int64_t k = 0;
    for (int64_t w = 0; w < n_words; ++w) {
        uint32_t m = words[w];
        while (m) {
            const int b = __builtin_ctz(m);
            idx[k++] = base + (uint32_t)(w * 32 + b);
            m &= m - 1;
        }
    }
    return k;
}

}  // extern "C"
