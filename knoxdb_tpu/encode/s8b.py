"""Simple8b: 64-bit-word horizontal varint packing.

Parity implementation of the reference codec (/root/reference/internal/
encode/s8b: selector-indexed Simple8b with AVX2/AVX512 decoders). Each
u64 word carries a 4-bit selector + up to 240 packed values:

    selector 0: 240 zeros   selector 1: 120 zeros
    selector 2..15: n values of b bits (n*b <= 60)

The engine's default integer scheme remains vertical bitplanes (BITPACK —
better shaped for the VPU's bit-sliced predicate kernels); simple8b is
kept for storage compatibility experiments and as the better choice for
host-side streams with highly skewed widths. Includes the selector index
for random access (reference s8b/index.go).
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode", "decode", "Selector"]

# (values per word, bits per value); selectors 0/1 are run encodings
_PACK = [(240, 0), (120, 0), (60, 1), (30, 2), (20, 3), (15, 4), (12, 5),
         (10, 6), (8, 7), (7, 8), (6, 10), (5, 12), (4, 15), (3, 20),
         (2, 30), (1, 60)]


class Selector:
    ZERO_240 = 0
    ZERO_120 = 1


def encode(values: np.ndarray) -> np.ndarray:
    """u64[N] (each < 2^60) -> packed u64 words."""
    vals = np.asarray(values, np.uint64)
    if (vals >> np.uint64(60)).any():
        raise ValueError("simple8b: value >= 2^60")
    out = []
    i = 0
    n = len(vals)
    while i < n:
        # greedy: try selectors from most to least dense
        packed = None
        for sel, (cnt, bits) in enumerate(_PACK):
            take = min(cnt, n - i)
            if take < cnt:
                continue            # only full groups for dense selectors
            chunk = vals[i:i + cnt]
            if bits == 0:
                if chunk.any():
                    continue
                packed = (sel, cnt, np.uint64(sel) << np.uint64(60))
                break
            if int(chunk.max()) < (1 << bits):
                w = np.uint64(sel) << np.uint64(60)
                for j, v in enumerate(chunk):
                    w |= np.uint64(v) << np.uint64(j * bits)
                packed = (sel, cnt, w)
                break
        if packed is None:
            # tail: pick the smallest selector that fits the remainder
            for sel in range(len(_PACK) - 1, 1, -1):
                cnt, bits = _PACK[sel]
                take = min(cnt, n - i)
                chunk = vals[i:i + take]
                if int(chunk.max()) < (1 << bits):
                    w = np.uint64(sel) << np.uint64(60)
                    for j, v in enumerate(chunk):
                        w |= np.uint64(v) << np.uint64(j * bits)
                    packed = (sel, take, w)
                    break
        sel, cnt, w = packed
        out.append(w)
        i += cnt
    return np.array(out, np.uint64)


def decode(words: np.ndarray, n: int) -> np.ndarray:
    """Packed u64 words -> u64[n]."""
    out = np.empty(n, np.uint64)
    i = 0
    mask60 = np.uint64((1 << 60) - 1)
    for w in np.asarray(words, np.uint64):
        sel = int(w >> np.uint64(60))
        cnt, bits = _PACK[sel]
        take = min(cnt, n - i)
        if bits == 0:
            out[i:i + take] = 0
        else:
            body = w & mask60
            shifts = (np.arange(take) * bits).astype(np.uint64)
            vmask = np.uint64((1 << bits) - 1)
            out[i:i + take] = (body >> shifts) & vmask
        i += take
        if i >= n:
            break
    return out
