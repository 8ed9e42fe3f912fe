"""One-pass column vector analysis feeding compression scheme selection.

Host-side (numpy) analog of the reference's vectorized analysis kernels
(/root/reference/internal/encode/analyze/analyze.go:12-25): computes min/max,
run count, cardinality and delta statistics over the *key domain* (the
order-preserving u64 image of a column pack, see utils/limbs.py).

Runs once per pack at encode time (write path); the scan path never touches
this. A C++ native version can replace it later without changing callers.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

__all__ = ["Context", "analyze_keys", "analyze_wide"]


@dataclass
class Context:
    """Analysis result over one pack (key domain)."""
    n: int
    min_key: int
    max_key: int
    num_runs: int
    card: int                 # exact cardinality (unique count)
    delta_width: int          # bits needed for zigzag(first-difference), 64 if n/a
    pack_width: int           # bits needed for (v - min)
    unique: np.ndarray | None = None   # sorted unique keys (u64) when computed
    codes: np.ndarray | None = None    # dict codes aligned with input
    run_ends: np.ndarray | None = None
    run_values: np.ndarray | None = None
    wide: bool = False        # True when keys are tuples (>64-bit types)
    sorted: bool = False


def _bits_for(x: int) -> int:
    return int(x).bit_length()


def analyze_keys(keys: np.ndarray, want_dict: bool = True) -> Context:
    """keys: u64[N] key-domain values.

    Fast one-pass stats via the native kernel (utils/native.analyze_u64,
    C++ analog of the reference AVX2 analyze); run/unique arrays are only
    materialized when the quick stats say RLE/DICT could win."""
    from ..utils import native as NT

    n = len(keys)
    keys = np.ascontiguousarray(keys, np.uint64)
    mn, mx, num_runs, delta_width, pack_width, is_sorted = \
        NT.analyze_u64(keys)

    run_ends = run_values = None
    if num_runs < n // 4:
        change = np.flatnonzero(keys[1:] != keys[:-1])
        run_ends = np.concatenate([change + 1, [n]]).astype(np.uint32)
        run_values = keys[np.concatenate([[0], change + 1])]

    unique = codes = None
    card = min(num_runs, n)
    if mn == mx:
        card = 1
    elif want_dict and n:
        # sampled cardinality probe (reference selector samples too,
        # internal/encode/int.go) — full unique only when dict plausible
        samp = keys[::max(1, n // 1024)]
        scard = len(np.unique(samp))
        if scard <= max(16, len(samp) // 4):
            unique, codes = np.unique(keys, return_inverse=True)
            card = len(unique)
            codes = codes.astype(np.uint32)

    return Context(
        n=n, min_key=mn, max_key=mx, num_runs=num_runs, card=card,
        delta_width=delta_width, pack_width=pack_width,
        unique=unique, codes=codes,
        run_ends=run_ends, run_values=run_values, sorted=is_sorted,
    )


def analyze_wide(limbs: np.ndarray) -> Context:
    """Analysis for >64-bit types. limbs: u32[L, N]; keys compared
    lexicographically. Only const/dict/rle/raw schemes apply."""
    L, n = limbs.shape
    cols = limbs.T  # (N, L)
    # run detection
    diff = (cols[1:] != cols[:-1]).any(axis=1)
    change = np.flatnonzero(diff)
    num_runs = len(change) + 1
    run_ends = np.concatenate([change + 1, [n]]).astype(np.uint32)
    run_starts = np.concatenate([[0], change + 1])

    uniq, codes = np.unique(cols, axis=0, return_inverse=True)
    order = np.lexsort(tuple(uniq[:, l] for l in range(L - 1, -1, -1)))
    # np.unique(axis=0) already sorts rows lexicographically; keep as-is
    ctx = Context(
        n=n, min_key=0, max_key=0, num_runs=num_runs, card=len(uniq),
        delta_width=64, pack_width=64,
        unique=uniq,  # (card, L) u32 rows
        codes=codes.astype(np.uint32),
        run_ends=run_ends, run_values=run_starts,  # starts; values gathered later
        wide=True,
    )
    return ctx
