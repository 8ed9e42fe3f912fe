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
    """keys: u64[N] key-domain values."""
    n = len(keys)
    mn = int(keys.min())
    mx = int(keys.max())

    change = np.flatnonzero(keys[1:] != keys[:-1])
    num_runs = len(change) + 1
    run_ends = np.concatenate([change + 1, [n]]).astype(np.uint32)
    run_values = keys[np.concatenate([[0], change + 1])]

    # delta stats (zigzag width of first differences)
    if n > 1:
        d = (keys[1:] - keys[:-1]).view(np.int64)  # mod-2^64 difference
        zz = ((d << 1) ^ (d >> 63)).view(np.uint64)
        delta_width = _bits_for(int(zz.max()))
        is_sorted = bool((d >= 0).all())
    else:
        delta_width = 0
        is_sorted = True

    unique = codes = None
    if want_dict:
        unique, codes = np.unique(keys, return_inverse=True)
        card = len(unique)
    else:
        card = min(num_runs, n)

    return Context(
        n=n, min_key=mn, max_key=mx, num_runs=num_runs, card=card,
        delta_width=delta_width, pack_width=_bits_for(mx - mn),
        unique=unique, codes=codes.astype(np.uint32) if codes is not None else None,
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
