"""Equi-joins over keyform keys.

The reference ships merge/loop join strategies with a pk-cursor block
fetch (/root/reference/internal/operator/join/join.go:380-427,536-556)
and leaves hash join TODO (join.go:6-9,825). Here the single-chip path is
a sort+probe join in the keyform domain:

- build side sorted once (device argsort / host for tiny sides)
- probe side binary-searches lower/upper bounds (vectorized searchsorted)
- duplicate build keys expand via bounded per-probe fanout

The multi-chip path (parallel/shuffle.py) hash-partitions both sides by
key over the mesh with all_to_all and runs this same kernel per shard.
"""

from __future__ import annotations

import numpy as np

from ..types import JoinType

__all__ = ["join_keys_np", "JoinResult"]


class JoinResult:
    def __init__(self, lidx: np.ndarray, ridx: np.ndarray):
        self.lidx = lidx      # row indices into the left batch (-1 = none)
        self.ridx = ridx      # row indices into the right batch (-1 = none)

    @property
    def n(self) -> int:
        return len(self.lidx)


def join_keys_np(lkeys: np.ndarray, rkeys: np.ndarray,
                 how: JoinType = JoinType.INNER) -> JoinResult:
    """Join two keyform key arrays (u64 or object ints).

    Host reference implementation (also the oracle for the device path):
    sort-probe with duplicate expansion. Returns matched index pairs in
    left-row order (stable), with -1 on the outer side's misses."""
    order = np.argsort(rkeys, kind="stable")
    rs = rkeys[order]
    lo = np.searchsorted(rs, lkeys, side="left")
    hi = np.searchsorted(rs, lkeys, side="right")
    counts = hi - lo

    if how == JoinType.CROSS:
        li = np.repeat(np.arange(len(lkeys)), len(rkeys))
        ri = np.tile(np.arange(len(rkeys)), len(lkeys))
        return JoinResult(li, ri)

    lidx: list[int] = []
    ridx: list[int] = []
    matched_r = np.zeros(len(rkeys), bool)
    for i in range(len(lkeys)):
        c = counts[i]
        if c:
            for j in range(lo[i], hi[i]):
                lidx.append(i)
                ridx.append(int(order[j]))
                matched_r[order[j]] = True
        elif how in (JoinType.LEFT, JoinType.FULL):
            lidx.append(i)
            ridx.append(-1)
    if how in (JoinType.RIGHT, JoinType.FULL):
        for j in np.flatnonzero(~matched_r):
            lidx.append(-1)
            ridx.append(int(j))
    return JoinResult(np.asarray(lidx, np.int64), np.asarray(ridx, np.int64))


def join_pairs_device(lkeys, rkeys, how: JoinType = JoinType.INNER
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Device sort-probe join with duplicate expansion.

    lkeys/rkeys: u64 device arrays in a common join domain. Returns
    (lidx i64[M], ridx i64[M]) host arrays of matched index pairs into
    the input arrays; LEFT-join misses emit ridx == -1. The expansion is
    two-phase: count matches per probe row on device, fetch the scalar
    total, then materialize pairs at a static pow2 cap — sorts,
    searchsorteds and output-sized gathers only (no [rows]-scale host
    fetch; reference merge-join semantics, join.go:536-556)."""
    import jax.numpy as jnp

    Nl = int(lkeys.shape[0])
    Nr = int(rkeys.shape[0])
    empty = np.empty(0, np.int64)
    if Nl == 0:
        return empty, empty
    if Nr == 0:
        if how == JoinType.LEFT:
            return np.arange(Nl, dtype=np.int64), np.full(Nl, -1, np.int64)
        return empty, empty

    total = int(join_count_device(lkeys, rkeys, how))
    if total == 0:
        return empty, empty
    cap = 1 << max(0, (total - 1).bit_length())
    lidx, ridx, _ = join_pairs_core(lkeys, rkeys, cap, how)
    lidx_np = np.asarray(lidx)
    ridx_np = np.asarray(ridx)
    keep = lidx_np != -2
    return lidx_np[keep].astype(np.int64), ridx_np[keep].astype(np.int64)


def join_count_device(lkeys, rkeys, how: JoinType = JoinType.INNER):
    """Match-pair count (phase 1; one scalar host fetch)."""
    import jax.numpy as jnp
    order = jnp.argsort(rkeys)
    rs = jnp.take(rkeys, order)
    lo = jnp.searchsorted(rs, lkeys, side="left").astype(jnp.int64)
    hi = jnp.searchsorted(rs, lkeys, side="right").astype(jnp.int64)
    counts = hi - lo
    eff = jnp.maximum(counts, 1) if how == JoinType.LEFT else counts
    return eff.sum()


def join_pairs_core(lkeys, rkeys, cap: int,
                    how: JoinType = JoinType.INNER):
    """Pure jittable sort-probe join with duplicate expansion at a
    STATIC cap: returns DEVICE arrays (lidx i32[cap], ridx i32[cap],
    total) with -2 past total (and ridx -1 on LEFT misses). Callers
    keep the pairs on device (projection gathers run device-side; only
    final columns cross the relay — it moves ~45 MB/s)."""
    import jax.numpy as jnp
    Nl = lkeys.shape[0]
    Nr = rkeys.shape[0]
    order = jnp.argsort(rkeys)
    rs = jnp.take(rkeys, order)
    lo = jnp.searchsorted(rs, lkeys, side="left").astype(jnp.int64)
    hi = jnp.searchsorted(rs, lkeys, side="right").astype(jnp.int64)
    counts = hi - lo
    eff = jnp.maximum(counts, 1) if how == JoinType.LEFT else counts
    offs = jnp.cumsum(eff)
    total = offs[-1]

    t = jnp.arange(cap, dtype=jnp.int64)
    i = jnp.searchsorted(offs, t, side="right")     # probe row per slot
    ic = jnp.minimum(i, Nl - 1).astype(jnp.int32)
    prev = jnp.where(ic > 0, jnp.take(offs, jnp.maximum(ic - 1, 0)),
                     jnp.int64(0))
    k = t - prev
    has = jnp.take(counts, ic) > 0
    j = jnp.take(lo, ic) + k
    jc = jnp.clip(j, 0, Nr - 1).astype(jnp.int32)
    ridx = jnp.where(has, jnp.take(order, jc).astype(jnp.int32),
                     jnp.int32(-1))
    valid = t < total
    lidx = jnp.where(valid, ic, jnp.int32(-2))
    ridx = jnp.where(valid, ridx, jnp.int32(-2))
    return lidx, ridx, total
