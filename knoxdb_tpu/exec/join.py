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


def join_keys_device(lkeys, rkeys, cap: int):
    """Device probe for UNIQUE build keys: returns (pos i32[Nl], match
    bool[Nl]) where pos indexes the SORTED build side. Callers expand
    projections with take(); duplicates fall back to join_keys_np."""
    import jax.numpy as jnp

    rs = jnp.sort(rkeys)
    pos = jnp.searchsorted(rs, lkeys)
    posc = jnp.minimum(pos, rs.shape[0] - 1)
    match = jnp.take(rs, posc) == lkeys
    return posc, match, jnp.argsort(rkeys)
