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


def _ranks_by_cosort(bkeys_hi, bkeys_lo, qk_hi, qk_lo, q_first: bool):
    """#build keys before each query key, via ONE co-sort + restore sort
    (NO searchsorted: vectorized binary search is ~20 gather passes and
    gathers run ~30x below bandwidth on TPU — CLAUDE.md perf rules).
    Tie order: q_first=True counts builds STRICTLY below (side='left'),
    else builds <= query (side='right'). Returns i32[Nq]."""
    import jax
    import jax.numpy as jnp
    Nb = bkeys_hi.shape[0]
    Nq = qk_hi.shape[0]
    kh = jnp.concatenate([bkeys_hi, qk_hi])
    kl = jnp.concatenate([bkeys_lo, qk_lo])
    tag = jnp.concatenate([
        jnp.full(Nb, 1 if q_first else 0, jnp.int32),
        jnp.full(Nq, 0 if q_first else 1, jnp.int32)])
    oid = jnp.concatenate([jnp.full(Nb, Nq, jnp.int32),
                           jnp.arange(Nq, dtype=jnp.int32)])
    kh_s, kl_s, tag_s, oid_s = jax.lax.sort((kh, kl, tag, oid),
                                            dimension=0, num_keys=3)
    is_q = oid_s < Nq
    pos = jnp.arange(Nb + Nq, dtype=jnp.int32)
    q_rank = jnp.cumsum(is_q.astype(jnp.int32)) - 1   # inclusive -> 0-based
    nb_before = pos - q_rank                          # builds before slot
    # restore query order: sort by (is_build, orig idx); queries first
    key2 = jnp.where(is_q, oid_s, jnp.int32(Nq))
    _k2, ranks = jax.lax.sort(
        (key2, jnp.where(is_q, nb_before, 0)), dimension=0, num_keys=1,
        is_stable=True)
    return ranks[:Nq]


def _probe_bounds_merged(rs_hi, rs_lo, qk_hi, qk_lo):
    """BOTH probe bounds (lo = builds strictly below, hi = builds <=)
    from ONE merged co-sort + one restore sort — halves the rank-phase
    sort count vs two _ranks_by_cosort calls (sorts dominate the join;
    measured ~20 ms per 2M-row 4-operand sort on v5e).

    Builds sort before equal-key queries, so at a query's slot the
    exclusive build count IS hi; lo is the build count at the slot's
    key-run START, forward-filled through the run with a cummax (run
    starts carry non-decreasing build counts). Returns (lo, hi) i32[Nq]
    in query order."""
    import jax
    import jax.numpy as jnp
    Nb = rs_hi.shape[0]
    Nq = qk_hi.shape[0]
    M = Nb + Nq
    kh = jnp.concatenate([rs_hi, qk_hi])
    kl = jnp.concatenate([rs_lo, qk_lo])
    tag = jnp.concatenate([jnp.zeros(Nb, jnp.int32),
                           jnp.ones(Nq, jnp.int32)])
    oid = jnp.concatenate([jnp.full(Nb, Nq, jnp.int32),
                           jnp.arange(Nq, dtype=jnp.int32)])
    kh_s, kl_s, tag_s, oid_s = jax.lax.sort((kh, kl, tag, oid),
                                            dimension=0, num_keys=3)
    is_q = tag_s == 1
    pos = jnp.arange(M, dtype=jnp.int32)
    cq = jnp.cumsum(is_q.astype(jnp.int32))          # inclusive
    bb = pos + 1 - cq - (1 - is_q.astype(jnp.int32))  # builds before slot
    start = (pos == 0) | (kh_s != jnp.roll(kh_s, 1)) \
        | (kl_s != jnp.roll(kl_s, 1))
    # forward-fill run-start build counts via log-doubling max:
    # lax.cummax lowers to a 128-window reduce-window that overflows the
    # 16 MB scoped-vmem limit on this libtpu (measured: compile fails at
    # ANY length); ~log2(M) elementwise maximum passes stay at bandwidth
    lo_all = jnp.where(start, bb, 0)
    sh = 1
    while sh < M:
        lo_all = jnp.maximum(
            lo_all,
            jnp.concatenate([jnp.zeros(sh, lo_all.dtype), lo_all[:-sh]]))
        sh <<= 1
    key2 = jnp.where(is_q, oid_s, jnp.int32(Nq))     # queries first, unique
    _k2, lo_q, hi_q = jax.lax.sort((key2, lo_all, bb), dimension=0,
                                   num_keys=1)
    return lo_q[:Nq], hi_q[:Nq]


def join_pairs_core(lkeys, rkeys, cap: int,
                    how: JoinType = JoinType.INNER):
    """Pure jittable sort-probe join with duplicate expansion at a
    STATIC cap: returns DEVICE arrays (lidx i32[cap], ridx i32[cap],
    total) with -2 past total (and ridx -1 on LEFT misses). Callers
    keep the pairs on device (projection gathers run device-side; only
    final columns cross the relay — it moves ~45 MB/s).

    SORT-ONLY formulation: probe bounds and the slot->probe expansion
    both use co-sort rank tricks (_probe_bounds_merged,
    _ranks_by_cosort) instead of searchsorted — measured 1.6 s/join at
    1M x 1M with searchsorteds (three ~20-gather-pass binary searches),
    sorts cut that ~10x; the merged-bounds form cuts 7 sorts to 5."""
    import jax
    import jax.numpy as jnp
    Nl = lkeys.shape[0]
    Nr = rkeys.shape[0]
    order = jnp.argsort(rkeys)
    rs = jnp.take(rkeys, order)
    rh = jax.lax.bitcast_convert_type(rs, jnp.uint32)     # [Nr, 2]
    lh = jax.lax.bitcast_convert_type(lkeys, jnp.uint32)  # [Nl, 2]
    rs_hi, rs_lo = rh[:, 1], rh[:, 0]
    lk_hi, lk_lo = lh[:, 1], lh[:, 0]
    lo32, hi32 = _probe_bounds_merged(rs_hi, rs_lo, lk_hi, lk_lo)
    lo = lo32.astype(jnp.int64)
    hi = hi32.astype(jnp.int64)
    counts = hi - lo
    eff = jnp.maximum(counts, 1) if how == JoinType.LEFT else counts
    offs = jnp.cumsum(eff)
    total = offs[-1]

    # slot -> probe row: #offs <= t per output slot. Specialized co-sort:
    # offs and t fit 31 bits here, so key and tie-break tag fold into ONE
    # u32 composite (v << 1 | tag; u32 shifts are trusted, unlike u64 —
    # CLAUDE.md x64 hazard) — the rank sort carries 2 operands instead of
    # _ranks_by_cosort's 4 (bitonic sort traffic is linear in operands).
    t = jnp.arange(cap, dtype=jnp.int64)
    if (Nl + cap) < (1 << 31) and cap < (1 << 30):
        comp = jnp.concatenate([
            (offs.astype(jnp.uint32) << jnp.uint32(1)),          # tag 0
            (t.astype(jnp.uint32) << jnp.uint32(1)) | jnp.uint32(1)])
        c_s, = jax.lax.sort((comp,), dimension=0, num_keys=1)
        is_q = (c_s & jnp.uint32(1)) == 1
        pos = jnp.arange(Nl + cap, dtype=jnp.int32)
        q_rank = jnp.cumsum(is_q.astype(jnp.int32)) - 1
        nb_before = pos - q_rank
        # query slots exit the sort already in t order (t is an iota) —
        # restore = one 2-operand sort pushing build slots to the tail
        key2 = jnp.where(is_q, (c_s >> jnp.uint32(1)).astype(jnp.int32),
                         jnp.int32(cap))
        _k2, i32r = jax.lax.sort((key2, nb_before), dimension=0,
                                 num_keys=1)
        i = i32r[:cap].astype(jnp.int64)
    else:
        zero32 = jnp.zeros(Nl, jnp.uint32)
        i = _ranks_by_cosort(zero32, offs.astype(jnp.uint32),
                             jnp.zeros(cap, jnp.uint32),
                             t.astype(jnp.uint32),
                             False).astype(jnp.int64)
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
