"""Distributed hash join: all_to_all shuffle + local sort-probe.

The genuinely-new TPU part (the reference is single-process —
/root/reference/README.md:57; its join strategies are block merge/loop
joins, internal/operator/join/join.go). Design per SURVEY §7.10:

1. each device hash-partitions its local rows by join key modulo the mesh
   axis (bucketed compaction into [ndev, cap] tiles, sentinel-padded)
2. one jax.lax.all_to_all exchanges bucket i -> device i (rides ICI)
3. each device sort-probes its partition locally (exec/join.py semantics)
4. per-device match counts / aggregate checksums psum to all devices

cap (per-bucket row budget) is static: callers size it from counts with a
skew factor; overflowing rows are dropped and REPORTED via the returned
overflow counter, so skew never silently corrupts results — salted
repartition of heavy keys is the round-2 upgrade.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["shuffle_join_fn", "shuffle_join"]

_SENT = (1 << 64) - 1


def _bucketize(keys, vals, ndev: int, cap: int):
    """keys u64[N], vals u64[N] -> (k u64[ndev, cap], v u64[ndev, cap],
    overflow i32). Rows land in bucket key % ndev; padding = sentinel."""
    n = keys.shape[0]
    dest = (keys % jnp.uint64(ndev)).astype(jnp.int32)
    ks = []
    vs = []
    dropped = jnp.int32(0)
    for d in range(ndev):
        m = dest == d
        cnt = m.sum(dtype=jnp.int32)
        pos = jnp.cumsum(m.astype(jnp.int32)) - 1
        slot = jnp.where(m & (pos < cap), pos, cap)
        kd = jnp.full(cap + 1, jnp.uint64(_SENT)).at[slot].set(
            keys, mode="drop")[:cap]
        vd = jnp.zeros(cap + 1, jnp.uint64).at[slot].set(
            vals, mode="drop")[:cap]
        ks.append(kd)
        vs.append(vd)
        dropped = dropped + jnp.maximum(cnt - cap, 0)
    return jnp.stack(ks), jnp.stack(vs), dropped


def _local_join_sum(lk, lv, rk, rv):
    """Sort-probe join of one partition; returns (match_count i64,
    checksum u64 = sum over matches of lv + rv). Build side must be
    unique within the partition (pk semantics)."""
    order = jnp.argsort(rk)
    rs = jnp.take(rk, order)
    rvs = jnp.take(rv, order)
    pos = jnp.clip(jnp.searchsorted(rs, lk), 0, rs.shape[0] - 1)
    hit = (jnp.take(rs, pos) == lk) & (lk != jnp.uint64(_SENT))
    cnt = hit.sum(dtype=jnp.int64)
    csum = jnp.where(hit, lv + jnp.take(rvs, pos), jnp.uint64(0)) \
        .sum(dtype=jnp.uint64)
    return cnt, csum


def shuffle_join_fn(mesh: Mesh, cap: int, axis: str = "shards"):
    """Build the jitted multi-chip shuffle-join step.

    fn(lkeys, lvals, rkeys, rvals) with every array sharded on its leading
    axis -> (matches i64, checksum u64, dropped i32), replicated."""
    ndev = mesh.shape[axis]

    def local(lk, lv, rk, rv):
        lk, lv, rk, rv = (x.reshape(-1) for x in (lk, lv, rk, rv))
        lkb, lvb, dl = _bucketize(lk, lv, ndev, cap)
        rkb, rvb, dr = _bucketize(rk, rv, ndev, cap)
        # bucket i of every device -> device i (ICI all-to-all)
        lkx = jax.lax.all_to_all(lkb, axis, 0, 0, tiled=False)
        lvx = jax.lax.all_to_all(lvb, axis, 0, 0, tiled=False)
        rkx = jax.lax.all_to_all(rkb, axis, 0, 0, tiled=False)
        rvx = jax.lax.all_to_all(rvb, axis, 0, 0, tiled=False)
        cnt, csum = _local_join_sum(lkx.reshape(-1), lvx.reshape(-1),
                                    rkx.reshape(-1), rvx.reshape(-1))
        return (jax.lax.psum(cnt, axis), jax.lax.psum(csum, axis),
                jax.lax.psum(dl + dr, axis))

    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(P(axis), P(axis), P(axis), P(axis)),
                       out_specs=(P(), P(), P()))
    return jax.jit(fn)


def shuffle_join(mesh: Mesh, lkeys: np.ndarray, lvals: np.ndarray,
                 rkeys: np.ndarray, rvals: np.ndarray,
                 skew_factor: float = 2.0, axis: str = "shards"):
    """One-call helper: shard, pick cap from sizes, run, verify overflow.
    Returns (matches, checksum) as python ints."""
    ndev = mesh.shape[axis]
    per_dev = max(len(lkeys), len(rkeys)) // ndev
    cap = max(64, int(per_dev / ndev * skew_factor))
    cap = 1 << (cap - 1).bit_length()
    fn = shuffle_join_fn(mesh, cap, axis)

    def shard(x):
        return jax.device_put(
            jnp.asarray(x), NamedSharding(mesh, P(axis)))

    cnt, csum, dropped = fn(shard(lkeys), shard(lvals),
                            shard(rkeys), shard(rvals))
    if int(dropped):
        raise RuntimeError(
            f"shuffle_join: {int(dropped)} rows overflowed cap={cap}; "
            f"raise skew_factor (salted repartition lands in round 2)")
    return int(cnt), int(csum)
