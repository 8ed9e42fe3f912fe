"""TPU probe: capacity-scale scan + 2Q residency contention
(VERDICT r4 weak-#7 / next-#5).

Part A — "more packs, same kernel": builds ONE segment at
KNOX_CAP_PACKS (default 4096 packs = 268M rows) x 3 data columns and
runs the cfg#2-shape whole-tree fused scan (two numeric AND leaves +
exact sum) marginal-timed, then the SAME program shape at 256 packs in
the same process. The claim under test: rows/s within ~10% across a
16x pack-count change (the kernel streams per-pack tiles; nothing is
resident-size-sensitive).

Part B — two-table contention under a CONSTRAINED HBM budget: three
segments sized so only ~2 fit the CacheManager budget; an A,B,A,C,...
access pattern must keep re-referenced A protected (2Q) while B/C
cycle probation. Reports the cache's own hit/miss/eviction counters
and per-access wall times (an eviction shows up as a re-upload).

Run (TPU):  PYTHONPATH=/root/repo:/root/.axon_site python \
            probes/capacity_probe.py [--packs 4096]
CPU check:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python \
            probes/capacity_probe.py --packs 16
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

PACK = 1 << 16
CAP_PACKS = int(os.environ.get("KNOX_CAP_PACKS", 4096))
if "--packs" in sys.argv:
    CAP_PACKS = int(sys.argv[sys.argv.index("--packs") + 1])


def build_seg(n_packs: int, rng, with_grp: bool = True):
    from knoxdb_tpu.pack.segment import build_segment
    from knoxdb_tpu.schema.schema import Builder
    from knoxdb_tpu.types import FieldType

    n = PACK * n_packs
    b = (Builder("cap").pk("id")
         .add("val", FieldType.UINT64)
         .add("bal", FieldType.INT64))
    if with_grp:
        b = b.add("grp", FieldType.UINT32)
    sch = b.finish()
    data = {
        "id": np.arange(1, n + 1, dtype=np.uint64),
        "val": rng.integers(0, 1 << 16, n, dtype=np.uint64),
        "bal": rng.integers(-1 << 40, 1 << 40, n, dtype=np.int64),
    }
    if with_grp:
        data["grp"] = rng.integers(0, 1000, n).astype(np.uint32)
    seg = build_segment(sch, data, pack_size=PACK)
    return sch, seg, data


def scan_marginal(sch, seg, tag: str):
    """cfg#2-shape dual-variant marginal on the whole-tree kernel."""
    import jax
    import jax.numpy as jnp

    from knoxdb_tpu.exec.device import DeviceSegment
    from knoxdb_tpu.exec.scan import AggSpec, SegmentScanner
    from knoxdb_tpu.query.filter import Filter, and_, leaf
    from knoxdb_tpu.types import FilterMode

    n = seg.nrows_total
    t0 = time.perf_counter()
    sc = SegmentScanner(DeviceSegment(seg))
    aggs = [AggSpec("count"), AggSpec("sum", "bal")]

    def mk(lo, gt):
        return and_(
            leaf(Filter(sch.field("val"), FilterMode.RANGE, (lo, 50000))),
            leaf(Filter(sch.field("bal"), FilterMode.GT, gt)),
        ).optimize()

    _f1, args, raw = sc.prepare(mk(1000, 0), aggs)
    _f2, args2, _r = sc.prepare(mk(1001, 1), aggs)
    arrays, consts, overrides, valid, excl = args
    consts_st = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a, b]), consts, args2[1])
    over_st = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a, b]), overrides, args2[2])

    def many(arrays, consts2, over2, valid, excl, idxs):
        def body(acc, i):
            j = (i % 2).astype(jnp.int32)
            c = jax.tree_util.tree_map(
                lambda s: jax.lax.dynamic_index_in_dim(s, j, 0, False),
                consts2)
            o = jax.tree_util.tree_map(
                lambda s: jax.lax.dynamic_index_in_dim(s, j, 0, False),
                over2)
            _m, counts, parts = raw(arrays, c, o, valid, excl)
            p = parts[1][0]
            if isinstance(p, dict):
                chk = p["pcnt"].sum(dtype=jnp.int64) \
                    + p["cnt"].sum(dtype=jnp.int64)
            else:
                lo, hi, _c = p
                chk = (lo.sum() + hi.sum()).astype(jnp.int64)
            return (acc[0] + counts.sum(), acc[1] + chk), None
        out, _ = jax.lax.scan(body, (jnp.int64(0), jnp.int64(0)), idxs)
        return out

    g = jax.jit(many)

    def run(k):
        out = g(arrays, consts_st, over_st, valid, excl,
                jnp.arange(k, dtype=jnp.uint64))
        return int(out[0]), int(out[1])

    run(1)
    print(f"{tag}: upload+compile+first {time.perf_counter()-t0:.1f}s",
          flush=True)
    K_hi = 257 if seg.npacks >= 1024 else 1025
    if os.environ.get("KNOX_CAP_SMOKE"):
        K_hi = 9                       # CPU correctness pass only
    ts = []
    for _ in range(5):
        t1 = time.perf_counter()
        run(1)
        ta = time.perf_counter() - t1
        t1 = time.perf_counter()
        run(K_hi)
        tb = time.perf_counter() - t1
        ts.append((tb - ta) / (K_hi - 1))
    marg = sorted(ts)[2]
    print(f"{tag}: marginal {marg*1e3:.3f} ms = {n/marg/1e9:.1f} G "
          f"rows/s  (packs={seg.npacks})", flush=True)
    return n / marg


def part_a():
    rng = np.random.default_rng(0xCAFE)
    print(f"# building {CAP_PACKS}-pack segment "
          f"({CAP_PACKS * PACK / 1e6:.0f}M rows x 3 cols)...", flush=True)
    t0 = time.perf_counter()
    sch, seg, _ = build_seg(CAP_PACKS, rng)
    print(f"# built in {time.perf_counter()-t0:.1f}s; "
          f"encoded {seg.nbytes/1e9:.2f} GB", flush=True)
    big = scan_marginal(sch, seg, "capacity")
    del seg
    sch2, seg2, _ = build_seg(256, rng)
    small = scan_marginal(sch2, seg2, "baseline256")
    print(f"# capacity/baseline rows-per-s ratio: {big/small:.3f}",
          flush=True)


def part_b():
    import jax  # noqa: F401

    from knoxdb_tpu.engine.engine import CacheManager
    from knoxdb_tpu.engine.table import _SegHandle
    from knoxdb_tpu.exec.scan import AggSpec
    from knoxdb_tpu.query.filter import Filter, leaf
    from knoxdb_tpu.types import FilterMode

    rng = np.random.default_rng(0xBEEF)
    npx = min(256, max(8, CAP_PACKS // 16))
    segs = []
    for i in range(3):
        sch, seg, _ = build_seg(npx, rng, with_grp=False)
        segs.append((sch, seg))
    seg_bytes = segs[0][1].nbytes

    class _Eng:
        pass

    class _Tbl:
        engine = _Eng()

    _Tbl.engine.cache = CacheManager(budget_bytes=int(2.2 * seg_bytes))
    _Tbl.engine.mesh = None
    handles = []
    for sch, seg in segs:
        n = seg.nrows_total
        h = _SegHandle(seg=seg, host_pk=np.arange(n, dtype=np.uint64),
                       host_rid=np.arange(n, dtype=np.uint64))
        h.table = _Tbl
        handles.append((sch, h))

    def q(i):
        sch, h = handles[i]
        t0 = time.perf_counter()
        resident = h.dseg is not None
        sc = h.scanner_()
        r = sc.scan(leaf(Filter(sch.field("val"), FilterMode.GT,
                                1000)).optimize(), [AggSpec("count")])
        dt = time.perf_counter() - t0
        return r.count, dt, resident

    # pattern: A B A C A B A C ... — A re-references (protected), B/C
    # alternate through probation and evict each other, never A
    pattern = [0, 1, 0, 2, 0, 1, 0, 2, 0, 1, 0, 2]
    names = "ABC"
    a_resident = []
    bc_uploads = 0
    for step, i in enumerate(pattern):
        cnt, dt, resident = q(i)
        # A's step-0 probation entry may be fifo-evicted by B's arrival
        # (first-touch entries are deliberately vulnerable); its step-2
        # touch ghost-promotes to protected — assert from there on
        if i == 0 and step >= 4:
            a_resident.append(resident)
        if i != 0 and step >= 4 and not resident:
            bc_uploads += 1
        print(f"contention step {step} table {names[i]}: {dt:.2f}s "
              f"{'resident' if resident else 'UPLOAD'}", flush=True)
    cm = _Tbl.engine.cache
    print(f"contention: budget 2.2x seg ({seg_bytes/1e6:.0f} MB "
          f"each); cache hits={cm.hits} misses={cm.misses} "
          f"evictions={cm.evictions}", flush=True)
    # 2Q property: A promotes on its 2nd touch and is never evicted by
    # the B/C probation churn (which keeps re-uploading)
    assert all(a_resident), f"protected table was evicted: {a_resident}"
    assert bc_uploads >= 2, "B/C never cycled — budget not constraining"
    print("contention: PASS (protected table never re-uploaded; "
          f"B/C re-uploaded {bc_uploads}x)", flush=True)


if __name__ == "__main__":
    part_a()
    part_b()
