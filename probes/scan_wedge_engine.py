"""TPU probe: engine-integrated Pallas scan repeat-execution (stage 2
of the r3 wedge isolation; run probes/scan_wedge_probe.py FIRST).

r3 finding so far: the BARE fused kernel is clean (28/28 repeat
executions, scan_wedge_probe.py) but `KNOX_PALLAS=1 bench.py` still
wedges on the SECOND execution of its timing loop (INVALID_ARGUMENT at
the host fetch, grant dead minutes — the historical signature). The
differences are (a) the engine program wraps the kernel in the full
scan plan (kernel operands are XLA-computed from traced consts, not
device_put arrays) and (b) bench runs P=256. This probe isolates (a)
at P=64, then (b) bare-kernel at P=256:

  e0  engine raw fn (SegmentScanner.prepare, KNOX_PALLAS=1), direct x6
  e1  engine raw fn inside lax.scan(K=8) (bench's wrapper)        x6
  e2  bare kernel P=256 direct                                    x6

RUN LAST (after all other captures). Usage:
  KNOX_PALLAS=1 timeout 2400 python probes/scan_wedge_engine.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
os.environ.setdefault("KNOX_PALLAS", "1")

PACK = 1 << 16


def stage(name, fn, reps):
    for i in range(reps):
        print(f"{name} rep {i}: exec...", flush=True)
        t0 = time.perf_counter()
        try:
            ok = fn(i)
        except Exception as e:
            print(f"{name} rep {i}: WEDGE {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            return False
        print(f"{name} rep {i}: {'ok' if ok else 'MISMATCH'} "
              f"{(time.perf_counter()-t0)*1e3:.1f}ms", flush=True)
        if not ok:
            return False
    return True


def main():
    import jax
    import jax.numpy as jnp

    from knoxdb_tpu.exec.device import DeviceSegment
    from knoxdb_tpu.exec.scan import AggSpec, SegmentScanner
    from knoxdb_tpu.pack.segment import build_segment
    from knoxdb_tpu.query.filter import Filter, leaf
    from knoxdb_tpu.schema.schema import Builder
    from knoxdb_tpu.types import FieldType, FilterMode

    print(f"platform={jax.devices()[0].platform} "
          f"KNOX_PALLAS={os.environ.get('KNOX_PALLAS')}", flush=True)

    P = 64
    n = PACK * P
    rng = np.random.default_rng(0xE46)
    sch = (Builder("wp").pk("id").add("val", FieldType.UINT64).finish())
    vals = rng.integers(0, 1 << 16, n, dtype=np.uint64)
    seg = build_segment(sch, {"id": np.arange(1, n + 1, dtype=np.uint64),
                              "val": vals}, pack_size=PACK)
    sc = SegmentScanner(DeviceSegment(seg))
    tree = leaf(Filter(sch.field("val"), FilterMode.RANGE,
                       (1000, 50000))).optimize()
    aggs = [AggSpec("count"), AggSpec("sum", "val")]
    m = (vals >= 1000) & (vals <= 50000)
    want_cnt = int(m.sum())
    want_sum = int(vals[m].astype(object).sum())

    def e0(i):
        res = sc.scan(tree, aggs)
        return (res.count == want_cnt
                and res.aggs[("sum", "val")] == want_sum)
    if not stage("e0-engine-direct", e0, 6):
        return 1

    # bench's scan(K) wrapper over the raw fn — r3 form: kernel operands
    # are HOST-BOUND by prepare(); the loop stacks two fully-bound query
    # variants and dynamic_indexes between them (the in-body operand
    # COMPUTATION of the old form was the wedge trigger)
    _fn, args, raw = sc.prepare(tree, aggs)
    arrays, consts, overrides, valid, excl = args
    tree2 = leaf(Filter(sch.field("val"), FilterMode.RANGE,
                        (1001, 50000))).optimize()
    _f2, args2, _r2 = sc.prepare(tree2, aggs)
    consts_st = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a, b]), consts, args2[1])
    over_st = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a, b]), overrides, args2[2])
    K = 8

    def many(arrays, consts, overrides, valid, excl, idxs):
        def body(acc, i):
            j = (i % 2).astype(jnp.int32)
            c = jax.tree_util.tree_map(
                lambda s: jax.lax.dynamic_index_in_dim(s, j, 0, False),
                consts)
            o = jax.tree_util.tree_map(
                lambda s: jax.lax.dynamic_index_in_dim(s, j, 0, False),
                overrides)
            _mask, counts, parts = raw(arrays, c, o, valid, excl)
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
    consts, overrides = consts_st, over_st

    def e1(i):
        out = g(arrays, consts, overrides, valid, excl,
                jnp.arange(K, dtype=jnp.uint64))
        return int(out[0]) >= 0 and int(out[1]) >= 0
    if not stage("e1-engine-scanK", e1, 6):
        return 1

    # bare kernel at bench scale P=256
    from knoxdb_tpu.ops.pallas_scan import fused_range_sum, range_consts
    from knoxdb_tpu.utils.native import bitplane_pack
    P2, W_BITS = 256, 16
    W = PACK // 32
    v2 = rng.integers(0, 1 << W_BITS, P2 * PACK, dtype=np.uint64)
    planes = jnp.asarray(np.stack([
        bitplane_pack(v2.reshape(P2, PACK)[i], W_BITS, PACK)
        for i in range(P2)]))
    validw = jnp.full((P2, W), np.uint32(0xFFFFFFFF))
    lo_b, hi_b, fl = range_consts(np.zeros(P2, np.uint64),
                                  np.uint64(1000), np.uint64(50000),
                                  W_BITS)
    from knoxdb_tpu.config import is_tpu
    kfn = jax.jit(lambda a, b, c, d, e: fused_range_sum(
        d, a, b, c, e, W_BITS, interpret=not is_tpu()))
    m2 = (v2 >= 1000) & (v2 <= 50000)
    want2 = int(m2.sum())

    def e2(i):
        _mk, pcnt, cnt = kfn(lo_b, hi_b, fl, planes, validw)
        return int(cnt.sum()) == want2
    if not stage("e2-bare-P256", e2, 6):
        return 1

    print("RESULT: CLEAN (engine direct + scanK + bare P=256)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
