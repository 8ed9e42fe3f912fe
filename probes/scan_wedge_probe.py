"""TPU probe: Pallas fused-scan repeat-execution wedge (VERDICT r2 #7).

History: the fused range+sum scan kernel (ops/pallas_scan.py) wedged the
TPU grant on THREE independent days (r2-early, r2-final, r2-cont): the
first execution of a second program shape raises INVALID_ARGUMENT and
every later device_put in ANY process fails FAILED_PRECONDITION for
minutes. The group kernel (ops/pallas_group.py) ran dozens of clean
repeats the same hours — the instability is program-specific.

This probe is the decision harness: >= 20 repeat executions across the
suspicion axes, every result bit-checked vs the XLA oracle. Stages run
in escalating-similarity-to-bench order so a wedge attributes to a
specific axis (each stage logs BEFORE executing):

  s0  jit(fused_range_sum) direct   x12 (same input buffers)
  s1  fresh device_put inputs       x4
  s2  scan(K=16) wrapper, varying per-iteration consts (bench-like) x6
  s3  SECOND scan length (K=64) same process (bench's two-K marginal
      structure -- the historical wedge point)               x6

Exit 0 = all clean (>= 28 executions): flipping the default is
justified. Nonzero = wedge reproduced at the logged stage; keep opt-in.

RUN THIS LAST in any TPU batch: a wedge kills the grant for minutes.
Usage: timeout 2400 python probes/scan_wedge_probe.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

P, W_BITS, PACK = 64, 16, 1 << 16
W = PACK // 32


def main():
    import jax
    import jax.numpy as jnp

    from knoxdb_tpu.ops import bitslice as B
    from knoxdb_tpu.ops.pallas_scan import (fused_range_sum, range_consts)

    platform = jax.devices()[0].platform
    interp = platform != "tpu"        # CPU validation rides interpret mode
    print(f"platform={platform} interpret={interp}", flush=True)

    from knoxdb_tpu.utils.native import bitplane_pack

    def make_inputs(seed):
        r = np.random.default_rng(seed)
        vals = r.integers(0, 1 << W_BITS, P * PACK, dtype=np.uint64)
        min_keys = np.zeros(P, np.uint64)
        planes_np = np.stack([
            bitplane_pack(vals.reshape(P, PACK)[i], W_BITS, PACK)
            for i in range(P)], axis=1)             # u32[w, P, W] (r4)
        return vals, jnp.asarray(planes_np), jnp.asarray(min_keys)

    vals, planes, min_keys = make_inputs(1)
    valid = jnp.full((P, W), np.uint32(0xFFFFFFFF))
    LO, HI = 1000, 50000

    def consts(lo, hi):
        lo_b, hi_b, flags = range_consts(min_keys, np.uint64(lo),
                                         np.uint64(hi), W_BITS)
        return lo_b, hi_b, flags

    def expect(vals, lo, hi):
        m = (vals >= lo) & (vals <= hi)
        cnt = int(m.sum())
        s = int(vals[m].astype(object).sum())
        return cnt, s

    kfn = jax.jit(lambda lo_b, hi_b, fl, pl_, va: fused_range_sum(
        pl_, lo_b, hi_b, fl, va, W_BITS, interpret=interp))

    def run_direct(lo, hi, planes=planes):
        lo_b, hi_b, fl = consts(lo, hi)
        mask, pcnt, cnt = kfn(lo_b, hi_b, fl, planes, valid)
        c = int(cnt.sum())
        ssum = sum((1 << p) * int(pcnt[:, p].sum()) for p in range(W_BITS))
        return c, ssum

    failures = []

    def stage(name, fn, reps):
        for i in range(reps):
            print(f"{name} rep {i}: exec...", flush=True)
            t0 = time.perf_counter()
            try:
                ok = fn(i)
            except Exception as e:
                print(f"{name} rep {i}: WEDGE {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)
                failures.append((name, i, type(e).__name__))
                return False
            dt = time.perf_counter() - t0
            print(f"{name} rep {i}: {'ok' if ok else 'MISMATCH'} "
                  f"{dt*1e3:.1f}ms", flush=True)
            if not ok:
                failures.append((name, i, "mismatch"))
                return False
        return True

    # s0: direct repeats, same buffers
    def s0(i):
        lo = LO + i          # vary consts a little (still same program)
        w = expect(vals, lo, HI)
        return run_direct(lo, HI) == w
    if not stage("s0-direct", s0, 12):
        return finish(failures)

    # s1: fresh inputs each call
    def s1(i):
        v2, p2, _ = make_inputs(100 + i)
        w = expect(v2, LO, HI)
        return run_direct(LO, HI, planes=p2) == w
    if not stage("s1-fresh-inputs", s1, 4):
        return finish(failures)

    # s2/s3: scan(K) wrapper, PER-ITERATION consts (bench shape: the
    # iteration selects between two stacked const sets, so the kernel
    # cannot hoist out of the loop and really executes K times)
    lo_b0, hi_b0, fl0 = consts(LO, HI)
    lo_b1, hi_b1, fl1 = consts(LO + 1, HI)
    lo_st = jnp.stack([lo_b0, lo_b1])
    hi_st = jnp.stack([hi_b0, hi_b1])
    fl_st = jnp.stack([fl0, fl1])

    def scan_fn(K):
        def many(lo_st, hi_st, fl_st, pl_, va, idxs):
            def body(acc, i):
                j = (i % 2).astype(jnp.int32)
                lo_b = jax.lax.dynamic_index_in_dim(lo_st, j, 0, False)
                hi_b = jax.lax.dynamic_index_in_dim(hi_st, j, 0, False)
                fl = jax.lax.dynamic_index_in_dim(fl_st, j, 0, False)
                mask, pcnt, cnt = fused_range_sum(pl_, lo_b, hi_b, fl, va,
                                                  W_BITS, interpret=interp)
                chk = cnt.sum(dtype=jnp.int64) + pcnt.sum(dtype=jnp.int64)
                return acc + chk, None
            out, _ = jax.lax.scan(body, jnp.int64(0),
                                  jnp.arange(K, dtype=jnp.int64))
            return out
        return jax.jit(many)

    def base_for(lo):
        lo_b, hi_b, fl = consts(lo, HI)
        _m, pcnt, cnt = kfn(lo_b, hi_b, fl, planes, valid)
        return int(cnt.sum()) + int(np.asarray(pcnt).sum())

    base0, base1 = base_for(LO), base_for(LO + 1)

    def make_sk(K):
        f = scan_fn(K)
        wantv = (K + 1) // 2 * base0 + K // 2 * base1

        def sk(i):
            got = int(f(lo_st, hi_st, fl_st, planes, valid,
                        jnp.arange(K, dtype=jnp.int64)))
            return got == wantv
        return sk

    if not stage("s2-scan16", make_sk(16), 6):
        return finish(failures)
    if not stage("s3-scan64", make_sk(64), 6):
        return finish(failures)

    return finish(failures)


def finish(failures):
    if failures:
        print(f"RESULT: WEDGE/FAIL at {failures}", flush=True)
        return 1
    print("RESULT: CLEAN (28 executions across 4 stages, all bit-exact)",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
