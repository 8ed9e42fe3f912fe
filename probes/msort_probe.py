"""TPU probe: Mosaic VMEM-staged sort — the recorded join-ceiling lever
(VERDICT r4 next-#2). Decides by MEASUREMENT whether a hand-written
bitonic (u32 key, u32 payload) sort can beat lax.sort at 2M rows
(~3.99 ms, docs/bench.md JOIN ROOFLINE), or closes the lever with
pass-count math grounded in real per-stage cost.

The math frame: bitonic sort of n=2M is sum_k k = 231 compare-exchange
stages (21 merge phases). A VMEM-staged version runs each stage at VMEM
speed but pays (a) the same stage COUNT, (b) a sublane<->lane transpose
whenever a stage's exchange distance crosses the 128-lane boundary
(2 per merge phase once tiles sort locally), and (c) cross-tile HBM
passes for distances beyond the 64K tile (15 such stages at 2M/64K=32
tiles). lax.sort is XLA's own staged implementation of the same
network; our only possible edge is lower per-stage overhead.

What this probe measures on chip:
  stage   one Pallas kernel running the full 45-stage bitonic COLUMN
          sort (each of 128 lanes sorts its 512-element column,
          row-distance exchanges only — the Mosaic-friendly subset) on
          [512, 128] u32 key+payload tiles, 2M rows total, verified
          against a numpy per-column sort -> per-stage cost.
  tpose   the same kernel + 8 in-kernel [512,128] transposes ->
          marginal transpose cost (the lane-crossing tax).
  lax     jax.lax.sort (u32 key + u32 payload) on the same 2M rows.

Projection printed at the end: full-sort estimate =
  per_stage * 231 (all stages) + tpose_cost * 2*21 (lane crossings)
  + HBM passes for the 15 cross-tile stages at stream bandwidth.
Decision rule: estimate < lax/1.3 -> build it; else lever CLOSED.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python probes/msort_probe.py
CPU:   KNOX_PROBE_INTERPRET=1 PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
       python probes/msort_probe.py --n 131072
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N = 2_097_152
if "--n" in sys.argv:
    N = int(sys.argv[sys.argv.index("--n") + 1])
R, C = 512, 128                       # tile layout [sublane, lane]
TILE = R * C
K = 64


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    INTERP = bool(os.environ.get("KNOX_PROBE_INTERPRET"))
    _Z = np.int32(0)

    rng = np.random.default_rng(3)
    keys_np = rng.integers(0, 1 << 32, N, dtype=np.uint64).astype(np.uint32)
    pay_np = np.arange(N, dtype=np.uint32)

    def col_sort_stages():
        """Bitonic stage list for a 512-element column sort: (phase
        span, distance) pairs, distances all row-wise. (The r5 first
        attempt crashed Mosaic at small d — root cause was a
        bool-valued jnp.where lowering to trunci i8->i1, now expressed
        as a u32 select + one compare.)"""
        out = []
        k = 2
        while k <= R:
            d = k // 2
            while d >= 1:
                out.append((k, d))
                d //= 2
            k *= 2
        return out

    STAGES = col_sort_stages()        # 45 stages for R=512

    def simulate_np(keys2, pays2):
        """Exact numpy twin of the staged network (per tile column)."""
        kv = keys2.copy()
        pv = pays2.copy()
        rows = np.arange(R)
        for k, d in STAGES:
            i = rows.reshape(-1, 2 * d)
            a, b = i[:, :d].reshape(-1), i[:, d:].reshape(-1)
            asc = ((a // k) % 2) == 0
            swap = np.where(asc, kv[a] > kv[b], kv[a] < kv[b])
            ka, kb = kv[a].copy(), kv[b].copy()
            pa, pb = pv[a].copy(), pv[b].copy()
            kv[a] = np.where(swap, kb, ka)
            kv[b] = np.where(swap, ka, kb)
            pv[a] = np.where(swap, pb, pa)
            pv[b] = np.where(swap, pa, pb)
        return kv, pv

    def exchange(kv, pv, k, d):
        """One bitonic compare-exchange at row distance d, direction
        alternating every k rows (leading-dim reshapes/slices only —
        the Mosaic-friendly subset)."""
        g = R // (2 * d)
        k3 = kv.reshape(g, 2 * d, C)
        p3 = pv.reshape(g, 2 * d, C)
        a_k, b_k = k3[:, :d], k3[:, d:]
        a_p, b_p = p3[:, :d], p3[:, d:]
        # ascending iff the element's phase block index is even
        row0 = jax.lax.broadcasted_iota(jnp.int32, (g, d, C), 0) * (2 * d) \
            + jax.lax.broadcasted_iota(jnp.int32, (g, d, C), 1)
        asc = ((row0 // k) % 2) == 0
        # NO bool-valued where (jnp.where(asc, boolA, boolB) lowers to a
        # trunci i8->i1 the Mosaic backend rejects — r5 on-chip find):
        # pick operands with where on u32, then ONE compare
        swap = jnp.where(asc, a_k, b_k) > jnp.where(asc, b_k, a_k)
        na_k = jnp.where(swap, b_k, a_k)
        nb_k = jnp.where(swap, a_k, b_k)
        na_p = jnp.where(swap, b_p, a_p)
        nb_p = jnp.where(swap, a_p, b_p)
        kv = jnp.concatenate([na_k, nb_k], axis=1).reshape(R, C)
        pv = jnp.concatenate([na_p, nb_p], axis=1).reshape(R, C)
        return kv, pv

    def kern_sort(k_ref, p_ref, ko_ref, po_ref, *, ntpose: int):
        kv = k_ref[0]
        pv = p_ref[0]
        for k, d in STAGES:
            kv, pv = exchange(kv, pv, k, d)
        for _ in range(ntpose):
            kv = jnp.transpose(kv).reshape(R, C)
            pv = jnp.transpose(pv).reshape(R, C)
        ko_ref[0] = kv
        po_ref[0] = pv

    def call(keys, pay, ntpose: int):
        B = keys.shape[0] // TILE
        k3 = keys.reshape(B, R, C)
        p3 = pay.reshape(B, R, C)
        spec = pl.BlockSpec((1, R, C), lambda i: (i, _Z, _Z))
        return pl.pallas_call(
            lambda a, b, c, d: kern_sort(a, b, c, d, ntpose=ntpose),
            grid=(B,),
            in_specs=[spec, spec],
            out_specs=[spec, spec],
            out_shape=[jax.ShapeDtypeStruct((B, R, C), jnp.uint32)] * 2,
            interpret=INTERP,
        )(k3, p3)

    # correctness vs the numpy twin of the same partial network
    ks, ps = jax.jit(lambda a, b: call(a, b, 0))(
        jnp.asarray(keys_np), jnp.asarray(pay_np))
    ks_np = np.asarray(ks).reshape(-1, R, C)
    ps_np = np.asarray(ps).reshape(-1, R, C)
    ok = True
    src = keys_np.reshape(-1, R, C)
    srcp = pay_np.reshape(-1, R, C)
    for b in range(min(ks_np.shape[0], 4)):
        for c in range(0, C, 37):
            wk, wp = simulate_np(src[b, :, c], srcp[b, :, c])
            ok &= (ks_np[b, :, c] == wk).all()
            ok &= (ps_np[b, :, c] == wp).all()
    print(f"column-net exact={bool(ok)}", flush=True)
    if not ok:
        return

    tiny = jax.jit(lambda x: x + 1)
    int(tiny(jnp.uint32(1)))
    floors = []
    for i in range(4):
        t0 = time.perf_counter()
        int(tiny(jnp.uint32(i)))
        floors.append(time.perf_counter() - t0)
    floor = min(floors)
    print(f"relay floor ~{floor*1e3:.1f} ms  N={N}", flush=True)

    def bench(name, fn):
        def one(cv, _):
            out = fn(cv)
            return out, ()
        stepK = jax.jit(lambda c0: jax.lax.scan(one, c0, None,
                                                length=K)[0])
        t0 = time.perf_counter()
        int(stepK(jnp.uint32(0)))
        print(f"{name}: compile {time.perf_counter()-t0:.1f}s",
              flush=True)
        ts = []
        for i in range(6):
            t0 = time.perf_counter()
            int(stepK(jnp.uint32(i)))
            ts.append(time.perf_counter() - t0)
        tk = (min(ts) - floor) / K
        print(f"{name}: per-iter {tk*1e3:.3f} ms", flush=True)
        return tk

    keys_d = jnp.asarray(keys_np)
    pay_d = jnp.asarray(pay_np)

    def f_stage(cv):
        ks_, ps_ = call(keys_d ^ (cv & jnp.uint32(1)), pay_d, 0)
        return (ks_.sum(dtype=jnp.uint32)
                + ps_.sum(dtype=jnp.uint32)).astype(jnp.uint32)

    def f_tpose(cv):
        ks_, ps_ = call(keys_d ^ (cv & jnp.uint32(1)), pay_d, 8)
        return (ks_.sum(dtype=jnp.uint32)
                + ps_.sum(dtype=jnp.uint32)).astype(jnp.uint32)

    def f_lax(cv):
        ks_, ps_ = jax.lax.sort(
            (keys_d ^ (cv & jnp.uint32(1)), pay_d), dimension=0,
            num_keys=1)
        return (ks_[0] + ps_[-1] + ks_[-1]).astype(jnp.uint32)

    t_stage = bench("stage45", f_stage)
    t_tpose = bench("stage45+8tpose", f_tpose)
    t_lax = bench("lax.sort", f_lax)

    per_stage = t_stage / len(STAGES)
    per_tpose = max(t_tpose - t_stage, 0.0) / 8
    n_phases = int(np.log2(N))
    total_stages = n_phases * (n_phases + 1) // 2
    cross_tile = sum(max(0, p - int(np.log2(TILE)))
                     for p in range(1, n_phases + 1))
    hbm_pass = (N * 8 * 3) / 1.2e12    # rw of key+payload at ~1.2 TB/s
    est = (per_stage * total_stages + per_tpose * 2 * n_phases
           + cross_tile * hbm_pass)
    print(f"per-stage {per_stage*1e6:.1f} us, per-transpose "
          f"{per_tpose*1e6:.1f} us, cross-tile stages {cross_tile}",
          flush=True)
    print(f"PROJECTION full bitonic ~{est*1e3:.2f} ms vs lax.sort "
          f"{t_lax*1e3:.2f} ms -> "
          f"{'BUILD IT' if est < t_lax / 1.3 else 'LEVER CLOSED'}",
          flush=True)


if __name__ == "__main__":
    main()
