"""TPU probe: join-core phase costs (r3 general-core regression hunt).

Config #5 r3 capture: unique core 431 M rows/s, GENERAL core 10.8 M
(r2: 85.6 M with the 7-sort formulation). The r3 general core swapped
three restore sorts for two bitonic-merge networks (merge_sorted_stable)
— this probe times each primitive in isolation with the scan(K) marginal
method so the regression attributes to a specific pass structure:

  sort2/sort3/sort4   lax.sort over 2M rows, 2/3/4 u32 operands
  sort4M              lax.sort over 4M rows, 4 operands (r2 expansion)
  bmerge4M            merge_sorted_stable over 4M rows, 3 channels
  bmerge5M            merge_sorted_stable over 5M rows, 2 channels
  fills4M             _fill_forward_max + 2x _fill_forward_last over 4M
  core_general        join_pairs_core end-to-end (1M x 1M)
  core_unique         join_pairs_core_unique end-to-end

Usage: timeout 3000 python probes/join_phase_probe.py [sel ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

N = 1 << 20
K = 8


def marginal(run, k_lo=1, k_hi=K + 1, reps=3):
    def t(k):
        t0 = time.perf_counter()
        run(k)
        return time.perf_counter() - t0
    m = sorted(max((t(k_hi) - t(k_lo)) / (k_hi - k_lo), 1e-9)
               for _ in range(reps))
    return m[len(m) // 2]


def scan_wrap(fn, *arrs):
    """fn(*arrs, i) -> scalar-reducible; returns run(k) with marginal
    semantics (per-iteration i defeats hoisting)."""
    import jax
    import jax.numpy as jnp

    def many(args, idxs):
        def body(acc, i):
            return acc + fn(*args, i), None
        out, _ = jax.lax.scan(body, jnp.int64(0), idxs)
        return out

    g = jax.jit(many)

    def run(k):
        return int(g(arrs, jnp.arange(k, dtype=jnp.uint32)))
    return run


def main():
    import jax
    import jax.numpy as jnp

    from knoxdb_tpu.exec import join as J

    print(f"platform={jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(7)
    sel = set(sys.argv[1:]) or None

    def want(name):
        return sel is None or name in sel

    def report(name, marg, rows):
        print(f"{name}: {marg*1e3:.2f} ms  ({rows/marg/1e6:.1f} M rows/s "
              f"over {rows/1e6:.1f}M)", flush=True)

    a = jnp.asarray(rng.integers(0, 1 << 32, 2 * N, dtype=np.uint64)
                    .astype(np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 32, 2 * N, dtype=np.uint64)
                    .astype(np.uint32))
    c = jnp.asarray(rng.integers(0, 1 << 32, 2 * N, dtype=np.uint64)
                    .astype(np.uint32))
    d = jnp.asarray(rng.integers(0, 1 << 32, 2 * N, dtype=np.uint64)
                    .astype(np.uint32))

    for nops, name in ((2, "sort2"), (3, "sort3"), (4, "sort4")):
        if not want(name):
            continue
        ops = (a, b, c, d)[:nops]

        def f(*args):
            i = args[-1]
            srt = jax.lax.sort(tuple(x ^ i for x in args[:-1]),
                               dimension=0, num_keys=min(2, nops))
            return srt[0].astype(jnp.int64).sum()
        report(name, marginal(scan_wrap(f, *ops)), 2 * N)

    if want("sort4M"):
        a4 = jnp.concatenate([a, b])
        b4 = jnp.concatenate([c, d])
        c4 = jnp.concatenate([b, c])
        d4 = jnp.concatenate([d, a])

        def f4(x, y, z, w, i):
            srt = jax.lax.sort((x ^ i, y, z, w), dimension=0, num_keys=1)
            return srt[1].astype(jnp.int64).sum()
        report("sort4M", marginal(scan_wrap(f4, a4, b4, c4, d4)), 4 * N)

    if want("bmerge4M"):
        # two pre-sorted runs of 2M each, 3 payload channels
        r1 = jnp.sort(a)
        r2 = jnp.sort(b)
        key = jnp.concatenate([r1 >> 1, r2 >> 1])   # < 0xFFFFFFFF pad ok
        p1 = jnp.concatenate([c, d])
        p2 = jnp.concatenate([d, c])
        p3 = jnp.concatenate([b, a])

        def fm(k, x, y, z, i):
            out = J.merge_sorted_stable(2 * N, k, x ^ i, y, z)
            return out[1].astype(jnp.int64).sum()
        report("bmerge4M", marginal(scan_wrap(fm, key, p1, p2, p3)), 4 * N)

    if want("bmerge5M"):
        r1 = jnp.sort(a)[:N]
        key5 = jnp.concatenate([r1 >> 1, jnp.sort(jnp.concatenate(
            [b, c])) >> 1])
        p1 = jnp.concatenate([c[:N], d, a])

        def fm5(k, x, i):
            out = J.merge_sorted_stable(N, k, x ^ i)
            return out[1].astype(jnp.int64).sum()
        report("bmerge5M", marginal(scan_wrap(fm5, key5, p1)), 5 * N)

    if want("fills4M"):
        v = jnp.concatenate([a, b])
        w = jnp.concatenate([c, d])

        def ff(x, y, i):
            m = J._fill_forward_max(x ^ i)
            l1 = J._fill_forward_last(y, jnp.uint32(0xFFFFFFFF))
            l2 = J._fill_forward_last(x, jnp.uint32(0xFFFFFFFF))
            return (m.astype(jnp.int64).sum() + l1.astype(jnp.int64).sum()
                    + l2.astype(jnp.int64).sum())
        report("fills4M", marginal(scan_wrap(ff, v, w)), 4 * N)

    from knoxdb_tpu.types import JoinType
    lkeys = jnp.asarray(rng.integers(0, 2 * N, N, dtype=np.uint64))
    rkeys = jnp.asarray(rng.integers(0, 2 * N, N, dtype=np.uint64))
    rku = jnp.asarray(rng.permutation(
        np.arange(N, dtype=np.uint64) * np.uint64(2)))

    if want("core_general"):
        cap = 1 << 20

        def cg(lk, rk, i):
            lidx, ridx, total = J.join_pairs_core(
                lk + i.astype(jnp.uint64), rk, cap, JoinType.INNER)
            return (lidx.astype(jnp.int64).sum()
                    + ridx.astype(jnp.int64).sum() + total)
        report("core_general", marginal(scan_wrap(cg, lkeys, rkeys)), 2 * N)

    if want("core_unique"):
        def cu(lk, rk, i):
            lidx, ridx, total, dup = J.join_pairs_core_unique(
                lk + i.astype(jnp.uint64), rk, JoinType.INNER)
            return (lidx.astype(jnp.int64).sum()
                    + ridx.astype(jnp.int64).sum() + total
                    + dup.astype(jnp.int64))
        report("core_unique", marginal(scan_wrap(cu, lkeys, rku)), 2 * N)


if __name__ == "__main__":
    main()
