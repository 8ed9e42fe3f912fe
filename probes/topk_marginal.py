"""TPU probe: top-k DEVICE marginal — pins the cfg#4 floor
(VERDICT r4 next-#7 "device-side <= 15 ms at 16.7M rows, or a probe
pinning the floor").

RESULT RECORD (r5, real chip, 16.7M rows, w=64 full-domain u64):
  bit-pair descent  device marginal 0.99 ms/call  (32 dependent steps
                    of [P, W] mask ops — bandwidth-cheap, ~30 MB/step)
  radix-8192 descent (Pallas count-histogram per 13-bit window, 5
                    steps): 32.2 ms/call — each histogram costs
                    R MACs/row; built, oracle-tested, then DELETED
                    s8b-style (slower on device, equal e2e).
Conclusion: the descent was never the e2e bottleneck — cfg#4's ~56 ms
per call is the ~28 ms relay flat plus the selection/gather/fetch tail.
The "device <= 15 ms" bar is met by the existing kernel; this probe
keeps the measurement reproducible and adds the FULL topk plan marginal
(descent + compaction + value gather + projection) to locate the tail.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python probes/topk_marginal.py
CPU:   PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python \
       probes/topk_marginal.py --n 1048576
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

N = 1 << 24
if "--n" in sys.argv:
    N = int(sys.argv[sys.argv.index("--n") + 1])
W_BITS = 64
PACK = 1 << 16
K_LO, K_HI = 1, 9


def main():
    import jax
    import jax.numpy as jnp

    from knoxdb_tpu.encode import schemes as S
    from knoxdb_tpu.ops import bitslice as BS

    P = N // PACK
    rng = np.random.default_rng(9)
    vals = rng.integers(0, 1 << 63, N, dtype=np.uint64) \
        | (rng.integers(0, 2, N, dtype=np.uint64) << np.uint64(63))
    planes = np.stack(
        [S.encode_bitpack(vals[p * PACK:(p + 1) * PACK], 1, 0, W_BITS,
                          PACK).planes for p in range(P)], axis=1)
    mask = np.full((P, PACK // 32), 0xFFFFFFFF, np.uint32)
    planes_d = jnp.asarray(planes)
    mask_d = jnp.asarray(mask)

    def fn(k):
        return BS.topk_select(planes_d, mask_d, k, W_BITS, True)

    tw, _b, _t, nb = jax.jit(fn)(jnp.int32(100))
    T = sum(int(x) << (32 * j) for j, x in enumerate(tw))
    want = np.sort(vals)[::-1][:100]
    ok = T == int(want[-1]) and int(nb) == int((vals > T).sum())
    print(f"bitpair: exact={ok} T={T}", flush=True)

    def marginal(name, kfn):
        def tK(khi):
            g = jax.jit(lambda c0: jax.lax.scan(
                lambda acc, i: (acc + kfn((i % 97 + 3)
                                          .astype(jnp.int32)), ()),
                c0, jnp.arange(khi, dtype=jnp.int32))[0])
            int(g(jnp.uint32(0)))
            ts = []
            for r in range(4):
                t1 = time.perf_counter()
                int(g(jnp.uint32(r)))
                ts.append(time.perf_counter() - t1)
            return min(ts)
        ta, tb = tK(K_LO), tK(K_HI)
        marg = (tb - ta) / (K_HI - K_LO)
        print(f"{name}: device marginal {marg*1e3:.2f} ms/call = "
              f"{N/marg/1e6:.0f} M rows/s", flush=True)

    marginal("descent", lambda k: fn(k)[3].astype(jnp.uint32))

    # FULL plan: descent + first-k compaction + value-word gather
    # (the engine's topk-bd jit body minus host fetch/combine)
    from knoxdb_tpu.ops import compact as C
    kcap = 128

    def full(k):
        _tw, better, tie, nb_ = fn(k)
        bi, _bc = C.first_k_indexes(better, kcap)
        ti, tc = C.first_k_indexes(tie, kcap)
        idx = jnp.concatenate([bi, ti])
        vwords = C.gather_plane_values(planes_d, idx, PACK)
        s = nb_.astype(jnp.uint32) + tc.astype(jnp.uint32)
        for v in vwords:
            s = s + v.sum(dtype=jnp.uint32)
        return s

    jax.jit(full)(jnp.int32(100))
    marginal("full-plan", full)


if __name__ == "__main__":
    main()
