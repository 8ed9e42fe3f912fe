"""TPU capture: fused Pallas range+sum kernel marginal at bench scale.

Uses the WEDGE-SAFE loop shape proven by probes/scan_wedge_probe.py
(28/28 clean): kernel operands come from PRE-STACKED const sets via
dynamic_index inside lax.scan — NOT computed in the loop body (the
engine plan's in-body operand computation under lax.scan is the wedge
trigger, probes/scan_wedge_engine.py e1). Reports the marginal ms/iter
and rows/s for the 16-plane 16.7M-row config-#1 shape, i.e. what the
scan path would run at IF the fused kernel were the default.

Usage: timeout 2400 python probes/pallas_scan_capture.py [n_packs]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

PACK = 1 << 16
W_BITS = 16


def main():
    import jax
    import jax.numpy as jnp

    from knoxdb_tpu.ops.pallas_scan import fused_range_sum, range_consts
    from knoxdb_tpu.utils.native import bitplane_pack

    P = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    W = PACK // 32
    n = P * PACK
    platform = jax.devices()[0].platform
    interp = platform != "tpu"
    print(f"platform={platform} P={P} rows={n} interpret={interp}",
          flush=True)
    rng = np.random.default_rng(0xCAB)
    vals = rng.integers(0, 1 << W_BITS, n, dtype=np.uint64)
    planes = jnp.asarray(np.stack([
        bitplane_pack(vals.reshape(P, PACK)[i], W_BITS, PACK)
        for i in range(P)], axis=1))    # plane-major (r4)
    valid = jnp.full((P, W), np.uint32(0xFFFFFFFF))
    mk = np.zeros(P, np.uint64)

    sets = [range_consts(mk, np.uint64(1000 + j), np.uint64(50000), W_BITS)
            for j in range(2)]
    lo_st = jnp.stack([s[0] for s in sets])
    hi_st = jnp.stack([s[1] for s in sets])
    fl_st = jnp.stack([s[2] for s in sets])

    def many(lo_st, hi_st, fl_st, pl_, va, idxs):
        def body(acc, i):
            j = (i % 2).astype(jnp.int32)
            lo_b = jax.lax.dynamic_index_in_dim(lo_st, j, 0, False)
            hi_b = jax.lax.dynamic_index_in_dim(hi_st, j, 0, False)
            fl = jax.lax.dynamic_index_in_dim(fl_st, j, 0, False)
            _m, pcnt, cnt = fused_range_sum(pl_, lo_b, hi_b, fl, va,
                                            W_BITS, interpret=interp)
            return acc + cnt.sum(dtype=jnp.int64) \
                + pcnt.sum(dtype=jnp.int64), None
        out, _ = jax.lax.scan(body, jnp.int64(0), idxs)
        return out

    g = jax.jit(many)

    def run(k):
        return int(g(lo_st, hi_st, fl_st, planes, valid,
                     jnp.arange(k, dtype=jnp.int64)))

    K_LO, K_HI = 1, 129
    # correctness of one variant
    m = (vals >= 1000) & (vals <= 50000)
    want = int(m.sum())

    t0 = time.perf_counter()
    run(K_LO)
    print(f"compile+first {time.perf_counter()-t0:.1f}s", flush=True)

    def t(k):
        t0 = time.perf_counter()
        run(k)
        return time.perf_counter() - t0

    margs = sorted(max((t(K_HI) - t(K_LO)) / (K_HI - K_LO), 1e-9)
                   for _ in range(5))
    marg = margs[len(margs) // 2]
    print(f"marginal={marg*1e3:.3f} ms/iter rows/s={n/marg/1e9:.1f}G "
          f"planes={planes.nbytes/1e6:.1f}MB eff={planes.nbytes/marg/1e9:.0f}GB/s",
          flush=True)


if __name__ == "__main__":
    main()
