"""TPU probe: group kernel throughput at G=8192 (the H=256/L=32 Pallas
route, S=8 by pick_sublanes) and G=12288 (XLA factored fallback).
Closes NOTES_r2 open item 2's "capture a number" for G in (4096, 16384].

Method: lax.scan(K) marginal like probes/pg3_variants.py, through the
production dispatch exec/groupby.group_aggregate_mxu (includes mask
unpack + value split, i.e. the e2e kernel stage, not kernel-only).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python probes/pg_g8192.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

N = int(os.environ.get("KNOX_PROBE_N", 4_194_304))
K = 8


def main():
    import jax
    import jax.numpy as jnp

    from knoxdb_tpu.exec import groupby as GB

    rng = np.random.default_rng(11)
    P, rows = N // 8192, 8192
    vals = rng.integers(0, 1 << 40, (P, rows), dtype=np.uint64)
    words = np.full((P, rows // 32), 0xFFFFFFFF, np.uint32)

    tiny = jax.jit(lambda x: x + 1)
    int(tiny(jnp.uint32(1)))
    floors = []
    for i in range(4):
        t0 = time.perf_counter()
        int(tiny(jnp.uint32(i)))
        floors.append(time.perf_counter() - t0)
    floor = min(floors)
    print(f"relay floor ~{floor*1e3:.1f} ms", flush=True)

    for G in (8192, 12288):
        gids = rng.integers(0, G, (P, rows)).astype(np.int32)
        gd = jnp.asarray(gids)
        wd = jnp.asarray(words)
        vd = jnp.asarray(vals)

        def one(c, _, G=G, gd=gd, wd=wd, vd=vd):
            v = vd ^ (c & jnp.uint64(1)).astype(jnp.uint64)
            counts, chunks, mn, mx = GB.group_aggregate_mxu(
                gd, wd, v, G, n_chunks=8)
            s = (counts.sum().astype(jnp.uint32)
                 + chunks[0].sum().astype(jnp.uint32))
            return s.astype(jnp.uint32), ()

        stepK = jax.jit(
            lambda c0, one=one: jax.lax.scan(one, c0, None, length=K)[0])

        # correctness vs numpy oracle (single call)
        counts, chunks, _, _ = jax.jit(
            lambda g, w, v, G=G: GB.group_aggregate_mxu(g, w, v, G,
                                                        n_chunks=8))(gd, wd, vd)
        want_cnt = np.bincount(gids.reshape(-1), minlength=G)
        ok = (np.asarray(counts) == want_cnt).all()
        sums = GB.mxu_chunk_sums(chunks)
        want_sum = np.zeros(G, dtype=object)
        np.add.at(want_sum, gids.reshape(-1), vals.reshape(-1).astype(object))
        ok = ok and list(sums) == [int(x) for x in want_sum]
        print(f"G={G}: exact={bool(ok)}", flush=True)
        if not ok:
            continue

        t0 = time.perf_counter()
        int(stepK(jnp.uint32(0)))
        print(f"G={G}: scanK compile+run {time.perf_counter()-t0:.1f}s",
              flush=True)
        ts = []
        for i in range(6):
            t0 = time.perf_counter()
            int(stepK(jnp.uint32(i)))
            ts.append(time.perf_counter() - t0)
        tk = (min(ts) - floor) / K
        print(f"G={G}: per-iter {tk*1e3:.2f} ms = {N/tk/1e9:.2f} G rows/s"
              f"  (runs {['%.0f' % (t*1e3) for t in ts]} ms)", flush=True)


if __name__ == "__main__":
    main()
