"""Distributed shuffle-join exchange bandwidth on the virtual mesh.

VERDICT r2 next-#1 asks for a checked-in shuffle GB/s number for
parallel/shuffle.py. Real multi-chip ICI is not reachable from this
harness (one chip behind a relay), so this measures the FULL salted
exchange + local join program over an 8-device virtual CPU mesh — the
same program the driver's dryrun compiles — and reports:

  - shuffle_gbps: exchanged bytes / wall seconds on the virtual mesh
    (bytes = keys + positions + validity per padded row, both sides;
    the same accounting shuffle_join_rows.stats uses). On CPU the
    all_to_all is a memcpy, so this is a PROGRAM-overhead floor, not an
    ICI number.
  - bytes/row exchanged — the harness-independent quantity. On a real
    v5e pod (45 GB/s bidirectional ICI per chip x 4 links), 17 B/row
    each way bounds the exchange at ~2.6 G rows/s/chip; the per-chip
    local join core (bench_suite config #5) is the binding stage well
    below that, so the shuffle adds ~nothing at pod scale.

Prints one JSON line. Usage (CPU, concurrency-safe vs a TPU process):
  PALLAS_AXON_POOL_IPS= python bench_shuffle.py [n_per_side]
The PALLAS_AXON_POOL_IPS= prefix is MANDATORY and must come from the
PARENT environment: the axon sitecustomize claims the TPU session at
python start, before this file's first line runs (CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

if os.environ.get("PALLAS_AXON_POOL_IPS", None) is None:
    sys.exit("bench_shuffle.py must run with PALLAS_AXON_POOL_IPS= "
             "(empty) in the parent env — see module docstring")
os.environ["JAX_PLATFORMS"] = "cpu"   # parent exports axon; force cpu
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np


def main():
    import jax
    from jax.sharding import Mesh

    from knoxdb_tpu.parallel.shuffle import shuffle_join_rows

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 21
    rng = np.random.default_rng(0x5F)
    lk = rng.integers(0, n * 2, n, dtype=np.uint64)
    rk = rng.integers(0, n * 2, n, dtype=np.uint64)

    mesh = Mesh(np.array(jax.devices()[:8]), ("shards",))

    # correctness spot check on a small slice first
    from knoxdb_tpu.exec.join import join_keys_np
    from knoxdb_tpu.types import JoinType
    li0, ri0, _ = shuffle_join_rows(mesh, lk[:4096], rk[:4096])
    want = join_keys_np(lk[:4096], rk[:4096], JoinType.INNER)
    assert len(li0) == want.n, "shuffle join cardinality mismatch"
    assert (lk[li0] == rk[ri0]).all(), "shuffle join pairs mismatch"

    # warm (compiles all phases at the full shape), then timed repeats
    shuffle_join_rows(mesh, lk, rk)
    gbps, rows_s = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        li, ri, stats = shuffle_join_rows(mesh, lk, rk)
        dt = time.perf_counter() - t0
        gbps.append(stats["shuffle_bytes"] / stats["seconds"] / 1e9)
        rows_s.append(2 * n / dt)
    gb = sorted(gbps)[1]
    print(json.dumps({
        "metric": "shuffle_join_exchange_gbps_virtual8",
        "value": gb,
        "unit": "GB/s",
        "vs_baseline": None,   # reference has no distributed join at all
    }))
    print(f"# n={n}x{n} ndev=8 core={stats['core']} bytes/slot=17x2 "
          f"exchanged={stats['shuffle_bytes']/1e6:.0f}MB pairs={len(li)} "
          f"rows/s_e2e={sorted(rows_s)[1]/1e6:.1f}M "
          f"device_seconds={stats['seconds']*1e3:.0f}ms "
          f"heavy={stats['heavy_buckets']}", file=sys.stderr)

    # per-rung device seconds at the same size (docs/bench.md table):
    # unique build (pk join), shift default, forced general fallback
    nr_u = rng.permutation(np.arange(1, n + 1)).astype(np.uint64)
    for label, kw, keys in (
            ("unique+keys32", dict(unique_build=True, keys32=True), nr_u),
            ("shift+keys32", dict(keys32=True), rk),
            ("general", dict(), None)):
        probes = lk
        if keys is None:
            # a > SHIFT_S-wide matched build run forces the general
            # phases (maxneed counts MATCHED probe distances)
            keys = np.concatenate([rk[:-40], np.full(40, 7, np.uint64)])
            probes = np.concatenate([lk[:-8], np.full(8, 7, np.uint64)])
        shuffle_join_rows(mesh, probes, keys, **kw)      # warm/compile
        ts = []
        for _ in range(3):
            _li, _ri, st = shuffle_join_rows(mesh, probes, keys, **kw)
            ts.append(st["seconds"])
        print(f"# rung {label}: core={st['core']} "
              f"device_seconds={sorted(ts)[1]*1e3:.0f}ms "
              f"rows/s={2*n/sorted(ts)[1]/1e6:.1f}M", file=sys.stderr)


if __name__ == "__main__":
    main()
