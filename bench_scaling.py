"""Scaling-efficiency harness: pack-parallel scan at 1..N devices.

BASELINE north star: >=80% rows/s scaling efficiency. With one physical
chip in CI, absolute multi-chip numbers come from the virtual CPU mesh
(relative efficiency of the SPMD program: measures whether the sharded
program introduces serialization — collectives here are one psum over
scalars, so efficiency loss would indicate a layout bug). Run on a real
pod slice unchanged.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        PALLAS_AXON_POOL_IPS= python bench_scaling.py
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"   # this harness is the virtual-mesh run
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from knoxdb_tpu.encode import schemes as S
    from knoxdb_tpu.parallel import shard as PS

    ndev_all = len(jax.devices())
    pack_size = 1 << 14
    packs_per_dev = 16
    width = 16
    rng = np.random.default_rng(7)

    results = {}
    for ndev in [d for d in (1, 2, 4, 8) if d <= ndev_all]:
        P = ndev * packs_per_dev
        vals = rng.integers(0, 1 << width, (P, pack_size), dtype=np.uint64)
        planes = np.stack([
            S.encode_bitpack(vals[p], 1, 0, width, pack_size).planes
            for p in range(P)], axis=1)   # plane-major (r4)
        mins = np.zeros(P, np.uint64)
        valid = np.full((P, pack_size // 32), 0xFFFFFFFF, np.uint32)

        mesh = PS.make_mesh(ndev)
        fn = PS.sharded_scan_fn(mesh, width)
        sp, sm, sv = PS.shard_packs(mesh, (jnp.asarray(planes),
                                           jnp.asarray(mins),
                                           jnp.asarray(valid)))
        lo, hi = jnp.uint64(100), jnp.uint64(30000)
        int(fn(sp, sm, sv, lo, hi)[0])          # compile + force
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(sp, sm, sv, lo, hi)
        jax.block_until_ready(out)
        int(out[0])
        dt = (time.perf_counter() - t0) / iters
        rows = P * pack_size
        results[ndev] = rows / dt
        print(f"# ndev={ndev}: {rows / dt / 1e9:.2f} G rows/s "
              f"({dt*1e3:.2f} ms for {rows/1e6:.1f}M rows)", file=sys.stderr)

    # Virtual devices SHARE host cores, so naive rows/s/dev efficiency is
    # meaningless here. Report core-adjusted WEAK scaling instead:
    # per-device work is constant, ideal time grows only when ndev
    # exceeds physical cores. Real >=80% validation needs a pod slice.
    ncores = os.cpu_count() or 1
    base_t = (1 * packs_per_dev * pack_size) / results[1]
    eff = {}
    for ndev, rps in results.items():
        t = (ndev * packs_per_dev * pack_size) / rps
        ideal = base_t * max(1.0, ndev / ncores)
        eff[ndev] = ideal / t
    top = max(results)
    print(json.dumps({
        "metric": f"cpu_mesh_weak_scaling_{top}dev",
        "value": eff[top],
        "unit": "ratio",
        "vs_baseline": eff[top] / 0.80,
    }))
    print(f"# ncores={ncores} per-mesh rows/s: "
          f"{ {d: f'{r/1e9:.2f}G' for d, r in results.items()} } "
          f"core-adjusted weak-scaling: "
          f"{ {d: f'{e:.2f}' for d, e in eff.items()} }", file=sys.stderr)

    # ---- shuffle-join STRONG scaling (fixed total size, 1..N devices).
    # r4 tight tile caps make local work O(N/ndev); this measures
    # whether the sharded program keeps that (a flat curve would mean
    # the caps or the exchange serialize). Same core-adjustment caveat:
    # XLA:CPU multithreads ONE virtual device across all host cores, so
    # ideal strong-scaling time is flat once ndev saturates the cores —
    # report raw medians + the core-adjusted efficiency.
    from jax.sharding import Mesh
    from knoxdb_tpu.parallel.shuffle import shuffle_join_rows
    n = 1 << 19
    lk = rng.integers(1, n * 2, n).astype(np.uint64)
    rk = rng.integers(1, n * 2, n).astype(np.uint64)
    jt = {}
    for ndev in [d for d in (1, 2, 4, 8) if d <= ndev_all]:
        mesh = Mesh(np.array(jax.devices()[:ndev]), ("shards",))
        shuffle_join_rows(mesh, lk, rk)                 # warm/compile
        ts = []
        for _ in range(3):
            _l, _r, st = shuffle_join_rows(mesh, lk, rk)
            ts.append(st["seconds"])
        jt[ndev] = sorted(ts)[1]
        print(f"# join ndev={ndev}: {jt[ndev]*1e3:.0f}ms "
              f"core={st['core']} work_eff={st['work_eff']:.2f} "
              f"measured={st.get('work_eff_measured', -1):.2f} "
              f"rows/dev={st.get('rows_per_dev')}",
              file=sys.stderr)
    jeff = {d: jt[1] / (min(d, max(ncores, 1)) * t) if d > 1 else 1.0
            for d, t in jt.items()}
    topj = max(jt)
    print(json.dumps({
        "metric": f"cpu_mesh_join_strong_scaling_{topj}dev",
        "value": jeff[topj],
        "unit": "ratio",
        "vs_baseline": jeff[topj] / 0.80,
    }))
    print(f"# join strong-scaling core-adjusted eff: "
          f"{ {d: f'{e:.2f}' for d, e in jeff.items()} }", file=sys.stderr)
    # deterministic work efficiency (ideal local rows / actual slots):
    # the local sort dominates pod-scale join cost, so this ratio is
    # the harness-independent strong-scaling predictor (the time ratio
    # above is 4-core-box noise at ndev > ncores)
    print(json.dumps({
        "metric": f"join_strong_scaling_work_eff_{topj}dev",
        "value": st["work_eff"],
        "unit": "ratio",
        "vs_baseline": st["work_eff"] / 0.80,
    }))
    # r5: MEASURED occupancy efficiency from the fused rungs' own
    # per-device valid-row counters (ideal rows/dev / busiest dev)
    if "work_eff_measured" in st:
        print(json.dumps({
            "metric": f"join_strong_scaling_work_eff_measured_{topj}dev",
            "value": st["work_eff_measured"],
            "unit": "ratio",
            "vs_baseline": st["work_eff_measured"] / 0.80,
        }))


if __name__ == "__main__":
    main()
