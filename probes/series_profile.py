"""Series bucket-moments STAGE PROFILE + two-Mosaic-call stability probe
(VERDICT r3 next-#3: "stage-profile decode/gids/kernel/host-recombine as
promised; route the moments halves through ops/pallas_group").

Config #6 shape: n rows, G=1024 time buckets, INT64 value column whose
stats range fits the exact-MXU moments gate (C_m <= 4). The probe:

 1. oracle: numpy bucket counts/sums/sumsqs
 2. XLA path (KNOX_SERIES_PALLAS=0 semantics via allow_pallas=False):
    correctness + marginal timing
 3. Pallas path: FOUR repeat executions bit-exact vs XLA (the r2 wedge
    discipline: a wedge shows on the 2nd process-level execution) +
    marginal timing under the same lax.scan loop bench_suite uses
 4. stage marginals, each its own jitted scan loop: mask+gids only,
    + value decode halves, + kernel pass 1, + both kernel passes
    (stage cost = difference of consecutive marginals); host recombine
    timed on host

Run (TPU): timeout 3600 python probes/series_profile.py [n_packs]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

PACK = 1 << 16


def marginal(run, k_lo=1, k_hi=65, reps=3):
    def t(k):
        t0 = time.perf_counter()
        run(k)
        return time.perf_counter() - t0
    run(1)
    pairs = [(t(k_lo), t(k_hi)) for _ in range(reps)]
    ms = sorted(max((hi - lo) / (k_hi - k_lo), 1e-9) for lo, hi in pairs)
    return ms[len(ms) // 2]


def main():
    import jax
    import jax.numpy as jnp

    from knoxdb_tpu.exec.device import DeviceSegment
    from knoxdb_tpu.exec.scan import SegmentScanner
    from knoxdb_tpu.exec import groupby as GB
    from knoxdb_tpu.pack.segment import build_segment
    from knoxdb_tpu.schema.schema import Builder
    from knoxdb_tpu.types import FieldType

    n_packs = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n = PACK * n_packs
    G = 1024
    t0_, iv = 1_000_000, 64
    rng = np.random.default_rng(0xC6)
    sch = (Builder("c6").pk("id")
           .add("ts", FieldType.UINT64)
           .add("val", FieldType.INT64)
           .finish())
    ts = (t0_ + rng.integers(0, G * iv, n)).astype(np.uint64)
    val = rng.integers(-1 << 30, 1 << 30, n)
    seg = build_segment(sch, {"id": np.arange(1, n + 1, dtype=np.uint64),
                              "ts": ts, "val": val}, pack_size=PACK)
    sc = SegmentScanner(DeviceSegment(seg))
    gplan = GB.plan_buckets(sc.d, "ts", t0_, iv, G)
    d = sc.d
    print(f"# n={n} G={G} platform={jax.devices()[0].platform}",
          flush=True)

    # oracle
    gid_np = ((ts - t0_) // iv).astype(np.int64)
    w_cnt = np.bincount(gid_np, minlength=G)
    w_sum = np.bincount(gid_np, weights=val.astype(np.float64),
                        minlength=G)

    # ---- full-path correctness + repeats (pallas on/off via env gate)
    import os
    results = {}
    for label, env in (("xla", "0"), ("pallas", "")):
        os.environ["KNOX_SERIES_PALLAS"] = env
        sc2 = SegmentScanner(DeviceSegment(seg))
        outs = []
        for rep in range(4):
            t0 = time.perf_counter()
            out = sc2.series_scan(None, "ts", {"val": ("moments",)}, gplan)
            dt = time.perf_counter() - t0
            nb, sm, sq = out[("val", "moments")]
            assert (np.asarray(nb) == w_cnt).all(), f"{label} rep{rep} n"
            assert np.allclose(sm, w_sum, rtol=1e-9), f"{label} rep{rep} s"
            outs.append((np.asarray(nb).copy(), np.asarray(sm).copy(),
                         np.asarray(sq).copy()))
            print(f"# {label} rep{rep}: ok ({dt:.1f}s)", flush=True)
        for rep in range(1, 4):
            for a, b in zip(outs[0], outs[rep]):
                assert (np.asarray(a) == np.asarray(b)).all(), \
                    f"{label} rep{rep} drift"
        results[label] = outs[0]
    for a, b in zip(results["xla"], results["pallas"]):
        assert (a == b).all(), "pallas vs xla drift"
    print("# pallas 4/4 repeats bit-exact vs xla", flush=True)

    # ---- stage marginals (shared pieces)
    _fn, margs, mask_raw = sc.prepare(None, [])
    garrays = d.arrays_pytree(["ts", "val"])
    gconsts = GB.gid_consts(gplan)
    tcol = d.column("ts")
    vcol = d.column("val")
    mode_tags = tuple(m[0] for m in gplan.mode)
    tsigs = tuple(g.sig() for g in tcol.groups)
    tidxs = tuple(g.idx for g in tcol.groups)
    vsig = vcol.groups[0].sig()
    C_m, gmin_m = GB.chunk_plan(d.seg.stats.fields.get("val"))
    qC = min(8, 2 * C_m)
    mb = jnp.uint64(gmin_m)
    from knoxdb_tpu.exec import device as D

    def stage_fn(depth):
        def one(margs, garrays, gconsts, mb, i):
            mask, _, _ = mask_raw(*margs)
            gids = GB.row_gids(mode_tags, tsigs, tidxs, garrays["ts"],
                               gconsts, d.W)
            acc = gids.sum(dtype=jnp.int64) \
                + mask[0].sum(dtype=jnp.int64) + i.astype(jnp.int64)
            if depth >= 1:
                vk = D.group_decode_keys(vsig, garrays["val"][0], d.W)
                rlo, rhi = GB._value_halves(vk, mb)
                qlo, qhi = GB.square_halves(rlo)
                acc = acc + rlo.sum(dtype=jnp.int64) \
                    + qlo.sum(dtype=jnp.int64)
            if depth == 5:       # r4 fused moments kernel (one pass)
                c1, ch1, ch2 = GB.group_moments_mxu(
                    gids, mask, (rlo, rhi), (qlo, qhi), G, C_m, qC,
                    allow_pallas=True)
                return acc + c1.sum() + ch1[0].sum().astype(jnp.int64) \
                    + ch2[0].sum().astype(jnp.int64)
            if depth >= 2:
                c1, ch1, _, _ = GB.group_aggregate_mxu(
                    gids, mask, (rlo, rhi), G, allow_pallas=depth >= 4,
                    n_chunks=C_m)
                acc = acc + c1.sum() + ch1[0].sum().astype(jnp.int64)
            if depth >= 3:
                c2, ch2, _, _ = GB.group_aggregate_mxu(
                    gids, mask, (qlo, qhi), G, allow_pallas=depth >= 4,
                    n_chunks=qC)
                acc = acc + c2.sum() + ch2[0].sum().astype(jnp.int64)
            return acc

        def many(margs, garrays, gconsts, mb, idxs):
            def body(a, i):
                return a + one(margs, garrays, gconsts, mb, i), None
            out, _ = jax.lax.scan(body, jnp.int64(0), idxs)
            return out
        f = jax.jit(many)

        def run(k):
            return int(f(margs, garrays, gconsts, mb,
                         jnp.arange(k, dtype=jnp.int64)))
        return run

    labels = ["mask+gids", "+decode/halves", "+kernel1(xla)",
              "+kernel2(xla)"]
    prev = 0.0
    for depth, lab in enumerate(labels):
        m = marginal(stage_fn(depth))
        print(f"# stage {lab}: cumulative {m*1e3:.2f} ms "
              f"(+{(m-prev)*1e3:.2f})", flush=True)
        prev = m

    # pallas kernels (both passes, depth 4 == depth 3 but pallas)
    m_pal = marginal(stage_fn(4))
    print(f"# stage +both-kernels(pallas): cumulative {m_pal*1e3:.2f} ms",
          flush=True)
    # r4 fused moments kernel: one pass for both halves
    m_fus = marginal(stage_fn(5))
    print(f"# stage +fused-moments(pallas): cumulative {m_fus*1e3:.2f} ms",
          flush=True)
    print(f"# end-to-end model: xla {prev*1e3:.2f} ms -> "
          f"{n/prev/1e6:.0f} M rows/s; pallas {m_pal*1e3:.2f} ms -> "
          f"{n/m_pal/1e6:.0f} M rows/s; fused {m_fus*1e3:.2f} ms -> "
          f"{n/m_fus/1e6:.0f} M rows/s", flush=True)

    # host recombine cost
    os.environ["KNOX_SERIES_PALLAS"] = ""
    t0 = time.perf_counter()
    for _ in range(5):
        sc.series_scan(None, "ts", {"val": ("moments",)}, gplan)
    t_e2e = (time.perf_counter() - t0) / 5
    print(f"# e2e per-call (incl. relay + host recombine): "
          f"{t_e2e*1e3:.0f} ms", flush=True)
    print("SERIES PROBE PASS", flush=True)


if __name__ == "__main__":
    main()
