"""Flagship benchmark: scan + filter + aggregate rows/s on one chip.

BASELINE.json config #1: uint64 range filter + count/sum over compressed
64K-row packs. The reference's best filter kernel does ~11 G rows/s
(~88 GB/s AVX2 u64 EQ, BASELINE.md); vs_baseline = our rows/s over that.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REF_ROWS_PER_S = 11e9   # BASELINE.md: u64 EQ AVX2 ~88 GB/s = 11 G rows/s


def main():
    import jax

    from knoxdb_tpu.exec.device import DeviceSegment
    from knoxdb_tpu.exec.scan import AggSpec, SegmentScanner
    from knoxdb_tpu.pack.segment import build_segment
    from knoxdb_tpu.query.filter import Filter, and_, leaf
    from knoxdb_tpu.schema.schema import Builder
    from knoxdb_tpu.types import FieldType, FilterMode

    pack_size = 1 << 16
    n_packs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_rows = pack_size * n_packs

    rng = np.random.default_rng(0xBEEF)
    sch = (Builder("bench").pk("id")
           .add("val", FieldType.UINT64)
           .add("bal", FieldType.INT64)
           .finish())
    data = {
        "id": np.arange(1, n_rows + 1, dtype=np.uint64),
        "val": rng.integers(0, 1 << 16, n_rows, dtype=np.uint64),
        "bal": rng.integers(-1 << 40, 1 << 40, n_rows, dtype=np.int64),
    }
    t0 = time.perf_counter()
    seg = build_segment(sch, data, pack_size=pack_size)
    t_build = time.perf_counter() - t0

    sc = SegmentScanner(DeviceSegment(seg))
    tree = and_(
        leaf(Filter(sch.field("val"), FilterMode.RANGE, (1000, 50000))),
        leaf(Filter(sch.field("bal"), FilterMode.GT, 0)),
    ).optimize()
    aggs = [AggSpec("count"), AggSpec("sum", "bal")]

    fn, args, _raw = sc.prepare(tree, aggs)

    def run_once():
        mask, counts, parts = fn(*args)
        jax.block_until_ready(counts)
        return counts

    t0 = time.perf_counter()
    run_once()
    t_compile = time.perf_counter() - t0

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        run_once()
    dt = (time.perf_counter() - t0) / iters

    # correctness guard (exact vs numpy oracle)
    res = sc.scan(tree, aggs)
    m = ((data["val"] >= 1000) & (data["val"] <= 50000) & (data["bal"] > 0))
    assert res.count == int(m.sum()), "bench result mismatch"
    assert res.aggs[("sum", "bal")] == int(data["bal"][m].astype(object).sum())

    rows_per_s = n_rows / dt
    print(json.dumps({
        "metric": "scan_filter_agg_rows_per_s",
        "value": rows_per_s,
        "unit": "rows/s",
        "vs_baseline": rows_per_s / REF_ROWS_PER_S,
    }))
    print(f"# n_rows={n_rows} dt={dt*1e3:.3f}ms compile={t_compile:.1f}s "
          f"build={t_build:.1f}s platform={jax.devices()[0].platform}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
