"""Mask-only whole-tree fusion stability probe (r4).

KNOX_PALLAS_MASKONLY=1 routes COUNT / group-by / top-k / join-side
plans (no sum column) through the whole-tree kernel with agg_slot=-1.
That puts a Mosaic call inside program shapes the wedge history has not
cleared (group/series programs already carry the group kernel — this
adds a SECOND Mosaic call to those). Discipline (r2/r3): repeat
executions at PROCESS level are where wedges show; everything must be
bit-identical to the XLA path.

Checks, 4 repeats each, maskonly on:
  1. count-only 2-leaf AND query        (pure mask-only kernel)
  2. filtered GROUP-BY count/sum        (mask-only kernel + group MXU
                                         kernel in one program)
  3. filtered series buckets            (mask-only + fused moments —
                                         THREE Mosaic calls/program)
  4. top-k under a filter               (mask-only + bit-descent)
All compared against the same queries with KNOX_PALLAS_MASKONLY unset.

Run (TPU):  timeout 3600 python probes/maskonly_probe.py
Run twice back-to-back for the process-level repeat discipline.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def run_all(t, G):
    from knoxdb_tpu.knox import F
    out = {}
    out["count"] = t.query().where(F("a").between(1000, 40_000),
                                   F("b") > 0).count()
    g = t.query().where(F("a") > 500).group_by("grp").aggregate(
        ("count", ""), ("sum", "b"))
    out["group"] = (list(np.asarray(g["count"])),
                    [int(x) for x in g[("sum", "b")]])
    from knoxdb_tpu.series import SeriesRequest, run_series
    s = run_series(SeriesRequest(table=t, time_field="ts",
                                 start=1_000_000,
                                 end=1_000_000 + G * 64, interval=64,
                                 aggs=[("sum", "b"), ("var", "b")],
                                 where=t.query().where(
                                     F("a") > 2000)._tree()))
    out["series"] = (list(np.asarray(s["count"])),
                     [float(x) for x in s[("var", "b")]])
    tk = t.query().where(F("a") < 30_000).order_by("b").limit(20) \
        .select("b").rows()
    out["topk"] = [int(x) for x in tk["b"]]
    return out


def main():
    import jax

    import knoxdb_tpu.knox as knox
    from knoxdb_tpu.schema.schema import Builder
    from knoxdb_tpu.types import FieldType

    print(f"# platform={jax.devices()[0].platform} "
          f"maskonly={os.environ.get('KNOX_PALLAS_MASKONLY')}",
          flush=True)
    n, G = 1 << 20, 128
    rng = np.random.default_rng(0xAB)
    sch = (Builder("m").pk("id")
           .add("a", FieldType.UINT64)
           .add("b", FieldType.INT64)
           .add("grp", FieldType.UINT16)
           .add("ts", FieldType.UINT64)
           .finish())

    def mk(name):
        db = knox.create_database(name, driver="mem", pack_size=1 << 16,
                                  background_merge=False)
        t = db.create_table(sch)
        t.insert({
            "id": np.zeros(n, np.uint64),
            "a": rng.integers(0, 50_000, n, dtype=np.uint64),
            "b": rng.integers(-1 << 29, 1 << 29, n, dtype=np.int64),
            "grp": rng.integers(0, 32, n).astype(np.uint16),
            "ts": (1_000_000
                   + rng.integers(0, G * 64, n)).astype(np.uint64),
        })
        t.merge()
        return db, t

    rng2 = np.random.default_rng(0xAB)      # same data both ways
    os.environ.pop("KNOX_PALLAS_MASKONLY", None)
    rng = rng2
    db0, t0 = mk("m_off")
    want = run_all(t0, G)
    db0.close()

    os.environ["KNOX_PALLAS_MASKONLY"] = "1"
    rng = np.random.default_rng(0xAB)
    db1, t1 = mk("m_on")
    for rep in range(4):
        t0_ = time.perf_counter()
        got = run_all(t1, G)
        dt = time.perf_counter() - t0_
        for k in want:
            assert got[k] == want[k], f"rep{rep} {k} mismatch"
        print(f"# rep{rep}: all 4 checks bit-identical ({dt:.1f}s)",
              flush=True)
    db1.close()
    print("MASKONLY PROBE PASS", flush=True)


if __name__ == "__main__":
    main()
