"""Host-path result-materialization bench (VERDICT r2 items #6 and #8).

Round-2's sorted_query and bytes/ALP/wide materialization ran per-row
python loops (entries.sort over tuples, per-row _limbs_to_value); the
r3 rewrite routes full ORDER BY through one scan + a vectorized keyform
argsort, and bytes/wide projections through pack-grouped fancy
indexing. This measures the absolute throughput of both through the
public SDK:

  orderby:  full (no-limit) ORDER BY over N rows, 3 projected columns
  strings:  1M-row string-column projection (dict-coded bytes)

The r2 python-loop floor was ~30-60 K rows/s (tuple sort + per-row
decode); vectorized paths should land in the millions — the >= 10x
done-bar is cleared by orders of magnitude, recorded here.

Usage (CPU, independent of the TPU session):
  PALLAS_AXON_POOL_IPS= python probes/host_path_bench.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

if os.environ.get("PALLAS_AXON_POOL_IPS", None) is None:
    sys.exit("run with PALLAS_AXON_POOL_IPS= (empty) in the parent env")
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, ".")


def main():
    import knoxdb_tpu.knox as knox
    from knoxdb_tpu.schema.schema import Builder
    from knoxdb_tpu.types import FieldType

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    rng = np.random.default_rng(0xB0B)
    db = knox.create_database("hostbench", pack_size=1 << 16,
                              background_merge=False)
    sch = (Builder("t").pk("id")
           .add("val", FieldType.UINT64)
           .add("name", FieldType.STRING)
           .add("f", FieldType.FLOAT64)
           .finish())
    t = db.create_table(sch)
    names = np.array([f"name-{i:04d}".encode() for i in range(512)],
                     object)
    val = rng.integers(0, 1 << 40, n, dtype=np.uint64)
    f = rng.normal(size=n)
    t0 = time.perf_counter()
    t.insert({"id": np.zeros(n, np.uint64), "val": val,
              "name": names[rng.integers(0, 512, n)], "f": f})
    t.merge()
    t_ing = time.perf_counter() - t0

    # --- string projection: full-table fetch of the dict-coded column
    q = t.query().select("name")
    rows = q.rows()         # warm plan caches
    t0 = time.perf_counter()
    rows = q.rows()
    t_str = time.perf_counter() - t0
    assert len(rows["name"]) == n
    assert str(rows["name"][0]).startswith("name-")
    print(f"strings: {n} rows in {t_str:.3f}s = "
          f"{n/t_str/1e6:.2f} M rows/s", flush=True)

    # --- full ORDER BY (no limit), 3 projected columns
    q2 = t.query().order_by("val").select("val", "name", "f")
    out = q2.rows()
    t0 = time.perf_counter()
    out = q2.rows()
    t_ord = time.perf_counter() - t0
    v = np.array([int(x) for x in out["val"][:1000]], np.uint64)
    assert (np.diff(v.astype(np.int64)) >= 0).all(), "not sorted"
    assert len(out["val"]) == n
    print(f"orderby: {n} rows x 3 cols in {t_ord:.3f}s = "
          f"{n/t_ord/1e6:.2f} M rows/s", flush=True)
    print(f"# ingest+merge {t_ing:.1f}s", flush=True)
    db.close()


if __name__ == "__main__":
    main()
