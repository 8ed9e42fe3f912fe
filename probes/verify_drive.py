"""TPU verify drive: the /verify skill's end-to-end check, committed so
it survives sessions (the round-2 tmp_verify_drive.py was untracked and
lost). Drives the PUBLIC knoxdb_tpu surface on the real chip:

  encode -> filter (AND tree, range + eq) -> count/sum/min/max
  group-by (MXU/Pallas path) -> series buckets -> join -> edge probes
  (empty mask, extreme values, -0.0 floats, strict ALP bounds)

Every result is asserted against a plain-numpy oracle computed in the
same process. Prints one PASS/FAIL line per check and exits nonzero on
any FAIL.

Run (TPU):  PYTHONPATH=/root/repo:/root/.axon_site python probes/verify_drive.py
Run (CPU):  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH=. \
            python probes/verify_drive.py
First TPU compile of each plan shape takes minutes; use 1500s+ timeouts.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

FAILED = []


def check(name, got, want):
    ok = got == want
    if ok and isinstance(got, list) and len(got) > 8:
        print(f"PASS {name}: {len(got)} values equal", flush=True)
    else:
        print(f"{'PASS' if ok else 'FAIL'} {name}: got={got!r} "
              f"want={want!r}", flush=True)
    if not ok:
        FAILED.append(name)


def main():
    import knoxdb_tpu.knox as knox
    from knoxdb_tpu.schema.schema import Builder
    from knoxdb_tpu.series import FillMode, SeriesRequest, run_series
    from knoxdb_tpu.types import FieldType

    n = 1 << 18
    rng = np.random.default_rng(0xD01)
    db = knox.create_database("verify", pack_size=1 << 14,
                              background_merge=False)
    sch = (Builder("t").pk("id")
           .add("ts", FieldType.TIMESTAMP)
           .add("val", FieldType.UINT64)
           .add("bal", FieldType.INT64)
           .add("grp", FieldType.UINT32)
           .add("gg", FieldType.UINT32)
           .add("f", FieldType.FLOAT64)
           .finish())
    t = db.create_table(sch)

    ts = np.sort(rng.integers(0, 10_000_000, n)).astype(np.uint64)
    val = rng.integers(0, 1 << 16, n, dtype=np.uint64)
    bal = rng.integers(-(1 << 40), 1 << 40, n, dtype=np.int64)
    grp = rng.integers(0, 1000, n).astype(np.uint32)
    gg = rng.integers(0, 20000, n).astype(np.uint32)
    f = rng.normal(0, 1e6, n)
    f[::97] = -0.0
    f[1] = np.inf
    f[2] = -np.inf
    t.insert({"id": np.zeros(n, np.uint64), "ts": ts, "val": val,
              "bal": bal, "grp": grp, "gg": gg, "f": f})
    t.merge()

    t0 = time.perf_counter()
    q = t.query().where(knox.cond("val", "range", (1000, 50000)),
                        knox.F("bal") > 0)
    m = (val >= 1000) & (val <= 50000) & (bal > 0)
    check("and.count", q.count(), int(m.sum()))
    check("and.sum", q.sum("bal"), int(bal[m].astype(object).sum()))
    check("and.min", q.min("val"), int(val[m].min()))
    check("and.max", q.max("val"), int(val[m].max()))
    print(f"# filter+agg {(time.perf_counter()-t0):.1f}s", flush=True)

    # empty mask
    check("empty.count",
          t.query().where(knox.F("val") > (1 << 60)).count(), 0)

    # extreme values survive keyform round-trip
    check("extreme.max", t.query().max("bal"), int(bal.max()))
    check("extreme.min", t.query().min("bal"), int(bal.min()))

    # -0.0 == 0.0 through keyform; inf ordering
    check("float.eq0", t.query().where(knox.cond("f", "eq", 0.0)).count(),
          int((f == 0.0).sum()))
    check("float.max", t.query().max("f"), float(np.inf))
    # strict float bound (the round-1 ALP strict-range advisory)
    lo = float(np.percentile(f[np.isfinite(f)], 30))
    hi = float(np.percentile(f[np.isfinite(f)], 70))
    qf = t.query().where(knox.F("f") > lo, knox.F("f") <= hi)
    check("float.strict", qf.count(), int(((f > lo) & (f <= hi)).sum()))

    # group-by through the MXU/Pallas kernel path
    t0 = time.perf_counter()
    g = t.query().group_by("grp").aggregate(("sum", "val"), ("count", ""))
    keys = np.asarray(g["keys"])
    want_cnt = np.bincount(grp, minlength=1000)
    order = np.argsort(keys)
    got_cnt = np.asarray(g["count"])[order]
    check("group.n", len(keys), int((want_cnt > 0).sum()))
    check("group.counts", got_cnt.tolist(),
          want_cnt[want_cnt > 0].tolist())
    sums = np.zeros(1000, dtype=object)
    np.add.at(sums, grp, val.astype(object))
    check("group.sums", [int(x) for x in np.asarray(g[("sum", "val")])[order]],
          [int(x) for x in sums[want_cnt > 0]])
    print(f"# group-by {(time.perf_counter()-t0):.1f}s", flush=True)

    # r5: BIG-G group-by (G=20000 > the old 16384 ceiling) rides the
    # multi-pass Pallas kernel — counts + exact sums vs numpy
    t0 = time.perf_counter()
    gb = t.query().group_by("gg").aggregate(("sum", "val"),
                                            ("count", ""))
    gkeys = np.asarray(gb["keys"], np.int64)
    wc = np.bincount(gg.astype(np.int64), minlength=20000)
    gorder = np.argsort(gkeys)
    check("biggroup.n", len(gkeys), int((wc > 0).sum()))
    check("biggroup.counts",
          np.asarray(gb["count"])[gorder].tolist(),
          wc[wc > 0].tolist())
    gsums = np.zeros(20000, dtype=object)
    np.add.at(gsums, gg.astype(np.int64), val.astype(object))
    check("biggroup.sums",
          [int(x) for x in np.asarray(gb[("sum", "val")])[gorder]],
          [int(x) for x in gsums[wc > 0]])
    print(f"# big-G group-by {(time.perf_counter()-t0):.1f}s",
          flush=True)

    # series buckets
    t0 = time.perf_counter()
    req = SeriesRequest(table=t, time_field="ts", start=0,
                        end=10_000_000, interval=1_000_000,
                        aggs=[("sum", "val")], fill=FillMode.ZERO)
    sr = run_series(req)
    bids = (ts // 1_000_000).astype(np.int64)
    wcnt = np.bincount(bids, minlength=10)
    check("series.counts", [int(x) for x in sr["count"]],
          [int(x) for x in wcnt])
    print(f"# series {(time.perf_counter()-t0):.1f}s", flush=True)

    # join (pk-join unique fast core)
    t0 = time.perf_counter()
    sch2 = (Builder("u").pk("id").add("uval", FieldType.UINT64).finish())
    u = db.create_table(sch2)
    ids = np.arange(1, (n // 4) + 1, dtype=np.uint64) * 3  # sparse pks
    u.insert({"id": ids, "uval": ids * 7})
    u.merge()
    j = knox.join(t.query().where(knox.F("val") < 1000), u.query(),
                  on=("id", "id"))
    tid = np.arange(1, n + 1, dtype=np.uint64)
    lm = val < 1000
    want_n = int(np.isin(tid[lm], ids).sum())
    check("join.n", len(j["id"]), want_n)
    print(f"# join {(time.perf_counter()-t0):.1f}s", flush=True)

    # r5: ORDER BY + limit through the bit-descent top-k fast path
    t0 = time.perf_counter()
    tk = t.query().where(knox.F("bal") > 0).order_by("val", desc=True) \
        .limit(25).select("val").rows()
    wv = np.sort(val[bal > 0])[::-1][:25]
    check("topk.vals", [int(x) for x in tk["val"]],
          [int(x) for x in wv])
    tk2 = t.query().order_by("bal").limit(10).select("bal").rows()
    check("topk.min", [int(x) for x in tk2["bal"]],
          [int(x) for x in np.sort(bal)[:10]])
    print(f"# topk {(time.perf_counter()-t0):.1f}s", flush=True)

    # r5: MULTI-AGG single scan — count+sum+min+max (the driver entry()
    # shape) must run the ONE fused kernel and stay oracle-exact
    t0 = time.perf_counter()
    from knoxdb_tpu.exec.scan import AggSpec
    with db.begin(read_only=True) as tx:
        res = t._t.query(tx.snapshot, q._tree(), [
            AggSpec("count"), AggSpec("sum", "bal"),
            AggSpec("min", "bal"), AggSpec("max", "bal"),
            AggSpec("min", "val"), AggSpec("max", "val")])
    check("multiagg.count", res.count, int(m.sum()))
    check("multiagg.sum", res.aggs[("sum", "bal")],
          int(bal[m].astype(object).sum()))
    check("multiagg.minb", res.aggs[("min", "bal")], int(bal[m].min()))
    check("multiagg.maxb", res.aggs[("max", "bal")], int(bal[m].max()))
    check("multiagg.minv", res.aggs[("min", "val")], int(val[m].min()))
    check("multiagg.maxv", res.aggs[("max", "val")], int(val[m].max()))
    print(f"# multi-agg {(time.perf_counter()-t0):.1f}s", flush=True)

    # r5: post-join predicate + limit (join.go:490-503 analog)
    t0 = time.perf_counter()
    j3 = knox.join(t.query().where(knox.F("val") < 1000), u.query(),
                   on=("id", "id"), where=knox.F("uval") > 2100,
                   limit=40)
    lm3 = val < 1000
    mt = np.isin(tid[lm3], ids)
    matched_ids = tid[lm3][mt]
    want3 = int((matched_ids * 7 > 2100).sum())
    check("join.where", len(j3["id"]), min(40, want3))
    check("join.where.pred",
          all(int(v) > 2100 for v in j3["uval"]), True)
    print(f"# join-where {(time.perf_counter()-t0):.1f}s", flush=True)

    db.close()
    if FAILED:
        print(f"FAILED: {FAILED}", flush=True)
        sys.exit(1)
    print("ALL PASS", flush=True)


if __name__ == "__main__":
    main()
