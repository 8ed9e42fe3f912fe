"""End-to-end segment scan vs numpy oracle.

Covers every compression scheme, signed/unsigned/float/wide types, all
filter modes, AND/OR trees, pruning overrides, aggregation exactness and
row materialization — the knoxdb workload-1 style equality contract
(/root/reference/internal/tests/scenarios/workload1_test.go)."""

import numpy as np
import pytest

from knoxdb_tpu.exec.device import DeviceSegment
from knoxdb_tpu.exec.scan import AggSpec, SegmentScanner
from knoxdb_tpu.pack.segment import build_segment
from knoxdb_tpu.query.filter import Filter, and_, leaf, or_
from knoxdb_tpu.schema.schema import Builder
from knoxdb_tpu.types import FieldType, FilterMode, FilterType

N = 4096
PACK = 1024


@pytest.fixture(scope="module")
def db():
    rng = np.random.default_rng(42)
    sch = (Builder("t").pk("id")
           .add("u64", FieldType.UINT64)
           .add("i64", FieldType.INT64)
           .add("cat", FieldType.UINT16, filter=FilterType.BLOOM_2B)
           .add("f64", FieldType.FLOAT64)
           .add("runs", FieldType.UINT32)
           .add("dict", FieldType.UINT64)
           .add("cst", FieldType.UINT32)
           .add("raw", FieldType.UINT64)
           .add("i128", FieldType.INT128)
           .finish())
    run_vals = np.repeat(rng.integers(0, 100, N // 64, dtype=np.uint64), 64)
    data = {
        "id": np.arange(1, N + 1, dtype=np.uint64),
        "u64": rng.integers(0, 100000, N, dtype=np.uint64),
        "i64": rng.integers(-500000, 500000, N, dtype=np.int64),
        "cat": rng.integers(0, 30, N, dtype=np.uint16),
        "f64": rng.normal(0, 1e6, N),
        "runs": run_vals.astype(np.uint32),
        # high-cardinality dict: ~200 distinct sparse values
        "dict": rng.choice((rng.integers(0, 1 << 40, 200)).astype(np.uint64), N),
        "cst": np.full(N, 77, np.uint32),
        # raw: full-range values that defeat bitpack/dict/rle
        "raw": rng.integers(0, 1 << 63, N, dtype=np.uint64),
        "i128": [int(x) * (10**20) - 5 * 10**22 for x in
                 rng.integers(0, 1000, N)],
    }
    seg = build_segment(sch, data, pack_size=PACK)
    d = DeviceSegment(seg)
    return sch, data, seg, SegmentScanner(d)


def _oracle_mask(data, fname, mode, value):
    col = data[fname]
    if fname == "i128":
        col = np.array([int(v) for v in col], object)
    if mode == FilterMode.EQ:
        return col == value
    if mode == FilterMode.NE:
        return col != value
    if mode == FilterMode.LT:
        return col < value
    if mode == FilterMode.LE:
        return col <= value
    if mode == FilterMode.GT:
        return col > value
    if mode == FilterMode.GE:
        return col >= value
    if mode == FilterMode.RANGE:
        return (col >= value[0]) & (col <= value[1])
    if mode == FilterMode.IN:
        return np.isin(col, value)
    if mode == FilterMode.NOT_IN:
        return ~np.isin(col, value)


def _scan_count(db, fname, mode, value):
    sch, data, seg, sc = db
    tree = leaf(Filter(sch.field(fname), mode, value)).optimize()
    res = sc.scan(tree, [AggSpec("count")])
    want = int(_oracle_mask(data, fname, mode, value).sum())
    assert res.count == want, (fname, mode, value, res.count, want)


SCHEME_COLS = ["u64", "i64", "runs", "dict", "cst", "raw", "id"]


@pytest.mark.parametrize("fname", SCHEME_COLS)
def test_modes_per_scheme(db, fname):
    sch, data, seg, sc = db
    col = data[fname]
    present = col[len(col) // 3]
    absent = {"u64": 10**9, "i64": 10**9, "runs": 2**31, "dict": 12345,
              "cst": 5, "raw": 3, "id": 0}[fname]
    mid = int(np.median(col.astype(np.float64))) if fname != "dict" else int(present)
    for mode, val in [
        (FilterMode.EQ, present), (FilterMode.EQ, absent),
        (FilterMode.NE, present),
        (FilterMode.LT, mid), (FilterMode.LE, mid),
        (FilterMode.GT, mid), (FilterMode.GE, mid),
        (FilterMode.RANGE, (mid // 2, mid)),
        (FilterMode.IN, [int(present), int(absent)]),
        (FilterMode.NOT_IN, [int(present), int(absent)]),
    ]:
        _scan_count(db, fname, mode, val)


@pytest.mark.parametrize("fname", SCHEME_COLS)
@pytest.mark.parametrize("mode", [FilterMode.IN, FilterMode.NOT_IN])
def test_big_in_lists_per_scheme(db, fname, mode, rng):
    """K >= 17/64 IN lists take the fixed-shape membership / dict-mask
    paths on every scheme (the unrolled sweep was a compile explosion;
    r2-cont)."""
    sch, data, seg, sc = db
    col = data[fname]
    if col.dtype == object:
        col = np.array([int(v) for v in col], object)
    picks = rng.choice(len(col), 40, replace=False)
    vals = sorted({int(col[i]) for i in picks}
                  | {10**9 + int(x) for x in range(60)})  # misses too
    _scan_count(db, fname, mode, vals)


def test_big_in_list_wide_i128(db, rng):
    """Wide (int128) K>=17 IN lists stay exact on the RAW-wide
    fallback path."""
    sch, data, seg, sc = db
    vals = [int(v) for v in data["i128"]]
    picks = sorted({vals[i] for i in rng.choice(len(vals), 30,
                                                replace=False)}
                   | {(1 << 100) + i for i in range(20)})   # misses
    for mode in (FilterMode.IN, FilterMode.NOT_IN):
        _scan_count(db, "i128", mode, picks)


def test_big_in_list_wide_bitpack(rng):
    """CLUSTERED int128 (per-pack-base wide BITPACK) + K>=17 IN list:
    the L-limb sort-membership path (cs_limbs consts) replaces the
    O(K*width) rels sweep."""
    from knoxdb_tpu.encode.schemes import Scheme
    from knoxdb_tpu.exec.device import DeviceSegment
    from knoxdb_tpu.pack.segment import build_segment
    n = 2048
    sch = (Builder("w").pk("id").add("x", FieldType.INT128).finish())
    base = 10**25
    vals = np.array([base + int(v) for v in
                     rng.integers(0, 1 << 30, n)], object)
    seg = build_segment(sch, {"id": np.arange(1, n + 1, dtype=np.uint64),
                              "x": vals}, pack_size=512)
    assert all(p.scheme == Scheme.BITPACK
               for p in seg.columns["x"].packs)
    sc = SegmentScanner(DeviceSegment(seg))
    picks = sorted({int(v) for v in vals[:25]} | {base - 7, base + 2**40})
    for mode in (FilterMode.IN, FilterMode.NOT_IN):
        tree = leaf(Filter(sch.field("x"), mode, picks)).optimize()
        res = sc.scan(tree, [AggSpec("count")])
        inset = np.isin(np.array([int(v) for v in vals], object),
                        np.array(picks, object))
        want = int(inset.sum()) if mode == FilterMode.IN \
            else n - int(inset.sum())
        assert res.count == want, (mode, res.count, want)


def test_float_modes(db):
    sch, data, seg, sc = db
    for mode, val in [(FilterMode.GT, 0.0), (FilterMode.LE, -1234.5),
                      (FilterMode.RANGE, (-1e5, 1e5)),
                      (FilterMode.EQ, float(data["f64"][7]))]:
        _scan_count(db, "f64", mode, val)


def test_wide_i128(db):
    sch, data, seg, sc = db
    vals = [int(v) for v in data["i128"]]
    mid = sorted(vals)[len(vals) // 2]
    for mode, val in [(FilterMode.EQ, vals[5]), (FilterMode.GT, mid),
                      (FilterMode.LE, mid), (FilterMode.RANGE, (mid, mid * 2)),
                      (FilterMode.IN, [vals[0], vals[9], 1])]:
        _scan_count(db, "i128", mode, val)


def test_and_or_tree(db):
    sch, data, seg, sc = db
    tree = or_(
        and_(leaf(Filter(sch.field("u64"), FilterMode.LT, 30000)),
             leaf(Filter(sch.field("cat"), FilterMode.EQ, 7))),
        leaf(Filter(sch.field("i64"), FilterMode.GT, 490000)),
    ).optimize()
    res = sc.scan(tree, [AggSpec("count"), AggSpec("sum", "u64")])
    m = ((data["u64"] < 30000) & (data["cat"] == 7)) | (data["i64"] > 490000)
    assert res.count == int(m.sum())
    assert res.aggs[("sum", "u64")] == int(data["u64"][m].astype(object).sum())


def test_aggregates_exact(db):
    sch, data, seg, sc = db
    tree = leaf(Filter(sch.field("cat"), FilterMode.LT, 15)).optimize()
    aggs = [AggSpec("count"), AggSpec("sum", "i64"), AggSpec("min", "i64"),
            AggSpec("max", "i64"), AggSpec("sum", "raw"),
            AggSpec("min", "f64"), AggSpec("max", "f64"),
            AggSpec("avg", "u64"), AggSpec("sum", "i128"),
            AggSpec("min", "i128"), AggSpec("max", "i128")]
    res = sc.scan(tree, aggs)
    m = data["cat"] < 15
    assert res.aggs[("sum", "i64")] == int(data["i64"][m].astype(object).sum())
    assert res.aggs[("min", "i64")] == int(data["i64"][m].min())
    assert res.aggs[("max", "i64")] == int(data["i64"][m].max())
    assert res.aggs[("sum", "raw")] == int(data["raw"][m].astype(object).sum())
    assert res.aggs[("min", "f64")] == float(data["f64"][m].min())
    assert res.aggs[("max", "f64")] == float(data["f64"][m].max())
    assert abs(res.aggs[("avg", "u64")]
               - data["u64"][m].mean()) < 1e-6 * data["u64"][m].mean()
    wide = [int(v) for v, keep in zip(data["i128"], m) if keep]
    assert res.aggs[("sum", "i128")] == sum(wide)
    assert res.aggs[("min", "i128")] == min(wide)
    assert res.aggs[("max", "i128")] == max(wide)


def test_empty_result(db):
    sch, data, seg, sc = db
    tree = leaf(Filter(sch.field("u64"), FilterMode.GT, 10**9)).optimize()
    res = sc.scan(tree, [AggSpec("count"), AggSpec("sum", "i64"),
                         AggSpec("min", "u64")])
    assert res.count == 0
    assert res.aggs[("sum", "i64")] == 0
    assert res.aggs[("min", "u64")] is None


def test_materialize_rows(db):
    sch, data, seg, sc = db
    tree = and_(leaf(Filter(sch.field("u64"), FilterMode.RANGE, (1000, 20000))),
                leaf(Filter(sch.field("cat"), FilterMode.IN, [2, 4, 6]))
                ).optimize()
    res = sc.scan(tree, [AggSpec("count")],
                  project=["id", "i64", "f64", "i128"])
    m = ((data["u64"] >= 1000) & (data["u64"] <= 20000)
         & np.isin(data["cat"], [2, 4, 6]))
    np.testing.assert_array_equal(res.rows["id"], data["id"][m])
    np.testing.assert_array_equal(res.rows["i64"], data["i64"][m])
    np.testing.assert_array_equal(res.rows["f64"], data["f64"][m])
    want_wide = [int(v) for v, keep in zip(data["i128"], m) if keep]
    assert [int(v) for v in res.rows["i128"]] == want_wide


def test_limit(db):
    sch, data, seg, sc = db
    tree = leaf(Filter(sch.field("cat"), FilterMode.GE, 0)).optimize()
    res = sc.scan(tree, [AggSpec("count")], project=["id"], limit=17)
    assert len(res.rows["id"]) == 17
    np.testing.assert_array_equal(res.rows["id"], data["id"][:17])


def test_full_true_scan(db):
    sch, data, seg, sc = db
    res = sc.scan(None, [AggSpec("count"), AggSpec("sum", "u64")])
    assert res.count == N
    assert res.aggs[("sum", "u64")] == int(data["u64"].astype(object).sum())


def test_bloom_pruning_stats(db):
    sch, data, seg, sc = db
    # value absent everywhere: stats+bloom should prune all packs
    tree = leaf(Filter(sch.field("cat"), FilterMode.EQ, 12345)).optimize()
    res = sc.scan(tree, [AggSpec("count")])
    assert res.count == 0


def test_long_in_lists_do_not_collide_in_upload_cache(rng):
    """Two IN queries whose numpy reprs truncate identically ('...')
    must not share cached constants (exec/scan._leaf_cache_key)."""
    import knoxdb_tpu.knox as knox
    from dataclasses import dataclass

    @dataclass
    class R:
        id: int = 0
        v: int = 0

    db = knox.create_database("incache", driver="mem", pack_size=256,
                              background_merge=False)
    t = db.create_table(R)
    n = 4000
    v = rng.integers(0, 100_000, n)
    t.insert({"id": np.zeros(n, np.uint64), "v": v})
    t.merge()
    keys1 = np.unique(rng.choice(100_000, 2000, replace=False))
    keys2 = keys1.copy()
    keys2[1000] = (keys2[1000] + 1) % 100_000   # differs mid-array only
    keys2 = np.unique(keys2)
    c1 = t.query().where(v__in=[int(x) for x in keys1]).count()
    c2 = t.query().where(v__in=[int(x) for x in keys2]).count()
    assert c1 == int(np.isin(v, keys1).sum())
    assert c2 == int(np.isin(v, keys2).sum())
    db.close()
