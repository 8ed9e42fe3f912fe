"""Pallas fused scan kernel vs XLA/bitslice oracle (interpret mode on
CPU; the TPU compile path is exercised by the bench/verify drives)."""

import numpy as np
import jax.numpy as jnp
import pytest

from knoxdb_tpu.encode import schemes as S
from knoxdb_tpu.ops import pallas_scan as PS


@pytest.mark.parametrize("width,P", [(8, 8), (16, 8), (1, 16),
                                     (41, 8)])  # 41: blockwise pcnt
def test_fused_range_sum_matches_oracle(rng, width, P):
    N = 1024
    vals = rng.integers(0, 1 << width, (P, N), dtype=np.uint64)
    mins = rng.integers(0, 500, P, dtype=np.uint64)
    vals_abs = vals + mins[:, None]
    planes = np.stack([
        S.encode_bitpack(vals_abs[p], 1, int(mins[p]), width, N).planes
        for p in range(P)], axis=1)     # plane-major [w, P, W] (r4)
    valid = np.full((P, N // 32), 0xFFFFFFFF, np.uint32)
    valid[-1, -2:] = 0x0000FFFF      # partial pack edge

    for lo, hi in [(400, 900), (0, 10**6), (10**6, 2 * 10**6), (550, 550)]:
        lo64, hi64 = jnp.uint64(lo), jnp.uint64(hi)
        lob, hib, flags = PS.range_consts(jnp.asarray(mins), lo64, hi64,
                                          width)
        mask, pcnt, cnt = PS.fused_range_sum(
            jnp.asarray(planes), lob, hib, flags, jnp.asarray(valid),
            width, interpret=True)
        rmask, rpcnt, rcnt = PS.fused_range_sum_ref(
            jnp.asarray(planes), jnp.asarray(mins), jnp.asarray(valid),
            lo64, hi64, width)
        np.testing.assert_array_equal(np.asarray(mask), np.asarray(rmask),
                                      err_msg=f"[{lo},{hi}] mask")
        np.testing.assert_array_equal(np.asarray(pcnt), np.asarray(rpcnt))
        np.testing.assert_array_equal(np.asarray(cnt), np.asarray(rcnt))


def test_exact_sum_reconstruction(rng):
    width, P, N = 12, 8, 2048
    vals = rng.integers(0, 1 << width, (P, N), dtype=np.uint64)
    mins = np.array([10, 10**6, 0, 5, 7, 9, 11, 13], np.uint64)
    vals_abs = vals + mins[:, None]
    planes = np.stack([
        S.encode_bitpack(vals_abs[p], 1, int(mins[p]), width, N).planes
        for p in range(P)], axis=1)     # plane-major [w, P, W] (r4)
    valid = np.full((P, N // 32), 0xFFFFFFFF, np.uint32)
    lo, hi = jnp.uint64(500), jnp.uint64(10**6 + 3000)
    lob, hib, flags = PS.range_consts(jnp.asarray(mins), lo, hi, width)
    mask, pcnt, cnt = PS.fused_range_sum(
        jnp.asarray(planes), lob, hib, flags, jnp.asarray(valid),
        width, interpret=True)
    pcnt, cnt = np.asarray(pcnt), np.asarray(cnt)
    for p in range(P):
        m = (vals_abs[p] >= 500) & (vals_abs[p] <= 10**6 + 3000)
        want = int(vals_abs[p][m].sum(dtype=object))
        got = sum(int(pcnt[p, b]) << b for b in range(width)) \
            + int(mins[p]) * int(cnt[p])
        assert got == want and cnt[p] == m.sum()


def test_whole_tree_fusion_vs_oracle(rng):
    """r4 multi-leaf fused kernel: an AND of two bitpack leaves + a
    bytes EQ (stays in the XLA rest mask) with sum on a third bitpack
    column (agg NOT in the tree) — plan must pick the multi kernel and
    results must match the numpy oracle exactly."""
    from knoxdb_tpu.exec.device import DeviceSegment
    from knoxdb_tpu.exec.scan import AggSpec, SegmentScanner
    from knoxdb_tpu.pack.segment import build_segment
    from knoxdb_tpu.query.filter import Filter, and_, leaf
    from knoxdb_tpu.schema.schema import Builder
    from knoxdb_tpu.types import FieldType, FilterMode

    n = 16384
    sch = (Builder("t").pk("id")
           .add("a", FieldType.UINT64)
           .add("b", FieldType.INT64)
           .add("s", FieldType.STRING)
           .add("v", FieldType.UINT64)
           .finish())
    data = {
        "id": np.arange(1, n + 1, dtype=np.uint64),
        "a": rng.integers(0, 50_000, n, dtype=np.uint64),
        "b": rng.integers(-1 << 30, 1 << 30, n, dtype=np.int64),
        "s": np.array(["x", "y", "z"], object)[rng.integers(0, 3, n)],
        "v": rng.integers(0, 1 << 40, n, dtype=np.uint64),
    }
    seg = build_segment(sch, data, pack_size=2048)
    sc = SegmentScanner(DeviceSegment(seg))
    tree = and_(
        leaf(Filter(sch.field("a"), FilterMode.RANGE, (1000, 40_000))),
        leaf(Filter(sch.field("b"), FilterMode.GT, 0)),
        leaf(Filter(sch.field("s"), FilterMode.EQ, "y")),
    ).optimize()
    aggs = [AggSpec("count"), AggSpec("sum", "v")]
    res = sc.scan(tree, aggs)
    m = ((data["a"] >= 1000) & (data["a"] <= 40_000)
         & (data["b"] > 0) & (data["s"] == "y"))
    assert res.count == int(m.sum())
    assert res.aggs[("sum", "v")] == int(data["v"][m].astype(object).sum())
    # the plan must have chosen the multi kernel (2 fused leaves + the
    # separate agg column)
    multi = [s for s in sc._fns
             if isinstance(s, tuple) and any(
                 isinstance(x, tuple) and len(x) and x[0] == "multi"
                 for x in s if isinstance(x, tuple))]
    assert multi, "whole-tree fusion not selected"

    # same query with sum on a LEAF column (agg in tree)
    res2 = sc.scan(tree, [AggSpec("count"), AggSpec("sum", "b")])
    assert res2.count == int(m.sum())
    assert res2.aggs[("sum", "b")] == int(data["b"][m].astype(object).sum())


def test_dict_leaf_fusion_vs_oracle(rng):
    """r4 phase 2: DICT (bytes + int-dict) leaves fuse as per-pack code
    ranges. Every fusable mode vs the numpy oracle, incl. values absent
    from some packs' dictionaries (miss -> empty code range)."""
    from knoxdb_tpu.exec.device import DeviceSegment
    from knoxdb_tpu.exec.scan import AggSpec, SegmentScanner
    from knoxdb_tpu.pack.segment import build_segment
    from knoxdb_tpu.query.filter import Filter, and_, leaf
    from knoxdb_tpu.schema.schema import Builder
    from knoxdb_tpu.types import FieldType, FilterMode

    n = 8192
    sch = (Builder("t").pk("id")
           .add("s", FieldType.STRING)
           .add("k", FieldType.UINT32)
           .add("v", FieldType.UINT64)
           .finish())
    # uniform dictionaries (every pack sees the full pool) -> ONE
    # device group, the fused-kernel contract; a nowhere-present value
    # ("qq") covers the empty-code-range miss path
    svals = np.array(["aa", "bb", "cc", "dd", "zz"], object)
    sidx = rng.integers(0, 5, n)
    kpool = np.array([10, 20, 30, 40, 500_000], np.uint64)
    kidx = rng.integers(0, 5, n)
    data = {
        "id": np.arange(1, n + 1, dtype=np.uint64),
        "s": svals[sidx],
        "k": kpool[kidx].astype(np.uint64),
        "v": rng.integers(0, 1 << 30, n, dtype=np.uint64),
    }
    seg = build_segment(sch, data, pack_size=1024)
    sc = SegmentScanner(DeviceSegment(seg))
    from knoxdb_tpu.encode.schemes import Scheme
    assert sc.d.column("s").groups[0].scheme == Scheme.DICT
    assert sc.d.column("k").groups[0].scheme == Scheme.DICT

    cases = [
        (Filter(sch.field("s"), FilterMode.EQ, "zz"),
         data["s"] == "zz"),
        (Filter(sch.field("s"), FilterMode.EQ, "qq"),   # miss everywhere
         np.zeros(n, bool)),
        (Filter(sch.field("s"), FilterMode.RANGE, ("bb", "dd")),
         (data["s"] >= "bb") & (data["s"] <= "dd")),
        (Filter(sch.field("s"), FilterMode.GT, "cc"),
         data["s"] > "cc"),
        (Filter(sch.field("k"), FilterMode.EQ, 500_000),
         data["k"] == 500_000),
        (Filter(sch.field("k"), FilterMode.LE, 20),
         data["k"] <= 20),
        (Filter(sch.field("k"), FilterMode.RANGE, (20, 40)),
         (data["k"] >= 20) & (data["k"] <= 40)),
    ]
    for f, m_leaf in cases:
        tree = and_(leaf(f),
                    leaf(Filter(sch.field("v"), FilterMode.GT, 1000))
                    ).optimize()
        m = m_leaf & (data["v"] > 1000)
        res = sc.scan(tree, [AggSpec("count"), AggSpec("sum", "v")])
        assert res.count == int(m.sum()), f"{f.mode} count"
        assert res.aggs[("sum", "v")] == \
            int(data["v"][m].astype(object).sum()), f"{f.mode} sum"
    # the dict leaves must actually be IN the fused fields
    multi_sigs = [x for s in sc._fns if isinstance(s, tuple)
                  for x in s if isinstance(x, tuple) and len(x) == 4
                  and x[0] == "multi"]
    assert any("s" in x[2] or "k" in x[2] for x in multi_sigs), \
        "dict leaf never fused"


def test_fused_vs_unfused_equivalence(rng, monkeypatch):
    """The whole-tree kernel and the XLA matcher path MUST agree
    predicate-by-predicate (the dict code-interval mapping lives in two
    host twins — scan._dict_code_range_host vs rewrite._dict_consts* —
    and this is the guard): run the same randomized query set with the
    tree kernel on and off and compare counts + sums exactly."""
    from knoxdb_tpu.exec.device import DeviceSegment
    from knoxdb_tpu.exec.scan import AggSpec, SegmentScanner
    from knoxdb_tpu.pack.segment import build_segment
    from knoxdb_tpu.query.filter import Filter, and_, leaf
    from knoxdb_tpu.schema.schema import Builder
    from knoxdb_tpu.types import FieldType, FilterMode

    n = 8192
    sch = (Builder("t").pk("id")
           .add("s", FieldType.STRING)
           .add("a", FieldType.UINT64)
           .add("v", FieldType.INT64)
           .finish())
    svals = np.array(["aa", "bb", "cc", "dd", "zz"], object)
    data = {
        "id": np.arange(1, n + 1, dtype=np.uint64),
        "s": svals[rng.integers(0, 5, n)],
        "a": rng.integers(0, 60_000, n, dtype=np.uint64),
        "v": rng.integers(-1 << 30, 1 << 30, n, dtype=np.int64),
    }
    seg = build_segment(sch, data, pack_size=1024)
    queries = []
    for mode, val in [(FilterMode.EQ, "bb"), (FilterMode.GT, "cc"),
                      (FilterMode.LE, "aa"), (FilterMode.EQ, "qq"),
                      (FilterMode.RANGE, ("bb", "dd"))]:
        queries.append(and_(
            leaf(Filter(sch.field("s"), mode, val)),
            leaf(Filter(sch.field("a"), FilterMode.RANGE, (5, 55_000))),
            leaf(Filter(sch.field("v"), FilterMode.GT, -1000)),
        ).optimize())
    aggs = [AggSpec("count"), AggSpec("sum", "v")]

    results = {}
    for tag, env in (("fused", "0"), ("unfused", "1")):
        monkeypatch.setenv("KNOX_NO_PALLAS_TREE", env)
        sc = SegmentScanner(DeviceSegment(seg))
        results[tag] = [(r.count, r.aggs[("sum", "v")])
                        for r in (sc.scan(q, aggs) for q in queries)]
    assert results["fused"] == results["unfused"]


def test_mask_only_tree_fusion(rng, monkeypatch):
    """Mask-only whole-tree fusion (DEFAULT ON since r5): count-only
    queries plan the kernel with NO agg specs and stay oracle-exact
    (incl. projection via the kernel's mask); KNOX_PALLAS_MASKONLY=0
    reverts those plans to the XLA sweep with identical results."""
    from knoxdb_tpu.exec.device import DeviceSegment
    from knoxdb_tpu.exec.scan import AggSpec, SegmentScanner
    from knoxdb_tpu.pack.segment import build_segment
    from knoxdb_tpu.query.filter import Filter, and_, leaf
    from knoxdb_tpu.schema.schema import Builder
    from knoxdb_tpu.types import FieldType, FilterMode

    n = 8192
    sch = (Builder("t").pk("id")
           .add("a", FieldType.UINT64)
           .add("b", FieldType.INT64)
           .finish())
    data = {
        "id": np.arange(1, n + 1, dtype=np.uint64),
        "a": rng.integers(0, 50_000, n, dtype=np.uint64),
        "b": rng.integers(-1 << 30, 1 << 30, n, dtype=np.int64),
    }
    seg = build_segment(sch, data, pack_size=1024)
    sc = SegmentScanner(DeviceSegment(seg))
    tree = and_(
        leaf(Filter(sch.field("a"), FilterMode.RANGE, (100, 30_000))),
        leaf(Filter(sch.field("b"), FilterMode.LE, 12345)),
    ).optimize()
    m = (data["a"] >= 100) & (data["a"] <= 30_000) & (data["b"] <= 12345)
    res = sc.scan(tree, [AggSpec("count")])
    assert res.count == int(m.sum())
    res3 = sc.scan(tree, [AggSpec("count")], project=["a"], limit=50)
    assert len(res3.rows["a"]) == min(50, int(m.sum()))
    sigs = [x for s in sc._fns if isinstance(s, tuple)
            for x in s if isinstance(x, tuple) and len(x) == 4
            and x[0] == "multi"]
    assert any(x[3] == () for x in sigs), "mask-only plan not selected"
    # kill switch: same results, no fused plan
    monkeypatch.setenv("KNOX_PALLAS_MASKONLY", "0")
    sc2 = SegmentScanner(DeviceSegment(seg))
    assert sc2.scan(tree, [AggSpec("count")]).count == res.count
    sigs2 = [x for s in sc2._fns if isinstance(s, tuple)
             for x in s if isinstance(x, tuple) and len(x) == 4
             and x[0] == "multi"]
    assert not sigs2, "kill switch ignored"


def test_multi_agg_fused_kernel(rng):
    """r5: count+sum+min+max (the driver entry() shape) runs ONE fused
    kernel — sum popcounts AND min/max tournaments from a single HBM
    pass — and matches the numpy oracle exactly, incl. a signed leaf
    column, a >32-bit-wide agg column (hi-half tournament bits), and an
    empty-result query."""
    from knoxdb_tpu.exec.device import DeviceSegment
    from knoxdb_tpu.exec.scan import AggSpec, SegmentScanner
    from knoxdb_tpu.pack.segment import build_segment
    from knoxdb_tpu.query.filter import Filter, and_, leaf
    from knoxdb_tpu.schema.schema import Builder
    from knoxdb_tpu.types import FieldType, FilterMode

    n = 16384
    sch = (Builder("t").pk("id")
           .add("a", FieldType.UINT64)
           .add("b", FieldType.INT64)
           .add("v", FieldType.UINT64)
           .finish())
    data = {
        "id": np.arange(1, n + 1, dtype=np.uint64),
        "a": rng.integers(0, 50_000, n, dtype=np.uint64),
        "b": rng.integers(-1 << 30, 1 << 30, n, dtype=np.int64),
        "v": rng.integers(0, 1 << 40, n, dtype=np.uint64),
    }
    seg = build_segment(sch, data, pack_size=2048)
    sc = SegmentScanner(DeviceSegment(seg))
    tree = and_(
        leaf(Filter(sch.field("a"), FilterMode.RANGE, (1000, 40_000))),
        leaf(Filter(sch.field("b"), FilterMode.GT, -1 << 29)),
    ).optimize()
    aggs = [AggSpec("count"), AggSpec("sum", "v"), AggSpec("min", "v"),
            AggSpec("max", "v"), AggSpec("min", "b"), AggSpec("max", "b")]
    res = sc.scan(tree, aggs)
    m = ((data["a"] >= 1000) & (data["a"] <= 40_000)
         & (data["b"] > -(1 << 29)))
    assert res.count == int(m.sum())
    assert res.aggs[("sum", "v")] == int(data["v"][m].astype(object).sum())
    assert res.aggs[("min", "v")] == int(data["v"][m].min())
    assert res.aggs[("max", "v")] == int(data["v"][m].max())
    assert res.aggs[("min", "b")] == int(data["b"][m].min())
    assert res.aggs[("max", "b")] == int(data["b"][m].max())
    # the plan must fuse BOTH agg columns (v: sum+mm; b: mm only)
    sigs = [x for s in sc._fns if isinstance(s, tuple)
            for x in s if isinstance(x, tuple) and len(x) == 4
            and x[0] == "multi"]
    assert any(("v", True, True) in x[3] and ("b", False, True) in x[3]
               for x in sigs), "multi-agg fusion not selected"
    # empty result: min/max are None, sum 0
    t0 = leaf(Filter(sch.field("a"), FilterMode.GT, 10 ** 9)).optimize()
    r0 = sc.scan(t0, aggs)
    assert r0.count == 0 and r0.aggs[("min", "v")] is None
    assert r0.aggs[("max", "b")] is None and r0.aggs[("sum", "v")] == 0
