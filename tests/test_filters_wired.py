"""Fuse + BITS pack filters wired into stats pruning (VERDICT r2 #3).

Reference: internal/types/filter.go:10-19 (kinds), internal/pack/stats/
filter.go:68-101 (per-pack build), fuse/fuse.go:16-29. Checks:
- BFUSE8/16 prune packs on EQ/IN misses; fpr beats bloom at equal bytes
- BITS is EXACT (zero false positives) and errors on unsupported types
- unknown/non-bloom kinds ERROR instead of degrading to a default bloom
- segio round-trips fuse + bits filters
"""

import numpy as np
import pytest

from knoxdb_tpu.exec.device import DeviceSegment
from knoxdb_tpu.exec.scan import AggSpec, SegmentScanner
from knoxdb_tpu.filter import bloom, fuse
from knoxdb_tpu.pack.segment import build_segment
from knoxdb_tpu.pack.stats import FieldStats, prune_leaf
from knoxdb_tpu.query.filter import Filter, leaf
from knoxdb_tpu.schema.schema import Builder
from knoxdb_tpu.store import segio
from knoxdb_tpu.types import FieldType, FilterMode, FilterType
from knoxdb_tpu.utils import limbs as lb

N = 2048
PACK = 512


def _seg(filter_kind, rng, dtype=np.uint64, ftype=FieldType.UINT64):
    sch = (Builder("t").pk("id")
           .add("v", ftype, filter=filter_kind)
           .finish())
    # disjoint value ranges per pack so EQ probes hit exactly one pack
    vals = np.concatenate([
        rng.choice(np.arange(p * 100000, p * 100000 + 50000, 2,
                             dtype=dtype), PACK)
        for p in range(N // PACK)])
    data = {"id": np.arange(1, N + 1, dtype=np.uint64), "v": vals}
    return sch, data, build_segment(sch, data, pack_size=PACK)


@pytest.mark.parametrize("kind", [FilterType.BFUSE8, FilterType.BFUSE16,
                                  FilterType.BITS])
def test_filter_no_false_negatives(kind, rng):
    sch, data, seg = _seg(kind, rng)
    fs = seg.stats.fields["v"]
    assert fs.pack_filters is not None and len(fs.pack_filters) == N // PACK
    # every present value must probe positive in its own pack
    for p in range(N // PACK):
        vals = data["v"][p * PACK:(p + 1) * PACK]
        keys = lb.to_keys64(vals, FieldType.UINT64)
        t = prune_leaf(fs, FilterMode.EQ, lo=int(keys[0]),
                       key_limbs=lb.to_keyform(vals[:1], FieldType.UINT64))
        assert not t.none[p]


def test_bits_exact(rng):
    """BITS yields ZERO false positives: an absent in-range key prunes
    every pack (blooms/fuse cannot guarantee this)."""
    sch, data, seg = _seg(FilterType.BITS, rng)
    fs = seg.stats.fields["v"]
    # odd values are never generated (step-2 ranges) but are in-range
    for probe in (1, 100001, 200001, 300001):
        t = prune_leaf(fs, FilterMode.EQ, lo=probe,
                       key_limbs=lb.to_keyform(
                           np.array([probe], np.uint64), FieldType.UINT64))
        assert t.none.all(), f"BITS false positive for {probe}"


def test_fuse_fpr_beats_bloom_at_equal_bytes(rng):
    """At (roughly) equal bytes the xor filter's fpr must be below the
    bloom's (the reason fuse kinds exist — fuse.go:16-29)."""
    n = 4096
    # even members / odd probes (NEVER materialize a 2^31 arange)
    vals = np.unique(rng.integers(0, 1 << 31, n, dtype=np.uint64)
                     * np.uint64(2))
    limbs = lb.to_keyform(vals, FieldType.UINT64)
    n = len(vals)
    xf = fuse.build(limbs, 8)
    # bloom at 1 B/entry (4096 B) >= fuse ~9.8 bits/key (~5 KB at n=4096)
    nbits = bloom.bloom_bits(n, FilterType.BLOOM_1B)
    bw = bloom.build_np(limbs, nbits)

    probes = rng.integers(0, 1 << 31, 20000, dtype=np.uint64) \
        * np.uint64(2) + np.uint64(1)    # odd: never members
    pl = lb.to_keyform(probes, FieldType.UINT64)
    fpr_fuse = xf.contains_limbs(pl).mean()
    fpr_bloom = bloom.contains_np(bw, pl).mean()
    assert fpr_fuse < fpr_bloom
    assert fpr_fuse < 0.01                       # ~0.39% design point
    # 16-bit fingerprints: another ~256x lower
    xf16 = fuse.build(limbs, 16)
    assert xf16.contains_limbs(pl).mean() <= fpr_fuse


def test_scan_prunes_with_fuse(rng):
    sch, data, seg = _seg(FilterType.BFUSE8, rng)
    sc = SegmentScanner(DeviceSegment(seg))
    # absent odd value inside pack 0's range: zone maps can't prune
    # pack 0, the fuse filter must
    tree = leaf(Filter(sch.field("v"), FilterMode.EQ, 1)).optimize()
    res = sc.scan(tree, [AggSpec("count")])
    assert res.count == 0
    # present value scans correctly
    v0 = int(data["v"][0])
    tree = leaf(Filter(sch.field("v"), FilterMode.EQ, v0)).optimize()
    res = sc.scan(tree, [AggSpec("count")])
    assert res.count == int((data["v"] == v0).sum())


def test_segio_roundtrip_filters(rng):
    for kind in (FilterType.BFUSE8, FilterType.BFUSE16, FilterType.BITS):
        sch, data, seg = _seg(kind, rng)
        seg2 = segio.load_segment(segio.dump_segment(seg))
        fs2 = seg2.stats.fields["v"]
        assert fs2.filter_type == kind
        assert len(fs2.pack_filters) == N // PACK
        probe = np.array([int(data["v"][0])], np.uint64)
        pl = lb.to_keyform(probe, FieldType.UINT64)
        if kind == FilterType.BITS:
            assert fs2.pack_filters[0].isin(probe).any()
        else:
            assert fs2.pack_filters[0].contains_limbs(pl).any()


def test_strict_filter_kinds(rng):
    # BITS on strings: build-time error
    sch = (Builder("t").pk("id")
           .add("s", FieldType.STRING, filter=FilterType.BITS)
           .finish())
    data = {"id": np.arange(1, 9, dtype=np.uint64),
            "s": [f"x{i}" for i in range(8)]}
    with pytest.raises(ValueError, match="BITS"):
        build_segment(sch, data, pack_size=32)
    # BITS on wide: error
    schw = (Builder("t").pk("id")
            .add("w", FieldType.INT128, filter=FilterType.BITS)
            .finish())
    dataw = {"id": np.arange(1, 9, dtype=np.uint64),
             "w": [int(x) << 70 for x in range(8)]}
    with pytest.raises(ValueError, match="BITS"):
        build_segment(schw, dataw, pack_size=32)
    # bloom_bits never silently serves a non-bloom kind
    with pytest.raises(ValueError):
        bloom.bloom_bits(1024, FilterType.BITS)
    with pytest.raises(ValueError):
        bloom.bloom_bits(1024, FilterType.BFUSE8)
    # unknown string kind at the schema knob
    from knoxdb_tpu.schema.schema import field_meta
    with pytest.raises(ValueError, match="unknown pack filter"):
        field_meta(filter="blooom")


def test_string_fuse_filter(rng):
    sch = (Builder("t").pk("id")
           .add("s", FieldType.STRING, filter="bfuse8")
           .finish())
    n = 256
    data = {"id": np.arange(1, n + 1, dtype=np.uint64),
            "s": [f"key-{i:04d}" for i in range(n)]}
    seg = build_segment(sch, data, pack_size=64)
    sc = SegmentScanner(DeviceSegment(seg))
    tree = leaf(Filter(sch.field("s"), FilterMode.EQ, "key-0007")).optimize()
    res = sc.scan(tree, [AggSpec("count")])
    assert res.count == 1
    tree = leaf(Filter(sch.field("s"), FilterMode.EQ, "key-zz")).optimize()
    assert sc.scan(tree, [AggSpec("count")]).count == 0
