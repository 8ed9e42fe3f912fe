"""Round-2 depth tests: multi-segment sorted-query merges, WAL damage
matrix, float DICT/RLE container coverage through keyform (the VERDICT
round-1 "test volume" items)."""

from dataclasses import dataclass

import numpy as np
import pytest

import knoxdb_tpu.knox as knox
from knoxdb_tpu.types import FieldType, FilterMode


@dataclass
class Row:
    id: int = 0
    v: int = 0
    tag: int = 0


def _mkdb(tmp_path, **kw):
    kw.setdefault("driver", "file")
    kw.setdefault("path", str(tmp_path))
    kw.setdefault("pack_size", 256)
    kw.setdefault("background_merge", False)
    return knox.create_database("d", **kw)


# ------------------------------------------------------------- sorted --


@pytest.mark.slow
def test_sorted_query_across_many_segments(tmp_path, rng):
    """ORDER BY + LIMIT must k-way merge per-segment top-k with journal
    rows: 3 sealed segments (separate merges, sizes above the compaction
    threshold) + journal overlay, vs a numpy oracle. Covers ascending,
    descending, ties, and limits smaller/larger than one segment's k."""
    db = _mkdb(tmp_path)
    t = db.create_table(Row)
    all_v, all_tag = [], []
    # 3 merges, each > pack_size*MIN_MERGE_TAIL rows -> kept as separate
    # sealed segments
    for _ in range(3):
        n = 1100
        v = rng.integers(-5000, 5000, n)
        tag = rng.integers(0, 7, n)
        t.insert({"id": np.zeros(n, np.uint64), "v": v, "tag": tag})
        t.merge()
        all_v.extend(int(x) for x in v)
        all_tag.extend(int(x) for x in tag)
    assert len(t._t.segments) >= 3
    # journal overlay rows
    jv = rng.integers(-5000, 5000, 40)
    t.insert({"id": np.zeros(40, np.uint64), "v": jv,
              "tag": np.full(40, 3)})
    all_v.extend(int(x) for x in jv)
    all_tag.extend([3] * 40)

    va = np.array(all_v)
    ta = np.array(all_tag)
    for desc in (False, True):
        for lim in (17, 500, 5000):
            got = (t.query().order_by("v", desc=desc).limit(lim)
                   .select("v").execute())
            got_v = [g["v"] for g in got] if isinstance(got[0], dict) \
                else [g.v for g in got]
            want = np.sort(va)[::-1] if desc else np.sort(va)
            assert got_v == want[:lim].tolist(), (desc, lim)

    # with a filter over all sources
    got = (t.query().where(tag=3).order_by("v").limit(100)
           .select("v").execute())
    got_v = [g["v"] for g in got] if isinstance(got[0], dict) \
        else [g.v for g in got]
    want = np.sort(va[ta == 3])[:100]
    assert got_v == want.tolist()
    db.close()


def test_sorted_query_with_deletes_across_segments(tmp_path, rng):
    """Deleted rows must never surface in sorted output even when the
    tombstones live in the journal and the rows in sealed segments."""
    db = _mkdb(tmp_path)
    t = db.create_table(Row)
    n = 1100
    v = rng.integers(0, 100_000, n)
    pks = t.insert({"id": np.zeros(n, np.uint64), "v": v,
                    "tag": np.zeros(n)})
    t.merge()
    # delete the 50 smallest values — exactly the ones a naive top-k
    # ascending would return
    order = np.argsort(v)
    dead = [int(pks[i]) for i in order[:50]]
    t.delete(t.query().where(id__in=dead))
    got = t.query().order_by("v").limit(30).select("v").execute()
    got_v = [g["v"] for g in got] if isinstance(got[0], dict) \
        else [g.v for g in got]
    want = np.sort(v)[50:80]
    assert got_v == want.tolist()
    db.close()


# ---------------------------------------------------------- WAL damage --

def _wal_of(tmp_path):
    from knoxdb_tpu.wal.wal import Wal
    return Wal(str(tmp_path / "w"))


def test_wal_skip_mode_survives_midstream_corruption(tmp_path):
    """SKIP damage policy: a corrupted record mid-segment is skipped by
    resync; records before and after still stream (reference
    wal.go:33-40 repair modes)."""
    from knoxdb_tpu.wal.wal import (Record, RecordType, RecoveryMode, Wal,
                                    WalError, _HDR)
    w = _wal_of(tmp_path)
    lsns = [w.write(Record(RecordType.INSERT, entity=1, txid=7,
                           data=bytes([i]) * 40)) for i in range(10)]
    w.sync()
    w.close()
    # stomp bytes inside record 4's payload (LSN == global byte offset;
    # single segment based at 0)
    seg = sorted((tmp_path / "w").glob("*.seg"))[0]
    raw = bytearray(seg.read_bytes())
    off = lsns[4] + _HDR.size + 5
    raw[off:off + 4] = b"\xde\xad\xbe\xef"
    seg.write_bytes(bytes(raw))

    w2 = Wal(str(tmp_path / "w"))
    with pytest.raises(WalError):
        list(w2.records(mode=RecoveryMode.FAIL))
    got = [r.data[0] for r in w2.records(mode=RecoveryMode.SKIP)]
    assert got == [0, 1, 2, 3, 5, 6, 7, 8, 9]   # resynced past the damage
    w2.close()


def test_wal_truncate_mode_drops_tail_only(tmp_path):
    from knoxdb_tpu.wal.wal import Record, RecordType, RecoveryMode, Wal
    w = _wal_of(tmp_path)
    for i in range(6):
        w.write(Record(RecordType.INSERT, entity=1, txid=1,
                       data=bytes([i]) * 16))
    w.sync()
    w.close()
    seg = sorted((tmp_path / "w").glob("*.seg"))[0]
    raw = seg.read_bytes()
    seg.write_bytes(raw[:len(raw) - 7])      # torn tail (partial record)
    w2 = Wal(str(tmp_path / "w"))
    got = [r.data[0] for r in w2.records(mode=RecoveryMode.TRUNCATE)]
    assert got == [0, 1, 2, 3, 4]            # only the torn record lost
    w2.close()


def test_engine_reopen_after_checksum_damage_before_checkpoint(tmp_path):
    """End-to-end: records already covered by the durable checkpoint may
    be damaged on disk without affecting recovery (replay starts at the
    checkpoint watermark)."""
    db = _mkdb(tmp_path)
    t = db.create_table(Row)
    t.insert({"id": np.zeros(300, np.uint64),
              "v": np.arange(300), "tag": np.zeros(300)})
    t.merge()                                 # checkpoint advances
    t.insert([Row(v=12345, tag=1)])           # post-checkpoint row
    db.close()

    # damage the first WAL segment's early bytes (pre-checkpoint region)
    seg = sorted((tmp_path / "wal").glob("*.seg"))[0]
    raw = bytearray(seg.read_bytes())
    raw[40:44] = b"\x99\x99\x99\x99"
    seg.write_bytes(bytes(raw))

    db2 = knox.open_database("d", driver="file", path=str(tmp_path),
                             background_merge=False)
    t2 = db2.table("row")
    assert t2.count() == 301
    assert t2.query().where(v=12345).count() == 1
    db2.close()


# ------------------------------------------------- float containers ----

def test_float_dict_scheme_via_keyform(tmp_path, rng):
    """A float column with low cardinality but NON-ALP values (full
    mantissas) must dict-encode through keyform (reference float-dict
    container, internal/encode/container.go:20-55) and answer
    predicates exactly."""
    from knoxdb_tpu.encode.schemes import Scheme
    from knoxdb_tpu.schema.schema import Builder
    db = _mkdb(tmp_path)
    sch = (Builder("f").pk("id")
           .add("x", FieldType.FLOAT64).finish())
    t = db.create_table(sch)
    uniq = rng.standard_normal(9)             # full-mantissa noise
    x = rng.choice(uniq, 1500)
    t.insert({"id": np.zeros(1500, np.uint64), "x": x})
    t.merge()
    packs = t._t.segments[0].seg.columns["x"].packs
    assert all(p.scheme == Scheme.DICT for p in packs), \
        [p.scheme for p in packs]
    thr = float(np.median(uniq))
    got = t.query().where(knox.F("x") > thr).count()
    assert got == int((x > thr).sum())
    got = t.query().where(x=float(uniq[0])).count()
    assert got == int((x == uniq[0]).sum())
    assert t.query().sum("x") == pytest.approx(float(x.sum()), rel=1e-12)
    db.close()


def test_float_rle_scheme_via_keyform(tmp_path):
    """Run-heavy float column -> RLE through keyform (reference float
    runend container)."""
    from knoxdb_tpu.encode.schemes import Scheme
    from knoxdb_tpu.schema.schema import Builder
    db = _mkdb(tmp_path)
    sch = (Builder("f").pk("id")
           .add("x", FieldType.FLOAT64).finish())
    t = db.create_table(sch)
    base = np.repeat(np.array([np.pi, -np.e, 0.0, 1e300]), 400)
    t.insert({"id": np.zeros(len(base), np.uint64), "x": base})
    t.merge()
    packs = t._t.segments[0].seg.columns["x"].packs
    assert any(p.scheme == Scheme.RLE for p in packs), \
        [p.scheme for p in packs]
    assert t.query().where(knox.F("x") < 0.5).count() == \
        int((base < 0.5).sum())
    assert t.query().where(x=float(np.pi)).count() == 400
    db.close()


def test_float_special_values_order(tmp_path):
    """-inf < negatives < -0.0 == 0.0 < positives < inf through keyform
    order; NaN policy: stored and equal-matchable, excluded from
    range predicates (total-order keyform places NaN at the top end)."""
    from knoxdb_tpu.schema.schema import Builder
    db = _mkdb(tmp_path)
    sch = (Builder("f").pk("id")
           .add("x", FieldType.FLOAT64).finish())
    t = db.create_table(sch)
    vals = np.array([-np.inf, -1.5, -0.0, 0.0, 2.5, np.inf])
    t.insert({"id": np.zeros(len(vals), np.uint64), "x": vals})
    t.merge()
    assert t.query().where(knox.F("x") < 0.0).count() == 2   # -inf, -1.5
    assert t.query().where(x=0.0).count() == 2               # both zeros
    assert t.query().where(knox.F("x") >= 0.0).count() == 4
    got = t.query().order_by("x").select("x").execute()
    xs = [g["x"] if isinstance(g, dict) else g.x for g in got]
    assert xs[0] == -np.inf and xs[-1] == np.inf
    db.close()
