"""Regression tests for the round-1 advisor findings (ADVICE.md):

1. ALP strict float bounds survive optimizer GT/LT->RANGE merges
2. background merge is atomic w.r.t. concurrent readers
3. merge persistence is manifest-driven (staged blobs ignored on load)
4. crash recovery truncates a torn WAL tail instead of failing the open
5. pack_size is validated (power of two >= 32)
"""

import threading
from dataclasses import dataclass

import numpy as np
import pytest

import knoxdb_tpu.knox as knox
from knoxdb_tpu.knox import F


@dataclass
class Px:
    id: int = 0
    x: float = 0.0
    v: int = 0


def _mk_alp_table(tmp_path, n=4000):
    """Table whose x column ALP-encodes (2-decimal values incl. 5.00)."""
    db = knox.create_database("alp_adv", driver="file", path=str(tmp_path),
                              pack_size=1024, background_merge=False)
    t = db.create_table(Px)
    xs = (np.arange(n) % 1000) / 100.0          # 0.00 .. 9.99, hits 5.00
    t.insert({"id": np.zeros(n, np.uint64),
              "x": xs, "v": np.arange(n)})
    t.merge()
    from knoxdb_tpu.encode.schemes import Scheme
    schemes = {p.scheme for h in t._t.segments
               for p in h.seg.columns["x"].packs}
    assert Scheme.ALP in schemes, f"x not ALP-encoded: {schemes}"
    return db, t, xs


def test_alp_merged_strict_range(tmp_path):
    db, t, xs = _mk_alp_table(tmp_path)
    # GT + LE merge into RANGE in the optimizer; strictness must survive
    want = int(((xs > 5.0) & (xs <= 9.5)).sum())
    got = t.query().where(F("x") > 5.0, F("x") <= 9.5).count()
    assert got == want
    # LT side strict too
    want = int(((xs >= 2.0) & (xs < 5.0)).sum())
    got = t.query().where(F("x") >= 2.0, F("x") < 5.0).count()
    assert got == want
    # merged single-bound (GT twice -> GE with adjusted key)
    want = int(((xs > 5.0) & (xs > 3.0)).sum())
    got = t.query().where(F("x") > 5.0, F("x") > 3.0).count()
    assert got == want
    db.close()


def test_alp_merged_range_vs_oracle_journal(tmp_path):
    """Device (ALP segment) and journal oracle must agree on merged
    strict ranges: half the rows merged, half in the journal."""
    db = knox.create_database("alp_adv2", driver="file", path=str(tmp_path),
                              pack_size=1024, background_merge=False)
    t = db.create_table(Px)
    n = 3000
    xs1 = (np.arange(n) % 700) / 100.0
    t.insert({"id": np.zeros(n, np.uint64), "x": xs1,
              "v": np.arange(n)})
    t.merge()
    xs2 = (np.arange(n) % 900) / 100.0
    t.insert({"id": np.zeros(n, np.uint64), "x": xs2,
              "v": np.arange(n)})
    xs = np.concatenate([xs1, xs2])
    want = int(((xs > 5.0) & (xs <= 6.0)).sum())
    got = t.query().where(F("x") > 5.0, F("x") <= 6.0).count()
    assert got == want
    db.close()


@dataclass
class Rw:
    id: int = 0
    v: int = 0


def test_background_merge_vs_readers(tmp_path):
    """Readers must never observe a half-applied merge: counts are always
    a multiple of the batch size and never decrease (tiny journal forces
    many merges mid-run)."""
    db = knox.create_database("bgm", driver="file", path=str(tmp_path),
                              pack_size=64, journal_size=128,
                              background_merge=True)
    t = db.create_table(Rw)
    BATCH, NB = 50, 24
    stop = threading.Event()
    errs = []

    def reader():
        seen = 0                      # per-thread monotonicity watermark
        try:
            while not stop.is_set():
                # ONE query = one snapshot: count+sum must be consistent
                r = t.query().aggregate(("count", ""), ("sum", "v"))
                c, s = r[("count", "")], r[("sum", "v")]
                assert c % BATCH == 0, f"torn count {c}"
                assert c >= seen, f"count went backwards {c}<{seen}"
                seen = c
                # sum invariant: each batch contributes 0..BATCH-1
                assert s == (c // BATCH) * (BATCH * (BATCH - 1) // 2), \
                    f"sum {s} inconsistent with count {c}"
        except AssertionError as e:
            errs.append(e)

    rd = [threading.Thread(target=reader) for _ in range(3)]
    for th in rd:
        th.start()
    for b in range(NB):
        t.insert([Rw(v=i) for i in range(BATCH)])
    # let merges drain, keep reading through the drain
    t._t.engine.tasks.drain()
    stop.set()
    for th in rd:
        th.join()
    assert not errs, errs[:3]
    assert t.count() == BATCH * NB
    db.close()


def test_background_merge_deletes_never_reappear(tmp_path):
    db = knox.create_database("bgm2", driver="file", path=str(tmp_path),
                              pack_size=64, journal_size=128,
                              background_merge=True)
    t = db.create_table(Rw)
    t.insert([Rw(v=i) for i in range(500)])
    t._t.engine.tasks.drain()
    t.delete(t.query().where(F("v") < 100))
    stop = threading.Event()
    errs = []

    def reader():
        try:
            while not stop.is_set():
                # churn inserts+deletes 50 rows per round: 400 or 450
                assert t.count() in (400, 450)
                # the originally-deleted rows must NEVER reappear
                assert t.query().where(F("v") < 100).count() == 0
        except AssertionError as e:
            errs.append(e)

    rd = [threading.Thread(target=reader) for _ in range(2)]
    for th in rd:
        th.start()
    # churn more merges while readers run
    for b in range(8):
        t.insert([Rw(v=1000 + i) for i in range(50)])
        t.delete(t.query().where(F("v") >= 1000))
    t._t.engine.tasks.drain()
    stop.set()
    for th in rd:
        th.join()
    assert not errs, errs[:3]
    assert t.count() == 400
    db.close()


def test_manifest_ignores_staged_blobs(tmp_path):
    """A crash can leave staged (unreferenced) segment blobs; loading
    must ignore them and the next merge must GC them."""
    db = knox.create_database("mf", driver="file", path=str(tmp_path),
                              pack_size=256, background_merge=False)
    t = db.create_table(Rw)
    t.insert([Rw(v=i) for i in range(300)])
    t.merge()
    want = t.count()
    eng = t._t.engine
    b = eng.store.bucket(f"table_{t._t.id}_segments")
    # simulate a crash that staged a garbage blob but never landed the
    # manifest: loader must not read it
    b.put(b"ffffffff_9999", b"GARBAGE-NOT-A-SEGMENT")
    db.close()

    db2 = knox.open_database("mf", driver="file", path=str(tmp_path),
                             background_merge=False)
    t2 = db2.table("rw")
    assert t2.count() == want
    # next merge GCs the orphan
    t2.insert([Rw(v=i) for i in range(10)])
    t2.merge()
    b2 = db2.engine.store.bucket(f"table_{t2._t.id}_segments")
    assert b"ffffffff_9999" not in set(b2.keys())
    assert t2.count() == want + 10
    db2.close()


def test_torn_wal_tail_recovers(tmp_path):
    """A crash mid-append leaves a torn tail record; open must truncate
    it (RecoveryMode.TRUNCATE), not raise."""
    db = knox.create_database("torn", driver="file", path=str(tmp_path),
                              pack_size=256, background_merge=False)
    t = db.create_table(Rw)
    t.insert([Rw(v=i) for i in range(100)])
    db.close()

    # corrupt: append half a record header to the newest WAL segment
    import glob
    segs = sorted(glob.glob(str(tmp_path) + "/**/wal_*.seg",
                            recursive=True))
    assert segs
    with open(segs[-1], "ab") as fh:
        fh.write(b"\x01\x00\xde\xad\xbe")      # short torn header

    db2 = knox.open_database("torn", driver="file", path=str(tmp_path),
                             background_merge=False)
    assert db2.table("rw").count() == 100
    # and the db remains writable after truncation
    db2.table("rw").insert([Rw(v=777)])
    assert db2.table("rw").count() == 101
    db2.close()


def test_pack_size_validated(tmp_path):
    db = knox.create_database("ps", driver="mem")
    with pytest.raises(ValueError):
        db.create_table(Rw, pack_size=100)     # not a power of two
    with pytest.raises(ValueError):
        db.create_table(Rw, pack_size=16)      # < 32
    db.close()


def test_journal_mixed_dtype_chunks_stay_exact():
    """int64+uint64 chunk mix must NOT promote to float64 (review
    r2-cont: np.concatenate would silently destroy 2^63+5)."""
    import numpy as np
    from knoxdb_tpu.pack.journal import Journal
    from knoxdb_tpu.schema.schema import Builder
    from knoxdb_tpu.types import FieldType, Snapshot
    sch = (Builder("j").pk("id").add("v", FieldType.UINT64).finish())
    j = Journal(sch.with_meta() if hasattr(sch, "with_meta") else sch)
    big = (1 << 63) + 5
    names = [f.name for f in j.schema.fields]
    row1 = {n: np.array([big], np.uint64) for n in names}
    row2 = {n: np.array([7], np.int64) for n in names}
    j.insert(1, np.array([1], np.uint64), row1)
    j.insert(2, np.array([2], np.uint64), row2)
    j.commit(1)
    j.commit(2)
    snap = Snapshot(xown=0, xmin=0, xmax=0, xact=frozenset())
    data, rids = j.visible_rows(snap)
    assert int(data["v"][0]) == big          # exact, not 9.22e18
    assert int(data["v"][1]) == 7


def test_in_filter_accepts_set_and_tuple():
    """IN values may arrive as any iterable (regression: vectorized
    bind broke sets)."""
    db = knox.create_database("inset", driver="mem", pack_size=256,
                              background_merge=False)
    t = db.create_table(Rw)
    import numpy as np
    t.insert({"id": np.zeros(10, np.uint64),
              "v": np.arange(10, dtype=np.int64)})
    t.merge()
    assert t.query().where(v__in={1, 3, 5}).count() == 3
    assert t.query().where(v__in=(2, 4)).count() == 2
    db.close()
