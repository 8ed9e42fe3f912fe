"""Engine-integrated SPMD execution (VERDICT round-2 item #1): a knox
Query (filter tree + count/sum/min/max + group-by) over the 8-device
virtual mesh returns BIT-IDENTICAL results to single-device execution.
"""

from dataclasses import dataclass

import jax
import numpy as np
import pytest

import knoxdb_tpu.knox as knox
from knoxdb_tpu.knox import F
from knoxdb_tpu.parallel.engine_spmd import ShardedScanner
from knoxdb_tpu.parallel.shard import make_mesh

pytestmark = pytest.mark.slow  # full tier only (see pytest.ini)


@dataclass
class Row:
    id: int = 0
    val: int = 0          # uint-ish narrow
    bal: int = 0          # signed
    grp: int = 0          # small-cardinality group key
    px: float = 0.0       # ALP-encodable float


def _fill(t, n, rng):
    t.insert({
        "id": np.zeros(n, np.uint64),
        "val": rng.integers(0, 50_000, n),
        "bal": rng.integers(-1 << 40, 1 << 40, n),
        "grp": rng.integers(0, 20, n),
        "px": rng.integers(-10**6, 10**6, n) / 100.0,
    })


def _mk(tmp_path, name, mesh, n=20_000, rng=None):
    db = knox.create_database(name, driver="mem", pack_size=512,
                              background_merge=False, mesh=mesh)
    t = db.create_table(Row)
    _fill(t, n, rng or np.random.default_rng(7))
    t.merge()
    return db, t


@pytest.fixture(scope="module")
def pair():
    mesh = make_mesh(8)
    rng1 = np.random.default_rng(7)
    rng2 = np.random.default_rng(7)
    db_s, t_s = _mk(None, "spmd_s", None, rng=rng1)
    db_m, t_m = _mk(None, "spmd_m", mesh, rng=rng2)
    yield t_s, t_m
    db_s.close()
    db_m.close()


def test_sharded_scanner_selected(pair):
    _t_s, t_m = pair
    h = t_m._t.segments[0]
    assert isinstance(h.scanner_(), ShardedScanner)


def test_count_filters(pair):
    t_s, t_m = pair
    for q in [
        lambda t: t.query().where(F("val") > 25_000),
        lambda t: t.query().where(F("val").between(100, 10_000),
                                  F("bal") > 0),
        lambda t: t.query().where(F("grp").in_([1, 5, 19])),
        lambda t: t.query().or_where(F("val") < 50, F("val") > 49_000),
        lambda t: t.query().where(F("px") > 5000.0, F("px") <= 9000.25),
        lambda t: t.query().where(F("bal") != 0),
    ]:
        assert q(t_m).count() == q(t_s).count()


def test_aggregates_bit_identical(pair):
    t_s, t_m = pair
    for q in [
        lambda t: t.query().where(F("val") > 1000),
        lambda t: t.query(),
        lambda t: t.query().where(F("grp") <= 7),
    ]:
        a = q(t_s).aggregate(("count", ""), ("sum", "bal"),
                             ("min", "bal"), ("max", "val"))
        b = q(t_m).aggregate(("count", ""), ("sum", "bal"),
                             ("min", "bal"), ("max", "val"))
        assert a == b


def test_float_sum_identical(pair):
    t_s, t_m = pair
    # ALP packs produce exact rational sums on both paths
    a = t_s.query().where(F("px") > 0.0).sum("px")
    b = t_m.query().where(F("px") > 0.0).sum("px")
    assert a == b


def test_group_by_identical(pair):
    t_s, t_m = pair
    ga = t_s.query().where(F("val") > 500).group_by("grp").aggregate(
        ("count", ""), ("sum", "bal"), ("min", "bal"), ("max", "bal"))
    gb = t_m.query().where(F("val") > 500).group_by("grp").aggregate(
        ("count", ""), ("sum", "bal"), ("min", "bal"), ("max", "bal"))
    np.testing.assert_array_equal(ga["keys"], gb["keys"])
    np.testing.assert_array_equal(ga["count"], gb["count"])
    for k in ga:
        if isinstance(k, tuple):
            np.testing.assert_array_equal(ga[k], gb[k])


def test_projection_rows_identical(pair):
    t_s, t_m = pair
    ra = t_s.query().where(F("val") < 300).select("val", "bal").rows()
    rb = t_m.query().where(F("val") < 300).select("val", "bal").rows()
    # same multiset (pack padding can reorder across shard boundaries)
    for k in ("val", "bal"):
        np.testing.assert_array_equal(np.sort(np.asarray(ra[k])),
                                      np.sort(np.asarray(rb[k])))


def test_journal_and_deletes_identical(pair):
    t_s, t_m = pair
    extra = {
        "id": np.zeros(500, np.uint64),
        "val": np.arange(500) + 100_000,
        "bal": np.arange(500) - 250,
        "grp": np.arange(500) % 20,
        "px": np.arange(500) / 10.0,
    }
    t_s.insert(dict(extra))
    t_m.insert(dict(extra))
    t_s.delete(t_s.query().where(F("val").between(100_100, 100_199)))
    t_m.delete(t_m.query().where(F("val").between(100_100, 100_199)))
    assert t_s.count() == t_m.count()
    a = t_s.query().where(F("bal") < 0).aggregate(("count", ""),
                                                  ("sum", "bal"))
    b = t_m.query().where(F("bal") < 0).aggregate(("count", ""),
                                                  ("sum", "bal"))
    assert a == b
    # merge the journal on both and re-check
    t_s.merge()
    t_m.merge()
    assert t_s.count() == t_m.count()


def test_wide_int128_identical():
    @dataclass
    class WRow:
        id: int = 0
        amt: object = 0     # int128 via field typing

    from knoxdb_tpu.schema.schema import Builder
    from knoxdb_tpu.types import FieldType
    mesh = make_mesh(8)
    rng = np.random.default_rng(3)
    sch = (Builder("wt").pk("id").add("amt", FieldType.INT128).finish())
    vals = [int(v) * (10**25 // 7) for v in rng.integers(-10**6, 10**6, 3000)]

    out = {}
    for nm, m in (("s", None), ("m", mesh)):
        db = knox.create_database(f"wide_{nm}", driver="mem", pack_size=256,
                                  background_merge=False, mesh=m)
        t = db.create_table(sch)
        t.insert({"id": np.zeros(len(vals), np.uint64), "amt": vals})
        t.merge()
        q = t.query().where(F("amt") > 0)
        out[nm] = (q.count(), q.sum("amt"),
                   t.query().min("amt"), t.query().max("amt"))
        db.close()
    assert out["s"] == out["m"]


def test_strings_identical():
    @dataclass
    class SRow:
        id: int = 0
        name: str = ""

    mesh = make_mesh(8)
    rng = np.random.default_rng(5)
    names = [f"acct-{i % 97:03d}" for i in range(5000)]
    out = {}
    for nm, m in (("s", None), ("m", mesh)):
        db = knox.create_database(f"str_{nm}", driver="mem", pack_size=256,
                                  background_merge=False, mesh=m)
        t = db.create_table(SRow)
        t.insert({"id": np.zeros(len(names), np.uint64), "name": names})
        t.merge()
        out[nm] = (
            t.query().where(F("name") == "acct-042").count(),
            t.query().where(F("name") >= "acct-090").count(),
            t.query().where(F("name").in_(["acct-001", "acct-096"])).count(),
        )
        db.close()
    assert out["s"] == out["m"]


def test_distributed_engine_join_1m():
    """VERDICT #2 done-criterion: inner join of two engine tables over
    the mesh matches the join_keys_np oracle at 1M+ rows."""
    from knoxdb_tpu.exec.join import join_keys_np
    from knoxdb_tpu.schema.schema import Builder
    from knoxdb_tpu.types import FieldType, JoinType

    mesh = make_mesh(8)
    rng = np.random.default_rng(11)
    na, nt = 10_000, 1_050_000
    accts_s = (Builder("xa").pk("id").add("code", FieldType.UINT64)
               .finish())
    txns_s = (Builder("xt").pk("id").add("acct", FieldType.UINT64)
              .add("amt", FieldType.INT64).finish())
    db = knox.create_database("dj1m", driver="mem", pack_size=1 << 13,
                              background_merge=False, mesh=mesh)
    accts = db.create_table(accts_s)
    txns = db.create_table(txns_s)
    accts.insert({"id": np.zeros(na, np.uint64),
                  "code": np.arange(na, dtype=np.uint64) * 3})
    aid = rng.integers(1, na * 2, nt).astype(np.uint64)   # ~50% match
    amt = rng.integers(-100, 100, nt)
    txns.insert({"id": np.zeros(nt, np.uint64), "acct": aid, "amt": amt})
    accts.merge()
    txns.merge()

    out = knox.join(txns.query().where(F("amt") > 90),
                    accts.query(), on=("acct", "id"))
    m = amt > 90
    oracle = join_keys_np(aid[m],
                          np.arange(1, na + 1, dtype=np.uint64),
                          JoinType.INNER)
    assert out["__n"] == oracle.n
    got = sorted((int(a), int(c)) for a, c in zip(out["amt"], out["code"]))
    want = sorted((int(a), int(k - 1) * 3)
                  for a, k in zip(amt[m], aid[m]) if k <= na)
    assert got == want
    db.close()


def test_group_by_high_cardinality_factored_mxu(tmp_path):
    """G >= _MXU_FACTORED_MIN_G routes through the two-level factored
    MXU kernel — must compile under shard_map and stay bit-identical to
    single-device (the low-G tests never reach that kernel)."""
    from knoxdb_tpu.exec import groupby as GB

    @dataclass
    class HG:
        id: int = 0
        g: int = 0
        v: int = 0

    G = max(1000, GB._MXU_FACTORED_MIN_G + 8)
    rng1 = np.random.default_rng(11)
    rng2 = np.random.default_rng(11)
    out = []
    for name, mesh in (("hg_s", None), ("hg_m", make_mesh(8))):
        rng = rng1 if mesh is None else rng2
        db = knox.create_database(name, driver="mem", pack_size=512,
                                  background_merge=False, mesh=mesh)
        t = db.create_table(HG)
        n = 16_000
        t.insert({"id": np.zeros(n, np.uint64),
                  "g": rng.integers(0, G, n),
                  "v": rng.integers(-1 << 40, 1 << 40, n)})
        t.merge()
        # count/sum only -> MXU path -> factored kernel at this G
        out.append(t.query().where(F("v") != 0).group_by("g")
                   .aggregate(("count", ""), ("sum", "v")))
        db.close()
    ga, gb = out
    np.testing.assert_array_equal(ga["keys"], gb["keys"])
    np.testing.assert_array_equal(ga["count"], gb["count"])
    np.testing.assert_array_equal(np.asarray(ga[("sum", "v")], object),
                                  np.asarray(gb[("sum", "v")], object))
