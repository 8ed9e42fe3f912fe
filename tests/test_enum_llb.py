"""Enum registry, LLB cardinality, count-distinct, query stats."""

from dataclasses import dataclass

import numpy as np
import pytest

import knoxdb_tpu.knox as knox
from knoxdb_tpu.filter.llb import LLB
from knoxdb_tpu.schema.schema import Builder, field_meta
from knoxdb_tpu.types import FieldType


@pytest.fixture
def db():
    d = knox.create_database("e", driver="mem", pack_size=256,
                             background_merge=False)
    yield d
    d.close()


import dataclasses


@dataclasses.dataclass
class Order2:
    id: int = 0
    status: str = dataclasses.field(
        default="", metadata=field_meta(enum="status"))
    amount: int = 0


def test_enum_roundtrip(db):
    db.create_enum("status", ["new", "paid", "shipped", "void"])
    t = db.create_table(Order2)
    t.insert([Order2(status="new", amount=5),
              Order2(status="paid", amount=10),
              Order2(status="paid", amount=20)])
    assert t.query().where(knox.cond("status", "eq", "paid")).count() == 2
    assert t.query().where(
        knox.cond("status", "in", ["new", "void"])).count() == 1
    rows = t.query().select("status", "amount").rows()
    assert list(rows["status"]) == ["new", "paid", "paid"]
    # unknown enum value raises
    with pytest.raises(KeyError):
        t.insert([Order2(status="bogus")])


def test_enum_persistence(tmp_path):
    d = knox.create_database("e", driver="file", path=str(tmp_path),
                             background_merge=False)
    d.create_enum("status", ["a", "b"])
    t = d.create_table(Order2)
    t.insert([Order2(status="b")])
    d.close()
    d2 = knox.open_database("e", driver="file", path=str(tmp_path),
                            background_merge=False)
    t2 = d2.table("order2")
    assert t2.query().where(knox.cond("status", "eq", "b")).count() == 1
    d2.close()


def test_llb_accuracy(rng):
    for true_card in (100, 5000, 200000):
        keys = rng.integers(0, true_card, true_card * 3, dtype=np.uint64)
        actual = len(np.unique(keys))
        sk = LLB()
        sk.add_keys64(keys)
        est = sk.cardinality()
        assert abs(est - actual) / actual < 0.05, (true_card, est, actual)


def test_llb_merge(rng):
    a = rng.integers(0, 10000, 20000, dtype=np.uint64)
    b = rng.integers(5000, 15000, 20000, dtype=np.uint64)
    s1, s2 = LLB(), LLB()
    s1.add_keys64(a)
    s2.add_keys64(b)
    merged = s1.merge(s2)
    actual = len(np.unique(np.concatenate([a, b])))
    assert abs(merged.cardinality() - actual) / actual < 0.05


def test_count_distinct(db, rng):
    sch = Builder("t").pk("id").add("v", FieldType.UINT32).finish()
    t = db.create_table(sch)
    v = rng.integers(0, 200, 3000).astype(np.uint32)
    t.insert({"id": np.zeros(3000, np.uint64), "v": v})
    t.merge()
    assert t.query().count_distinct("v") == len(np.unique(v))
    approx = t.query().count_distinct("v", exact=False)
    assert abs(approx - len(np.unique(v))) <= 10


def test_query_stats(db, rng):
    sch = Builder("t").pk("id").add("v", FieldType.UINT32).finish()
    t = db.create_table(sch)
    t.insert({"id": np.zeros(1000, np.uint64),
              "v": rng.integers(0, 100, 1000).astype(np.uint32)})
    t.merge()
    with db.begin(read_only=True) as tx:
        res = t._t.query(tx.snapshot, None)
    assert res.stats["total_time"] > 0
    assert res.stats["packs_scanned"] > 0
    assert "scan_time" in res.stats and "journal_time" in res.stats
