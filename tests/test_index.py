"""Secondary index engine: lookups + rid pushdown correctness
(reference internal/pack/index)."""

from dataclasses import dataclass

import numpy as np
import pytest

import knoxdb_tpu.knox as knox
from knoxdb_tpu.types import IndexType


@dataclass
class Ev:
    id: int = 0
    user: int = 0
    kind: int = 0
    v: int = 0


@pytest.fixture
def db():
    d = knox.create_database("ix", driver="mem", pack_size=256,
                             background_merge=False)
    yield d
    d.close()


def test_index_eq_in_range(db, rng):
    t = db.create_table(Ev)
    n = 3000
    user = rng.integers(1, 500, n)
    kind = rng.integers(0, 5, n)
    v = rng.integers(-100, 100, n)
    t.insert({"id": np.zeros(n, np.uint64), "user": user, "kind": kind,
              "v": v})
    t.merge()
    idx = t.create_index("user", kind="int")
    assert len(idx.rids) == n

    # EQ through the index pushdown path
    got = t.query().where(user=7).count()
    assert got == int((user == 7).sum())
    got = t.query().where(knox.F("user").in_([3, 9, 400])).count()
    assert got == int(np.isin(user, [3, 9, 400]).sum())
    got = t.query().where(knox.F("user").between(10, 20),
                          knox.F("v") > 0).count()
    assert got == int(((user >= 10) & (user <= 20) & (v > 0)).sum())


def test_index_stays_correct_after_updates(db, rng):
    t = db.create_table(Ev)
    t.insert([Ev(user=1, v=10), Ev(user=2, v=20), Ev(user=2, v=30)])
    t.merge()
    t.create_index("user", kind="hash")
    assert t.query().where(user=2).count() == 2
    # journal-resident row is found too (index restricts segments only)
    t.insert([Ev(user=2, v=40)])
    assert t.query().where(user=2).count() == 3
    # delete one matching row -> exclude mask beats the stale index entry
    n = t.delete(t.query().where(knox.F("v") == 20))
    assert n == 1
    assert t.query().where(user=2).count() == 2
    t.merge()   # rebuild applies tombstones + journal
    assert t.query().where(user=2).count() == 2


def test_composite_index_lookup(db, rng):
    t = db.create_table(Ev)
    n = 500
    user = rng.integers(1, 10, n)
    kind = rng.integers(0, 3, n)
    t.insert({"id": np.zeros(n, np.uint64), "user": user, "kind": kind,
              "v": np.zeros(n, np.int64)})
    t.merge()
    idx = t.create_index(["user", "kind"], kind="composite")
    from knoxdb_tpu.exec import oracle as ORC
    ft = t.schema.field("user").type
    ku = int(ORC.column_keys(np.array([4]), ft)[0])
    kk = int(ORC.column_keys(np.array([1]),
                             t.schema.field("kind").type)[0])
    rids = idx.lookup_eq((ku, kk))
    assert len(rids) == int(((user == 4) & (kind == 1)).sum())
