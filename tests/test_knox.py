"""SDK + engine end-to-end: insert/query/update/delete/merge/recovery.

Models the reference workload scenarios
(/root/reference/internal/tests/scenarios/workload{1..5}_test.go)."""

import dataclasses
from dataclasses import dataclass

import numpy as np
import pytest

import knoxdb_tpu.knox as knox
from knoxdb_tpu.types import FieldType


@dataclass
class Account:
    id: int = 0
    balance: int = 0
    kind: int = 0


@pytest.fixture
def db(tmp_path):
    d = knox.create_database("t", driver="file", path=str(tmp_path),
                             pack_size=256, journal_size=1 << 20,
                             background_merge=False)
    yield d
    d.close()


def test_insert_query_roundtrip(db):
    acc = db.create_table(Account)
    rows = [Account(balance=i * 10, kind=i % 3) for i in range(1, 501)]
    pks = acc.insert(rows)
    assert len(pks) == 500 and pks[0] == 1

    assert acc.count() == 500
    q = acc.query().where(knox.F("balance") > 2500)
    want = sum(1 for r in rows if r.balance > 2500)
    assert q.count() == want
    assert q.sum("balance") == sum(r.balance for r in rows if r.balance > 2500)

    got = acc.query().where(kind=1).limit(5).execute()
    assert len(got) == 5
    assert all(isinstance(g, Account) and g.kind == 1 for g in got)


def test_merge_then_query(db):
    acc = db.create_table(Account)
    rows = [Account(balance=i, kind=i % 5) for i in range(1, 2001)]
    acc.insert(rows)
    acc.merge()
    assert acc._t.journal.is_empty()
    assert len(acc._t.segments) == 1
    assert acc.count() == 2000
    assert acc.query().where(knox.F("balance").between(100, 200)).count() == 101
    # mixed: segment + journal rows
    acc.insert([Account(balance=10**6)])
    assert acc.query().where(knox.F("balance") >= 10**6).count() == 1
    assert acc.count() == 2001


def test_update_delete_visibility(db):
    acc = db.create_table(Account)
    acc.insert([Account(balance=100), Account(balance=200),
                Account(balance=300)])
    acc.merge()
    # update pk 2
    acc.update([Account(id=2, balance=999)])
    assert acc.query().where(id=2).execute()[0].balance == 999
    assert acc.count() == 3
    # delete pk 1 (still in segments -> exclude mask path)
    n = acc.delete(acc.query().where(id=1))
    assert n == 1
    assert acc.count() == 2
    assert acc.query().where(id=1).count() == 0
    # merge applies tombstones physically
    acc.merge()
    assert acc.count() == 2
    assert sorted(r.balance for r in acc.query().execute()) == [300, 999]


def test_get_point_lookup(db):
    acc = db.create_table(Account)
    acc.insert([Account(balance=5), Account(balance=6)])
    assert acc.get(2).balance == 6
    assert acc.get(999) is None


def test_tx_abort(db):
    acc = db.create_table(Account)
    acc.insert([Account(balance=1)])
    tx = db.begin()
    acc.insert([Account(balance=2)], tx=tx)
    tx.abort()
    assert acc.count() == 1


def test_tx_isolation_snapshot(db):
    acc = db.create_table(Account)
    acc.insert([Account(balance=1)])
    tx = db.begin()           # writer with uncommitted insert
    acc.insert([Account(balance=2)], tx=tx)
    # a concurrent reader must not see the uncommitted row
    assert acc.count() == 1
    tx.commit()
    assert acc.count() == 2


def test_persistence_recovery(tmp_path):
    d1 = knox.create_database("t", driver="file", path=str(tmp_path),
                              pack_size=256, background_merge=False)
    acc = d1.create_table(Account)
    acc.insert([Account(balance=i) for i in range(1, 101)])
    acc.merge()                        # sealed segment persisted
    acc.insert([Account(balance=777)])  # journal-only row (WAL replay)
    d1.close()

    d2 = knox.open_database("t", driver="file", path=str(tmp_path),
                            background_merge=False)
    acc2 = d2.table("account", Account)
    assert acc2.count() == 101
    assert acc2.query().where(knox.F("balance") == 777).count() == 1
    # counters restored: next insert gets a fresh pk
    pks = acc2.insert([Account(balance=1234)])
    assert pks[0] == 102
    d2.close()


def test_wide_decimal_column(db):
    sch = (knox.Builder("d")
           .pk("id")
           .add("amount", FieldType.DECIMAL128, scale=6)
           .finish())
    t = db.create_table(sch)
    vals = [123456789 * 10**6 + i for i in range(50)]
    t.insert({"id": np.zeros(50, np.uint64), "amount": vals})
    assert t.count() == 50
    got = t.query().where(knox.cond("amount", "ge", vals[40])).count()
    assert got == 10
    assert t.query().sum("amount") == sum(vals) / 10**6


def test_delay_sync_mode(tmp_path):
    d = knox.create_database("dl", driver="file", path=str(tmp_path / "dl"),
                             wal_sync="delay", background_merge=False)
    acc = d.create_table(Account)
    acc.insert([Account(balance=i) for i in range(50)])
    assert acc.count() == 50
    d.close()
    d2 = knox.open_database("dl", driver="file", path=str(tmp_path / "dl"),
                            background_merge=False)
    assert d2.table("account").count() == 50
    d2.close()


def test_device_cache_eviction(tmp_path):
    d = knox.create_database("cv", driver="mem", pack_size=256,
                             background_merge=False,
                             device_cache_bytes=1)
    acc = d.create_table(Account)
    acc._t.MIN_MERGE_TAIL = 0     # keep tail segments distinct
    # several small segments by merging between inserts
    for r in range(4):
        acc.insert([Account(balance=r * 1000 + i) for i in range(300)])
        acc.merge()
    assert len(acc._t.segments) >= 2
    assert acc.count() == 1200
    # queries touch every segment; tiny budget forces evictions
    for _ in range(3):
        assert acc.query().where(knox.F("balance") >= 0).count() == 1200
    cm = d.engine.cache
    assert cm.evictions > 0
    # evicted segments still answer correctly (re-upload)
    assert acc.query().where(knox.F("balance") < 1000).count() == 300
    d.close()


def test_stream_batches_incremental(rng):
    """Streaming pull path: batches concat == full rows(); bounded
    window sizes; limit respected (reference operator pipeline)."""
    import numpy as np
    import knoxdb_tpu.knox as knox
    from dataclasses import dataclass

    @dataclass
    class S:
        id: int = 0
        k: int = 0
        v: int = 0

    db = knox.create_database("stream", driver="mem", pack_size=256,
                              background_merge=False)
    t = db.create_table(S)
    n = 5000
    k = rng.integers(0, 100, n)
    v = rng.integers(-10**6, 10**6, n)
    t.insert({"id": np.zeros(n, np.uint64), "k": k, "v": v})
    t.merge()
    t.insert([S(k=50, v=777)])          # journal overlay row

    q = lambda: db.table("s").query().where(k__ge=50).select("k", "v")
    full = q().rows()
    batches = list(q().stream_batches(batch_packs=4))
    assert len(batches) > 1             # actually incremental
    got_k = np.concatenate([b["k"] for b in batches])
    got_v = np.concatenate([b["v"] for b in batches])
    assert sorted(got_k.tolist()) == sorted(np.asarray(full["k"]).tolist())
    assert sorted(got_v.tolist()) == sorted(np.asarray(full["v"]).tolist())
    for b in batches[:-1]:              # window bound: 4 packs * 256
        assert len(b["k"]) <= 4 * 256
    # limit via stream()
    seen = []
    cnt = q().limit(10).stream(lambda r: seen.append(r))
    assert cnt == 10 and len(seen) == 10
    db.close()


def test_import_union_describe(rng, tmp_path):
    """Reference pipeline operators: table_import (streaming CSV),
    union (streamed UNION ALL), describe."""
    import io
    import knoxdb_tpu.knox as knox
    from dataclasses import dataclass

    @dataclass
    class U:
        id: int = 0
        k: int = 0
        v: int = 0

    db = knox.create_database("ops", driver="mem", pack_size=256,
                              background_merge=False)
    ta = db.create_table(U)
    # import: csv with shuffled column order + extra column
    n = 700
    lines = ["v,junk,k,id"]
    for i in range(n):
        lines.append(f"{i * 3},x,{i % 5},0")
    got = ta.import_csv(io.StringIO("\n".join(lines)), batch_rows=100)
    assert got == n
    assert ta.count() == n
    assert ta.query().sum("v") == sum(i * 3 for i in range(n))
    ta.merge()

    # union: same-schema queries stream back in order
    q1 = ta.query().where(k=1).select("k", "v")
    q2 = ta.query().where(k=2).select("k", "v")
    ks = []
    for b in knox.union(q1, q2, batch_packs=1):
        ks.extend(int(x) for x in b["k"])
    n1 = ta.query().where(k=1).count()
    assert ks[:n1] == [1] * n1 and set(ks[n1:]) == {2}
    assert len(ks) == n1 + ta.query().where(k=2).count()

    d = db.describe("u")
    assert d["rows"] == n and d["segments"] == 1
    assert any(f["name"] == "k" for f in d["fields"])
    assert d["fields"][0]["pk"] is True
    db.close()


def test_truncate_table(rng, tmp_path):
    """TruncateTable parity: all rows gone, schema/indexes stay,
    survives reopen (crash-safe like merge)."""
    import knoxdb_tpu.knox as knox
    from dataclasses import dataclass

    @dataclass
    class TR:
        id: int = 0
        k: int = 0

    db = knox.create_database("trunc", driver="file",
                              path=str(tmp_path), pack_size=256,
                              background_merge=False)
    t = db.create_table(TR)
    t.create_index(["k"], kind="int")
    t.insert({"id": np.zeros(500, np.uint64),
              "k": rng.integers(0, 50, 500)})
    t.merge()
    t.insert([TR(k=7)])                      # journal rows too
    assert t.count() == 501
    t.truncate()
    assert t.count() == 0
    assert t.query().where(k__ge=0).count() == 0
    t.insert([TR(k=1)])                      # still writable, index alive
    assert t.query().where(k=1).count() == 1
    db.close()
    db2 = knox.open_database("trunc", driver="file", path=str(tmp_path),
                             background_merge=False)
    assert db2.table("tr").count() == 1      # truncation is durable
    db2.close()


def test_filter_mode_aliases(db):
    """cond() accepts the long-form mode names _KW_OPS already accepted;
    unknown names raise instead of silently binding INVALID (which used
    to crash later with an unrelated broadcast error)."""
    import pytest

    from knoxdb_tpu.types import FilterMode, parse_filter_mode

    assert parse_filter_mode("range") == FilterMode.RANGE
    assert parse_filter_mode("rg") == FilterMode.RANGE
    assert parse_filter_mode("nin") == FilterMode.NOT_IN
    assert parse_filter_mode("NIN") == FilterMode.NOT_IN
    with pytest.raises(ValueError, match="unknown filter mode"):
        parse_filter_mode("between")

    t = db.create_table(Account)
    t.insert([Account(balance=i, kind=0) for i in range(100)])
    t.merge()
    n = t.query().where(knox.cond("balance", "range", (10, 20))).count()
    assert n == 11
