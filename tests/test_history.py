"""History table kind: dying row versions archived with $del_xid
(reference registers kinds 'pack' and 'history', table.go:27-30)."""

from dataclasses import dataclass

import numpy as np
import pytest

import knoxdb_tpu.knox as knox


@dataclass
class Acct:
    id: int = 0
    balance: int = 0


def test_history_on_update_and_delete(tmp_path):
    db = knox.create_database("h", driver="file", path=str(tmp_path),
                              pack_size=256, background_merge=False,
                              )
    t = db.create_table(Acct, history=True)
    t.insert([Acct(balance=100), Acct(balance=200), Acct(balance=300)])
    t.merge()

    t.update([Acct(id=2, balance=250)])
    t.update([Acct(id=2, balance=299)])
    n = t.delete(t.query().where(id=1))
    assert n == 1

    hist = t.history()
    rows = hist.query().select("id", "balance", "$del_xid").rows()
    got = sorted((int(i), int(b)) for i, b in zip(rows["id"], rows["balance"]))
    # versions archived: pk2@200 (first update), pk2@250 (second), pk1@100
    assert got == [(1, 100), (2, 200), (2, 250)]
    assert all(int(x) > 0 for x in rows["$del_xid"])

    # live table unaffected
    assert t.count() == 2
    assert t.query().where(id=2).execute()[0].balance == 299

    # survives merge + reopen
    t.merge()
    hist.merge()
    db.close()
    db2 = knox.open_database("h", driver="file", path=str(tmp_path),
                             background_merge=False)
    t2 = db2.table("acct")
    assert t2._t.history_enabled
    h2 = db2.table("acct_history")
    assert h2.count() == 3
    # further updates keep archiving after reopen
    t2.update([Acct(id=3, balance=301)])
    assert db2.table("acct_history").count() == 4
    db2.close()
