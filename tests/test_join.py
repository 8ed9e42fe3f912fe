"""Join tests vs numpy oracle (reference internal/operator/join semantics;
hash join EXCEEDS reference which left it TODO, join.go:825)."""

from dataclasses import dataclass

import numpy as np
import pytest

import knoxdb_tpu.knox as knox
from knoxdb_tpu.exec.join import join_keys_np
from knoxdb_tpu.types import JoinType


def test_join_keys_inner_dups():
    lk = np.array([5, 1, 7, 5, 9], np.uint64)
    rk = np.array([5, 5, 1, 3], np.uint64)
    r = join_keys_np(lk, rk, JoinType.INNER)
    pairs = sorted(zip(r.lidx.tolist(), r.ridx.tolist()))
    want = sorted([(0, 0), (0, 1), (1, 2), (3, 0), (3, 1)])
    assert pairs == want


def test_join_keys_outer():
    lk = np.array([1, 2], np.uint64)
    rk = np.array([2, 3], np.uint64)
    left = join_keys_np(lk, rk, JoinType.LEFT)
    assert (left.lidx.tolist(), left.ridx.tolist()) == ([0, 1], [-1, 0])
    full = join_keys_np(lk, rk, JoinType.FULL)
    assert sorted(zip(full.lidx.tolist(), full.ridx.tolist())) == \
        [(-1, 1), (0, -1), (1, 0)]


@dataclass
class Account:
    id: int = 0
    name_code: int = 0


@dataclass
class Txn:
    id: int = 0
    acct: int = 0
    amount: int = 0


@pytest.fixture
def db():
    d = knox.create_database("j", driver="mem", pack_size=256,
                             background_merge=False)
    yield d
    d.close()


def test_table_join(db, rng):
    accts = db.create_table(Account)
    txns = db.create_table(Txn)
    na, nt = 20, 500
    accts.insert([Account(name_code=i * 11) for i in range(na)])
    aid = rng.integers(1, na + 1, nt)
    amt = rng.integers(-1000, 1000, nt)
    txns.insert({"id": np.zeros(nt, np.uint64), "acct": aid, "amount": amt})
    txns.merge()
    accts.merge()

    out = knox.join(txns.query().where(knox.F("amount") > 0),
                    accts.query(),
                    on=("acct", "id"))
    m = amt > 0
    assert out["__n"] == int(m.sum())
    got_codes = np.array([int(v) for v in out["name_code"]])
    want_codes = (aid[m] - 1) * 11
    np.testing.assert_array_equal(got_codes, want_codes)
    got_amt = np.array([int(v) for v in out["amount"]])
    np.testing.assert_array_equal(got_amt, amt[m])


# ------------------------------------------------------- device join path --

def _mk_tables(db, rng, na=50, nt=2000):
    """uint64-keyed pair so the DEVICE join path engages."""
    from knoxdb_tpu.schema.schema import Builder
    from knoxdb_tpu.types import FieldType
    accts_s = (Builder("da").pk("id").add("code", FieldType.UINT64).finish())
    txns_s = (Builder("dt").pk("id").add("acct", FieldType.UINT64)
              .add("amount", FieldType.INT64).finish())
    accts = db.create_table(accts_s)
    txns = db.create_table(txns_s)
    accts.insert({"id": np.zeros(na, np.uint64),
                  "code": np.arange(na, dtype=np.uint64) * 11})
    aid = rng.integers(1, na + 1, nt).astype(np.uint64)
    amt = rng.integers(-1000, 1000, nt)
    txns.insert({"id": np.zeros(nt, np.uint64), "acct": aid, "amount": amt})
    return accts, txns, aid, amt


def test_device_join_inner(db, rng):
    accts, txns, aid, amt = _mk_tables(db, rng)
    accts.merge()
    txns.merge()
    out = knox.join(txns.query().where(knox.F("amount") > 0),
                    accts.query(), on=("acct", "id"))
    m = amt > 0
    assert out["__n"] == int(m.sum())
    got = sorted((int(a), int(c)) for a, c in zip(out["amount"],
                                                  out["code"]))
    want = sorted((int(a), int(k - 1) * 11) for a, k in
                  zip(amt[m], aid[m]))
    assert got == want


def test_device_join_left_and_dups(db, rng):
    accts, txns, aid, amt = _mk_tables(db, rng, na=10, nt=300)
    accts.merge()
    txns.merge()
    # join accounts -> txns: duplicates expand (many txns per account);
    # filter txns so some accounts miss -> LEFT emits None
    out = knox.join(accts.query(),
                    txns.query().where(knox.F("amount") > 900),
                    on=("id", "acct"), how="left")
    m = amt > 900
    hits = {}
    for a, v in zip(aid[m], amt[m]):
        hits.setdefault(int(a), []).append(int(v))
    n_want = sum(max(len(v), 1) for v in
                 (hits.get(i, []) for i in range(1, 11)))
    assert out["__n"] == n_want
    miss = sum(1 for v in out["amount"] if v is None)
    assert miss == sum(1 for i in range(1, 11) if i not in hits)


def test_join_select_projection(db, rng):
    """join(select=...) keeps only the named output columns."""
    accts, txns, aid, amt = _mk_tables(db, rng, na=10, nt=100)
    accts.merge()
    txns.merge()
    out = knox.join(txns.query(), accts.query(), on=("acct", "id"),
                    select=("amount", "code"))
    assert set(out) == {"amount", "code", "__n"}
    with pytest.raises(KeyError):
        knox.join(txns.query(), accts.query(), on=("acct", "id"),
                  select=("nope",))


def test_post_join_where_and_limit(db, rng):
    """r5 post-join predicate + output limit (reference
    join.go:490-503): device path, predicates spanning both sides,
    LEFT-join None semantics (misses fail every predicate), limit with
    and without where, and select= interplay."""
    accts, txns, aid, amt = _mk_tables(db, rng, na=10, nt=400)
    accts.merge()
    txns.merge()
    # inner join + both-side predicate
    out = knox.join(txns.query(), accts.query(), on=("acct", "id"),
                    where=[knox.F("amount") > 0, knox.F("code") >= 33])
    m = (amt > 0) & ((aid - 1) * 11 >= 33)
    assert out["__n"] == int(m.sum())
    got = sorted((int(a), int(c)) for a, c in zip(out["amount"],
                                                  out["code"]))
    want = sorted((int(a), int(k - 1) * 11) for a, k in
                  zip(amt[m], aid[m]))
    assert got == want
    # OR combo + limit caps output
    out2 = knox.join(txns.query(), accts.query(), on=("acct", "id"),
                     where=("or", knox.F("amount") > 900,
                            knox.F("amount") < -900), limit=5)
    n_all = int(((amt > 900) | (amt < -900)).sum())
    assert out2["__n"] == min(5, n_all)
    assert all(int(v) > 900 or int(v) < -900 for v in out2["amount"])
    # limit without where
    out3 = knox.join(txns.query(), accts.query(), on=("acct", "id"),
                     limit=7)
    assert out3["__n"] == 7 and len(out3["amount"]) == 7
    # LEFT join: predicate on the RIGHT side drops miss rows (NULL
    # fails every predicate, incl. NE)
    out4 = knox.join(accts.query(),
                     txns.query().where(knox.F("amount") > 900),
                     on=("id", "acct"), how="left",
                     where=knox.F("amount") != 12345)
    assert all(v is not None for v in out4["amount"])
    m9 = amt > 900
    assert out4["__n"] == int(m9.sum())
    # predicate column NOT in select= still filters; output pruned
    out5 = knox.join(txns.query(), accts.query(), on=("acct", "id"),
                     select=("code",), where=knox.F("amount") > 0)
    assert set(out5) == {"code", "__n"}
    assert out5["__n"] == int((amt > 0).sum())
    # unknown predicate column raises
    with pytest.raises(KeyError):
        knox.join(txns.query(), accts.query(), on=("acct", "id"),
                  where=knox.F("nope") == 1)


def test_post_join_where_host_path(db, rng):
    """Host join path (FULL join) honors where + limit with the same
    NULL semantics."""
    accts, txns, aid, amt = _mk_tables(db, rng, na=10, nt=200)
    accts.merge()
    txns.merge()
    out = knox.join(accts.query(),
                    txns.query().where(knox.F("amount") > 800),
                    on=("id", "acct"), how="full",
                    where=knox.F("amount") > 900)
    m = amt > 900
    assert out["__n"] == int(m.sum())
    assert all(int(v) > 900 for v in out["amount"])
    out2 = knox.join(accts.query(), txns.query(), on=("id", "acct"),
                     how="full", limit=3)
    assert out2["__n"] == 3


def test_device_join_journal_overlay(db, rng):
    accts, txns, aid, amt = _mk_tables(db, rng, na=20, nt=400)
    accts.merge()      # accounts sealed; txns stay in the JOURNAL
    out = knox.join(txns.query().where(knox.F("amount") < 0),
                    accts.query(), on=("acct", "id"))
    m = amt < 0
    assert out["__n"] == int(m.sum())
    got = sorted(int(v) for v in out["amount"])
    assert got == sorted(int(v) for v in amt[m])


def test_device_join_no_wholesale_fetch(db, rng):
    """The device path must fetch only matched projections: queried_tuples
    metric counts materialized rows, which must be ~matches not ~table."""
    accts, txns, aid, amt = _mk_tables(db, rng, na=50, nt=5000)
    accts.merge()
    txns.merge()
    before = txns._t.metrics.queried_tuples
    out = knox.join(txns.query().where(knox.F("amount") == 5),
                    accts.query(), on=("acct", "id"))
    m = amt == 5
    fetched = txns._t.metrics.queried_tuples - before
    assert out["__n"] == int(m.sum())
    assert fetched <= int(m.sum()) + 64, (fetched, int(m.sum()))


@pytest.mark.parametrize("na,nb", [(0, 64), (64, 0), (100, 28),
                                   (7, 250), (256, 256), (1, 1)])
def test_merge_sorted_stable_vs_sort(rng, na, nb):
    """Bitonic merge == stable sort on two pre-sorted runs with ties."""
    import jax
    import jax.numpy as jnp
    from knoxdb_tpu.exec.join import merge_sorted_stable
    a = np.sort(rng.integers(0, 40, na)).astype(np.uint32)
    b = np.sort(rng.integers(0, 40, nb)).astype(np.uint32)
    key = np.concatenate([a, b])
    pay = rng.integers(0, 1 << 31, na + nb).astype(np.uint32)
    ks, ps = merge_sorted_stable(na, jnp.asarray(key), jnp.asarray(pay))
    want_k, want_p = jax.lax.sort(
        (jnp.asarray(key), jnp.asarray(pay)), dimension=0, num_keys=1,
        is_stable=True)
    np.testing.assert_array_equal(np.asarray(ks), np.asarray(want_k))
    np.testing.assert_array_equal(np.asarray(ps), np.asarray(want_p))


@pytest.mark.parametrize("how", [JoinType.INNER, JoinType.LEFT])
@pytest.mark.parametrize("nl,nr,krange", [
    (257, 129, 400),     # unique-capable sizes, some probe misses
    (64, 512, 4000),     # sparse matches
    (300, 1, 4),         # single build row
])
def test_join_pairs_core_unique_oracle(rng, how, nl, nr, krange):
    """Unique-build fast core vs host oracle (build keys unique)."""
    import jax.numpy as jnp
    from knoxdb_tpu.exec.join import join_keys_np, join_pairs_core_unique
    rkeys = rng.choice(krange, nr, replace=False).astype(np.uint64)
    lkeys = rng.integers(0, krange, nl, dtype=np.uint64)
    lkeys[0] = krange + 5          # probe miss at index 0
    want = join_keys_np(lkeys, rkeys, how)
    lidx, ridx, total, dups = join_pairs_core_unique(
        jnp.asarray(lkeys), jnp.asarray(rkeys), how)
    assert not bool(dups)
    li = np.asarray(lidx)
    ri = np.asarray(ridx)
    keep = li != -2
    assert int(total) == want.n == int(keep.sum())
    assert sorted(zip(li[keep].tolist(), ri[keep].tolist())) == \
        sorted(zip(want.lidx.tolist(), want.ridx.tolist()))


def test_join_pairs_unique_dup_detection(rng):
    """A duplicated build key must set dup_builds (device fallback)."""
    import jax.numpy as jnp
    from knoxdb_tpu.exec.join import (join_pairs_core_unique,
                                      join_pairs_device)
    rkeys = np.array([3, 7, 7, 9], np.uint64)
    lkeys = np.array([7, 3, 11], np.uint64)
    _, _, _, dups = join_pairs_core_unique(jnp.asarray(lkeys),
                                           jnp.asarray(rkeys))
    assert bool(dups)
    # device wrapper falls back to the general core: full dup expansion
    li, ri = join_pairs_device(jnp.asarray(lkeys), jnp.asarray(rkeys),
                               JoinType.INNER, unique_build=True)
    assert sorted(zip(li.tolist(), ri.tolist())) == \
        [(0, 1), (0, 2), (1, 0)]
    # LEFT fallback: total = sum(max(counts, 1)), miss keeps ridx -1
    li, ri = join_pairs_device(jnp.asarray(lkeys), jnp.asarray(rkeys),
                               JoinType.LEFT, unique_build=True)
    assert sorted(zip(li.tolist(), ri.tolist())) == \
        [(0, 1), (0, 2), (1, 0), (2, -1)]


def test_join_pairs_unique_all_match_and_empty(rng):
    import jax.numpy as jnp
    from knoxdb_tpu.exec.join import join_pairs_core_unique
    rkeys = np.arange(50, dtype=np.uint64)
    lkeys = np.arange(50, dtype=np.uint64)[::-1].copy()
    li, ri, total, dups = join_pairs_core_unique(
        jnp.asarray(lkeys), jnp.asarray(rkeys), JoinType.INNER)
    assert int(total) == 50 and not bool(dups)
    li, ri = np.asarray(li), np.asarray(ri)
    keep = li != -2
    assert int(keep.sum()) == 50
    assert (ri[keep] == 49 - li[keep]).all()
    # no matches at all
    li, ri, total, _ = join_pairs_core_unique(
        jnp.asarray(lkeys + np.uint64(100)), jnp.asarray(rkeys),
        JoinType.LEFT)
    assert int(total) == 50
    li, ri = np.asarray(li), np.asarray(ri)
    keep = li != -2
    assert int(keep.sum()) == 50 and (ri[keep] == -1).all()


@pytest.mark.parametrize("how", [JoinType.INNER, JoinType.LEFT])
@pytest.mark.parametrize("nl,nr,krange", [
    (257, 129, 40),      # heavy dups, ragged sizes
    (64, 512, 1000),     # sparse matches (leading/trailing empty probes)
    (100, 100, 1),       # single key: full cross fanout
])
def test_join_pairs_core_oracle(rng, how, nl, nr, krange):
    """Gather-free join core vs host oracle: pair SETS equal (device
    order is key-clustered, not probe-stable), LEFT misses included."""
    import jax.numpy as jnp
    from knoxdb_tpu.exec.join import (join_count_device, join_pairs_core,
                                      join_keys_np)
    lkeys = rng.integers(0, krange, nl, dtype=np.uint64)
    rkeys = rng.integers(0, krange, nr, dtype=np.uint64)
    lkeys[0] = krange + 5          # probe miss at index 0
    want = join_keys_np(lkeys, rkeys, how)
    total = int(join_count_device(jnp.asarray(lkeys), jnp.asarray(rkeys),
                                  how))
    assert total == want.n
    cap = 1 << max(0, (total - 1).bit_length() + 1)   # slack past total
    lidx, ridx, tot = join_pairs_core(jnp.asarray(lkeys),
                                      jnp.asarray(rkeys), cap, how)
    assert int(tot) == total
    li = np.asarray(lidx)
    ri = np.asarray(ridx)
    keep = li != -2           # r3 contract: pairs interspersed, -2 rest
    assert (ri[~keep] == -2).all()
    li, ri = li[keep], ri[keep]
    assert len(li) == total
    assert sorted(zip(li.tolist(), ri.tolist())) == \
        sorted(zip(want.lidx.tolist(), want.ridx.tolist()))


@pytest.mark.parametrize("how", [JoinType.INNER, JoinType.LEFT])
@pytest.mark.parametrize("nl,nr,krange", [
    (257, 129, 400),     # light dups
    (64, 512, 1000),     # sparse matches
    (100, 73, 40),       # multi-dup runs (spans still <= S)
])
def test_join_pairs_core_shift_oracle(rng, how, nl, nr, krange):
    """r3 shift core vs host oracle: ONE sort + S shifted compares.
    Pair sets equal; maxneed reports the true max run distance."""
    import jax.numpy as jnp
    from knoxdb_tpu.exec.join import join_keys_np, join_pairs_core_shift
    lkeys = rng.integers(0, krange, nl, dtype=np.uint64)
    rkeys = rng.integers(0, krange, nr, dtype=np.uint64)
    lkeys[0] = krange + 5          # probe miss at index 0
    want = join_keys_np(lkeys, rkeys, how)
    lidx, ridx, total, maxneed = join_pairs_core_shift(
        jnp.asarray(lkeys), jnp.asarray(rkeys), S=16, how=how)
    assert int(maxneed) <= 16, "test shapes sized for the fast path"
    li = np.asarray(lidx)
    ri = np.asarray(ridx)
    keep = li != -2
    assert int(total) == want.n == int(keep.sum())
    assert sorted(zip(li[keep].tolist(), ri[keep].tolist())) == \
        sorted(zip(want.lidx.tolist(), want.ridx.tolist()))


def test_join_pairs_shift_overflow_fallback(rng):
    """Key runs spanning > S entries: maxneed flags the undercount and
    join_pairs_device falls back to the expansion core."""
    import jax.numpy as jnp
    from knoxdb_tpu.exec.join import (join_keys_np, join_pairs_core_shift,
                                      join_pairs_device)
    # one key with 30 builds and 10 probes: span 40 > S=16
    lkeys = np.concatenate([np.full(10, 7, np.uint64),
                            rng.integers(100, 200, 50, dtype=np.uint64)])
    rkeys = np.concatenate([np.full(30, 7, np.uint64),
                            rng.integers(100, 200, 50, dtype=np.uint64)])
    _, _, total, maxneed = join_pairs_core_shift(
        jnp.asarray(lkeys), jnp.asarray(rkeys), S=16, how=JoinType.INNER)
    assert int(maxneed) > 16
    assert int(total) < 300        # undercounted — the flag matters
    li, ri = join_pairs_device(jnp.asarray(lkeys), jnp.asarray(rkeys),
                               JoinType.INNER)
    want = join_keys_np(lkeys, rkeys, JoinType.INNER)
    assert sorted(zip(li.tolist(), ri.tolist())) == \
        sorted(zip(want.lidx.tolist(), want.ridx.tolist()))


@pytest.mark.parametrize("core", ["general", "unique", "shift"])
def test_join_keys32_parity(rng, core):
    """keys32=True must agree with keys32=False AND the host oracle —
    including keys at the 2^32-1 boundary (max representable u32)."""
    import jax.numpy as jnp
    from knoxdb_tpu.exec.join import (join_keys_np, join_pairs_core,
                                      join_pairs_core_shift,
                                      join_pairs_core_unique)
    top = (1 << 32) - 1
    if core == "unique":
        rkeys = rng.choice(1 << 20, 200, replace=False).astype(np.uint64)
        rkeys[0] = top
        lkeys = rng.integers(0, 1 << 20, 300, dtype=np.uint64)
        lkeys[:3] = top
        outs = [join_pairs_core_unique(jnp.asarray(lkeys),
                                       jnp.asarray(rkeys),
                                       JoinType.INNER, keys32=k)
                for k in (False, True)]
        assert not bool(outs[0][3]) and not bool(outs[1][3])
    else:
        rkeys = rng.integers(0, 500, 200, dtype=np.uint64)
        lkeys = rng.integers(0, 500, 300, dtype=np.uint64)
        rkeys[:2] = top
        lkeys[:5] = top
        if core == "general":
            outs = [join_pairs_core(jnp.asarray(lkeys), jnp.asarray(rkeys),
                                    1024, JoinType.INNER, keys32=k)
                    for k in (False, True)]
        else:
            outs = [join_pairs_core_shift(jnp.asarray(lkeys),
                                          jnp.asarray(rkeys),
                                          S=16, how=JoinType.INNER,
                                          keys32=k)
                    for k in (False, True)]
    want = join_keys_np(lkeys, rkeys, JoinType.INNER)
    for out in outs:
        li, ri = np.asarray(out[0]), np.asarray(out[1])
        keep = li != -2
        assert int(out[2]) == want.n == int(keep.sum())
        assert sorted(zip(li[keep].tolist(), ri[keep].tolist())) == \
            sorted(zip(want.lidx.tolist(), want.ridx.tolist()))


def test_device_join_uint32_keys32_path(db, rng):
    """UINT32-keyed join rides the keys32 device cores end to end."""
    from knoxdb_tpu.schema.schema import Builder
    from knoxdb_tpu.types import FieldType
    accts_s = (Builder("ka").pk("id").add("id32", FieldType.UINT32)
               .add("code", FieldType.UINT64).finish())
    txns_s = (Builder("kt").pk("id").add("acct", FieldType.UINT32)
              .add("amount", FieldType.INT64).finish())
    accts = db.create_table(accts_s)
    txns = db.create_table(txns_s)
    na, nt = 40, 1200
    accts.insert({"id": np.zeros(na, np.uint64),
                  "id32": np.arange(1, na + 1, dtype=np.uint32),
                  "code": np.arange(na, dtype=np.uint64) * 7})
    aid = rng.integers(1, na + 1, nt).astype(np.uint32)
    amt = rng.integers(-100, 100, nt)
    txns.insert({"id": np.zeros(nt, np.uint64), "acct": aid,
                 "amount": amt})
    accts.merge()
    txns.merge()
    out = knox.join(txns.query().where(knox.F("amount") > 0),
                    accts.query(), on=("acct", "id32"))
    m = amt > 0
    assert out["__n"] == int(m.sum())
    got = sorted((int(a), int(c)) for a, c in zip(out["amount"],
                                                  out["code"]))
    want = sorted((int(a), (int(k) - 1) * 7) for a, k in
                  zip(amt[m], aid[m]))
    assert got == want


def test_post_join_where_review_fixes(db, rng):
    """r5 review regressions: (1) a right-side output column shadowed
    by an UNSELECTED left-schema column filters the RIGHT values on
    both paths; (2) ('not', EQ) agrees with NE on NULL rows (SQL 3VL);
    (3) 'r_X' without a collision raises cleanly; (4) where=[] keeps
    every row."""
    from knoxdb_tpu.schema.schema import Builder
    from knoxdb_tpu.types import FieldType
    # both tables carry a 'score' column; left does NOT select it
    ls = (Builder("wl").pk("id").add("k", FieldType.UINT64)
          .add("score", FieldType.INT64).finish())
    rs = (Builder("wr").pk("id").add("score", FieldType.INT64).finish())
    lt = db.create_table(ls)
    rt = db.create_table(rs)
    nl = 64
    lk = np.arange(1, nl + 1, dtype=np.uint64)
    lt.insert({"id": np.zeros(nl, np.uint64), "k": lk,
               "score": np.full(nl, -5, np.int64)})
    rt.insert({"id": lk, "score": (lk.astype(np.int64) * 10)})
    lt.merge()
    rt.merge()
    # (1) output 'score' is the RIGHT column (no collision with the
    # left SELECTION): predicate must hit right values on both paths
    for how in ("inner", "full"):       # device path, host path
        out = knox.join(lt.query().select("k"), rt.query(),
                        on=("k", "id"), how=how,
                        where=knox.F("score") > 500)
        assert out["__n"] == int((lk * 10 > 500).sum()), how
        assert all(int(v) > 500 for v in out["score"]), how
    # unselected LEFT column still addressable when right has no claim
    out_l = knox.join(lt.query().select("k"), rt.query().select("id"),
                      on=("k", "id"), where=knox.F("score") < 0)
    assert out_l["__n"] == nl            # left score all -5
    # (2) NULL 3VL: LEFT join, not(EQ) == NE on outer-miss rows
    rt2 = db.create_table(
        Builder("wr2").pk("id").add("rv", FieldType.INT64).finish())
    rt2.insert({"id": lk[:8], "rv": np.arange(8, dtype=np.int64)})
    rt2.merge()
    a = knox.join(lt.query().select("k"), rt2.query(), on=("k", "id"),
                  how="left", where=knox.F("rv") != 5)
    b = knox.join(lt.query().select("k"), rt2.query(), on=("k", "id"),
                  how="left", where=("not", knox.F("rv") == 5))
    assert a["__n"] == b["__n"] == 7     # 8 matches minus rv==5; Nones drop
    # (3) bogus r_ prefix raises BEFORE any fetch
    with pytest.raises(KeyError):
        knox.join(lt.query().select("k"), rt2.query(), on=("k", "id"),
                  where=knox.F("r_rv") > 3)
    # (4) empty condition list = no filter
    out_e = knox.join(lt.query().select("k"), rt2.query(),
                      on=("k", "id"), where=[])
    assert out_e["__n"] == 8
