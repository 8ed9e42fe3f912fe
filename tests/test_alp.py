"""ALP float compression: exact round-trip, predicates, aggregates
(reference internal/encode/alp semantics; sums become EXACT rationals)."""

import math
from dataclasses import dataclass

import numpy as np
import pytest

import knoxdb_tpu.knox as knox
from knoxdb_tpu.encode.alp import frac_bounds, try_alp
from knoxdb_tpu.encode.schemes import Scheme


def test_try_alp_roundtrip(rng):
    # price-like data: 2 decimal digits
    vals = rng.integers(-10**7, 10**7, 5000) / 100.0
    got = try_alp(vals)
    assert got is not None
    enc, e = got
    assert e == 2
    np.testing.assert_array_equal(enc / 10.0**e, vals)


def test_try_alp_rejects_noise(rng):
    vals = rng.standard_normal(100)          # full-mantissa noise
    assert try_alp(vals) is None
    assert try_alp(np.array([1.0, np.nan])) is None
    assert try_alp(np.array([np.inf])) is None


def test_frac_bounds():
    fl, ce, integral = frac_bounds(1.5, 1)    # 15 exactly
    assert (fl, ce, integral) == (15, 15, True)
    fl, ce, integral = frac_bounds(1.55, 1)   # 15.5 -> floor 15 ceil 16
    assert (fl, ce, integral) == (15, 16, False)
    # 0.1 is not exactly representable: 0.1*10 != 1 in exact rationals
    fl, ce, integral = frac_bounds(0.1, 2)
    assert fl == 10 and ce == 11 and not integral


@pytest.fixture
def db():
    d = knox.create_database("alp", driver="mem", pack_size=512,
                             background_merge=False)
    yield d
    d.close()


@dataclass
class P:
    id: int = 0
    price: float = 0.0
    qty: int = 0


def test_alp_table_queries(db, rng):
    t = db.create_table(P)
    n = 4000
    price = rng.integers(-10**6, 10**6, n) / 100.0
    qty = rng.integers(1, 50, n)
    t.insert({"id": np.zeros(n, np.uint64), "price": price, "qty": qty})
    t.merge()
    # verify ALP actually engaged
    col = t._t.segments[0].seg.columns["price"]
    assert all(p.scheme == Scheme.ALP for p in col.packs)

    for mode, val in [("gt", 0.0), ("le", -1234.55), ("ge", 999.99),
                      ("eq", float(price[17])), ("eq", 0.005)]:
        got = t.query().where(knox.cond("price", mode, val)).count()
        want = {"gt": (price > val).sum(), "le": (price <= val).sum(),
                "ge": (price >= val).sum(), "eq": (price == val).sum()}[mode]
        assert got == int(want), (mode, val)

    got = t.query().where(knox.F("price").between(-500.25, 500.25)).count()
    assert got == int(((price >= -500.25) & (price <= 500.25)).sum())

    # EXACT float sum (rational accumulation)
    s = t.query().where(knox.F("qty") > 10).sum("price")
    m = qty > 10
    exact = sum(int(round(p * 100)) for p in price[m])
    assert s == exact / 100
    assert t.query().min("price") == price.min()
    assert t.query().max("price") == price.max()


def test_alp_materialize_and_sort(db, rng):
    t = db.create_table(P)
    n = 1000
    price = rng.integers(-10**5, 10**5, n) / 10.0
    t.insert({"id": np.zeros(n, np.uint64), "price": price,
              "qty": np.ones(n, np.int64)})
    t.merge()
    rows = t.query().where(knox.F("price") >= 0).select("price").rows()
    np.testing.assert_array_equal(np.sort(rows["price"]),
                                  np.sort(price[price >= 0]))
    top = t.query().order_by("price", desc=True).limit(5).select("price").rows()
    np.testing.assert_array_equal(top["price"], np.sort(price)[::-1][:5])


def test_alp_mixed_with_noise_packs(db, rng):
    """Column where some packs round-trip and others don't (RAW keyform)."""
    t = db.create_table(P)
    clean = rng.integers(0, 1000, 512) / 4.0     # 2 decimal digits (x.25)
    noisy = rng.standard_normal(512)
    price = np.concatenate([clean, noisy])
    t.insert({"id": np.zeros(1024, np.uint64), "price": price,
              "qty": np.ones(1024, np.int64)})
    t.merge()
    schemes = {p.scheme for p in t._t.segments[0].seg.columns["price"].packs}
    assert Scheme.ALP in schemes and len(schemes) > 1
    got = t.query().where(knox.F("price") > 0.5).count()
    assert got == int((price > 0.5).sum())
    mx = t.query().max("price")
    assert mx == price.max()
