"""Roaring-style RidSet (utils/ridset.py, xroar bitmap.go analog)."""

import numpy as np

from knoxdb_tpu.utils.ridset import RidSet, _CUTOFF


def test_roundtrip_and_membership(rng):
    # sparse buckets + one dense bucket (> _CUTOFF members)
    sparse = rng.choice(1 << 24, 5000, replace=False).astype(np.uint64)
    dense = (np.uint64(7 << 16)
             + rng.choice(1 << 16, _CUTOFF + 500,
                          replace=False).astype(np.uint64))
    rids = np.concatenate([sparse, dense])
    s = RidSet.from_array(rids)
    assert len(s) == len(np.unique(rids))
    np.testing.assert_array_equal(s.to_array(), np.unique(rids))
    probe = rng.integers(0, 1 << 24, 10_000, dtype=np.uint64)
    np.testing.assert_array_equal(s.isin(probe), np.isin(probe, rids))
    # compression: sparse 5000-of-16M beats a flat positional bitset
    assert s.nbytes < (1 << 24) // 8


def test_union_and_empty(rng):
    a = RidSet.from_array(np.array([1, 5, 9], np.uint64))
    b = RidSet.from_array(np.array([5, 100_000], np.uint64))
    u = a.union(b)
    np.testing.assert_array_equal(u.to_array(),
                                  np.array([1, 5, 9, 100_000], np.uint64))
    e = RidSet.empty()
    assert len(e) == 0 and not e.isin(np.array([1], np.uint64)).any()
    assert e.union(a) is a and a.union(e) is a
