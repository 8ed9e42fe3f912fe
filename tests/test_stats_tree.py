"""Two-level stats tree (pack/stats.py): at >= 2*2048 packs the
super-block level must produce decisions IDENTICAL to the flat path
(reference spack n-ary tree, internal/pack/stats/index.go:175-223)."""

import numpy as np
import pytest

from knoxdb_tpu.pack import stats as ST
from knoxdb_tpu.types import FilterMode, FilterType


def _mk_stats(rng, P):
    # clustered mins so super-blocks actually decide: block b covers
    # keys around b * 1000
    base = (np.arange(P) // ST._TREE_BLOCK) * 100_000
    mn = (base + rng.integers(0, 500, P)).astype(np.uint64)
    mx = mn + rng.integers(0, 400, P).astype(np.uint64)
    return ST.FieldStats(mn, mx)


def _flat(fs, mode, **kw):
    """Reference result: force the flat path by evaluating slices below
    the tree threshold and concatenating."""
    P = len(fs.min_key)
    step = ST._TREE_BLOCK       # < 2*_TREE_BLOCK -> flat
    alls, nones = [], []
    for s in range(0, P, step):
        sub = ST.FieldStats(fs.min_key[s:s + step], fs.max_key[s:s + step],
                            None if fs.bloom_words is None
                            else fs.bloom_words[s:s + step],
                            fs.filter_type, fs.is_prefix)
        t = ST.prune_leaf(sub, mode, **kw)
        alls.append(t.all_)
        nones.append(t.none)
    return np.concatenate(alls), np.concatenate(nones)


@pytest.mark.parametrize("mode,kw", [
    (FilterMode.LT, dict(lo=250_000)),
    (FilterMode.LE, dict(lo=250_000)),
    (FilterMode.GT, dict(lo=199_700)),
    (FilterMode.GE, dict(lo=199_700)),
    (FilterMode.RANGE, dict(lo=150_000, hi=350_100)),
    (FilterMode.EQ, dict(lo=200_123)),
    (FilterMode.NE, dict(lo=200_123)),
    (FilterMode.IN, dict(lo=None, keys=np.array([100_123, 400_001],
                                                np.uint64))),
    (FilterMode.NOT_IN, dict(lo=None, keys=np.array([100_123, 400_001],
                                                    np.uint64))),
])
def test_tree_matches_flat(rng, mode, kw):
    P = 3 * ST._TREE_BLOCK + 137        # engages the tree, ragged tail
    fs = _mk_stats(rng, P)
    t = ST.prune_leaf(fs, mode, **kw)
    w_all, w_none = _flat(fs, mode, **kw)
    np.testing.assert_array_equal(t.all_, w_all)
    np.testing.assert_array_equal(t.none, w_none)
    # the coarse level must have decided a majority of blocks outright
    # for this clustered layout (otherwise the tree adds no value)
    ct = ST.prune_leaf(
        ST.FieldStats(*fs.coarse(), None, FilterType.NONE), mode, **kw)
    assert (ct.all_ | ct.none).sum() >= len(ct.all_) // 2
