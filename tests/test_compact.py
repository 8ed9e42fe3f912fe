"""Selection-vector compaction vs numpy oracle (reference bitset.Indexes)."""

import numpy as np
import jax.numpy as jnp

from knoxdb_tpu.ops import compact as C


def test_mask_to_indexes(rng):
    n = 512
    mask = rng.random(n) < 0.3
    idx, count = C.mask_to_indexes(jnp.asarray(mask), cap=n)
    want = np.flatnonzero(mask)
    assert int(count) == len(want)
    np.testing.assert_array_equal(np.asarray(idx)[:len(want)], want)
    assert (np.asarray(idx)[len(want):] == 0xFFFFFFFF).all()


def test_mask_to_indexes_empty_and_full():
    n = 64
    idx, count = C.mask_to_indexes(jnp.zeros(n, bool), cap=8)
    assert int(count) == 0 and (np.asarray(idx) == 0xFFFFFFFF).all()
    idx, count = C.mask_to_indexes(jnp.ones(n, bool), cap=n, base=100)
    assert int(count) == n
    np.testing.assert_array_equal(np.asarray(idx), np.arange(100, 100 + n))


def test_mask_to_indexes_cap_overflow_drops():
    n = 64
    idx, count = C.mask_to_indexes(jnp.ones(n, bool), cap=10)
    # count reports true popcount; indexes beyond cap are dropped
    assert int(count) == n
    np.testing.assert_array_equal(np.asarray(idx), np.arange(10))


def test_compact_rows(rng):
    n = 256
    limbs = rng.integers(0, 1 << 32, size=(2, n)).astype(np.uint32)
    mask = rng.random(n) < 0.5
    out, count = C.compact_rows(jnp.asarray(limbs), jnp.asarray(mask), cap=n)
    want = limbs[:, mask]
    np.testing.assert_array_equal(np.asarray(out)[:, :int(count)], want)
