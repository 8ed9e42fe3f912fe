"""Masked aggregation vs numpy oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from knoxdb_tpu.types import FieldType
from knoxdb_tpu.ops import agg as A
from knoxdb_tpu.utils import limbs as lb


@pytest.mark.parametrize("ft", [FieldType.UINT64, FieldType.INT64,
                                FieldType.UINT32, FieldType.INT16],
                         ids=lambda t: t.name)
def test_int_sum_min_max(ft, rng):
    n = 4096
    dt = lb.numpy_dtype(ft)
    info = np.iinfo(dt)
    vals = rng.integers(info.min, info.max, n, dtype=dt, endpoint=True)
    mask = rng.integers(0, 2, n).astype(bool)

    x = jnp.asarray(lb.to_keyform(vals, ft))
    m = jnp.asarray(mask)

    cnt = int(A.masked_count(m))
    assert cnt == mask.sum()

    sums = np.asarray(A.masked_limb_sums(x, m))
    total = A.combine_limb_sums(sums, cnt, ft)
    assert total == sum(int(v) for v in vals[mask])

    mn = np.asarray(A.masked_min(x, m))[:, None]
    mx = np.asarray(A.masked_max(x, m))[:, None]
    assert lb.from_keyform(mn, ft)[0] == vals[mask].min()
    assert lb.from_keyform(mx, ft)[0] == vals[mask].max()


def test_wide_sum(rng):
    ft = FieldType.INT128
    vals = np.array([int(v) << int(s) for v, s in
                     zip(rng.integers(-(2**62), 2**62, 1024), rng.integers(0, 60, 1024))],
                    dtype=object)
    mask = rng.integers(0, 2, 1024).astype(bool)
    x = jnp.asarray(lb.to_keyform(vals, ft))
    m = jnp.asarray(mask)
    sums = np.asarray(A.masked_limb_sums(x, m))
    total = A.combine_limb_sums(sums, int(mask.sum()), ft)
    assert total == sum(int(v) for v in vals[mask])
    mn = lb.from_keyform(np.asarray(A.masked_min(x, m))[:, None], ft)[0]
    assert int(mn) == min(int(v) for v in vals[mask])


def test_float_sum_and_decode(rng):
    ft = FieldType.FLOAT64
    vals = rng.normal(size=4096) * 1000
    mask = rng.integers(0, 2, 4096).astype(bool)
    x = jnp.asarray(lb.to_keyform(vals, ft))
    # device float decode: bit-exactness not guaranteed on stacks that
    # emulate f64 (X64 rewrite -> ~48-bit mantissa); values must agree to
    # well beyond f32 precision.
    np.testing.assert_allclose(np.asarray(A.keyform_to_float(x, ft)), vals,
                               rtol=1e-12)
    got = float(A.masked_sum_float(x, jnp.asarray(mask), ft))
    # pairwise order: compare to the same order in numpy
    v = np.where(mask, vals, 0.0)
    n = len(v)
    while n > 1:
        n //= 2
        v = v[:n] + v[n:]
    np.testing.assert_allclose(got, v[0], rtol=1e-9)


def test_first_last(rng):
    mask = np.zeros(1024, dtype=bool)
    mask[[17, 500, 900]] = True
    m = jnp.asarray(mask)
    assert int(A.first_index(m)) == 17
    assert int(A.last_index(m)) == 900
    empty = jnp.zeros(1024, dtype=bool)
    assert int(A.first_index(empty)) == 1024
    assert int(A.last_index(empty)) == 1024
