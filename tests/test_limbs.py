"""Keyform limb conversion: roundtrip + order preservation vs numpy oracle."""

import numpy as np
import pytest

from knoxdb_tpu.types import FieldType
from knoxdb_tpu.utils import limbs as lb

FIXED_TYPES = [
    FieldType.UINT8, FieldType.UINT16, FieldType.UINT32, FieldType.UINT64,
    FieldType.INT8, FieldType.INT16, FieldType.INT32, FieldType.INT64,
    FieldType.FLOAT32, FieldType.FLOAT64, FieldType.TIMESTAMP,
    FieldType.DECIMAL32, FieldType.DECIMAL64, FieldType.BOOLEAN,
]


def gen_values(ft, rng, n=4096):
    dt = lb.numpy_dtype(ft)
    if ft is FieldType.BOOLEAN:
        return rng.integers(0, 2, n).astype(bool)
    if ft.is_float:
        vals = rng.normal(scale=1e6, size=n).astype(dt)
        vals[:16] = [0.0, 1.5, -1.5, 1e-300 if dt == np.float64 else 1e-30,
                     np.inf, -np.inf, 2.0, -2.0] * 2
        return vals.astype(dt)
    info = np.iinfo(dt)
    vals = rng.integers(info.min, info.max, size=n, dtype=dt, endpoint=True)
    vals[:4] = [info.min, info.max, 0, 1]
    return vals


@pytest.mark.parametrize("ft", FIXED_TYPES, ids=lambda t: t.name)
def test_roundtrip(ft, rng):
    vals = gen_values(ft, rng)
    limbs = lb.to_keyform(vals, ft)
    assert limbs.dtype == np.uint32
    assert limbs.shape == (ft.nlimbs, len(vals))
    back = lb.from_keyform(limbs, ft)
    np.testing.assert_array_equal(back, vals)


@pytest.mark.parametrize("ft", FIXED_TYPES, ids=lambda t: t.name)
def test_order_preserved(ft, rng):
    vals = gen_values(ft, rng, n=2000)
    limbs = lb.to_keyform(vals, ft)
    # widen limbs to python-int keys for lexicographic compare
    keys = np.zeros(len(vals), dtype=object)
    for l in range(ft.nlimbs):
        keys = keys * (1 << 32) + limbs[l].astype(object)
    order_key = np.argsort(keys, kind="stable")
    order_val = np.argsort(vals, kind="stable")
    np.testing.assert_array_equal(vals[order_key], vals[order_val])


@pytest.mark.parametrize("ft", [FieldType.INT128, FieldType.INT256,
                                FieldType.DECIMAL128, FieldType.DECIMAL256])
def test_wide_roundtrip(ft, rng):
    bits = ft.bits
    n = 257
    vals = [int(rng.integers(-(2**62), 2**62)) * int(rng.integers(0, 2**60))
            for _ in range(n)]
    vals[0] = -(1 << (bits - 1))          # min
    vals[1] = (1 << (bits - 1)) - 1       # max
    vals[2] = 0
    limbs = lb.to_keyform(vals, ft)
    back = lb.from_keyform(limbs, ft)
    assert [int(v) for v in back] == [int(v) for v in vals]
    # order preservation
    keys = [tuple(int(limbs[l, i]) for l in range(ft.nlimbs)) for i in range(n)]
    assert sorted(range(n), key=lambda i: keys[i]) == sorted(range(n), key=lambda i: vals[i])


def test_scalar_roundtrip():
    for ft, v in [(FieldType.UINT64, 2**63 + 17), (FieldType.INT64, -42),
                  (FieldType.FLOAT64, -3.25), (FieldType.INT128, -(2**100))]:
        k = lb.scalar_to_keyform(v, ft)
        assert len(k) == ft.nlimbs
        got = lb.keyform_to_scalar(k, ft)
        assert (got == v) or (int(got) == int(v))
