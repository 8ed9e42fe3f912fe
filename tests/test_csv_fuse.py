"""CSV codec + xor/fuse filter tests (reference pkg/csv, internal/filter/fuse)."""

import numpy as np
import pytest

from knoxdb_tpu.filter import fuse
from knoxdb_tpu.ops import hash as H
from knoxdb_tpu.schema.schema import Builder
from knoxdb_tpu.types import FieldType
from knoxdb_tpu.utils import csvio


def test_csv_roundtrip(rng):
    sch = (Builder("t").pk("id")
           .add("v", FieldType.INT64)
           .add("f", FieldType.FLOAT64)
           .add("s", FieldType.STRING)
           .add("b", FieldType.BYTES)
           .add("d", FieldType.DECIMAL64, scale=2)
           .finish())
    n = 50
    data = {
        "id": np.arange(1, n + 1, dtype=np.uint64),
        "v": rng.integers(-10**9, 10**9, n),
        "f": rng.normal(size=n),
        "s": [f"name,{i};x" for i in range(n)],   # embedded delimiters
        "b": [bytes([i, 255 - i]) for i in range(n)],
        "d": [int(x) for x in rng.integers(-10**6, 10**6, n)],
    }
    text = csvio.write_csv(sch, data, n)
    back = csvio.read_csv(sch, text)
    np.testing.assert_array_equal(back["id"], data["id"])
    np.testing.assert_array_equal(back["v"], data["v"])
    np.testing.assert_array_equal(back["f"], data["f"])
    assert list(back["s"]) == data["s"]
    assert list(back["b"]) == data["b"]
    assert back["d"] == data["d"]


def test_csv_sniffer():
    d = csvio.sniff_dialect("a;b;c\n1;2;3\n4;5;6\n")
    assert d.delimiter == ";"


def test_csv_decimal_exact():
    sch = Builder("t").pk("id").add("d", FieldType.DECIMAL64, scale=4).finish()
    text = "id,d\n1,0.1\n2,-12.3456\n3,7\n"
    back = csvio.read_csv(sch, text)
    assert back["d"] == [1000, -123456, 70000]


def test_xor_filter_no_false_negatives(rng):
    keys = np.unique(rng.integers(0, 1 << 60, 5000, dtype=np.uint64))
    limbs = np.stack([(keys >> np.uint64(32)).astype(np.uint32),
                      keys.astype(np.uint32)])
    f = fuse.build(limbs)
    assert f.contains_limbs(limbs).all()
    # fpr ~0.4%
    probe = rng.integers(1 << 61, 1 << 62, 30000, dtype=np.uint64)
    pl = np.stack([(probe >> np.uint64(32)).astype(np.uint32),
                   probe.astype(np.uint32)])
    fpr = f.contains_limbs(pl).mean()
    assert fpr < 0.02, fpr
    # space ~9.8 bits/key
    assert f.nbytes * 8 / len(keys) < 14


def test_xor_filter_bytes_and_dups(rng):
    vals = [b"alpha", b"beta", b"alpha", b"gamma"] * 50
    f = fuse.build_bytes(vals)
    from knoxdb_tpu.filter.bloom import _bytes_hashes
    h1, h2 = _bytes_hashes(list(set(vals)))
    assert f.contains_hashes(h1, h2).all()
