"""Wire-codec fuzzing + multi-segment sorted-query merges
(VERDICT r1 weak #10 test-volume gaps)."""

from dataclasses import dataclass

import numpy as np
import pytest

import knoxdb_tpu.knox as knox
from knoxdb_tpu.schema.schema import Builder
from knoxdb_tpu.schema.wire import decode_batch, encode_batch
from knoxdb_tpu.types import FieldType


NUMERIC = [FieldType.UINT64, FieldType.INT64, FieldType.INT32,
           FieldType.UINT16, FieldType.INT8, FieldType.FLOAT64,
           FieldType.FLOAT32, FieldType.BOOLEAN, FieldType.TIMESTAMP]
WIDE = [FieldType.INT128, FieldType.INT256, FieldType.DECIMAL128]
BYTESY = [FieldType.STRING, FieldType.BYTES]


def _rand_col(rng, ft, n):
    from knoxdb_tpu.utils import limbs as lb
    if ft in BYTESY:
        vals = [bytes(rng.integers(0, 256, int(rng.integers(0, 20)),
                                   dtype=np.uint8)) for _ in range(n)]
        if ft == FieldType.STRING:
            vals = [v.hex() for v in vals]       # valid utf-8
        return vals
    if ft in WIDE:
        bits = ft.bits
        return [int(x) << int(rng.integers(0, bits - 40))
                for x in rng.integers(-1 << 30, 1 << 30, n)]
    if ft == FieldType.BOOLEAN:
        return rng.integers(0, 2, n).astype(bool)
    if ft.is_float:
        a = rng.normal(0, 1e6, n)
        a[: n // 10] = [0.0, -0.0, np.inf, -np.inf, 1e-300][: max(1, n // 10)][0]
        return a.astype(lb.numpy_dtype(ft))
    info_bits = min(ft.bits, 63) - 1
    lo = -(1 << info_bits) if ft.is_signed else 0
    hi = 1 << info_bits
    return rng.integers(lo, hi, n, dtype=lb.numpy_dtype(ft))


@pytest.mark.parametrize("seed", range(8))
def test_wire_roundtrip_fuzz(seed):
    rng = np.random.default_rng(seed)
    nfields = int(rng.integers(1, 7))
    b = Builder(f"fz{seed}").pk("id")
    pool = NUMERIC + WIDE + BYTESY
    fts = [pool[int(rng.integers(0, len(pool)))] for _ in range(nfields)]
    for i, ft in enumerate(fts):
        b.add(f"c{i}", ft)
    sch = b.finish()
    n = int(rng.integers(0, 300))
    data = {"id": np.arange(1, n + 1, dtype=np.uint64)}
    for i, ft in enumerate(fts):
        data[f"c{i}"] = _rand_col(rng, ft, n)
    buf = encode_batch(sch, data, n)
    out, n2 = decode_batch(sch, buf)
    assert n2 == n
    for i, ft in enumerate(fts):
        a, w = out[f"c{i}"], data[f"c{i}"]
        if ft in BYTESY:
            want = [v.encode() if isinstance(v, str) else v for v in w]
            got = [v.encode() if isinstance(v, str) else v for v in a]
            assert got == want
        elif ft in WIDE:
            assert [int(x) for x in a] == [int(x) for x in w]
        elif ft.is_float:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(w))
        else:
            np.testing.assert_array_equal(np.asarray(a, np.int64),
                                          np.asarray(w, np.int64))


def test_wire_rejects_garbage():
    sch = Builder("g").pk("id").add("v", FieldType.INT64).finish()
    with pytest.raises(Exception):
        decode_batch(sch, b"\x00" * 32)
    buf = encode_batch(sch, {"id": np.arange(1, 4, dtype=np.uint64),
                             "v": np.arange(3)}, 3)
    with pytest.raises(Exception):
        decode_batch(sch, buf[:-3])              # truncated payload


@dataclass
class SRow:
    id: int = 0
    k: int = 0
    v: int = 0


def test_sorted_query_multi_segment_merge(rng):
    """ORDER BY merging across MULTIPLE sealed segments + journal rows:
    big tail segments are kept by the compaction policy, so two inserts
    + merges + a journal remainder give three contributor sources."""
    db = knox.create_database("ms", driver="mem", pack_size=256,
                              background_merge=False)
    t = db.create_table(SRow)
    n1, n2, nj = 4000, 3000, 37
    k1 = rng.integers(0, 10**6, n1)
    k2 = rng.integers(0, 10**6, n2)
    kj = rng.integers(0, 10**6, nj)
    t.insert({"id": np.zeros(n1, np.uint64), "k": k1,
              "v": np.arange(n1)})
    t.merge()
    t.insert({"id": np.zeros(n2, np.uint64), "k": k2,
              "v": np.arange(n2)})
    t.merge()
    t.insert({"id": np.zeros(nj, np.uint64), "k": kj,
              "v": np.arange(nj)})
    nseg = len(t._t.segments)
    assert nseg >= 2, f"expected multiple segments, got {nseg}"
    allk = np.concatenate([k1, k2, kj])
    for desc in (False, True):
        got = t.query().order_by("k", desc=desc).limit(50) \
            .select("k").rows()["k"]
        want = np.sort(allk)
        want = want[::-1] if desc else want
        np.testing.assert_array_equal(np.asarray(got, np.int64),
                                      want[:50])
    db.close()
