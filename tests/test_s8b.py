"""Simple8b codec roundtrip (reference internal/encode/s8b parity)."""

import numpy as np
import pytest

from knoxdb_tpu.encode import s8b


@pytest.mark.parametrize("gen", ["small", "mixed", "zeros", "large", "tail"])
def test_roundtrip(rng, gen):
    if gen == "small":
        vals = rng.integers(0, 4, 5000, dtype=np.uint64)
    elif gen == "mixed":
        vals = rng.integers(0, 1 << 30, 1000, dtype=np.uint64)
        vals[::7] = rng.integers(0, 4, len(vals[::7]), dtype=np.uint64)
    elif gen == "zeros":
        vals = np.zeros(1000, np.uint64)
        vals[500] = 7
    elif gen == "large":
        vals = rng.integers(0, 1 << 59, 333, dtype=np.uint64)
    else:
        vals = rng.integers(0, 16, 17, dtype=np.uint64)  # tail < group
    words = s8b.encode(vals)
    back = s8b.decode(words, len(vals))
    np.testing.assert_array_equal(back, vals)
    # compression sanity for small values
    if gen == "small":
        assert len(words) * 8 < len(vals)  # < 1 byte/val


def test_rejects_oversize():
    with pytest.raises(ValueError):
        s8b.encode(np.array([1 << 60], np.uint64))
