"""Native C++ host kernels vs numpy oracle (reference tests its asm
kernels against generic Go the same way, internal/cmp/avx2/kernel_test)."""

import numpy as np
import pytest

from knoxdb_tpu.encode.schemes import _pack_bitplanes_np
from knoxdb_tpu.utils import native as NT


@pytest.mark.skipif(not NT.available(), reason="native lib not built")
def test_bitplane_pack_matches_numpy(rng):
    for n, width in [(1000, 7), (4096, 16), (33, 1), (64, 64), (100, 0)]:
        n_pad = -(-n // 32) * 32
        vals = rng.integers(0, 1 << max(width, 1), n, dtype=np.uint64)
        if width == 64:
            vals = rng.integers(0, 1 << 63, n, dtype=np.uint64) * 2 + 1
        got = NT.bitplane_pack(vals, width, n_pad)
        want = _pack_bitplanes_np(vals, width, n_pad)
        np.testing.assert_array_equal(got, want, err_msg=f"n={n} w={width}")


@pytest.mark.skipif(not NT.available(), reason="native lib not built")
def test_bitplane_roundtrip(rng):
    n, width = 5000, 23
    vals = rng.integers(0, 1 << width, n, dtype=np.uint64)
    planes = NT.bitplane_pack(vals, width, -(-n // 32) * 32)
    back = NT.bitplane_unpack(planes, width, n)
    np.testing.assert_array_equal(back, vals)


def test_analyze_matches_numpy(rng):
    for keys in [rng.integers(0, 1000, 5000, dtype=np.uint64),
                 np.sort(rng.integers(0, 10**9, 1000, dtype=np.uint64)),
                 np.repeat(rng.integers(0, 5, 100, dtype=np.uint64), 37),
                 np.array([42], np.uint64),
                 np.full(64, 7, np.uint64)]:
        mn, mx, runs, dw, pw, srt = NT.analyze_u64(keys)
        assert mn == int(keys.min()) and mx == int(keys.max())
        assert runs == 1 + int((keys[1:] != keys[:-1]).sum())
        assert pw == (mx - mn).bit_length()
        if len(keys) > 1:
            with np.errstate(over="ignore"):
                d = (keys[1:] - keys[:-1]).view(np.int64)
                zz = ((d << 1) ^ (d >> 63)).view(np.uint64)
            assert dw == int(zz.max()).bit_length()
            assert srt == bool((d >= 0).all())


@pytest.mark.skipif(not NT.available(), reason="native lib not built")
def test_bitset_indexes(rng):
    mask = rng.random(3000) < 0.2
    pad = (-len(mask)) % 32
    m = np.concatenate([mask, np.zeros(pad, bool)])
    words = np.packbits(m.reshape(-1, 32), axis=-1, bitorder="little") \
        .view(np.uint32).reshape(-1)
    got = NT.bitset_indexes(words, base=10)
    np.testing.assert_array_equal(got, np.flatnonzero(mask) + 10)
