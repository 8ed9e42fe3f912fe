"""Fused bit-sliced predicate/aggregate kernels vs numpy oracle.

Mirrors the reference's kernel-vs-generic oracle testing style
(/root/reference/internal/cmp/avx2/kernel_test.go)."""

import numpy as np
import jax.numpy as jnp
import pytest

from knoxdb_tpu.encode import schemes as S
from knoxdb_tpu.ops import bitslice as B
from knoxdb_tpu.ops import bitset as bs
from knoxdb_tpu.types import FilterMode

N = 1024  # rows per pack (small for tests; multiple of 32)


def make_packs(rng, P=3, width=7, base=1000):
    """Random bitpacked packs. Returns (values u64[P,N], planes, min_keys)."""
    vals = rng.integers(0, 1 << width, size=(P, N), dtype=np.uint64)
    mins = (base + np.arange(P, dtype=np.uint64) * 37).astype(np.uint64)
    vals = vals + mins[:, None]
    planes = np.stack([
        S.encode_bitpack(vals[p], 1, int(mins[p]), width, N).planes
        for p in range(P)
    ], axis=1)          # plane-major [w, P, W] (r4)
    return vals, jnp.asarray(planes), jnp.asarray(mins)


MODES = [FilterMode.EQ, FilterMode.NE, FilterMode.LT, FilterMode.LE,
         FilterMode.GT, FilterMode.GE]


def oracle(mode, vals, c, hi=None):
    if mode == FilterMode.EQ:
        return vals == c
    if mode == FilterMode.NE:
        return vals != c
    if mode == FilterMode.LT:
        return vals < c
    if mode == FilterMode.LE:
        return vals <= c
    if mode == FilterMode.GT:
        return vals > c
    if mode == FilterMode.GE:
        return vals >= c
    if mode == FilterMode.RANGE:
        return (vals >= c) & (vals <= hi)


@pytest.mark.parametrize("mode", MODES)
def test_cmp_planes_vs_oracle(rng, mode):
    width = 7
    vals, planes, mins = make_packs(rng, P=3, width=width)
    # constants: in-domain, below every domain, above every domain, at edges
    consts = [int(vals[1, 5]), 0, 1 << 40, 1000, 1000 + (1 << width) - 1,
              999, 1000 + (1 << width)]
    for c in consts:
        got = B.cmp_planes(mode, planes, mins, jnp.uint64(c), width)
        want = oracle(mode, vals, np.uint64(c))
        got_bool = np.asarray(bs.unpack_mask(got))
        np.testing.assert_array_equal(got_bool, want, err_msg=f"{mode} c={c}")


def test_range_planes_vs_oracle(rng):
    width = 9
    vals, planes, mins = make_packs(rng, P=4, width=width)
    cases = [(1010, 1100), (0, 5), (1 << 30, 1 << 31), (0, 1 << 30),
             (1005, 1005), (1200, 1100)]
    for lo, hi in cases:
        got = B.range_planes(planes, mins, jnp.uint64(lo), jnp.uint64(hi), width)
        want = (vals >= np.uint64(lo)) & (vals <= np.uint64(hi))
        np.testing.assert_array_equal(np.asarray(bs.unpack_mask(got)), want,
                                      err_msg=f"[{lo},{hi}]")


def test_in_planes_vs_oracle(rng):
    width = 6
    vals, planes, mins = make_packs(rng, P=2, width=width)
    cs = np.array([int(vals[0, 0]), int(vals[1, 9]), 3, 1 << 50], dtype=np.uint64)
    got = B.in_planes(planes, mins, jnp.asarray(cs), width)
    want = np.isin(vals, cs)
    np.testing.assert_array_equal(np.asarray(bs.unpack_mask(got)), want)


def test_width_zero_and_full_mask():
    # width=0 packs are constants; empty plane loops must still be correct
    P = 2
    mins = jnp.asarray(np.array([42, 7], np.uint64))
    planes = jnp.zeros((1, P, N // 32), jnp.uint32)   # plane-major (r4)
    m = B.cmp_planes(FilterMode.EQ, planes[:0], mins, jnp.uint64(42), 0)
    got = np.asarray(bs.unpack_mask(m))
    assert got[0].all() and not got[1].any()


def test_masked_sum_min_max_planes(rng):
    width = 11
    vals, planes, mins = make_packs(rng, P=3, width=width)
    mask = rng.random((3, N)) < 0.4
    mask[2] = False  # one empty pack
    mw = jnp.asarray(np.stack([bs.np_pack_mask(m) for m in mask]))

    sums, counts = B.masked_sum_planes(planes, mins, mw, width)
    mn = B.masked_min_planes(planes, mins, mw, width)
    mx = B.masked_max_planes(planes, mins, mw, width)

    for p in range(3):
        sel = vals[p][mask[p]]
        assert int(counts[p]) == len(sel)
        if len(sel):
            assert int(sums[p]) == int(sel.sum(dtype=np.uint64))
            assert int(mn[p]) == int(sel.min())
            assert int(mx[p]) == int(sel.max())


def test_match_planes_dispatch(rng):
    width = 5
    vals, planes, mins = make_packs(rng, P=2, width=width)
    m = B.match_planes(FilterMode.NOT_IN, planes, mins, width,
                       cs=jnp.asarray(np.array([int(vals[0, 0])], np.uint64)))
    want = vals != vals[0, 0]
    np.testing.assert_array_equal(np.asarray(bs.unpack_mask(m)), want)


def test_transpose_decode_all_widths(rng):
    """32x32 bit-matrix transpose decode == per-plane oracle for every
    width class (1..64), including the 32/33 split edges."""
    import jax.numpy as jnp
    from knoxdb_tpu.encode import schemes as S
    P, N = 3, 256
    for width in (1, 5, 8, 9, 12, 31, 32, 33, 41, 63, 64):
        vals = rng.integers(0, 1 << 62, (P, N), dtype=np.uint64)
        if width < 64:
            vals &= np.uint64((1 << width) - 1)
        planes = np.zeros((max(width, 1), P, N // 32), np.uint32)
        for p in range(width):
            for pk in range(P):
                bits = ((vals[pk] >> np.uint64(p)) & np.uint64(1)) \
                    .astype(np.uint32)
                planes[p, pk] = (bits.reshape(-1, 32)
                                 << np.arange(32, dtype=np.uint32)).sum(
                                     axis=1, dtype=np.uint32)
        pj = jnp.asarray(planes)
        lo, hi = S.decode_bitplanes_pair(pj, width)
        got = np.asarray(lo).astype(np.uint64) \
            | (np.asarray(hi).astype(np.uint64) << np.uint64(32))
        np.testing.assert_array_equal(got, vals, err_msg=f"w={width}")
        np.testing.assert_array_equal(
            np.asarray(S.decode_bitplanes_u64(pj, width)), vals)
        if width <= 32:
            np.testing.assert_array_equal(
                np.asarray(S.decode_bitplanes_u32(pj, width)),
                vals.astype(np.uint32))
