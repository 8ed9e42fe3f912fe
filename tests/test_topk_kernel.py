"""Bit-descent top-k kernels (ops/bitslice.add_const_planes +
topk_select) vs numpy selection oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from knoxdb_tpu.ops import bitset as bs
from knoxdb_tpu.ops import bitslice as BS


def _mk_planes(vals_rel, width):
    P, N = vals_rel.shape
    # plane-major [w, P, W] (r4 device layout)
    planes = np.zeros((width, P, N // 32), np.uint32)
    for p in range(width):
        for pk in range(P):
            planes[p, pk] = bs.np_pack_mask(
                ((vals_rel[pk] >> p) & 1).astype(bool))
    return planes


def _const_bits(consts, width_out):
    P = len(consts)
    out = np.zeros((width_out, P), np.uint32)
    for b in range(width_out):
        out[b] = np.where((consts >> b) & 1, 0xFFFFFFFF, 0)
    return out


def test_add_const_planes(rng):
    P, N, w = 4, 128, 12
    rel = rng.integers(0, 1 << w, (P, N), dtype=np.uint64)
    consts = rng.integers(0, 1 << 13, P, dtype=np.uint64)
    wo = 15
    planes = _mk_planes(rel, w)
    out = np.asarray(BS.add_const_planes(
        jnp.asarray(planes), jnp.asarray(_const_bits(consts, wo)), wo))
    want = (rel + consts[:, None]) % (1 << wo)
    for b in range(wo):
        for pk in range(P):
            got_bits = bs.np_unpack_mask(out[b, pk], N)
            np.testing.assert_array_equal(
                got_bits, ((want[pk] >> b) & 1).astype(bool),
                err_msg=f"bit {b} pack {pk}")


@pytest.mark.parametrize("want_max", [True, False])
@pytest.mark.parametrize("k", [1, 7, 100])
def test_topk_select(rng, want_max, k):
    P, N, w = 4, 256, 20
    vals = rng.integers(0, 1 << w, (P, N), dtype=np.uint64)
    vals[0, :50] = 12345        # tie block
    mask = rng.random((P, N)) < 0.8
    planes = _mk_planes(vals, w)
    mw = np.stack([bs.np_pack_mask(mask[p]) for p in range(P)])
    tw, better, tie, nb = BS.topk_select(
        jnp.asarray(planes), jnp.asarray(mw), jnp.int32(k), w, want_max)
    T = sum(int(x) << (32 * j) for j, x in enumerate(tw))
    sel = np.sort(vals[mask])
    sel = sel[::-1] if want_max else sel
    kk = min(k, len(sel))
    want_set = sel[:kk]
    # threshold == k-th best value
    assert T == int(want_set[-1])
    bet = np.concatenate([bs.np_unpack_mask(np.asarray(better)[p], N)
                          for p in range(P)])
    tiem = np.concatenate([bs.np_unpack_mask(np.asarray(tie)[p], N)
                           for p in range(P)])
    flat_v = vals.reshape(-1)
    flat_m = mask.reshape(-1)
    if want_max:
        np.testing.assert_array_equal(bet, flat_m & (flat_v > T))
    else:
        np.testing.assert_array_equal(bet, flat_m & (flat_v < T))
    np.testing.assert_array_equal(tiem, flat_m & (flat_v == T))
    assert int(nb) == int(bet.sum())
    assert int(nb) + int(tiem.sum()) >= kk



@pytest.mark.slow
def test_wide_int128_bit_descent(rng):
    """End-to-end wide top-k through the bit-descent fast path
    (clustered int128 -> wide BITPACK planes; exec/sort)."""
    import numpy as np
    from knoxdb_tpu.exec.device import DeviceSegment
    from knoxdb_tpu.exec.scan import SegmentScanner
    from knoxdb_tpu.exec import sort as SRT
    from knoxdb_tpu.pack.segment import build_segment
    from knoxdb_tpu.schema.schema import Builder
    from knoxdb_tpu.types import FieldType
    n = 4096
    sch = Builder("w").pk("id").add("big", FieldType.INT128).finish()
    block = np.arange(n) // 512
    # wo ~ 68: exercises the >64-bit wide descent while keeping the
    # interpret-mode dependent chain (and its compile) at half the
    # r4 width — the 127-bit version cost 76 s of the slow tier
    big = np.array([int(b) * (1 << 66) + (int(x) << 9) for b, x in
                    zip(block, rng.integers(-1 << 45, 1 << 45, n))],
                   object)
    seg = build_segment(sch, {"id": np.arange(1, n + 1, dtype=np.uint64),
                              "big": big}, pack_size=512)
    sc = SegmentScanner(DeviceSegment(seg))
    assert SRT._topk_fast_plan(sc.d, sc.d.seg.columns["big"],
                               "big") is not None
    for desc in (True, False):
        keys, rows, nv = SRT.segment_topk(sc, None, "big", 25, desc=desc,
                                          project=["id"])
        want = sorted(big.tolist(), reverse=desc)[:25]
        assert [int(k) - (1 << 127) for k in keys] == want
        assert nv == 25 and rows["id"].shape[-1] == 25
