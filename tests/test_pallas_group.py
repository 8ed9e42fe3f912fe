"""Pallas fused group-by kernel vs python oracle (interpret mode on CPU;
the TPU compile path is exercised by the opt-in KNOX_PALLAS bench run)."""

import numpy as np
import jax.numpy as jnp
import pytest

from knoxdb_tpu.exec import groupby as GB


def _pack_mask(mask_rows):
    """bool[P, N] -> u32[P, N//32] valid words (bit i of word w = row
    w*32+i), matching ops/bitset layout used by unpack_mask."""
    P, N = mask_rows.shape
    bits = mask_rows.reshape(P, N // 32, 32).astype(np.uint32)
    return (bits << np.arange(32, dtype=np.uint32)).sum(
        axis=2, dtype=np.uint32)


@pytest.mark.parametrize("G,P,N", [(1000, 3, 8192), (200, 1, 4096),
                                   (4096, 2, 8192),
                                   (8192, 1, 8192),   # H=256 route
                                   (6000, 1, 8192)])  # H=256, G<H*L
def test_pallas_group_matches_oracle(rng, G, P, N):
    gids = rng.integers(-2, G + 3, (P, N)).astype(np.int32)  # some invalid
    vals = rng.integers(0, 1 << 63, (P, N), dtype=np.uint64)
    vals[0, :16] = np.uint64(0xFFFFFFFFFFFFFFFF)             # carry stress
    maskb = rng.random((P, N)) < 0.7
    words = _pack_mask(maskb)

    counts, chunks, _, _ = GB._group_pallas(
        jnp.asarray(gids), jnp.asarray(words), jnp.asarray(vals), G)
    counts = np.asarray(counts)
    sums = GB.mxu_chunk_sums(chunks)

    ok = maskb & (gids >= 0) & (gids < G)
    want_cnt = np.zeros(G, np.int64)
    want_sum = [0] * G
    for p in range(P):
        for i in np.nonzero(ok[p])[0]:
            g = int(gids[p, i])
            want_cnt[g] += 1
            want_sum[g] += int(vals[p, i])
    np.testing.assert_array_equal(counts, want_cnt)
    assert list(sums) == want_sum


def test_pallas_group_dispatch(rng, monkeypatch):
    """The default dispatch routes group_aggregate_mxu through the Pallas
    kernel for factored-range G; allow_pallas=False keeps the XLA path."""
    monkeypatch.delenv("KNOX_NO_PALLAS_GROUP", raising=False)
    G, P, N = 512, 2, 4096
    gids = rng.integers(0, G, (P, N)).astype(np.int32)
    vals = rng.integers(0, 1 << 40, (P, N), dtype=np.uint64)
    words = np.full((P, N // 32), 0xFFFFFFFF, np.uint32)
    a = GB.group_aggregate_mxu(jnp.asarray(gids), jnp.asarray(words),
                               jnp.asarray(vals), G)
    b = GB.group_aggregate_mxu(jnp.asarray(gids), jnp.asarray(words),
                               jnp.asarray(vals), G, allow_pallas=False)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    assert list(GB.mxu_chunk_sums(a[1])) == list(GB.mxu_chunk_sums(b[1]))


def test_pick_sublanes_budget():
    """Tile-size rule: known-good shapes keep their validated S; the
    VMEM budget (hi_oh + m2 bf16 <= ~9.5 MB) never picks a tile bigger
    than the r2-cont TPU-probed ones (probes/pg3_variants.py)."""
    from knoxdb_tpu.ops.pallas_group import pick_sublanes

    assert pick_sublanes(128, 8, 4) == 16    # config-3 shape (probed +56%)
    assert pick_sublanes(128, 8, 8) == 16
    assert pick_sublanes(256, 32, 8) == 8    # r2 H=256 validated shape
    assert pick_sublanes(128, 32, 8) == 8
    assert pick_sublanes(128, 1, 1) == 32    # tiny tiles can go wide


def test_fused_partials_forced_sublanes(rng):
    """Exactness is independent of the sublane tile choice (S is a pure
    layout knob): forced S=8/16/32 all match, including the pad tail."""
    import jax.numpy as jnp

    from knoxdb_tpu.ops.pallas_group import fused_group_partials

    G, L, shift, C = 60, 1, 0, 2
    n = 5000                                  # pads differently per S
    gid = rng.integers(0, G, n).astype(np.int32)
    vlo = rng.integers(0, 1 << 16, n).astype(np.uint32)
    vhi = np.zeros(n, np.uint32)
    outs = []
    for S in (8, 16, 32):
        parts = fused_group_partials(
            jnp.asarray(gid), jnp.asarray(vlo), jnp.asarray(vhi),
            G, L, shift, n_chunks=C, interpret=True, S=S)
        outs.append(np.asarray(parts).astype(np.int64).sum(axis=0))
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])
    want = np.zeros((128, C + 1), np.int64)
    for g, v in zip(gid, vlo):
        want[g, C] += 1
        want[g, 0] += v & 0xFF
        want[g, 1] += (v >> 8) & 0xFF
    np.testing.assert_array_equal(outs[0].reshape(128, C + 1), want)


def test_multipass_bigG_oracle(rng):
    """r5 multi-pass group path (G > 8192): pass p re-runs the kernel on
    gid - p*8192 (out-of-pass rows self-exclude). Oracle-exact counts +
    chunk sums at G=20000 through _group_pallas, incl. out-of-domain and
    masked rows."""
    import jax.numpy as jnp

    from knoxdb_tpu.exec.groupby import _group_pallas

    G = 20000
    n = 65536
    gid = rng.integers(-5, G + 7, n).astype(np.int32)   # incl. invalid
    vlo = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    vhi = rng.integers(0, 1 << 8, n, dtype=np.uint64).astype(np.uint32)
    from knoxdb_tpu.ops import bitset as bs
    maskbits = rng.random(n) < 0.9
    mw = bs.np_pack_mask(maskbits).reshape(1, -1)
    keys = (vhi.astype(np.uint64) << np.uint64(32)) | vlo.astype(np.uint64)
    c_, ch, _mn, _mx = _group_pallas(
        jnp.asarray(gid).reshape(1, -1), jnp.asarray(mw),
        jnp.asarray(keys).reshape(1, -1), G, n_chunks=6)
    ok = maskbits & (gid >= 0) & (gid < G)
    want_c = np.bincount(gid[ok], minlength=G)
    np.testing.assert_array_equal(np.asarray(c_), want_c)
    want = np.zeros((G, 6), object)
    for c in range(6):
        np.add.at(want[:, c], gid[ok],
                  (keys[ok].astype(object) >> (8 * c)) & 0xFF)
    for c in range(6):
        np.testing.assert_array_equal(
            np.asarray(ch[c]).astype(object), want[:, c])


def test_group_query_bigG_engine(rng):
    """Engine-level group query above the old 16384 MXU ceiling rides
    the multi-pass kernel and stays oracle-exact."""
    import knoxdb_tpu.knox as knox
    from knoxdb_tpu.schema.schema import Builder
    from knoxdb_tpu.types import FieldType

    n = 1 << 15
    G = 20000
    db = knox.create_database("bigg", driver="mem", pack_size=4096,
                              background_merge=False)
    sch = (Builder("t").pk("id")
           .add("g", FieldType.UINT32)
           .add("v", FieldType.INT64)
           .finish())
    t = db.create_table(sch)
    g = rng.integers(0, G, n).astype(np.uint32)
    g[:G:7] = np.arange(0, G, 7)       # ensure domain spread
    v = rng.integers(-1 << 40, 1 << 40, n)
    t.insert({"id": np.zeros(n, np.uint64), "g": g, "v": v})
    t.merge()
    out = t.query().group_by("g").aggregate(("count", ""), ("sum", "v"))
    keys = np.asarray(out["keys"], np.int64)
    want_c = np.bincount(g.astype(np.int64), minlength=G)
    present = np.flatnonzero(want_c)
    order = np.argsort(keys)
    np.testing.assert_array_equal(keys[order], present)
    np.testing.assert_array_equal(
        np.asarray(out["count"])[order], want_c[present])
    wsum = np.zeros(G, object)
    np.add.at(wsum, g.astype(np.int64), v.astype(object))
    got = np.asarray(out[("sum", "v")])[order]
    assert [int(x) for x in got] == [int(wsum[i]) for i in present]
    db.close()
