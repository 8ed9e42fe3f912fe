"""Pallas TPU kernel: fused bit-sliced range filter + masked plane counts.

The hand-scheduled form of the scan hot path (ops/bitslice.py): one grid
step per pack streams that pack's bitplanes HBM->VMEM once and produces
BOTH the packed match bitset and the per-plane masked popcounts (the
inputs to an exact sum) — a single HBM pass for filter+aggregate, where
the XLA version reads the planes twice (match sweep + popcount sweep).

Outputs per pack: mask u32[W], plane_counts i32[width] (set bits of
plane&mask; host/XLA combines sum = Σ 2^p · c_p + min_key · count
exactly), count i32.

Per-pack range constants arrive as precomputed per-plane select masks
(u32 0 / ~0) plus degenerate-pack flag words, built by `range_consts()`
from u64 min_keys OUTSIDE the kernel (u64 never enters Pallas).
Correctness oracle: fused_range_sum_ref / ops.bitslice.range_planes
(tests/test_pallas_scan.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

__all__ = ["range_consts", "fused_range_sum", "fused_range_sum_ref",
           "fused_tree_sum", "fused_tree_agg", "tree_fits_vmem"]

_FULL = jnp.uint32(0xFFFFFFFF)
_FULL_NP = np.uint32(0xFFFFFFFF)     # kernel-safe constant (not traced)

# flag word columns (u32 0 / ~0 per pack)
_F_LO_LT_ALL = 0    # lo above pack domain  -> every row >= ... see bitslice
_F_LO_GE_NONE = 1   # lo below pack domain
_F_HI_IN = 2        # hi representable in pack domain (eq contributes)
_F_HI_GE_NONE = 3   # hi below pack domain  -> le_hi = none
_F_HI_LT_ALL = 4    # hi above pack domain  -> le_hi = all
_NFLAGS = 8         # padded to 8 for layout friendliness


def range_consts(min_keys, lo, hi, width: int):
    """Build per-pack kernel constants for lo <= x <= hi (value domain).

    Returns (lo_bits u32[P, w], hi_bits u32[P, w], flags u32[P, 8])."""
    from . import bitslice as B
    lo_rel, lo_lt_all, lo_ge_none, _lo_in = B._rel_const(lo, min_keys, width)
    hi_rel, hi_lt_all, hi_ge_none, hi_in = B._rel_const(hi, min_keys, width)
    P = min_keys.shape[0]

    def bits(c_rel):
        if width == 0:
            return jnp.zeros((P, 1), jnp.uint32)
        cols = [jnp.where(((c_rel >> jnp.uint64(p)) & jnp.uint64(1)) != 0,
                          _FULL, jnp.uint32(0)) for p in range(width)]
        return jnp.stack(cols, axis=1)

    def f(b):
        return jnp.where(b, _FULL, jnp.uint32(0))

    flags = jnp.zeros((P, _NFLAGS), jnp.uint32)
    flags = flags.at[:, _F_LO_LT_ALL].set(f(lo_lt_all))
    flags = flags.at[:, _F_LO_GE_NONE].set(f(lo_ge_none))
    flags = flags.at[:, _F_HI_IN].set(f(hi_in))
    flags = flags.at[:, _F_HI_GE_NONE].set(f(hi_ge_none))
    flags = flags.at[:, _F_HI_LT_ALL].set(f(hi_lt_all))
    return bits(lo_rel), bits(hi_rel), flags


_TILE = 16     # preferred packs per grid step (r4: 16 with the
               # plane-major layout measured 0.045-0.046 ms vs the r3
               # pack-major T=8 kernel's 0.054-0.067 across two pool
               # states — probes/ps_variants.py v5; per-plane slices
               # now index the LEADING block dim, no sublane relayout
               # per plane). Wide columns drop to 8: the double-
               # buffered plane block must fit scoped VMEM (w=48 at
               # T=16 measured 21.2M > the 16M limit; the compiler's
               # observed overhead is ~3.4x the raw block bytes).


def _pick_tile(w: int, P: int, W: int) -> int:
    for T in (_TILE, 8):
        if P % T == 0 and 3.4 * 4 * max(w, 1) * T * W <= 15_500_000:
            return T
    return 8
_Z = np.int32(0)   # index-map zero: a python literal 0 traces as i64 under
                   # jax_enable_x64 and Mosaic fails to legalize the map


def _range_ladder(planes_ref, lo_bits_ref, hi_bits_ref, flags_ref,
                  T: int, W: int, width: int):
    """MSB-down compare ladder over one column's plane block -> packed
    in-range word mask [T, W] (shared by the single-column and the
    whole-tree kernels)."""
    lt_lo = jnp.zeros((T, W), jnp.uint32)
    eq_lo = jnp.full((T, W), _FULL_NP, jnp.uint32)
    lt_hi = jnp.zeros((T, W), jnp.uint32)
    eq_hi = jnp.full((T, W), _FULL_NP, jnp.uint32)
    for p in range(width - 1, -1, -1):
        x = planes_ref[p]
        cl = lo_bits_ref[:, p][:, None]
        ch = hi_bits_ref[:, p][:, None]
        lt_lo = lt_lo | (eq_lo & ~x & cl)
        eq_lo = eq_lo & ~(x ^ cl)
        lt_hi = lt_hi | (eq_hi & ~x & ch)
        eq_hi = eq_hi & ~(x ^ ch)
    lt_lo = lt_lo | flags_ref[:, _F_LO_LT_ALL][:, None]
    ge_lo = ~(lt_lo & ~flags_ref[:, _F_LO_GE_NONE][:, None])
    le_hi = lt_hi | (eq_hi & flags_ref[:, _F_HI_IN][:, None])
    le_hi = le_hi | flags_ref[:, _F_HI_LT_ALL][:, None]
    le_hi = le_hi & ~flags_ref[:, _F_HI_GE_NONE][:, None]
    return ge_lo & le_hi


def _emit_counts(mask, planes_ref, pcnt_ref, cnt_ref, width: int,
                 blockwise: bool):
    """Packed-mask popcount + masked per-plane popcounts (shared)."""
    cnt_ref[:, 0] = jnp.sum(
        jax.lax.population_count(mask).astype(jnp.int32), axis=-1,
        dtype=jnp.int32)
    _emit_pcnt(mask, planes_ref, pcnt_ref, width, blockwise)


def _kernel_masked(lo_bits_ref, hi_bits_ref, flags_ref, planes_ref,
                   mask_in_ref, mask_ref, pcnt_ref, cnt_ref, *,
                   width: int, blockwise: bool = False):
    """fused cmp+sum with an INCOMING mask (validity or the XLA rest
    mask): mask_out = range-match & mask_in; pcnt = per-plane popcounts
    under mask_out. One HBM pass over the column serves both the
    predicate and the aggregate."""
    _, T, W = planes_ref.shape
    mask = _range_ladder(planes_ref, lo_bits_ref, hi_bits_ref,
                         flags_ref, T, W, width) & mask_in_ref[:, :]
    mask_ref[:, :] = mask
    _emit_counts(mask, planes_ref, pcnt_ref, cnt_ref, width, blockwise)


def fused_range_sum_masked(planes, lo_bits, hi_bits, flags, mask_in,
                           width: int, interpret: bool = False):
    """Like fused_range_sum but ANDs an incoming packed mask (the rest of
    the filter tree) instead of just validity. planes are PLANE-MAJOR
    u32[w, P, W] (r4). Returns (mask u32[P, W], plane_counts
    i32[P, w1], counts i32[P])."""
    w, P, W = planes.shape
    T = _pick_tile(w, P, W)
    assert P % T == 0, f"P must be a multiple of {T}"
    w1 = max(w, 1)
    # under shard_map pallas_call's out_shape must state how outputs
    # vary over mesh axes: inherit the input's vma (per-shard packs in
    # -> per-shard outputs out) — same rule as ops/pallas_group (r4)
    vma = getattr(getattr(mask_in, "aval", None), "vma", None)
    if vma:
        def sds(s, d):
            return jax.ShapeDtypeStruct(s, d, vma=vma)
    else:
        sds = jax.ShapeDtypeStruct
    out = pl.pallas_call(
        partial(_kernel_masked, width=width, blockwise=T == 8 and w > 28),
        grid=(P // T,),
        in_specs=[
            pl.BlockSpec((T, w1), lambda i: (i, _Z)),
            pl.BlockSpec((T, w1), lambda i: (i, _Z)),
            pl.BlockSpec((T, _NFLAGS), lambda i: (i, _Z)),
            pl.BlockSpec((w, T, W), lambda i: (_Z, i, _Z)),
            pl.BlockSpec((T, W), lambda i: (i, _Z)),
        ],
        out_specs=[
            pl.BlockSpec((T, W), lambda i: (i, _Z)),
            pl.BlockSpec((T, w1), lambda i: (i, _Z)),
            pl.BlockSpec((T, 1), lambda i: (i, _Z)),
        ],
        out_shape=[
            sds((P, W), jnp.uint32),
            sds((P, w1), jnp.int32),
            sds((P, 1), jnp.int32),
        ],
        interpret=interpret,
    )(lo_bits, hi_bits, flags, planes, mask_in)
    mask, pcnt, cnt = out
    return mask, pcnt, cnt[:, 0]


def fused_range_sum(planes, lo_bits, hi_bits, flags, valid, width: int,
                    interpret: bool = False):
    """planes u32[w, P, W] PLANE-MAJOR; consts from range_consts; valid
    u32[P, W]. Returns (mask u32[P, W], plane_counts i32[P, w1], counts
    i32[P]). Validity plays exactly the incoming-mask role, so this IS
    fused_range_sum_masked (one kernel, not two near-copies)."""
    return fused_range_sum_masked(planes, lo_bits, hi_bits, flags,
                                  valid, width, interpret=interpret)


_MM_COLS = 8   # mnmx output columns (mn_lo, mn_hi, mx_lo, mx_hi, pad)


def _emit_minmax(mask, planes_ref, mm_ref, width: int):
    """Masked per-pack (min, max) over one column's plane block via
    MSB-down candidate narrowing — the in-kernel twin of
    ops/bitslice._tournament_planes, run on the SAME planes already in
    VMEM (zero extra HBM traffic vs the XLA second pass). Emits
    PACK-RELATIVE winners split into u32 halves (no 64-bit dtypes in
    Mosaic): mm_ref[:, 0..3] = mn_lo, mn_hi, mx_lo, mx_hi. Empty packs
    read (all-ones, 0) — callers gate on count==0."""
    T = mask.shape[0]
    cand_mn = mask
    cand_mx = mask
    mn_lo = jnp.zeros((T,), jnp.uint32)
    mn_hi = jnp.zeros((T,), jnp.uint32)
    mx_lo = jnp.zeros((T,), jnp.uint32)
    mx_hi = jnp.zeros((T,), jnp.uint32)
    one = jnp.uint32(1)
    zero = jnp.uint32(0)
    for p in range(width - 1, -1, -1):
        x = planes_ref[p]
        t = cand_mn & ~x
        has = jnp.sum(jax.lax.population_count(t).astype(jnp.int32),
                      axis=-1, dtype=jnp.int32) > 0
        cand_mn = jnp.where(has[:, None], t, cand_mn)
        bit = jnp.where(has, zero, one)      # min bit 1 iff no 0 cand
        if p < 32:
            mn_lo = mn_lo | (bit << p)
        else:
            mn_hi = mn_hi | (bit << (p - 32))
        tx = cand_mx & x
        hasx = jnp.sum(jax.lax.population_count(tx).astype(jnp.int32),
                       axis=-1, dtype=jnp.int32) > 0
        cand_mx = jnp.where(hasx[:, None], tx, cand_mx)
        bitx = jnp.where(hasx, one, zero)
        if p < 32:
            mx_lo = mx_lo | (bitx << p)
        else:
            mx_hi = mx_hi | (bitx << (p - 32))
    mm_ref[:, 0] = mn_lo
    mm_ref[:, 1] = mn_hi
    mm_ref[:, 2] = mx_lo
    mm_ref[:, 3] = mx_hi
    for c in range(4, _MM_COLS):
        mm_ref[:, c] = jnp.zeros((T,), jnp.uint32)


def _emit_pcnt(mask, planes_ref, pcnt_ref, width: int, blockwise: bool):
    """Masked per-plane popcounts (the exact-sum partial). blockwise
    (wide columns, T=8 tiles): ONE [w, T, W] elementwise op + lane
    reduce + a tiny [w, T] -> [T, w] relayout — 2.5-2.7x over the
    per-plane second pass at w=41 (probes/ps_variants.py v7)."""
    if blockwise and width:
        y = jax.lax.population_count(planes_ref[:width] & mask[None])
        pcnt_ref[:, :] = jnp.sum(y.astype(jnp.int32), axis=-1,
                                 dtype=jnp.int32).T
    else:
        for p in range(width):
            pcnt_ref[:, p] = jnp.sum(
                jax.lax.population_count(planes_ref[p] & mask)
                .astype(jnp.int32), axis=-1, dtype=jnp.int32)


def _kernel_tree(*refs, nleaf: int, nfield: int, fwidths: tuple,
                 leaf_field: tuple, agg_specs: tuple, blockwise: tuple):
    """WHOLE-TREE fused scan (r4; multi-agg r5): every AND-leaf's compare
    ladder runs in ONE kernel sharing each column's single HBM pass; the
    combined mask feeds EVERY fused aggregate — per-plane popcounts (sum)
    and/or min/max tournaments per agg_specs entry — over planes already
    resident in VMEM. refs layout: [lo_b, hi_b, flags] x nleaf,
    planes x nfield, mask_in, then outputs mask, cnt, and per agg spec
    (slot, want_sum, want_mm): pcnt if want_sum, mnmx if want_mm."""
    consts = refs[:3 * nleaf]
    planes = refs[3 * nleaf:3 * nleaf + nfield]
    mask_in = refs[3 * nleaf + nfield]
    outs = refs[3 * nleaf + nfield + 1:]
    mask_ref, cnt_ref = outs[0], outs[1]
    T = mask_in.shape[0]
    W = mask_in.shape[1]

    m = mask_in[:, :]
    for j in range(nleaf):
        lo_b, hi_b, fl = consts[3 * j:3 * j + 3]
        m = m & _range_ladder(planes[leaf_field[j]], lo_b, hi_b, fl,
                              T, W, fwidths[leaf_field[j]])
    mask_ref[:, :] = m
    cnt_ref[:, 0] = jnp.sum(
        jax.lax.population_count(m).astype(jnp.int32), axis=-1,
        dtype=jnp.int32)

    k = 2
    for si, (slot, want_sum, want_mm) in enumerate(agg_specs):
        if want_sum:
            _emit_pcnt(m, planes[slot], outs[k], fwidths[slot],
                       blockwise[si])
            k += 1
        if want_mm:
            _emit_minmax(m, planes[slot], outs[k], fwidths[slot])
            k += 1


def fused_tree_agg(planes_list, leaf_ops, leaf_field, mask_in,
                   fwidths: tuple, agg_specs: tuple,
                   interpret: bool = False):
    """Whole-AND-tree fused scan + ALL fused aggregate partials in one
    HBM pass (r5 — the single-pass-HBM completion of the reference's
    matcher-on-compressed-container design, container.go:72-76).

    planes_list: per-FIELD plane arrays u32[w_f, P, W] (deduped);
    leaf_ops: per-LEAF (lo_bits, hi_bits, flags) from range_consts;
    leaf_field: per-leaf field slot; fwidths: per-field widths (static);
    agg_specs: tuple of (field_slot, want_sum, want_mm) — want_sum emits
    the masked per-plane popcounts (exact-sum partial), want_mm the
    min/max tournament words. Empty agg_specs = MASK-ONLY plan
    (count/group-by/top-k/stream queries).

    Returns (mask u32[P, W], counts i32[P], parts) where parts is one
    dict per agg spec: {"pcnt": i32[P, w_f]} and/or
    {"mnmx": u32[P, 8]} (cols mn_lo, mn_hi, mx_lo, mx_hi — PACK-RELATIVE
    values; host adds min_key)."""
    nleaf = len(leaf_ops)
    nfield = len(planes_list)
    P = mask_in.shape[0]
    W = mask_in.shape[1]
    total_w = sum(fwidths)
    T = _pick_tile(total_w, P, W)
    blockwise = tuple(T == 8 and fwidths[s] > 28
                      for s, _ws, _wm in agg_specs)

    in_specs = []
    args = []
    for (lo_b, hi_b, fl), fs in zip(leaf_ops, leaf_field):
        wf1 = max(fwidths[fs], 1)
        in_specs += [pl.BlockSpec((T, wf1), lambda i: (i, _Z)),
                     pl.BlockSpec((T, wf1), lambda i: (i, _Z)),
                     pl.BlockSpec((T, _NFLAGS), lambda i: (i, _Z))]
        args += [lo_b, hi_b, fl]
    for fs, pr in enumerate(planes_list):
        wf = fwidths[fs]
        in_specs.append(
            pl.BlockSpec((wf, T, W), lambda i: (_Z, i, _Z)))
        args.append(pr)
    in_specs.append(pl.BlockSpec((T, W), lambda i: (i, _Z)))
    args.append(mask_in)

    vma = getattr(getattr(mask_in, "aval", None), "vma", None)
    if vma:
        def sds(s, d):
            return jax.ShapeDtypeStruct(s, d, vma=vma)
    else:
        sds = jax.ShapeDtypeStruct
    out_specs = [pl.BlockSpec((T, W), lambda i: (i, _Z)),
                 pl.BlockSpec((T, 1), lambda i: (i, _Z))]
    out_shape = [sds((P, W), jnp.uint32),
                 sds((P, 1), jnp.int32)]
    for slot, want_sum, want_mm in agg_specs:
        if want_sum:
            w1 = max(fwidths[slot], 1)
            out_specs.append(pl.BlockSpec((T, w1), lambda i: (i, _Z)))
            out_shape.append(sds((P, w1), jnp.int32))
        if want_mm:
            out_specs.append(
                pl.BlockSpec((T, _MM_COLS), lambda i: (i, _Z)))
            out_shape.append(sds((P, _MM_COLS), jnp.uint32))

    out = pl.pallas_call(
        partial(_kernel_tree, nleaf=nleaf, nfield=nfield,
                fwidths=tuple(fwidths), leaf_field=tuple(leaf_field),
                agg_specs=tuple(agg_specs), blockwise=blockwise),
        grid=(P // T,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    mask, cnt = out[0], out[1][:, 0]
    parts = []
    k = 2
    for slot, want_sum, want_mm in agg_specs:
        d = {}
        if want_sum:
            d["pcnt"] = out[k]
            k += 1
        if want_mm:
            d["mnmx"] = out[k]
            k += 1
        parts.append(d)
    return mask, cnt, parts


def fused_tree_sum(planes_list, leaf_ops, leaf_field, mask_in,
                   fwidths: tuple, agg_slot: int,
                   interpret: bool = False):
    """r4 sum-only / mask-only wrapper over fused_tree_agg (kept for
    the probe/test surface). agg_slot -1 = mask-only. Returns
    (mask u32[P, W], plane_counts i32[P, max(w_agg, 1)], counts i32[P])."""
    specs = ((agg_slot, True, False),) if agg_slot >= 0 else ()
    mask, cnt, parts = fused_tree_agg(
        planes_list, leaf_ops, leaf_field, mask_in, fwidths, specs,
        interpret=interpret)
    if specs:
        pcnt = parts[0]["pcnt"]
    else:
        pcnt = jnp.zeros((mask_in.shape[0], 1), jnp.int32)
    return mask, pcnt, cnt


def tree_fits_vmem(fwidths, P: int, W: int) -> bool:
    """Host-side gate: does the whole-tree kernel's plane working set
    fit scoped VMEM at some tile size? (same 3.4x model as _pick_tile)."""
    total_w = sum(fwidths)
    return P % 8 == 0 and 3.4 * 4 * max(total_w, 1) * 8 * W <= 15_500_000


def fused_range_sum_ref(planes, min_keys, valid, lo, hi, width: int):
    """XLA reference implementation (same outputs) for oracle testing."""
    from . import bitslice as B
    mask = B.range_planes(planes, min_keys, lo, hi, width) & valid
    cnt = jax.lax.population_count(mask).astype(jnp.int32).sum(axis=-1)
    if width:
        pcnt = jnp.stack([
            jax.lax.population_count(planes[p] & mask)
            .astype(jnp.int32).sum(axis=-1)
            for p in range(width)], axis=1)
    else:
        pcnt = jnp.zeros((planes.shape[1], 1), jnp.int32)
    return mask, pcnt, cnt
