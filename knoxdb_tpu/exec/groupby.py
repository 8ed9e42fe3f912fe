"""Group-by aggregation over device segments.

The reference only has streaming time-bucket reducers
(/root/reference/internal/reducer/reducer.go:24-48) and lists group-by as
TODO (internal/query/plan.go:26-34) — this operator EXCEEDS reference
parity per the BASELINE north star (config #3: group-by account with
sum/min/max over decimal balances).

TPU-first design: group ids are materialized per row from the compressed
form without a hash table —
- DICT packs: per-pack code -> global-group LUT built on the host from the
  per-pack dictionaries (host knows every dict; the union IS the group
  domain), applied as one gather
- BITPACK/RLE/CONST packs with a small global key range: gid = key - min
- time buckets: gid = (ts - t0) // interval (series path)
then per-group masked aggregation runs as segment-sums over split 8-bit
value planes so every partial stays exactly representable (f32/i32-safe),
recombined on the host with python ints. Group cardinality is static per
query (from zone maps), so the whole thing jits with traced constants.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..encode.schemes import Scheme
from ..ops import bitset as bs
from ..types import FieldType
from . import device as D

__all__ = ["GroupPlan", "plan_groups", "group_aggregate", "MAX_GROUPS"]

MAX_GROUPS = 1 << 16


@dataclass
class GroupPlan:
    """Host-side group domain for one segment + group column."""
    keys: np.ndarray            # u64[G] or object[G]: group keyform keys
    G: int
    # per device-group gid materialization inputs:
    mode: list                  # per group: ("lut", lut u32[Pg,k]) |
    #                                        ("range", gmin) | ("const", gids)

    def key_values(self, ft: FieldType):
        from ..utils import limbs as lb
        if ft.is_bytes_like:
            if ft == FieldType.STRING:
                return np.array([b.decode() for b in self.keys], object)
            return np.array(list(self.keys), object)
        if ft.nlimbs <= 2:
            L = ft.nlimbs
            limbs = np.zeros((L, self.G), np.uint32)
            for i, k in enumerate(self.keys):
                kk = int(k)
                for l in range(L - 1, -1, -1):
                    limbs[l, i] = kk & 0xFFFFFFFF
                    kk >>= 32
            return lb.from_keyform(limbs, ft)
        bias = 1 << (ft.bits - 1) if ft.is_signed else 0
        return np.array([int(k) - bias for k in self.keys], object)


def plan_groups(dseg: D.DeviceSegment, fname: str,
                global_keys: np.ndarray | None = None) -> GroupPlan:
    """Build the group domain + per-device-group gid recipe.

    global_keys: optional externally-imposed domain (multi-segment union,
    computed by the table layer); must be sorted keyform u64."""
    col = dseg.seg.columns[fname]
    dcol = dseg.column(fname)
    fs = dseg.seg.stats.fields[fname]

    if global_keys is None:
        global_keys = segment_group_keys(dseg, fname)
    G = len(global_keys)
    if G > MAX_GROUPS:
        raise ValueError(
            f"group-by {fname}: {G} groups exceeds MAX_GROUPS={MAX_GROUPS}; "
            f"use a bucket expression or a lower-cardinality key")

    if col.wide:
        raise ValueError(f"group-by {fname}: wide (>64-bit) group keys are "
                         f"not supported; bucket or dict-encode first")
    is_bytes = col.field.type.is_bytes_like
    key_index = {k: i for i, k in enumerate(global_keys)} if is_bytes else None
    modes = []
    for g in dcol.groups:
        if g.scheme == Scheme.DICT:
            lut = np.zeros((g.npacks, g.k), np.uint32)
            for j in range(g.npacks):
                if is_bytes:
                    gid = np.array([key_index[b] for b in g.dict_bytes[j]],
                                   np.uint32)
                else:
                    gid = np.searchsorted(global_keys,
                                          g.dict_keys[j]).astype(np.uint32)
                lut[j, :len(gid)] = gid
                lut[j, len(gid):] = gid[-1] if len(gid) else 0
            modes.append(("lut", lut))
        elif g.scheme == Scheme.CONST:
            vals = np.empty(g.npacks, np.uint64)
            for j in range(g.npacks):
                from .rewrite import _pack_const_value
                vals[j] = _pack_const_value(col, g, j) if not g.wide else 0
            gids = np.searchsorted(global_keys, vals).astype(np.uint32)
            modes.append(("const", gids))
        else:
            dense = (not is_bytes and G > 0
                     and int(global_keys[-1]) - int(global_keys[0]) + 1 == G)
            if dense:
                # gid = key - min: pure elementwise (searchsorted on
                # [P*N] rows is gather-bound, ~100x slower on TPU)
                modes.append(("range", int(global_keys[0])))
            else:
                modes.append(("search", global_keys.astype(np.uint64)))
    return GroupPlan(global_keys, G, modes)


def plan_buckets(dseg: D.DeviceSegment, fname: str, t0: int, interval: int,
                 G: int) -> GroupPlan:
    """Time-bucket grouping: gid = (key - t0) // interval, clamped to
    [0, G) with out-of-range rows -> bin G (dropped). The series layer
    (knoxdb_tpu/series.py) builds bucket keys t0 + i*interval.

    r4 fast paths (the u64-EMULATED division was 3.58 ms of the 10.7 ms
    series program — probes/series_profile.py stage profile): when the
    in-range rel domain G*interval fits 31 bits the gid computes from
    u32 halves with a u32 divide ("bucket32"), and a power-of-two
    interval becomes a STATIC shift baked into the mode tag
    ("bucket32s:<k>" — part of the jit signature, one retrace per
    distinct shift)."""
    dcol = dseg.column(fname)
    keys = np.arange(G, dtype=np.uint64) * np.uint64(interval) + np.uint64(t0)
    fits32 = G * interval < (1 << 31)
    if fits32 and interval & (interval - 1) == 0:
        tag = f"bucket32s:{interval.bit_length() - 1}"
    elif fits32:
        tag = "bucket32"
    else:
        tag = "bucket"
    modes = [(tag, np.uint64(t0), np.uint64(interval))
             for _ in dcol.groups]
    return GroupPlan(keys, G, modes)


def segment_group_keys(dseg: D.DeviceSegment, fname: str) -> np.ndarray:
    """Group key domain of one segment from host metadata only."""
    col = dseg.seg.columns[fname]
    dcol = dseg.column(fname)
    fs = dseg.seg.stats.fields[fname]
    if col.field.type.is_bytes_like:
        alls: set = set()
        for g in dcol.groups:
            for db in g.dict_bytes:
                alls.update(db)
        return np.array(sorted(alls), object)
    keysets = []
    dense_range = False
    for g in dcol.groups:
        if g.scheme == Scheme.DICT:
            keysets.extend(g.dict_keys)
        else:
            dense_range = True
    if dense_range:
        # EMPTY packs (SPMD mesh padding appends zero-row packs so P
        # divides ndev) carry zero stats — including them makes a
        # signed column's range span the keyform bias (r4 probe find)
        mk, xk = fs.min_key, fs.max_key
        nr = np.asarray(getattr(dseg.seg.stats, "nrows", ()))
        if nr.shape == mk.shape and (nr > 0).any():
            mk, xk = mk[nr > 0], xk[nr > 0]
        gmin = int(np.min(mk))
        gmax = int(np.max(xk))
        if gmax - gmin + 1 > MAX_GROUPS:
            raise ValueError(
                f"group-by {fname}: key range {gmax - gmin + 1} too wide for "
                f"dense grouping; dict-encode the column or bucket it")
        keysets.append(np.arange(gmin, gmax + 1, dtype=np.uint64))
    return np.unique(np.concatenate(keysets).astype(np.uint64))


def _pow2(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


def gid_consts(gplan: GroupPlan):
    """Traced per-device-group constants for row_gids (tags are static)."""
    out = []
    for m in gplan.mode:
        if m[0] in ("lut", "const"):
            out.append(jnp.asarray(m[1]).astype(jnp.int32))
        elif m[0].startswith("bucket"):
            out.append((jnp.uint64(m[1]), jnp.uint64(m[2])))
        elif m[0] == "range":
            out.append(jnp.uint64(m[1]))
        else:
            out.append(jnp.asarray(m[1]))
    return out


def row_gids(mode_tags: tuple, gsigs: tuple, gidxs: tuple,
             arrays_by_group, gconsts, W: int):
    """Materialize gid i32[P, N] for the whole segment (device, jittable).

    mode_tags/gsigs/gidxs are static; arrays/gconsts traced."""
    outs = []
    for gi, (tag, gsig, idx) in enumerate(zip(mode_tags, gsigs, gidxs)):
        arrs = arrays_by_group[gi]
        width = gsig[1]          # DeviceGroup.sig() = (scheme, width, ...)
        if tag == "lut":
            from ..encode import schemes as S
            codes = S.decode_bitplanes_u32(arrs["planes"], width) \
                .astype(jnp.int32)
            lut = gconsts[gi]
            if lut.shape[1] <= D._MXU_LOOKUP_MAX_K:
                # one-hot MXU lookup, not a [Pg, N] gather (~30x slower
                # on TPU; exec/device.onehot_lookup_u16)
                gid = D.onehot_lookup_u16(codes, lut)
            else:
                gid = jnp.take_along_axis(lut, codes, axis=1)
        elif tag == "const":
            gid = jnp.broadcast_to(gconsts[gi][:, None],
                                   (gconsts[gi].shape[0], W * 32))
        elif tag.startswith("bucket32"):
            # 32-BIT bucket gids (r4): rel = key - t0 via u32 borrow
            # halves; in-range rels fit 31 bits (plan-guaranteed), so
            # the divide is a native u32 op — or a STATIC shift when
            # the interval is a power of two (tag "bucket32s:<k>").
            # The u64-emulated divide this replaces cost 3.58 ms per
            # 4.2M rows (probes/series_profile.py).
            t0, iv = gconsts[gi]
            lo, hi = D.group_decode_halves(gsig, arrs, W)
            th = jax.lax.bitcast_convert_type(t0, jnp.uint32)
            borrow = (lo < th[0]).astype(jnp.uint32)
            rel_lo = lo - th[0]
            rel_hi = hi - th[1] - borrow
            below = (hi < th[1]) | ((hi == th[1]) & (lo < th[0]))
            in32 = rel_hi == 0
            if tag.startswith("bucket32s:"):
                sh = jnp.uint32(int(tag.split(":")[1]))
                g32 = (rel_lo >> sh).astype(jnp.int32)
            else:
                g32 = (rel_lo // iv.astype(jnp.uint32)).astype(jnp.int32)
            # out-of-u32-range rels are necessarily >= G*interval: park
            # them in a huge bin (callers clamp gid >= G to the drop bin)
            gid = jnp.where(below, jnp.int32(-1),
                            jnp.where(in32, g32, jnp.int32(1 << 30)))
        elif tag == "bucket":
            t0, iv = gconsts[gi]
            keys = D.group_decode_keys(gsig, arrs, W)
            below = keys < t0
            gid = ((keys - t0) // iv).astype(jnp.int32)
            gid = jnp.where(below, jnp.int32(-1), gid)
        elif tag == "range":
            gmin = gconsts[gi]
            # u32 borrow arithmetic on decoded halves — the u64 decode
            # chain is fusion-hostile (TPU-profiled r2). keys < gmin
            # wraps diff_hi to nonzero, so inb covers both bounds.
            lo, hi = D.group_decode_halves(gsig, arrs, W)
            gh = jax.lax.bitcast_convert_type(gmin, jnp.uint32)
            diff_lo = lo - gh[0]
            borrow = (lo < gh[0]).astype(jnp.uint32)
            diff_hi = hi - gh[1] - borrow
            inb = (diff_hi == 0) & (diff_lo < jnp.uint32(1 << 31))
            gid = jnp.where(inb, diff_lo.astype(jnp.int32), jnp.int32(-1))
        else:
            keys = D.group_decode_keys(gsig, arrs, W)
            gid = jnp.searchsorted(gconsts[gi], keys).astype(jnp.int32)
        outs.append(gid)
    total_P = sum(o.shape[0] for o in outs)
    if len(outs) == 1:
        return outs[0]          # single full-coverage group: no scatter
    full = jnp.zeros((total_P, W * 32), jnp.int32)
    for gid, idx in zip(outs, gidxs):
        full = full.at[idx].set(gid)
    return full


def f64_to_keyform(vf):
    """f64 VALUES -> order-preserving u64 keyform (inverse of
    keyform_to_f64's float branch; utils/limbs.to_keyform device form).
    All bit twiddling runs on u32 halves — emulated u64 shifts are
    unreliable in some fusion contexts on this stack (CLAUDE.md)."""
    h = jax.lax.bitcast_convert_type(vf, jnp.uint32)   # [..., 2] lo, hi
    lo, hi = h[..., 0], h[..., 1]
    sign = (hi >> jnp.uint32(31)) != 0
    klo = jnp.where(sign, ~lo, lo)
    khi = jnp.where(sign, ~hi, hi ^ jnp.uint32(0x80000000))
    pair = jnp.stack([klo, khi], axis=-1)
    return jax.lax.bitcast_convert_type(pair, jnp.uint64)


def keyform_to_f64(keys, bias, is_float: bool):
    """u64 keyform -> f64 VALUE (jit). Ints: (key - bias) signed mod-2^64
    interp (exact < 2^53); floats: invert the order-preserving bit trick
    (utils/limbs.py to_keyform: sign-flip / complement)."""
    if is_float:
        sign = (keys & jnp.uint64(1 << 63)) != 0
        bits = jnp.where(sign, keys ^ jnp.uint64(1 << 63), ~keys)
        return jax.lax.bitcast_convert_type(bits, jnp.float64)
    u = keys - bias                      # value domain, wraps for 64-bit
    # signed interp via i64 bitcast: exact for |v| < 2^53 (a u64->f64
    # convert of a wrapped small negative rounds to 2^64 and the naive
    # `f - 2^64` correction collapses to 0)
    return jax.lax.bitcast_convert_type(u, jnp.int64).astype(jnp.float64)


def group_moments(gids, mask_words, vals, G: int, bias=None,
                  is_float: bool = False):
    """Per-group float moments for var/std reducers (reference
    reducer.go:352-381 VarReducer): (counts i64[G], sum f64[G],
    sumsq f64[G]) over VALUE-domain f64. vals is u64 keyform for int
    columns (bias required) or f64 VALUES for float columns (ALP packs
    decode pack-locally, so the caller converts — exec/scan.series_scan).
    Reduction order is FIXED (sorted by gid, then value, cumsum) —
    deterministic for a given segment geometry; float contract
    documented in series.py. PRECISION NOTE: segmentation is
    cumsum-difference per pack, so a bucket's moments carry relative
    error ~eps * (pack prefix sum / bucket sum); an extreme outlier
    (|v| >~ 2^52) in one bucket degrades later buckets co-located in
    the same pack (the reference's per-bucket Welford does not — but
    its f64 accumulators blow up on the same inputs)."""
    mask = bs.unpack_mask(mask_words)
    ok = mask & (gids >= 0) & (gids < G)
    gid = jnp.where(ok, gids, G)
    if is_float:
        gs, vs_s = jax.lax.sort((gid, vals), dimension=1, num_keys=1,
                                is_stable=True)
        oks = gs < G
        vs = jnp.where(oks, vs_s, jnp.float64(0))
    else:
        # co-sort the value keyform as two u32 limbs (variadic sort)
        k_hi = (vals >> jnp.uint64(32)).astype(jnp.uint32)
        k_lo = vals.astype(jnp.uint32)
        gs, kh, kl = jax.lax.sort((gid, k_hi, k_lo), dimension=1,
                                  num_keys=1, is_stable=True)
        keys_s = (kh.astype(jnp.uint64) << jnp.uint64(32)) \
            | kl.astype(jnp.uint64)
        oks = gs < G
        vs = jnp.where(oks, keyform_to_f64(keys_s, bias, False),
                       jnp.float64(0))

    cs = jnp.cumsum(vs, axis=1)
    cq = jnp.cumsum(vs * vs, axis=1)
    cn = jnp.cumsum(oks.astype(jnp.int64), axis=1)
    z = jnp.zeros((gs.shape[0], 1))
    cs = jnp.concatenate([z.astype(jnp.float64), cs], axis=1)
    cq = jnp.concatenate([z.astype(jnp.float64), cq], axis=1)
    cn = jnp.concatenate([z.astype(jnp.int64), cn], axis=1)
    targets = jnp.arange(G + 1, dtype=jnp.int32)
    lb = jax.vmap(lambda row: jnp.searchsorted(row, targets))(gs)

    def seg(c):
        return (jnp.take_along_axis(c, lb[:, 1:], axis=1)
                - jnp.take_along_axis(c, lb[:, :-1], axis=1))

    return (seg(cn).sum(axis=0), seg(cs).sum(axis=0),
            seg(cq).sum(axis=0))


def group_first_last(gids, mask_words, ts_keys, val_keys, G: int):
    """Per-group FIRST/LAST value by TIMESTAMP order (reference
    reducer.go:198-247; ties broken by in-pack row order). Returns
    (first_ts, first_val, last_ts, last_val) u64 keyform [G] + counts,
    with empty groups at (u64max, 0) / (0, 0) sentinels — callers
    combine partials across segments by (ts) ordering."""
    mask = bs.unpack_mask(mask_words)
    ok = mask & (gids >= 0) & (gids < G)
    gid = jnp.where(ok, gids, G)
    t_hi = (ts_keys >> jnp.uint64(32)).astype(jnp.uint32)
    t_lo = ts_keys.astype(jnp.uint32)
    v_hi = (val_keys >> jnp.uint64(32)).astype(jnp.uint32)
    v_lo = val_keys.astype(jnp.uint32)
    gs, th, tl, vh, vl = jax.lax.sort((gid, t_hi, t_lo, v_hi, v_lo),
                                      dimension=1, num_keys=3,
                                      is_stable=True)
    inb = gs < G
    ts_s = (th.astype(jnp.uint64) << jnp.uint64(32)) | tl.astype(jnp.uint64)
    vs_s = (vh.astype(jnp.uint64) << jnp.uint64(32)) | vl.astype(jnp.uint64)

    ccnt = jnp.cumsum(inb.astype(jnp.int64), axis=1)
    ccnt = jnp.concatenate([jnp.zeros((gs.shape[0], 1), jnp.int64), ccnt],
                           axis=1)
    targets = jnp.arange(G + 1, dtype=jnp.int32)
    lb = jax.vmap(lambda row: jnp.searchsorted(row, targets))(gs)
    has = (jnp.take_along_axis(ccnt, lb[:, 1:], axis=1)
           - jnp.take_along_axis(ccnt, lb[:, :-1], axis=1)) > 0
    first_i = jnp.minimum(lb[:, :-1], gs.shape[1] - 1)
    last_i = jnp.clip(lb[:, 1:] - 1, 0, gs.shape[1] - 1)
    U = jnp.uint64(0xFFFFFFFFFFFFFFFF)
    f_ts = jnp.where(has, jnp.take_along_axis(ts_s, first_i, axis=1), U)
    f_v = jnp.where(has, jnp.take_along_axis(vs_s, first_i, axis=1),
                    jnp.uint64(0))
    l_ts = jnp.where(has, jnp.take_along_axis(ts_s, last_i, axis=1),
                     jnp.uint64(0))
    l_v = jnp.where(has, jnp.take_along_axis(vs_s, last_i, axis=1),
                    jnp.uint64(0))
    counts = (jnp.take_along_axis(ccnt, lb[:, 1:], axis=1)
              - jnp.take_along_axis(ccnt, lb[:, :-1], axis=1)).sum(axis=0)
    # combine packs: first = entry of the pack with the smallest ts
    # (argmin tie -> EARLIEST pack = earliest rows); last = largest ts
    # with ties taking the LATEST pack (reverse-argmax)
    P = f_ts.shape[0]
    fi = jnp.argmin(f_ts, axis=0)
    li = (P - 1) - jnp.argmax(l_ts[::-1], axis=0)
    gi = jnp.arange(G)
    return (f_ts[fi, gi], f_v[fi, gi], l_ts[li, gi], l_v[li, gi], counts)


def group_ts_runs(gids, mask_words, ts_keys, val_keys, G: int, bias):
    """Per-bucket TS-RUN aggregates for the reference's *_join reducers
    (reducer.go:460-700: rows sharing one timestamp are summed, then the
    base reducer applies to the per-timestamp sums).

    One GLOBAL stable sort of the whole segment by (gid, ts) coalesces
    equal-ts rows into runs; cumsum differences give exact split-limb run
    sums. Because a timestamp may also appear in OTHER segments or the
    journal, each bucket's FIRST and LAST run are returned separately
    (exact ts + count + limb sums) so the host can merge equal-ts
    boundary runs across contributors; interior runs (which can only
    collide when contributor ts-ranges interleave — detected on the host,
    which then falls back to an exact recompute) are pre-reduced here.

    bias: u64 keyform bias of the value type (2^(bits-1) signed, else 0);
    run sums are produced in the VALUE domain mod 2^64 (overflow wraps,
    matching the reference's native int semantics).

    Returns [G]-arrays: (n_runs i64, first_ts u64, first_cnt i64,
    first_lo u64, first_hi u64, last_ts, last_cnt, last_lo, last_hi,
    int_min u64 keyform, int_max u64 keyform, int_n i64, int_sum f64,
    int_sumsq f64) — int_* cover interior runs only.
    """
    mask = bs.unpack_mask(mask_words)
    ok = (mask & (gids >= 0) & (gids < G)).reshape(-1)
    gid = jnp.where(ok, gids.reshape(-1), G)
    M = gid.shape[0]
    t_hi = (ts_keys >> jnp.uint64(32)).astype(jnp.uint32).reshape(-1)
    t_lo = ts_keys.astype(jnp.uint32).reshape(-1)
    v_hi = (val_keys >> jnp.uint64(32)).astype(jnp.uint32).reshape(-1)
    v_lo = val_keys.astype(jnp.uint32).reshape(-1)
    gs, th, tl, vh, vl = jax.lax.sort((gid, t_hi, t_lo, v_hi, v_lo),
                                      dimension=0, num_keys=3,
                                      is_stable=True)
    inb = gs < G                       # in-bound rows are a prefix
    minb = jnp.sum(inb.astype(jnp.int32))
    ts = (th.astype(jnp.uint64) << jnp.uint64(32)) | tl.astype(jnp.uint64)
    key = (vh.astype(jnp.uint64) << jnp.uint64(32)) | vl.astype(jnp.uint64)
    v = jnp.where(inb, key - bias, jnp.uint64(0))   # value domain, wraps

    # run starts: first row, or (gid, ts) change — in-bound rows only
    idx = jnp.arange(M, dtype=jnp.int32)
    chg = (idx == 0) | (gs != jnp.roll(gs, 1)) | (th != jnp.roll(th, 1)) \
        | (tl != jnp.roll(tl, 1))
    st = inb & chg
    # run r occupies [starts[r], starts[r+1]) clipped to the inb prefix
    starts = jax.lax.sort(jnp.where(st, idx, jnp.int32(M)))      # [M]
    nxt = jnp.concatenate([starts[1:], jnp.full(1, M, jnp.int32)])
    s_c = jnp.clip(starts, 0, minb)
    e_c = jnp.clip(nxt, 0, minb)
    run_valid = starts < minb
    gpos = jnp.minimum(starts, M - 1)
    run_gid = jnp.where(run_valid, gs[gpos], G)
    run_ts = jnp.where(run_valid, ts[gpos], jnp.uint64(0))
    run_cnt = (e_c - s_c).astype(jnp.int64)

    z64 = jnp.zeros(1, jnp.uint64)
    clo = jnp.concatenate([z64, jnp.cumsum(v & jnp.uint64(0xFFFFFFFF))])
    chi = jnp.concatenate([z64, jnp.cumsum(v >> jnp.uint64(32))])
    run_lo = clo[e_c] - clo[s_c]       # exact: <= M * 2^32 < 2^64
    run_hi = chi[e_c] - chi[s_c]

    # per-bucket run boundaries (runs are sorted by (gid, ts))
    targets = jnp.arange(G + 1, dtype=jnp.int32)
    lbr = jnp.searchsorted(run_gid, targets).astype(jnp.int32)   # [G+1]
    n_runs = (lbr[1:] - lbr[:-1]).astype(jnp.int64)
    has = n_runs > 0
    fi = jnp.minimum(lbr[:-1], M - 1)
    li = jnp.clip(lbr[1:] - 1, 0, M - 1)
    U = jnp.uint64(0xFFFFFFFFFFFFFFFF)
    f_ts = jnp.where(has, run_ts[fi], U)
    f_cnt = jnp.where(has, run_cnt[fi], 0)
    f_lo = jnp.where(has, run_lo[fi], jnp.uint64(0))
    f_hi = jnp.where(has, run_hi[fi], jnp.uint64(0))
    l_ts = jnp.where(has, run_ts[li], jnp.uint64(0))
    l_cnt = jnp.where(has, run_cnt[li], 0)
    l_lo = jnp.where(has, run_lo[li], jnp.uint64(0))
    l_hi = jnp.where(has, run_hi[li], jnp.uint64(0))

    # interior runs: drop each bucket's first and last run
    first_of = idx == lbr[jnp.clip(run_gid, 0, G)]
    last_of = idx == (lbr[jnp.clip(run_gid, 0, G) + 1] - 1)
    m_int = run_valid & ~first_of & ~last_of

    # moments over interior run sums (f64 contract, reducer.go:352-381);
    # signed interpretation of the wrapped mod-2^64 sum
    s_mod = run_lo + (run_hi << jnp.uint64(32))
    # signed interp via i64 bitcast (see keyform_to_f64: the naive
    # u64->f64 + "- 2^64" correction collapses small negatives to 0)
    s_f = jax.lax.bitcast_convert_type(s_mod, jnp.int64) \
        .astype(jnp.float64)
    s_f = jnp.where(m_int, s_f, jnp.float64(0))
    zf = jnp.zeros(1, jnp.float64)
    zi = jnp.zeros(1, jnp.int64)
    cs = jnp.concatenate([zf, jnp.cumsum(s_f)])
    cq = jnp.concatenate([zf, jnp.cumsum(s_f * s_f)])
    cn = jnp.concatenate([zi, jnp.cumsum(m_int.astype(jnp.int64))])
    i_n = cn[lbr[1:]] - cn[lbr[:-1]]
    i_sum = cs[lbr[1:]] - cs[lbr[:-1]]
    i_sumsq = cq[lbr[1:]] - cq[lbr[:-1]]

    # interior min/max over ORDER-PRESERVING sum keyform (wrap matches
    # native overflow): second sort of runs by (gid, sum-key)
    sk = s_mod + bias
    g2 = jnp.where(m_int, run_gid, G)
    sk_hi = (sk >> jnp.uint64(32)).astype(jnp.uint32)
    sk_lo = sk.astype(jnp.uint32)
    g2s, skh, skl = jax.lax.sort((g2, sk_hi, sk_lo), dimension=0,
                                 num_keys=3)
    sks = (skh.astype(jnp.uint64) << jnp.uint64(32)) | skl.astype(jnp.uint64)
    lb2 = jnp.searchsorted(g2s, targets).astype(jnp.int32)
    has2 = (lb2[1:] - lb2[:-1]) > 0
    i_min = jnp.where(has2, sks[jnp.minimum(lb2[:-1], M - 1)], U)
    i_max = jnp.where(has2, sks[jnp.clip(lb2[1:] - 1, 0, M - 1)],
                      jnp.uint64(0))
    return (n_runs, f_ts, f_cnt, f_lo, f_hi, l_ts, l_cnt, l_lo, l_hi,
            i_min, i_max, i_n, i_sum, i_sumsq)


MXU_MAX_G = 65536    # one-hot path ceiling == MAX_GROUPS since r5: the
#                      multi-pass Pallas kernel (_group_pallas, 8192
#                      groups/pass) beats the sort path at every legal G
#                      (TPU-measured probes/pg_bigG.py: G=65536 mp-vec
#                      ~90 M vs sort 4 M rows/s; the sort's [P, G+1]
#                      boundary gathers scale with G)
_MXU_TILE = 8192     # rows per matmul step (15 * tile < 2^31: i32-exact;
#                      bigger tiles amortize the scan-step overhead)
_MXU_FACTORED_MIN_G = 192   # below this the flat one-hot moves less data
_MXU_H = 128         # factored hi-bin count = MXU output tile rows
# factored-path rows per scan step: the f32 exactness ceiling is
# 255 * T < 2^24 (byte-chunk partial sums accumulate in f32), so 65536
# is the largest legal power of two; bigger tiles = fewer scan steps =
# less per-step overhead (measured dominant at 8192). Env knob for
# on-TPU sweeps.
_MXU_FTILE = int(__import__("os").environ.get("KNOX_MXU_FTILE", "65536"))


def _value_halves(value_keys, bias):
    """(lo, hi) u32 value halves with the chunk_plan bias subtracted.
    Accepts either a (lo, hi) u32 pair (exec/device.group_decode_halves
    — the fused u32 decode path) or a u64 array (bitcast-split). The
    bias subtract runs in u32 borrow arithmetic: emulated u64 subtract
    chains are fusion-hostile on this stack (CLAUDE.md x64 hazard)."""
    if isinstance(value_keys, tuple):
        vlo, vhi = value_keys
    else:
        h = jax.lax.bitcast_convert_type(value_keys, jnp.uint32)
        vlo, vhi = h[..., 0], h[..., 1]
    if bias is not None:
        bh = jax.lax.bitcast_convert_type(bias, jnp.uint32)
        lo2 = vlo - bh[0]
        borrow = (vlo < bh[0]).astype(jnp.uint32)
        vlo, vhi = lo2, vhi - bh[1] - borrow
    return vlo, vhi


def square_halves(rlo):
    """EXACT r^2 as (lo, hi) u32 halves for r = rlo < 2^32, using ONLY
    32-bit multiplies/shifts of 16-bit limbs (the emulated u64
    multiply/shift lowering is unreliable on this stack — CLAUDE.md):
    r = a + 2^16 b  =>  r^2 = a^2 + 2^17 ab + 2^32 b^2."""
    a = rlo & jnp.uint32(0xFFFF)
    b = rlo >> jnp.uint32(16)
    p0 = a * a
    p1 = a * b
    p2 = b * b
    t = p1 << jnp.uint32(17)
    lo = p0 + t
    carry = (lo < p0).astype(jnp.uint32)
    hi = p2 + (p1 >> jnp.uint32(15)) + carry
    return lo, hi


def chunk_plan(fstats) -> tuple[int, int]:
    """(n_chunks, bias) for the MXU group kernels from a column's zone
    maps: values rebased by `bias` fit n_chunks*8 bits, so the one-hot
    chunk matrix shrinks from 8 byte columns to n_chunks (one-hot HBM
    traffic and MXU MACs scale with it — signed keyforms carry a 2^63
    offset that otherwise forces all 8). Host combine restores exact
    sums via sum += bias * count. Falls back to (8, 0) when stats are
    missing or wide (object min/max)."""
    if fstats is None or fstats.min_key.dtype == object:
        return 8, 0
    gmin = int(fstats.min_key.min())
    gmax = int(fstats.max_key.max())
    c0 = max(1, -(-gmax.bit_length() // 8))
    cb = max(1, -(-(gmax - gmin).bit_length() // 8))
    if cb < min(c0, 8):
        return cb, gmin
    return min(c0, 8), 0


def _group_mxu_factored(gids, mask_words, value_keys, G: int,
                        n_chunks: int = 8, bias=None):
    """Two-level one-hot MXU group (count, sum): gid = hi*L + lo.

    The flat kernel's floor is the materialized [T, G] one-hot — 2*G
    bytes/row of HBM traffic (~2 KB at G=1000 -> ~300 M rows/s
    measured). Factoring the group id over a fixed H=128 hi axis and an
    L = 2^ceil(log2(G/H)) lo axis turns the aggregation into ONE
    [H, T] @ [T, L*9] bf16 matmul per tile whose output [H, L*9]
    scatters nothing: entry (h, l*9+c) accumulates chunk c of rows with
    gid == h*L + l. Traffic drops to 2*H + 18*L bytes/row (~400 B at
    G=1000, 5x less); H=128 exactly fills the MXU output tile so the
    padding a smaller hi axis would waste is avoided.

    Exactness: per-tile f32 entries <= 255 * 8192 < 2^24; cross-tile
    accumulation is u64 ADDS only (emulated u64 shift/multiply is
    unreliable on this stack — byte recombination on the HOST,
    mxu_chunk_sums). Same contract as group_aggregate_mxu: count/sum
    only, mn/mx are empty sentinels."""
    L = 1
    while _MXU_H * L < G:
        L <<= 1
    H = -(-G // L)
    shift = L.bit_length() - 1
    SENT = H * L                 # >= G: hi == H -> all-zero one-hot col

    C = n_chunks
    NC = C + 1
    mask = bs.unpack_mask(mask_words)
    ok = mask & (gids >= 0) & (gids < G)
    gid = jnp.where(ok, gids, SENT).reshape(-1)
    vlo, vhi = _value_halves(value_keys, bias)
    vlo = jnp.where(ok, vlo, jnp.uint32(0)).reshape(-1)
    vhi = jnp.where(ok, vhi, jnp.uint32(0)).reshape(-1)

    n = gid.shape[0]
    T = min(_MXU_FTILE, n)
    B = -(-n // T)
    pad = B * T - n
    if pad:
        gid = jnp.concatenate([gid, jnp.full(pad, SENT, jnp.int32)])
        vlo = jnp.concatenate([vlo, jnp.zeros(pad, jnp.uint32)])
        vhi = jnp.concatenate([vhi, jnp.zeros(pad, jnp.uint32)])
    gm = gid.reshape(B, T)
    vlom = vlo.reshape(B, T)
    vhim = vhi.reshape(B, T)
    hrange = jnp.arange(H, dtype=jnp.int32)
    lrange = jnp.arange(L, dtype=jnp.int32)

    def step(carry, xs):
        g_t, vlo_t, vhi_t = xs
        # chunk matrix built IN the body from 12 B/row of inputs — the
        # [T, L*NC] expansion is elementwise and can fuse into the
        # matmul's operand load
        cols = []
        for c in range(C):
            h = vlo_t if c < 4 else vhi_t
            cols.append(((h >> jnp.uint32(8 * (c % 4)))
                         & jnp.uint32(0xFF)).astype(jnp.bfloat16))
        cols.append(jnp.ones(g_t.shape, jnp.bfloat16))      # count col
        cm = jnp.stack(cols, axis=-1)                       # [T, NC]
        lo_oh = (jnp.bitwise_and(g_t, L - 1)[:, None]
                 == lrange[None, :]).astype(jnp.bfloat16)   # [T, L]
        m_t = (lo_oh[:, :, None] * cm[:, None, :]).reshape(T, L * NC)
        hi_oh = ((g_t >> shift)[None, :]
                 == hrange[:, None]).astype(jnp.bfloat16)   # [H, T]
        part = jax.lax.dot_general(
            hi_oh, m_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # [H, L*NC]
        return carry + part.astype(jnp.uint32).astype(jnp.uint64), None

    # init derives from the data so it carries the same varying-axes type
    # under shard_map (see group_aggregate_mxu)
    vzero = gm[0, 0].astype(jnp.uint64) & jnp.uint64(0)
    acc0 = jnp.zeros((H, L * NC), jnp.uint64) + vzero
    acc, _ = jax.lax.scan(step, acc0, (gm, vlom, vhim))
    acc3 = acc.reshape(H, L, NC)
    counts = acc3[:, :, C].reshape(H * L)[:G].astype(jnp.int64)
    chunks = tuple(acc3[:, :, c].reshape(H * L)[:G] for c in range(C))
    mn = jnp.full(G, 0xFFFFFFFFFFFFFFFF, jnp.uint64)
    mx = jnp.zeros(G, jnp.uint64)
    return counts, chunks, mn, mx


def _pallas_group_geometry(G: int):
    """(H, L) decomposition for the VMEM one-hot kernels: H=128 fills
    one MXU output tile; L doubles until H*L >= G; past L=32 the m2
    tile would blow the VMEM budget, so the hi axis doubles to 256
    instead (covers G <= 8192, TPU-validated r2-cont)."""
    from ..ops import pallas_group as PG
    H = PG.H_BINS
    L = 1
    while H * L < G:
        L <<= 1
    if L > 32:
        H, L = 256, L >> 1
    return H, L


def _group_pallas(gids, mask_words, value_keys, G: int,
                  n_chunks: int = 8, bias=None):
    """Pallas fused factored group kernel (ops/pallas_group.py): one-hot
    operands built IN VMEM, f32 tile partials out; u64-add accumulation
    here. Same (counts, chunks, mn, mx) contract as the MXU paths.

    r5 MULTI-PASS for G > 8192 (the G-cliff, VERDICT r4 next-#3): pass
    p re-runs the SAME (H=256, L=32) kernel on gid - p*8192 — rows
    outside the pass's sub-range shift to a negative (or >= H) hi and
    match no iota column, so they self-exclude with no extra masking.
    TPU-measured (probes/pg_bigG.py): 708 M rows/s at G=8192 (vs the
    229 M XLA factored / 30 M sort), ~8-pass G=65536 far above the
    17 M XLA / 4 M sort alternatives."""
    from ..config import is_tpu
    from ..ops import pallas_group as PG
    if not is_tpu() and getattr(getattr(gids, "aval", None), "vma", None):
        # interpret-mode pallas under shard_map trips a JAX
        # hlo_interpreter vma bug (r4 probe); CPU has no Mosaic anyway —
        # the SPMD-pallas question is a TPU question. XLA kernel there.
        return _group_mxu_factored(gids, mask_words, value_keys, G,
                                   n_chunks, bias)
    C = n_chunks
    H, L = _pallas_group_geometry(min(G, 8192))
    GP = H * L                         # groups per pass (>= G when one
    NP = max(1, -(-G // GP))           # pass suffices; >=1 guards G=0)
    shift = L.bit_length() - 1
    SENT = NP * GP

    mask = bs.unpack_mask(mask_words)
    ok = mask & (gids >= 0) & (gids < G)
    gid = jnp.where(ok, gids, SENT).reshape(-1).astype(jnp.int32)
    vlo, vhi = _value_halves(value_keys, bias)
    vlo = jnp.where(ok, vlo, jnp.uint32(0)).reshape(-1)
    vhi = jnp.where(ok, vhi, jnp.uint32(0)).reshape(-1)
    accs = []
    for p in range(NP):
        gp = gid - jnp.int32(p * GP) if p else gid
        parts = PG.fused_group_partials(gp, vlo, vhi, min(G, GP),
                                        L, shift, n_chunks=C,
                                        interpret=not is_tpu(), H=H)
        acc = parts.astype(jnp.uint32).astype(jnp.uint64).sum(axis=0)
        accs.append(acc.reshape(H * L, C + 1))
    acc2 = jnp.concatenate(accs, axis=0) if NP > 1 else accs[0]
    counts = acc2[:G, C].astype(jnp.int64)
    chunks = tuple(acc2[:G, c] for c in range(C))
    mn = jnp.full(G, 0xFFFFFFFFFFFFFFFF, jnp.uint64)
    mx = jnp.zeros(G, jnp.uint64)
    return counts, chunks, mn, mx


def group_moments_mxu(gids, mask_words, rpair, qpair, G: int,
                      C1: int, C2: int, allow_pallas: bool = True):
    """Exact MXU moments: (counts i64[G], chunks1, chunks2) where
    chunks1/chunks2 are byte-chunk u64[G] tuples of the value and the
    SQUARE sums. One fused Pallas pass when eligible (r4 — the one-hot
    builds amortize over both moment halves, probes/series_profile.py);
    two group_aggregate_mxu passes otherwise."""
    from ..config import is_tpu, use_pallas_group
    from ..ops import pallas_group as PG
    rlo, rhi = rpair
    qlo, qhi = qpair
    H, L = _pallas_group_geometry(G)
    under_shard_map = getattr(getattr(gids, "aval", None), "vma", None)
    eligible = (allow_pallas and use_pallas_group() and L <= 32
                and _MXU_FACTORED_MIN_G <= G
                and not (not is_tpu() and under_shard_map))
    if not eligible:
        c1, ch1, _, _ = group_aggregate_mxu(gids, mask_words, rpair, G,
                                            allow_pallas=allow_pallas,
                                            n_chunks=C1)
        _c2, ch2, _, _ = group_aggregate_mxu(gids, mask_words, qpair, G,
                                             allow_pallas=allow_pallas,
                                             n_chunks=C2)
        return c1, ch1, ch2
    shift = L.bit_length() - 1
    SENT = H * L
    mask = bs.unpack_mask(mask_words)
    ok = mask & (gids >= 0) & (gids < G)
    gid = jnp.where(ok, gids, SENT).reshape(-1).astype(jnp.int32)
    z = jnp.uint32(0)
    a = jnp.where(ok, rlo, z).reshape(-1)
    b = jnp.where(ok, rhi, z).reshape(-1)
    c = jnp.where(ok, qlo, z).reshape(-1)
    d = jnp.where(ok, qhi, z).reshape(-1)
    parts = PG.fused_group_moments_partials(
        gid, a, b, c, d, G, L, shift, C1, C2,
        interpret=not is_tpu(), H=H)
    acc = parts.astype(jnp.uint32).astype(jnp.uint64).sum(axis=0)
    NC = C1 + C2 + 1
    acc3 = acc.reshape(H, L, NC)
    counts = acc3[:, :, NC - 1].reshape(-1)[:G].astype(jnp.int64)
    ch1 = tuple(acc3[:, :, i].reshape(-1)[:G] for i in range(C1))
    ch2 = tuple(acc3[:, :, C1 + i].reshape(-1)[:G] for i in range(C2))
    return counts, ch1, ch2


def group_aggregate_mxu(gids, mask_words, value_keys, G: int,
                        allow_pallas: bool = True, n_chunks: int = 8,
                        bias=None):
    """Per-group exact (count, sum) via ONE-HOT MXU MATMULS (bf16).

    The sort-based path (group_aggregate) moves every row through a
    3-operand sort — correct but memory-bound at ~140 M rows/s. For
    G <= MXU_MAX_G a [G, T] bf16 one-hot matmul per row tile computes
    [G, 9] partials (8 exact byte chunks + count); per-tile f32
    accumulations stay exact (255 * 8192 < 2^24) and cross-tile
    accumulation is u64 ADDS only (the emulated u64 SHIFT/MULTIPLY
    lowering is unreliable on this stack — measured round 2 — so byte
    recombination happens on the HOST, mxu_chunk_sums). n_chunks/bias
    (from chunk_plan zone-map stats) shrink the chunk matrix when the
    column's rebased range fits fewer than 8 bytes.

    Variants MEASURED on v5e at G=1000 (round 2): flat bf16 302 M
    rows/s, flat int8 262 M, factored sqrt(G)-one-hot 168 M (32x32
    output tiles use ~6% of the 128x128 systolic array). Flat bf16 won;
    the cost floor is the materialized one-hot (G bytes/row of HBM
    traffic). Returns (counts i64[G], chunks 8-tuple of u64[G], mn, mx)
    with mn/mx EMPTY sentinels — callers choose this path only when no
    min/max aggregate is requested; sum[g] = sum_c chunks[c][g] << 8c.

    For G >= _MXU_FACTORED_MIN_G the two-level factored kernel
    (_group_mxu_factored) moves ~5x less HBM traffic and takes over;
    by DEFAULT (config.use_pallas_group; KNOX_NO_PALLAS_GROUP=1 kills)
    the Pallas VMEM-one-hot kernel replaces it outside shard_map —
    callers pass allow_pallas=False there (Mosaic under shard_map is
    untested on this stack). TPU-measured r2: Pallas 1.27-1.29 G
    rows/s vs 0.50 G XLA factored at G=1000, 4.2M rows.
    """
    if G >= _MXU_FACTORED_MIN_G:
        from ..config import use_pallas_group
        if allow_pallas and use_pallas_group():
            return _group_pallas(gids, mask_words, value_keys, G,
                                 n_chunks, bias)
        return _group_mxu_factored(gids, mask_words, value_keys, G,
                                   n_chunks, bias)
    C = n_chunks
    mask = bs.unpack_mask(mask_words)
    ok = mask & (gids >= 0) & (gids < G)
    gid = jnp.where(ok, gids, G).reshape(-1)          # bin G never one-hots
    vlo, vhi = _value_halves(value_keys, bias)
    vlo = jnp.where(ok, vlo, jnp.uint32(0)).reshape(-1)
    vhi = jnp.where(ok, vhi, jnp.uint32(0)).reshape(-1)

    n = gid.shape[0]
    T = min(_MXU_TILE, n)
    B = -(-n // T)
    pad = B * T - n
    if pad:
        gid = jnp.concatenate([gid, jnp.full(pad, G, jnp.int32)])
        vlo = jnp.concatenate([vlo, jnp.zeros(pad, jnp.uint32)])
        vhi = jnp.concatenate([vhi, jnp.zeros(pad, jnp.uint32)])

    # [B, T, C+1] bf16 byte matrix (u32 half words — no emulated
    # 64-bit shifts anywhere) + a count column
    chunks = []
    for c in range(C):
        h = vlo if c < 4 else vhi
        chunks.append(((h >> jnp.uint32(8 * (c % 4)))
                       & jnp.uint32(0xFF)).astype(jnp.bfloat16))
    chunks.append(jnp.where(gid < G, jnp.bfloat16(1), jnp.bfloat16(0)))
    cm = jnp.stack(chunks, axis=-1).reshape(B, T, C + 1)
    gm = gid.reshape(B, T)
    groups = jnp.arange(G, dtype=jnp.int32)

    # TPU x64-emulation hazard: the scan carry is a TUPLE of 1-D u64
    # vectors — each updated from a 1-D slice of the f32 matmul result
    # (slice FIRST, then convert).
    def step(carry, xs):
        g_t, c_t = xs
        oneh = (g_t[None, :] == groups[:, None]).astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            oneh, c_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [G, C+1] < 2^24
        new = tuple(carry[c]
                    + part[:, c].astype(jnp.uint32).astype(jnp.uint64)
                    for c in range(C + 1))
        return new, None

    # init derives from the data so it carries the same varying-axes type
    # under shard_map (a plain zeros carry traces as unvarying and scan
    # rejects the carry-type mismatch)
    vzero = gm[0, 0].astype(jnp.uint64) & jnp.uint64(0)
    acc0 = tuple(jnp.zeros(G, jnp.uint64) + vzero for _ in range(C + 1))
    acc, _ = jax.lax.scan(step, acc0, (gm, cm))
    counts = acc[C].astype(jnp.int64)
    mn = jnp.full(G, 0xFFFFFFFFFFFFFFFF, jnp.uint64)
    mx = jnp.zeros(G, jnp.uint64)
    return counts, acc[:C], mn, mx


def mxu_chunk_sums(chunks) -> np.ndarray:
    """Host recombination of group_aggregate_mxu chunk partials:
    exact python-int keyform sums, OBJECT ndarray [G] (r4: ndarray, not
    list — callers combine across segments/devices with vectorized
    object arithmetic instead of per-group python loops, VERDICT weak
    #6). chunks: 16 nibble or 1..8 byte arrays u64[G] (byte count set
    by chunk_plan; a chunk_plan bias is the CALLER's to add back:
    sum += bias * count)."""
    cs = [np.asarray(c).astype(object) for c in chunks]
    shift = 4 if len(cs) == 16 else 8
    out = cs[0].copy()
    for c in range(1, len(cs)):
        out += cs[c] << (shift * c)
    return out


def group_aggregate(gids, mask_words, value_keys, G: int):
    """Per-group exact aggregation: SORT-BASED segmented reduction.

    gids: i32[P, N]; mask_words: u32[P, W]; value_keys: u64[P, N] keyform.
    Returns (counts i64[G], sum_lo u64[G], sum_hi u64[G], min u64[G],
    max u64[G]) — sums split so host recombination is exact.

    Design note: jax.ops.segment_sum lowers to scatter-adds that run
    ~1000x below bandwidth on TPU. Instead each pack sorts rows by
    (gid, value) — stable two-pass argsort — then group partials fall out
    of cumsum differences at searchsorted boundaries, and min/max are the
    boundary elements. Everything is sorts/cumsums/gathers: the shapes
    XLA:TPU handles at speed."""
    mask = bs.unpack_mask(mask_words)
    ok = mask & (gids >= 0) & (gids < G)    # out-of-domain rows -> bin G
    gid = jnp.where(ok, gids, G)            # i32[P, N]

    # ONE variadic sort carries the value limbs as co-sorted operands —
    # XLA's SortOp moves payload with the keys, avoiding [P, N] gathers
    # (take_along_axis at this shape runs ~30x slower than the sort).
    # Keys (gid, hi, lo) are all 32-bit: rows ordered by (gid, value).
    hi32 = (value_keys >> jnp.uint64(32)).astype(jnp.uint32)
    lo32 = value_keys.astype(jnp.uint32)
    gs, hi_s, lo_s = jax.lax.sort((gid, hi32, lo32), dimension=1, num_keys=3)
    inb = gs < G                             # in-domain (ok) rows
    vs = ((hi_s.astype(jnp.uint64) << jnp.uint64(32))
          | lo_s.astype(jnp.uint64))
    vs = jnp.where(inb, vs, jnp.uint64(0))   # bin-G rows contribute 0
    oks = inb

    # inclusive cumsums (split limbs stay < 2^48: exact)
    clo = jnp.cumsum(vs & jnp.uint64(0xFFFFFFFF), axis=1)
    chi = jnp.cumsum(vs >> jnp.uint64(32), axis=1)
    ccnt = jnp.cumsum(oks.astype(jnp.int64), axis=1)
    z64 = jnp.zeros((gs.shape[0], 1), jnp.uint64)
    zi = jnp.zeros((gs.shape[0], 1), jnp.int64)
    clo = jnp.concatenate([z64, clo], axis=1)
    chi = jnp.concatenate([z64, chi], axis=1)
    ccnt = jnp.concatenate([zi, ccnt], axis=1)

    # per-pack group boundaries: lb[p, g] = #rows with gid < g
    targets = jnp.arange(G + 1, dtype=jnp.int32)
    lb = jax.vmap(lambda row: jnp.searchsorted(row, targets))(gs)  # [P, G+1]

    def seg(c):
        hi_b = jnp.take_along_axis(c, lb[:, 1:], axis=1)
        lo_b = jnp.take_along_axis(c, lb[:, :-1], axis=1)
        return (hi_b - lo_b)

    counts = seg(ccnt).sum(axis=0)                    # i64[G]
    sum_lo = seg(clo).sum(axis=0, dtype=jnp.uint64)   # u64[G]
    sum_hi = seg(chi).sum(axis=0, dtype=jnp.uint64)

    # min/max: first/last element of each group's sorted run
    has = seg(ccnt) > 0                               # [P, G]
    first_i = jnp.minimum(lb[:, :-1], gs.shape[1] - 1)
    last_i = jnp.clip(lb[:, 1:] - 1, 0, gs.shape[1] - 1)
    mn_p = jnp.where(has, jnp.take_along_axis(vs, first_i, axis=1),
                     jnp.uint64(0xFFFFFFFFFFFFFFFF))
    mx_p = jnp.where(has, jnp.take_along_axis(vs, last_i, axis=1),
                     jnp.uint64(0))
    mn = mn_p.min(axis=0)
    mx = mx_p.max(axis=0)
    return counts, sum_lo, sum_hi, mn, mx
