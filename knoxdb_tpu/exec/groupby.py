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
    (knoxdb_tpu/series.py) builds bucket keys t0 + i*interval."""
    dcol = dseg.column(fname)
    keys = np.arange(G, dtype=np.uint64) * np.uint64(interval) + np.uint64(t0)
    modes = [("bucket", np.uint64(t0), np.uint64(interval))
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
        gmin = int(np.min(fs.min_key))
        gmax = int(np.max(fs.max_key))
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
        elif m[0] == "bucket":
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
            gid = jnp.take_along_axis(gconsts[gi], codes, axis=1)
        elif tag == "const":
            gid = jnp.broadcast_to(gconsts[gi][:, None],
                                   (gconsts[gi].shape[0], W * 32))
        elif tag == "bucket":
            t0, iv = gconsts[gi]
            keys = D.group_decode_keys(gsig, arrs, W)
            below = keys < t0
            gid = ((keys - t0) // iv).astype(jnp.int32)
            gid = jnp.where(below, jnp.int32(-1), gid)
        elif tag == "range":
            gmin = gconsts[gi]
            keys = D.group_decode_keys(gsig, arrs, W)
            diff = keys - gmin
            inb = (keys >= gmin) & (diff < jnp.uint64(1 << 31))
            gid = jnp.where(inb, diff.astype(jnp.int32), jnp.int32(-1))
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
