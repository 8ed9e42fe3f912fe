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
            # contiguous-range or searchsorted on decoded keys
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
            Pg = gsig[-1]
            gid = jnp.broadcast_to(gconsts[gi][:, None], (Pg, W * 32))
        elif tag == "bucket":
            t0, iv = gconsts[gi]
            keys = D.group_decode_keys(gsig, arrs, W)
            below = keys < t0
            gid = ((keys - t0) // iv).astype(jnp.int32)
            gid = jnp.where(below, jnp.int32(-1), gid)
        else:
            keys = D.group_decode_keys(gsig, arrs, W)
            gid = jnp.searchsorted(gconsts[gi], keys).astype(jnp.int32)
        outs.append(gid)
    total_P = sum(o.shape[0] for o in outs)
    full = jnp.zeros((total_P, W * 32), jnp.int32)
    for gid, idx in zip(outs, gidxs):
        full = full.at[idx].set(gid)
    return full


def group_aggregate(gids, mask_words, value_keys, G: int):
    """Per-group exact aggregation.

    gids: i32[P, N]; mask_words: u32[P, W]; value_keys: u64[P, N] keyform.
    Returns (counts i64[G], sum_lo u64[G], sum_hi u64[G], min u64[G],
    max u64[G]) — sums split so host recombination is exact."""
    mask = bs.unpack_mask(mask_words)
    ok = mask & (gids >= 0) & (gids < G)    # out-of-domain rows -> bin G
    flat_gid = jnp.where(ok, gids, G).reshape(-1)
    mask = ok
    ones = jnp.ones_like(flat_gid, jnp.int64)
    counts = jax.ops.segment_sum(ones, flat_gid, num_segments=G + 1)[:G]

    keys = value_keys.reshape(-1)
    lo = (keys & jnp.uint64(0xFFFFFFFF))
    hi = (keys >> jnp.uint64(32))
    sum_lo = jax.ops.segment_sum(lo, flat_gid, num_segments=G + 1)[:G]
    sum_hi = jax.ops.segment_sum(hi, flat_gid, num_segments=G + 1)[:G]

    mn = jax.ops.segment_min(
        jnp.where(mask.reshape(-1), keys, jnp.uint64(0xFFFFFFFFFFFFFFFF)),
        flat_gid, num_segments=G + 1)[:G]
    mx = jax.ops.segment_max(
        jnp.where(mask.reshape(-1), keys, jnp.uint64(0)),
        flat_gid, num_segments=G + 1)[:G]
    return counts, sum_lo, sum_hi, mn, mx
