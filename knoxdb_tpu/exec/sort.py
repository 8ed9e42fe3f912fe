"""Order-by / top-k over device segments.

EXCEEDS reference parity per the BASELINE north star (config #4): the
reference orders only by pk (docs list sort/top-k as future operator
work, internal/query/plan.go:26-34).

Design: ordering happens in the KEYFORM domain (utils/limbs.py), where
every type — signed/unsigned/float/decimal/wide — is an unsigned
lexicographic integer, so ONE sort kernel family serves all types:
- narrow (<=64-bit): single u64 argsort (descending = argsort of ~key)
- wide (128/256-bit): LSB->MSB multi-pass STABLE argsort over u64 chunks
  (radix-style over limb pairs)
Filtered-out rows get sentinel keys that sink to the end; top-k is a
static slice of the sorted order. Per-segment top-k results merge on the
host (k is small); full sorts merge with a host keyform argsort.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import bitset as bs
from . import device as D

__all__ = ["segment_topk"]

_SENT = jnp.uint64(0xFFFFFFFFFFFFFFFF)


def _flat_keys_u64(scanner, fname: str, arrays, W: int):
    """Decode a narrow column to flat u64 keys [P*N] (value domain)."""
    d = scanner.d
    dec = jnp.zeros((d.P, d.N), jnp.uint64)
    for gi, g in enumerate(d.column(fname).groups):
        keys = D.group_decode_keys(g.sig(), arrays[fname][gi], W)
        dec = dec.at[g.idx].set(keys)
    return dec.reshape(-1)


def _flat_limbs(scanner, fname: str, arrays, W: int):
    """Absolute keyform limbs [L, P*N] (wide bitpack rebased on device)."""
    d = scanner.d
    L = d.seg.columns[fname].nlimbs
    dec = jnp.zeros((L, d.P, d.N), jnp.uint32)
    for gi, g in enumerate(d.column(fname).groups):
        lim = D.group_decode_limbs_abs(g.sig(), g, arrays[fname][gi], W)
        dec = dec.at[:, g.idx].set(lim)
    return dec.reshape(L, -1)


def segment_topk(scanner, tree, order_field: str, k: int,
                 desc: bool = False, project: list[str] | None = None,
                 exclude_words=None):
    """Top-k rows of one segment under a filter.

    Returns (order_keys, rows) where order_keys are python-int keyform
    keys (host merges segments with these) and rows maps projected field
    -> u32 limb matrix [L, k] (+ "__idx" row positions). Rows beyond the
    match count carry sentinel keys."""
    d = scanner.d
    project = project or []
    col = d.seg.columns[order_field]
    wide = col.wide
    used = sorted(set([order_field] + project))

    _fn, margs, mask_raw = scanner.prepare(tree, [], exclude_words)
    arrays = d.arrays_pytree(used)

    sig = ("topk", d.sig(used), order_field, k, desc, wide,
           tuple(project), exclude_words is not None)
    fn = scanner._fns.get(sig)
    if fn is None:
        proj_cols = list(project)

        def f(margs, arrays):
            mask, _, _ = mask_raw(*margs)
            flat_mask = bs.unpack_mask(mask).reshape(-1)
            if wide:
                limbs = _flat_limbs(scanner, order_field, arrays, d.W)
                if desc:
                    limbs = ~limbs
                limbs = jnp.where(flat_mask[None], limbs,
                                  jnp.uint32(0xFFFFFFFF))
                L = limbs.shape[0]
                # radix over u64 chunks, LSB chunk first, stable
                order = jnp.arange(limbs.shape[1])
                for c in range((L + 1) // 2 - 1, -1, -1):
                    hi_l = max(0, 2 * c)
                    chunk = (limbs[hi_l].astype(jnp.uint64) << jnp.uint64(32))
                    if 2 * c + 1 < L:
                        chunk = chunk | limbs[2 * c + 1].astype(jnp.uint64)
                    order = order[jnp.argsort(chunk[order], stable=True)]
                top = order[:k]
            else:
                keys = _flat_keys_u64(scanner, order_field, arrays, d.W)
                if desc:
                    keys = ~keys
                keys = jnp.where(flat_mask, keys, _SENT)
                # partial sort: top_k of flipped keys == k smallest keys
                # ascending (full argsort + gather is ~30x slower on TPU)
                _vals, top = jax.lax.top_k(~keys, k)
            outs = {"__idx": top}
            okeys = None
            if wide:
                okeys = jnp.take(_flat_limbs(scanner, order_field, arrays,
                                             d.W), top, axis=1)
            else:
                okeys = jnp.take(_flat_keys_u64(scanner, order_field,
                                                arrays, d.W), top)
            valid = jnp.take(flat_mask, top)
            for name in proj_cols:
                lim = _flat_limbs(scanner, name, arrays, d.W)
                outs[name] = jnp.take(lim, top, axis=1)
            return outs, okeys, valid

        fn = jax.jit(f)
        scanner._fns[sig] = fn

    outs, okeys, valid = fn(margs, arrays)
    valid = np.asarray(valid)
    nvalid = int(valid.sum())
    okeys = np.asarray(okeys)
    keys_int = []
    for i in range(min(k, nvalid)):
        if wide:
            x = 0
            for l in range(okeys.shape[0]):
                x = (x << 32) | int(okeys[l, i])
        else:
            x = int(okeys[i])
        keys_int.append(x)
    rows = {name: np.asarray(v)[..., :nvalid] for name, v in outs.items()}
    return keys_int, rows, nvalid
