"""TPU probe: Pallas group-kernel variants beyond the r2 bf16 baseline.

Open item (NOTES_r2 #2): the VMEM one-hot kernel is VPU-bound on the
in-VMEM one-hot expansion (kernel 2.6 ms of 3.1 at 4.2M rows, G=1000).
Candidates measured here, each as a standalone pallas_call inside a
lax.scan(K) program (Mosaic+scan compiles in seconds; Mosaic+fori_loop
hangs the remote compiler — CLAUDE.md):

  v0  current bf16 kernel (ops/pallas_group.fused_group_partials)
  v1  vectorized m2 build: one broadcast multiply [8,L,1,T]x[8,1,C+1,T]
      instead of the L*(C+1)-step python loop + stack
  v2  i8 operands: bias-128 value chunks, 0/1 i8 one-hots, i32 MXU
      accum, in-kernel +128*count de-bias (exact in i32: |part| < 2^21)
  v3  16-sublane tiles: grid halves, per-step batch dim 16

Method: marginal-ish — one scan(K=16) program per variant, 6 repeat
calls (doubles as the repeat-execution wedge probe), subtract the
measured relay floor (tiny cached jit). Bit-exactness of every variant
is asserted vs a numpy oracle BEFORE timing.

Usage: python probes/pg3_variants.py [v0 v1 v2 v3] [--n 4194304]
Run from /root/repo, TPU env untouched, ONE process at a time.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

N = int(os.environ.get("KNOX_PROBE_N", 4_194_304))
G = 1000
C = 4                     # chunk_plan-realistic shrink for decimal64
K = 16
_T8 = 1024


def build_inputs(rng):
    gid = rng.integers(0, G, N).astype(np.int32)
    vlo = rng.integers(0, 1 << 32, N, dtype=np.uint64).astype(np.uint32)
    vhi = rng.integers(0, 1 << 8, N, dtype=np.uint64).astype(np.uint32)
    return gid, vlo, vhi


def oracle(gid, vlo, vhi, H, L):
    """counts + per-chunk byte sums per (h*L+l), python-int exact."""
    NC = C + 1
    out = np.zeros((H * L, NC), dtype=object)
    v = vlo.astype(object)
    if C > 4:
        v = v + (vhi.astype(object) << 32)
    np.add.at(out[:, C], gid, 1)
    for c in range(C):
        np.add.at(out[:, c], gid, (v >> (8 * c)) & 0xFF)
    return out


def main():
    variants = [a for a in sys.argv[1:] if a.startswith("v")] or \
        ["v0", "v1", "v2", "v3"]
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from knoxdb_tpu.ops import pallas_group as PG

    INTERP = bool(os.environ.get("KNOX_PROBE_INTERPRET"))

    H, L = 128, 8
    shift = 3
    NC = C + 1
    rng = np.random.default_rng(7)
    gid_np, vlo_np, vhi_np = build_inputs(rng)
    want = oracle(gid_np, vlo_np, vhi_np, H, L)

    B = N // (8 * _T8)
    _Z = np.int32(0)

    # ---- variant kernels ------------------------------------------------

    def k_v1(gid_ref, vlo_ref, vhi_ref, out_ref):
        g = gid_ref[0]
        vlo, vhi = vlo_ref[0], vhi_ref[0]
        hi = g >> shift
        lo = g & (L - 1)
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (8, H, _T8), 1)
        hi_oh = (hi[:, None, :] == iota_h).astype(jnp.bfloat16)
        cols = []
        for c in range(C):
            w = vlo if c < 4 else vhi
            cols.append(((w >> np.uint32(8 * (c % 4))) & np.uint32(0xFF))
                        .astype(jnp.int32).astype(jnp.bfloat16))
        cols.append(jnp.ones(g.shape, jnp.bfloat16))
        colstack = jnp.stack(cols, axis=1)               # [8, NC, T]
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (8, L, _T8), 1)
        lo_oh = (lo[:, None, :] == iota_l).astype(jnp.bfloat16)
        m2 = (lo_oh[:, :, None, :] * colstack[:, None, :, :]) \
            .reshape(8, L * NC, _T8)
        part = jax.lax.dot_general(
            hi_oh, m2, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        out_ref[0] = jnp.sum(part, axis=0)

    def k_v2(gid_ref, vlo_ref, vhi_ref, out_ref):
        g = gid_ref[0]
        vlo, vhi = vlo_ref[0], vhi_ref[0]
        hi = g >> shift
        lo = g & (L - 1)
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (8, H, _T8), 1)
        hi_oh = (hi[:, None, :] == iota_h).astype(jnp.int8)
        cols = []
        for c in range(C):
            w = vlo if c < 4 else vhi
            b = ((w >> np.uint32(8 * (c % 4))) & np.uint32(0xFF)) \
                .astype(jnp.int32)
            cols.append((b - 128).astype(jnp.int8))
        cols.append(jnp.ones(g.shape, jnp.int8))
        rows = []
        for l in range(L):
            lm = lo == l
            for c in range(NC):
                rows.append(jnp.where(lm, cols[c], jnp.int8(0)))
        m2 = jnp.stack(rows, axis=1)
        part = jax.lax.dot_general(
            hi_oh, m2, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)            # [8, H, L*NC]
        acc = jnp.sum(part, axis=0, dtype=jnp.int32).reshape(H, L, NC)
        cnt = acc[:, :, C:]
        fixed = acc[:, :, :C] + 128 * cnt                # de-bias, exact
        out_ref[0] = jnp.concatenate([fixed, cnt], axis=2) \
            .reshape(H, L * NC)

    def k_v3(gid_ref, vlo_ref, vhi_ref, out_ref):
        g = gid_ref[0]
        vlo, vhi = vlo_ref[0], vhi_ref[0]
        hi = g >> shift
        lo = g & (L - 1)
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (16, H, _T8), 1)
        hi_oh = (hi[:, None, :] == iota_h).astype(jnp.bfloat16)
        cols = []
        for c in range(C):
            w = vlo if c < 4 else vhi
            cols.append(((w >> np.uint32(8 * (c % 4))) & np.uint32(0xFF))
                        .astype(jnp.int32).astype(jnp.bfloat16))
        cols.append(jnp.ones(g.shape, jnp.bfloat16))
        rows = []
        for l in range(L):
            lm = (lo == l).astype(jnp.bfloat16)
            for c in range(NC):
                rows.append(lm * cols[c])
        m2 = jnp.stack(rows, axis=1)
        part = jax.lax.dot_general(
            hi_oh, m2, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        out_ref[0] = jnp.sum(part, axis=0)

    def call_v1(gid, vlo, vhi):
        g3 = gid.reshape(B, 8, _T8)
        l3 = vlo.reshape(B, 8, _T8)
        h3 = vhi.reshape(B, 8, _T8)
        spec = pl.BlockSpec((1, 8, _T8), lambda i: (i, _Z, _Z))
        return pl.pallas_call(
            k_v1, grid=(B,), in_specs=[spec, spec, spec],
            out_specs=pl.BlockSpec((1, H, L * NC), lambda i: (i, _Z, _Z)),
            out_shape=jax.ShapeDtypeStruct((B, H, L * NC), jnp.float32),
            interpret=INTERP,
        )(g3, l3, h3)

    def call_v2(gid, vlo, vhi):
        g3 = gid.reshape(B, 8, _T8)
        l3 = vlo.reshape(B, 8, _T8)
        h3 = vhi.reshape(B, 8, _T8)
        spec = pl.BlockSpec((1, 8, _T8), lambda i: (i, _Z, _Z))
        return pl.pallas_call(
            k_v2, grid=(B,), in_specs=[spec, spec, spec],
            out_specs=pl.BlockSpec((1, H, L * NC), lambda i: (i, _Z, _Z)),
            out_shape=jax.ShapeDtypeStruct((B, H, L * NC), jnp.int32),
            interpret=INTERP,
        )(g3, l3, h3)

    def call_v3(gid, vlo, vhi):
        B2 = B // 2
        g3 = gid.reshape(B2, 16, _T8)
        l3 = vlo.reshape(B2, 16, _T8)
        h3 = vhi.reshape(B2, 16, _T8)
        spec = pl.BlockSpec((1, 16, _T8), lambda i: (i, _Z, _Z))
        return pl.pallas_call(
            k_v3, grid=(B2,), in_specs=[spec, spec, spec],
            out_specs=pl.BlockSpec((1, H, L * NC), lambda i: (i, _Z, _Z)),
            out_shape=jax.ShapeDtypeStruct((B2, H, L * NC), jnp.float32),
            interpret=INTERP,
        )(g3, l3, h3)

    def call_v0(gid, vlo, vhi):
        # S=8 pinned: v0 is the documented r2 S=8 baseline (the
        # production pick_sublanes rule now auto-picks S=16 for this
        # shape, which would alias v0 onto v3/v4)
        return PG.fused_group_partials(gid, vlo, vhi, G, L, shift,
                                       n_chunks=C, H=H, S=8,
                                       interpret=INTERP)

    def make_call(S: int, vec: bool):
        def kern(gid_ref, vlo_ref, vhi_ref, out_ref):
            g = gid_ref[0]
            vlo, vhi = vlo_ref[0], vhi_ref[0]
            hi = g >> shift
            lo = g & (L - 1)
            iota_h = jax.lax.broadcasted_iota(jnp.int32, (S, H, _T8), 1)
            hi_oh = (hi[:, None, :] == iota_h).astype(jnp.bfloat16)
            cols = []
            for c in range(C):
                w = vlo if c < 4 else vhi
                cols.append(((w >> np.uint32(8 * (c % 4))) & np.uint32(0xFF))
                            .astype(jnp.int32).astype(jnp.bfloat16))
            cols.append(jnp.ones(g.shape, jnp.bfloat16))
            if vec:
                colstack = jnp.stack(cols, axis=1)
                iota_l = jax.lax.broadcasted_iota(jnp.int32, (S, L, _T8), 1)
                lo_oh = (lo[:, None, :] == iota_l).astype(jnp.bfloat16)
                m2 = (lo_oh[:, :, None, :] * colstack[:, None, :, :]) \
                    .reshape(S, L * NC, _T8)
            else:
                rows = []
                for l in range(L):
                    lm = (lo == l).astype(jnp.bfloat16)
                    for c in range(NC):
                        rows.append(lm * cols[c])
                m2 = jnp.stack(rows, axis=1)
            part = jax.lax.dot_general(
                hi_oh, m2, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            out_ref[0] = jnp.sum(part, axis=0)

        def call(gid, vlo, vhi):
            Bs = N // (S * _T8)
            g3 = gid.reshape(Bs, S, _T8)
            l3 = vlo.reshape(Bs, S, _T8)
            h3 = vhi.reshape(Bs, S, _T8)
            spec = pl.BlockSpec((1, S, _T8), lambda i: (i, _Z, _Z))
            return pl.pallas_call(
                kern, grid=(Bs,), in_specs=[spec, spec, spec],
                out_specs=pl.BlockSpec((1, H, L * NC),
                                       lambda i: (i, _Z, _Z)),
                out_shape=jax.ShapeDtypeStruct((Bs, H, L * NC),
                                               jnp.float32),
                interpret=INTERP,
            )(g3, l3, h3)
        return call

    calls = {"v0": call_v0, "v1": call_v1, "v2": call_v2, "v3": call_v3,
             "v4": make_call(16, True), "v5": make_call(32, False),
             "v6": make_call(32, True)}

    gid_d = jnp.asarray(gid_np)
    vlo_d = jnp.asarray(vlo_np)
    vhi_d = jnp.asarray(vhi_np)

    # relay floor
    tiny = jax.jit(lambda x: x + 1)
    int(tiny(jnp.uint32(1)))
    floors = []
    for i in range(4):
        t0 = time.perf_counter()
        int(tiny(jnp.uint32(i)))
        floors.append(time.perf_counter() - t0)
    floor = min(floors)
    print(f"relay floor ~{floor*1e3:.1f} ms", flush=True)

    for name in variants:
        fn = calls[name]

        def one(c, _, fn=fn):
            vl = vlo_d ^ (c & jnp.uint32(1))
            parts = fn(gid_d, vl, vhi_d)
            s = jnp.sum(parts.astype(jnp.uint32)).astype(jnp.uint32)
            return s, ()

        stepK = jax.jit(lambda c0: jax.lax.scan(one, c0, None, length=K)[0])

        # correctness: single call with carry 0 (vlo unchanged)
        t0 = time.perf_counter()
        parts = jax.jit(fn)(gid_d, vlo_d, vhi_d)
        acc = np.asarray(parts).astype(np.uint64).sum(axis=0) \
            .reshape(H * L, NC)
        ok = (acc[:G] == want[:G].astype(np.uint64)).all()
        print(f"{name}: compile+run1 {time.perf_counter()-t0:.1f}s "
              f"exact={bool(ok)}", flush=True)
        if not ok:
            bad = np.argwhere(acc[:G] != want[:G].astype(np.uint64))[:4]
            print(f"{name}: MISMATCH at {bad.tolist()}", flush=True)
            continue

        t0 = time.perf_counter()
        r = int(stepK(jnp.uint32(0)))
        print(f"{name}: scanK compile+run {time.perf_counter()-t0:.1f}s "
              f"carry={r}", flush=True)
        ts = []
        for i in range(6):
            t0 = time.perf_counter()
            r = int(stepK(jnp.uint32(i)))
            ts.append(time.perf_counter() - t0)
        tk = (min(ts) - floor) / K
        print(f"{name}: per-iter {tk*1e3:.2f} ms = "
              f"{N/tk/1e9:.2f} G rows/s  (runs {['%.1f' % (t*1e3) for t in ts]} ms)",
              flush=True)


if __name__ == "__main__":
    main()
