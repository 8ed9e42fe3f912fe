"""TPU probe: group-by beyond the G=4096 cliff (VERDICT r4 next-#3).

The production Pallas kernel at G=8192 (H=256, L=32) builds its m2
operand as a python loop + jnp.stack of L*NC = 224 rows — the same
Mosaic materialization trap family as the r4 plane-major find. At
G>16384 the engine falls to the sort path. Variants measured here
(N=4.2M rows, cfg#3-realistic C=6 chunks from the +-2^40 balance
range):

  G=8192:
    loop   production-style loop+stack m2 build (today's path)
    vec    one-broadcast m2 build: lo_oh [S,L,T8] iota-compare ONCE,
           m2 = (lo_oh[:,:,None,:] * colstack[:,None,:,:]).reshape
    chunk  per-chunk dots: lo_oh built once, NC small dots
           hi_oh @ (lo_oh * col_c) -> [H, L] written per c column band
           (no [S, L*NC, T8] stack at all)
    xla    exec/groupby._group_mxu_factored (HBM-materialized one-hots)
    sort   per-pack lax.sort(gid) + cumsum-difference segmentation
  G=65536:
    mp<k>  multi-pass best kernel: pass p re-runs the same kernel on
           gid - p*8192 (out-of-pass rows self-exclude: negative hi
           never matches the iota) — 8 passes cover 65536
    xla65  XLA factored at G=65536
    sort65 sort path at G=65536 ([P, G+1] boundary gathers included)

Method: bit-exact oracle check first, then lax.scan(K=8) marginal
timing with a per-iter vlo perturbation (defeats hoisting); relay
floor subtracted. Mosaic+scan only (fori_loop hangs the remote
compiler — CLAUDE.md).

Usage: python probes/pg_bigG.py [loop vec chunk xla sort mp8 xla65 sort65]
CPU check: KNOX_PROBE_INTERPRET=1 PALLAS_AXON_POOL_IPS= \
           JAX_PLATFORMS=cpu python probes/pg_bigG.py --n 262144
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N = int(os.environ.get("KNOX_PROBE_N", 4_194_304))
if "--n" in sys.argv:
    N = int(sys.argv[sys.argv.index("--n") + 1])
C = 6                      # chunk_plan for +-2^40 i64 balances
K = 8
_T8 = 1024
G1 = 8192                  # single-pass geometry H=256, L=32
H, L = 256, 32
SHIFT = 5
NC = C + 1


def oracle(gid, vlo, vhi, G):
    out = np.zeros((G, NC), dtype=object)
    v = vlo.astype(object) + (vhi.astype(object) << 32)
    np.add.at(out[:, C], gid, 1)
    for c in range(C):
        np.add.at(out[:, c], gid, (v >> (8 * c)) & 0xFF)
    return out


def main():
    variants = [a for a in sys.argv[1:] if not a.startswith("--")
                and not a.isdigit()] or \
        ["loop", "vec", "chunk", "xla", "sort", "mp8", "xla65",
         "sort65"]
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    INTERP = bool(os.environ.get("KNOX_PROBE_INTERPRET"))
    _Z = np.int32(0)
    S = 8                   # hi_oh [S,256,T8] + m2 [S,224,T8] ~ 7.9 MB

    rng = np.random.default_rng(11)
    G2 = 65536
    gid65_np = rng.integers(0, G2, N).astype(np.int32)
    gid_np = (gid65_np % G1).astype(np.int32)
    vlo_np = rng.integers(0, 1 << 32, N, dtype=np.uint64).astype(np.uint32)
    vhi_np = rng.integers(0, 1 << 9, N, dtype=np.uint64).astype(np.uint32)

    # ---- kernels -------------------------------------------------------

    def cols_of(vlo, vhi):
        cols = []
        for c in range(C):
            w = vlo if c < 4 else vhi
            cols.append(((w >> np.uint32(8 * (c % 4))) & np.uint32(0xFF))
                        .astype(jnp.int32).astype(jnp.bfloat16))
        cols.append(jnp.ones(vlo.shape, jnp.bfloat16))
        return cols

    def k_loop(gid_ref, vlo_ref, vhi_ref, out_ref):
        g = gid_ref[0]
        hi = g >> SHIFT
        lo = g & (L - 1)
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (S, H, _T8), 1)
        hi_oh = (hi[:, None, :] == iota_h).astype(jnp.bfloat16)
        cols = cols_of(vlo_ref[0], vhi_ref[0])
        rows = []
        for li in range(L):
            lm = (lo == li).astype(jnp.bfloat16)
            for c in range(NC):
                rows.append(lm * cols[c])
        m2 = jnp.stack(rows, axis=1)
        part = jax.lax.dot_general(
            hi_oh, m2, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        out_ref[0] = jnp.sum(part, axis=0)

    def k_vec(gid_ref, vlo_ref, vhi_ref, out_ref):
        g = gid_ref[0]
        hi = g >> SHIFT
        lo = g & (L - 1)
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (S, H, _T8), 1)
        hi_oh = (hi[:, None, :] == iota_h).astype(jnp.bfloat16)
        cols = cols_of(vlo_ref[0], vhi_ref[0])
        colstack = jnp.stack(cols, axis=1)                  # [S, NC, T8]
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (S, L, _T8), 1)
        lo_oh = (lo[:, None, :] == iota_l).astype(jnp.bfloat16)
        m2 = (lo_oh[:, :, None, :] * colstack[:, None, :, :]) \
            .reshape(S, L * NC, _T8)
        part = jax.lax.dot_general(
            hi_oh, m2, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        out_ref[0] = jnp.sum(part, axis=0)

    def k_chunk(gid_ref, vlo_ref, vhi_ref, out_ref):
        g = gid_ref[0]
        hi = g >> SHIFT
        lo = g & (L - 1)
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (S, H, _T8), 1)
        hi_oh = (hi[:, None, :] == iota_h).astype(jnp.bfloat16)
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (S, L, _T8), 1)
        lo_oh = (lo[:, None, :] == iota_l).astype(jnp.bfloat16)
        cols = cols_of(vlo_ref[0], vhi_ref[0])
        for c in range(NC):
            m2c = lo_oh * cols[c][:, None, :]               # [S, L, T8]
            part = jax.lax.dot_general(
                hi_oh, m2c, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)         # [S, H, L]
            out_ref[0, :, c * L:(c + 1) * L] = jnp.sum(part, axis=0)

    def mk_call(kern):
        def call(gid, vlo, vhi):
            B = gid.shape[0] // (S * _T8)
            g3 = gid.reshape(B, S, _T8)
            l3 = vlo.reshape(B, S, _T8)
            h3 = vhi.reshape(B, S, _T8)
            spec = pl.BlockSpec((1, S, _T8), lambda i: (i, _Z, _Z))
            return pl.pallas_call(
                kern, grid=(B,), in_specs=[spec, spec, spec],
                out_specs=pl.BlockSpec((1, H, L * NC),
                                       lambda i: (i, _Z, _Z)),
                out_shape=jax.ShapeDtypeStruct((B, H, L * NC),
                                               jnp.float32),
                interpret=INTERP,
            )(g3, l3, h3)
        return call

    def acc_of(parts, chunk_layout: bool):
        """f32[B, H, L*NC] partials -> u64[G1, NC] (chunk_layout: column
        bands c*L..(c+1)*L instead of interleaved l*NC+c)."""
        a = parts.astype(jnp.uint32).astype(jnp.uint64).sum(axis=0)
        if chunk_layout:
            a3 = a.reshape(H, NC, L)
            return jnp.transpose(a3, (0, 2, 1)).reshape(H * L, NC)
        return a.reshape(H, L, NC).reshape(H * L, NC)

    def xla_call(gid, vlo, vhi, G):
        from knoxdb_tpu.exec import groupby as GB
        mask = jnp.full((1, gid.shape[0] // 32), 0xFFFFFFFF, jnp.uint32)
        c_, ch, _mn, _mx = GB._group_mxu_factored(
            gid.reshape(1, -1), mask, (vlo.reshape(1, -1),
                                       vhi.reshape(1, -1)), G,
            n_chunks=C)
        return c_, ch

    def sort_call(gid, vlo, vhi, G):
        P = gid.shape[0] // 65536
        g2 = gid.reshape(P, 65536)
        l2 = vlo.reshape(P, 65536)
        h2 = vhi.reshape(P, 65536)
        gs, ls, hs = jax.lax.sort((g2, l2, h2), dimension=1, num_keys=1)
        clo = jnp.cumsum(ls.astype(jnp.uint64), axis=1)
        chi = jnp.cumsum(hs.astype(jnp.uint64), axis=1)
        cn = jnp.cumsum(jnp.ones_like(gs, jnp.int64), axis=1)
        z = jnp.zeros((P, 1), jnp.uint64)
        zi = jnp.zeros((P, 1), jnp.int64)
        clo = jnp.concatenate([z, clo], axis=1)
        chi = jnp.concatenate([z, chi], axis=1)
        cn = jnp.concatenate([zi, cn], axis=1)
        targets = jnp.arange(G + 1, dtype=jnp.int32)
        lb = jax.vmap(lambda row: jnp.searchsorted(row, targets))(gs)

        def seg(cm):
            return (jnp.take_along_axis(cm, lb[:, 1:], axis=1)
                    - jnp.take_along_axis(cm, lb[:, :-1], axis=1))

        return (seg(cn).sum(axis=0), seg(clo).sum(axis=0),
                seg(chi).sum(axis=0))

    # ---- harness -------------------------------------------------------

    gid_d = jnp.asarray(gid_np)
    gid65_d = jnp.asarray(gid65_np)
    vlo_d = jnp.asarray(vlo_np)
    vhi_d = jnp.asarray(vhi_np)
    want1 = oracle(gid_np, vlo_np, vhi_np, G1)
    want65 = oracle(gid65_np, vlo_np, vhi_np, G2)

    tiny = jax.jit(lambda x: x + 1)
    int(tiny(jnp.uint32(1)))
    floor = min(map(lambda i: (lambda t0: (int(tiny(jnp.uint32(i))),
                                           time.perf_counter() - t0)[1])
                    (time.perf_counter()), range(4)))
    print(f"relay floor ~{floor*1e3:.1f} ms  N={N}", flush=True)

    def run(name, fn, check_fn):
        t0 = time.perf_counter()
        ok = check_fn()
        print(f"{name}: compile+check {time.perf_counter()-t0:.1f}s "
              f"exact={ok}", flush=True)
        if not ok:
            return

        def one(cv, _):
            vl = vlo_d ^ (cv & jnp.uint32(1))
            s = fn(vl)
            return s, ()

        stepK = jax.jit(lambda c0: jax.lax.scan(one, c0, None,
                                                length=K)[0])
        t0 = time.perf_counter()
        int(stepK(jnp.uint32(0)))
        print(f"{name}: scanK compile {time.perf_counter()-t0:.1f}s",
              flush=True)
        ts = []
        for i in range(6):
            t0 = time.perf_counter()
            int(stepK(jnp.uint32(i)))
            ts.append(time.perf_counter() - t0)
        tk = (min(ts) - floor) / K
        print(f"{name}: per-iter {tk*1e3:.2f} ms = "
              f"{N/tk/1e6:.0f} M rows/s  "
              f"(runs {['%.1f' % (t*1e3) for t in ts]})", flush=True)

    def mk_pallas_variant(name, kern, chunk_layout):
        call = mk_call(kern)

        def check():
            acc = np.asarray(jax.jit(
                lambda g, l, h: acc_of(call(g, l, h), chunk_layout))(
                    gid_d, vlo_d, vhi_d))
            return bool((acc[:G1] == want1.astype(np.uint64)).all())

        def fn(vl):
            parts = call(gid_d, vl, vhi_d)
            return jnp.sum(parts.astype(jnp.uint32)).astype(jnp.uint32)

        return name, fn, check

    def mk_mp(npass, kern, chunk_layout):
        call = mk_call(kern)

        def full(g65, vl, vh):
            accs = []
            for p in range(npass):
                gp = g65 - jnp.int32(p * G1)
                accs.append(acc_of(call(gp, vl, vh), chunk_layout))
            return jnp.concatenate(accs, axis=0)            # [G2, NC]

        def check():
            acc = np.asarray(jax.jit(full)(gid65_d, vlo_d, vhi_d))
            return bool((acc[:G2] == want65.astype(np.uint64)).all())

        def fn(vl):
            s = jnp.uint32(0)
            for p in range(npass):
                gp = gid65_d - jnp.int32(p * G1)
                parts = call(gp, vl, vhi_d)
                s = s + jnp.sum(parts.astype(jnp.uint32)).astype(
                    jnp.uint32)
            return s

        return fn, check

    def mk_xla(G, gid_dev, want):
        def check():
            c_, ch = jax.jit(lambda g, l, h: xla_call(g, l, h, G))(
                gid_dev, vlo_d, vhi_d)
            c_np = np.asarray(c_)
            ok = (c_np == want[:, C].astype(np.int64)).all()
            for ci in range(C):
                ok = ok and (np.asarray(ch[ci]).astype(object)
                             == want[:, ci]).all()
            return bool(ok)

        def fn(vl):
            c_, ch = xla_call(gid_dev, vl, vhi_d, G)
            return (c_.sum().astype(jnp.uint32)
                    + ch[0].sum().astype(jnp.uint32))

        return fn, check

    def mk_sort(G, gid_dev, want):
        def check():
            cn, lo_, hi_ = jax.jit(
                lambda g, l, h: sort_call(g, l, h, G))(
                gid_dev, vlo_d, vhi_d)
            cn = np.asarray(cn)
            tot = (np.asarray(lo_).astype(object)
                   + (np.asarray(hi_).astype(object) << 32))
            wsum = np.zeros(G, object)
            for ci in range(C):
                wsum += want[:, ci] << (8 * ci)
            return bool((cn == want[:, C].astype(np.int64)).all()
                        and (tot == wsum).all())

        def fn(vl):
            cn, lo_, hi_ = sort_call(gid_dev, vl, vhi_d, G)
            return (lo_.sum().astype(jnp.uint32)
                    + cn.sum().astype(jnp.uint32))

        return fn, check

    for v in variants:
        if v == "loop":
            run(*mk_pallas_variant("loop", k_loop, False))
        elif v == "vec":
            run(*mk_pallas_variant("vec", k_vec, False))
        elif v == "chunk":
            run(*mk_pallas_variant("chunk", k_chunk, True))
        elif v == "xla":
            fn, check = mk_xla(G1, gid_d, want1)
            run("xla", fn, check)
        elif v == "sort":
            fn, check = mk_sort(G1, gid_d, want1)
            run("sort", fn, check)
        elif v.startswith("mp"):
            kern = {"loop": k_loop, "vec": k_vec,
                    "chunk": k_chunk}[os.environ.get("KNOX_MP_KERN",
                                                     "chunk")]
            fn, check = mk_mp(8, kern,
                              os.environ.get("KNOX_MP_KERN",
                                             "chunk") == "chunk")
            run(v, fn, check)
        elif v == "xla65":
            fn, check = mk_xla(G2, gid65_d, want65)
            run("xla65", fn, check)
        elif v == "sort65":
            fn, check = mk_sort(G2, gid65_d, want65)
            run("sort65", fn, check)


if __name__ == "__main__":
    main()
