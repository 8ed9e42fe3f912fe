"""Config-#1 fused-scan kernel VARIANTS probe (VERDICT r3 next-#2: find
the missing ~1.4x on a healthy pool — 546 GB/s effective vs 781 GB/s
same-run stream — or pin where the time goes).

Hypotheses probed, each its own pallas kernel timed with the marginal
method (K iterations under lax.scan; per-iteration consts via
dynamic_index from PRE-STACKED host-bound arrays — the wedge-safe shape
scan_wedge_probe.py proved clean):

  v0  baseline: current _kernel on [P, w, W] planes, TILE=8
  v1  ladder-only (no per-plane popcounts) — isolates the pcnt cost
  v2  pcnt-only (mask precomputed outside) — isolates the ladder cost
  v3  TILE=16 and TILE=32 — grid-step amortization
  v4  PLANE-MAJOR layout [w, P, W]: per-plane slices index the LEADING
      (untiled) dim instead of the middle (sublane-tiled) dim — the
      baseline's planes_ref[:, p, :] plausibly pays a relayout per
      plane per pass
  v5  v4 + TILE=16

Also prints the same-run stream bandwidth so pct-of-stream is pool-load
independent. Run (TPU): timeout 3600 python probes/ps_variants.py
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax                                               # noqa: E402
import jax.numpy as jnp                                  # noqa: E402
from jax.experimental import pallas as pl                # noqa: E402

from knoxdb_tpu.ops import pallas_scan as PS             # noqa: E402
from knoxdb_tpu.ops import bitslice as B                 # noqa: E402

_Z = np.int32(0)
_FULL_NP = np.uint32(0xFFFFFFFF)


def _ladder(planes_at, lo_bits_ref, hi_bits_ref, flags_ref, T, W, width):
    lt_lo = jnp.zeros((T, W), jnp.uint32)
    eq_lo = jnp.full((T, W), _FULL_NP, jnp.uint32)
    lt_hi = jnp.zeros((T, W), jnp.uint32)
    eq_hi = jnp.full((T, W), _FULL_NP, jnp.uint32)
    for p in range(width - 1, -1, -1):
        x = planes_at(p)
        cl = lo_bits_ref[:, p][:, None]
        ch = hi_bits_ref[:, p][:, None]
        lt_lo = lt_lo | (eq_lo & ~x & cl)
        eq_lo = eq_lo & ~(x ^ cl)
        lt_hi = lt_hi | (eq_hi & ~x & ch)
        eq_hi = eq_hi & ~(x ^ ch)
    lo_lt_all = flags_ref[:, PS._F_LO_LT_ALL][:, None]
    lo_ge_none = flags_ref[:, PS._F_LO_GE_NONE][:, None]
    hi_in = flags_ref[:, PS._F_HI_IN][:, None]
    hi_ge_none = flags_ref[:, PS._F_HI_GE_NONE][:, None]
    hi_lt_all = flags_ref[:, PS._F_HI_LT_ALL][:, None]
    lt_lo = lt_lo | lo_lt_all
    ge_lo = ~(lt_lo & ~lo_ge_none)
    le_hi = lt_hi | (eq_hi & hi_in)
    le_hi = le_hi | hi_lt_all
    le_hi = le_hi & ~hi_ge_none
    return ge_lo & le_hi


def k_v0(lo, hi, fl, planes, valid, mask_ref, pcnt_ref, cnt_ref, *,
         width):
    T, _, W = planes.shape
    m = _ladder(lambda p: planes[:, p, :], lo, hi, fl, T, W, width) \
        & valid[:, :]
    mask_ref[:, :] = m
    cnt_ref[:, 0] = jnp.sum(jax.lax.population_count(m).astype(jnp.int32),
                            axis=-1, dtype=jnp.int32)
    for p in range(width):
        pcnt_ref[:, p] = jnp.sum(
            jax.lax.population_count(planes[:, p, :] & m)
            .astype(jnp.int32), axis=-1, dtype=jnp.int32)


def k_ladder_only(lo, hi, fl, planes, valid, mask_ref, cnt_ref, *, width):
    T, _, W = planes.shape
    m = _ladder(lambda p: planes[:, p, :], lo, hi, fl, T, W, width) \
        & valid[:, :]
    mask_ref[:, :] = m
    cnt_ref[:, 0] = jnp.sum(jax.lax.population_count(m).astype(jnp.int32),
                            axis=-1, dtype=jnp.int32)


def k_pcnt_only(planes, mask_in, pcnt_ref, cnt_ref, *, width):
    m = mask_in[:, :]
    cnt_ref[:, 0] = jnp.sum(jax.lax.population_count(m).astype(jnp.int32),
                            axis=-1, dtype=jnp.int32)
    for p in range(width):
        pcnt_ref[:, p] = jnp.sum(
            jax.lax.population_count(planes[:, p, :] & m)
            .astype(jnp.int32), axis=-1, dtype=jnp.int32)


def k_v6(lo, hi, fl, planes, valid, mask_ref, pcnt_ref, cnt_ref, *,
         width):
    """Baseline [T, w, W] layout, but the pcnt pass is BLOCK-WISE:
    planes & mask[:, None, :] -> popcount -> lane-reduce, no per-plane
    middle-dim slices (the v0-vs-v1 delta suggests those relayout)."""
    T, _, W = planes.shape
    m = _ladder(lambda p: planes[:, p, :], lo, hi, fl, T, W, width) \
        & valid[:, :]
    mask_ref[:, :] = m
    cnt_ref[:, 0] = jnp.sum(jax.lax.population_count(m).astype(jnp.int32),
                            axis=-1, dtype=jnp.int32)
    y = jax.lax.population_count(planes[:, :, :] & m[:, None, :])
    pcnt_ref[:, :] = jnp.sum(y.astype(jnp.int32), axis=-1,
                             dtype=jnp.int32)


def k_v4(lo, hi, fl, planes, valid, mask_ref, pcnt_ref, cnt_ref, *,
         width):
    # planes block: [w, T, W] — per-plane slice on the LEADING dim
    _, T, W = planes.shape[0], planes.shape[1], planes.shape[2]
    m = _ladder(lambda p: planes[p, :, :], lo, hi, fl, T, W, width) \
        & valid[:, :]
    mask_ref[:, :] = m
    cnt_ref[:, 0] = jnp.sum(jax.lax.population_count(m).astype(jnp.int32),
                            axis=-1, dtype=jnp.int32)
    for p in range(width):
        pcnt_ref[:, p] = jnp.sum(
            jax.lax.population_count(planes[p, :, :] & m)
            .astype(jnp.int32), axis=-1, dtype=jnp.int32)


def k_v7(lo, hi, fl, planes, valid, mask_ref, pcnt_ref, cnt_ref, *,
         width):
    """Plane-major ladder + BLOCK-WISE pcnt (one [w, T, W] elementwise
    op + lane reduce + tiny [w, T] -> [T, w] relayout)."""
    _, T, W = planes.shape[0], planes.shape[1], planes.shape[2]
    m = _ladder(lambda p: planes[p, :, :], lo, hi, fl, T, W, width) \
        & valid[:, :]
    mask_ref[:, :] = m
    cnt_ref[:, 0] = jnp.sum(jax.lax.population_count(m).astype(jnp.int32),
                            axis=-1, dtype=jnp.int32)
    y = jax.lax.population_count(planes[:width] & m[None, :, :])
    pcnt_ref[:, :] = jnp.sum(y.astype(jnp.int32), axis=-1,
                             dtype=jnp.int32).T


def build(P, w, W, T, kern, nouts, plane_major):
    w1 = max(w, 1)
    if plane_major:
        pspec = pl.BlockSpec((w, T, W), lambda i: (_Z, i, _Z))
    else:
        pspec = pl.BlockSpec((T, w, W), lambda i: (i, _Z, _Z))
    in_specs = [
        pl.BlockSpec((T, w1), lambda i: (i, _Z)),
        pl.BlockSpec((T, w1), lambda i: (i, _Z)),
        pl.BlockSpec((T, PS._NFLAGS), lambda i: (i, _Z)),
        pspec,
        pl.BlockSpec((T, W), lambda i: (i, _Z)),
    ]
    out_specs = [pl.BlockSpec((T, W), lambda i: (i, _Z)),
                 pl.BlockSpec((T, w1), lambda i: (i, _Z)),
                 pl.BlockSpec((T, 1), lambda i: (i, _Z))][:nouts]
    out_shape = [jax.ShapeDtypeStruct((P, W), jnp.uint32),
                 jax.ShapeDtypeStruct((P, w1), jnp.int32),
                 jax.ShapeDtypeStruct((P, 1), jnp.int32)][:nouts]
    if nouts == 2:   # ladder-only: mask + cnt
        out_specs = [pl.BlockSpec((T, W), lambda i: (i, _Z)),
                     pl.BlockSpec((T, 1), lambda i: (i, _Z))]
        out_shape = [jax.ShapeDtypeStruct((P, W), jnp.uint32),
                     jax.ShapeDtypeStruct((P, 1), jnp.int32)]

    def f(lo, hi, fl, planes, valid):
        return pl.pallas_call(
            partial(kern, width=w), grid=(P // T,),
            in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
        )(lo, hi, fl, planes, valid)
    return f


def build_pcnt(P, w, W, T):
    w1 = max(w, 1)

    def f(planes, mask_in):
        return pl.pallas_call(
            partial(k_pcnt_only, width=w), grid=(P // T,),
            in_specs=[pl.BlockSpec((T, w, W), lambda i: (i, _Z, _Z)),
                      pl.BlockSpec((T, W), lambda i: (i, _Z))],
            out_specs=[pl.BlockSpec((T, w1), lambda i: (i, _Z)),
                       pl.BlockSpec((T, 1), lambda i: (i, _Z))],
            out_shape=[jax.ShapeDtypeStruct((P, w1), jnp.int32),
                       jax.ShapeDtypeStruct((P, 1), jnp.int32)],
        )(planes, mask_in)
    return f


def marginal(run, k_lo=8, k_hi=136, reps=3):
    def t(k):
        t0 = time.perf_counter()
        run(k)
        return time.perf_counter() - t0
    run(1)
    pairs = [(t(k_lo), t(k_hi)) for _ in range(reps)]
    ms = sorted(max((hi - lo) / (k_hi - k_lo), 1e-9) for lo, hi in pairs)
    return ms[len(ms) // 2]


def scan_loop(fn, *stacked_consts_and_args):
    """K-iteration loop; consts pre-stacked [2, ...] and dynamic_indexed
    in-body (the wedge-safe shape). Returns run(k)->int."""
    def many(args, idxs):
        consts2, fixed = args

        def body(acc, i):
            j = (i % 2).astype(jnp.int32)
            c = jax.tree_util.tree_map(
                lambda s: jax.lax.dynamic_index_in_dim(s, j, 0, False),
                consts2)
            outs = fn(*c, *fixed)
            s = sum(o.sum(dtype=jnp.int32).astype(jnp.int64) for o in outs)
            return acc + s, None
        out, _ = jax.lax.scan(body, jnp.int64(0), idxs)
        return out
    g = jax.jit(many)

    def run(k):
        return int(g(stacked_consts_and_args,
                     jnp.arange(k, dtype=jnp.int32)))
    return run


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    w = width
    W = 2048
    n = P * 65536
    rng = np.random.default_rng(0xF5)
    vals = rng.integers(0, 1 << width, n, dtype=np.uint64).reshape(P, -1)
    from knoxdb_tpu.encode import schemes as S
    planes_np = np.stack([
        S.encode_bitpack(vals[p], 1, 0, width, 65536).planes
        for p in range(P)])
    planes = jnp.asarray(planes_np)                      # [P, w, W]
    planes_pm = jnp.asarray(planes_np.transpose(1, 0, 2).copy())
    mins = jnp.zeros(P, jnp.uint64)
    valid = jnp.full((P, W), 0xFFFFFFFF, jnp.uint32)
    print(f"# P={P} n={n} platform={jax.devices()[0].platform}",
          flush=True)

    def consts(lo, hi):
        lo_b, hi_b, fl = jax.jit(PS.range_consts,
                                 static_argnames=("width",))(
            mins, jnp.uint64(lo), jnp.uint64(hi), width)
        return lo_b, hi_b, fl

    c1 = consts(1000, 50000)
    c2 = consts(1001, 50000)
    cs = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]), c1, c2)

    # oracle check for v0 + v4 against the XLA reference
    # (r4: the canonical device layout flipped to plane-major after
    # this probe's first capture; the XLA ref takes [w, P, W] now)
    ref_m, ref_pc, ref_c = jax.jit(
        PS.fused_range_sum_ref, static_argnames=("width",))(
        planes_pm, mins, valid, jnp.uint64(1000), jnp.uint64(50000),
        width)

    bytes_planes = planes_np.nbytes + 3 * (n // 8)
    results = {}
    variants = [
        ("v0 T=8 baseline", build(P, w, W, 8, k_v0, 3, False), planes),
        ("v1 T=8 ladder-only", build(P, w, W, 8, k_ladder_only, 2,
                                     False), planes),
        ("v3 T=16", build(P, w, W, 16, k_v0, 3, False), planes),
        ("v3 T=32", build(P, w, W, 32, k_v0, 3, False), planes),
        ("v4 T=8 plane-major", build(P, w, W, 8, k_v4, 3, True),
         planes_pm),
        ("v5 T=16 plane-major", build(P, w, W, 16, k_v4, 3, True),
         planes_pm),
        ("v6 T=8 blockwise-pcnt", build(P, w, W, 8, k_v6, 3, False),
         planes),
        ("v6 T=16 blockwise-pcnt", build(P, w, W, 16, k_v6, 3, False),
         planes),
        ("v6 T=32 blockwise-pcnt", build(P, w, W, 32, k_v6, 3, False),
         planes),
        ("v7 T=8 pm+blockwise", build(P, w, W, 8, k_v7, 3, True),
         planes_pm),
        ("v7 T=16 pm+blockwise", build(P, w, W, 16, k_v7, 3, True),
         planes_pm),
    ]
    for name, f, pl_in in variants:
        try:
            outs = jax.jit(f)(*c1, pl_in, valid)
            if len(outs) == 3:
                ok = (np.asarray(outs[0]) == np.asarray(ref_m)).all() \
                    and (np.asarray(outs[1]) == np.asarray(ref_pc)).all()
            else:
                ok = (np.asarray(outs[0]) == np.asarray(ref_m)).all()
            run = scan_loop(f, cs, (pl_in, valid))
            m = marginal(run)
            gbs = bytes_planes / m / 1e9
            results[name] = m
            print(f"# {name}: exact={bool(ok)} marginal={m*1e3:.3f} ms "
                  f"eff={gbs:.0f} GB/s rows/s={n/m/1e9:.0f}G", flush=True)
        except Exception as e:
            print(f"# {name}: FAILED {type(e).__name__}: {e}",
                  flush=True)

    # v2 pcnt-only (mask arrives as a "const" channel, planes fixed)
    try:
        fpc = build_pcnt(P, w, W, 8)

        def f2(m_, planes_):
            return fpc(planes_, m_)
        run = scan_loop(f2, (jnp.stack([ref_m, ref_m]),), (planes,))
        m = marginal(run)
        results["v2 T=8 pcnt-only"] = m
        print(f"# v2 T=8 pcnt-only: marginal={m*1e3:.3f} ms "
              f"rows/s={n/m/1e9:.0f}G", flush=True)
    except Exception as e:
        print(f"# v2 pcnt-only skipped: {type(e).__name__}: {e}",
              flush=True)

    # same-run stream bandwidth
    x = jnp.arange((256 << 20) // 4, dtype=jnp.uint32)

    def many(x, idxs):
        def body(acc, i):
            return acc + (x ^ i).sum(dtype=jnp.uint32), None
        out, _ = jax.lax.scan(body, jnp.uint32(0), idxs)
        return out
    g = jax.jit(many)

    def srun(k):
        return int(g(x, jnp.arange(k, dtype=jnp.uint32)))
    sm = marginal(srun, 1, 33)
    print(f"# stream: {x.nbytes/sm/1e9:.0f} GB/s", flush=True)
    for name, m in results.items():
        print(f"# {name}: pct_of_stream="
              f"{100*bytes_planes/m/(x.nbytes/sm):.0f}%", flush=True)
    print("PS VARIANTS DONE", flush=True)


if __name__ == "__main__":
    main()
