"""Extended series reducers (first/last/var/std + *_join) vs a python
oracle implementing the reference semantics (reducer.go:24-48,198-700).
"""

import math

import numpy as np
import pytest

import knoxdb_tpu.knox as knox
from knoxdb_tpu.series import FillMode, SeriesRequest, run_series
from dataclasses import dataclass


@dataclass
class Row:
    id: int = 0
    ts: int = 0
    v: int = 0
    x: float = 0.0


def oracle(ts, vals, start, end, interval, op):
    """Reference reducer semantics per bucket; None for empty buckets."""
    G = max(1, -(-(end - start) // interval))
    out = [None] * G
    ts = np.asarray(ts)
    vals = np.asarray(vals)
    for g in range(G):
        lo = start + g * interval
        m = (ts >= lo) & (ts < lo + interval) & (ts >= start) & (ts < end)
        if not m.any():
            continue
        tv, vv = ts[m], vals[m]
        order = np.argsort(tv, kind="stable")
        tv, vv = tv[order], vv[order]
        if op.endswith("_join"):
            # sum same-timestamp rows, then reduce over the sums
            uts = np.unique(tv)
            sums = np.array([vv[tv == u].sum() for u in uts], vv.dtype)
            base = op[:-5]
            if base == "first":
                out[g] = sums[0]
            elif base == "last":
                out[g] = sums[-1]
            elif base == "min":
                out[g] = sums.min()
            elif base == "max":
                out[g] = sums.max()
            elif base == "mean":
                out[g] = float(sums.mean())
            elif base == "var":
                out[g] = float("nan") if len(sums) < 2 else \
                    float(np.var(sums.astype(np.float64), ddof=1))
            elif base == "std":
                out[g] = float("nan") if len(sums) < 2 else \
                    float(np.std(sums.astype(np.float64), ddof=1))
        elif op == "first":
            out[g] = vv[0]
        elif op == "last":
            out[g] = vv[-1]
        elif op == "var":
            out[g] = float("nan") if len(vv) < 2 else \
                float(np.var(vv.astype(np.float64), ddof=1))
        elif op == "std":
            out[g] = float("nan") if len(vv) < 2 else \
                float(np.std(vv.astype(np.float64), ddof=1))
    return out


def close(a, b):
    if a is None or b is None:
        return a is None and b is None
    fa, fb = float(a), float(b)
    if math.isnan(fa) or math.isnan(fb):
        return math.isnan(fa) and math.isnan(fb)
    return fa == pytest.approx(fb, rel=1e-9, abs=1e-9)


START, END, IV = 1000, 2000, 100
OPS = ["first", "last", "var", "std", "first_join", "last_join",
       "min_join", "max_join", "mean_join", "var_join", "std_join"]


def _mkdb(rng, n=3000, two_segments=False, journal_rows=0, name="sr"):
    db = knox.create_database(name, driver="mem", pack_size=256,
                              background_merge=False)
    t = db.create_table(Row)
    ts = rng.integers(900, 2100, n)          # spills outside the window
    # heavy ts collisions inside buckets exercise the run coalescing
    ts = (ts // 7) * 7
    v = rng.integers(-1000, 1000, n)
    x = np.round(rng.normal(0, 10, n), 3)
    if two_segments:
        h = n // 2
        t.insert({"id": np.arange(1, h + 1, dtype=np.uint64),
                  "ts": ts[:h], "v": v[:h], "x": x[:h]})
        t.merge()
        t.insert({"id": np.arange(h + 1, n + 1, dtype=np.uint64),
                  "ts": ts[h:], "v": v[h:], "x": x[h:]})
        t.merge()
    else:
        t.insert({"id": np.arange(1, n + 1, dtype=np.uint64),
                  "ts": ts, "v": v, "x": x})
        t.merge()
    if journal_rows:
        jts = (rng.integers(900, 2100, journal_rows) // 7) * 7
        jv = rng.integers(-1000, 1000, journal_rows)
        jx = np.round(rng.normal(0, 10, journal_rows), 3)
        t.insert({"id": np.arange(n + 1, n + journal_rows + 1,
                                  dtype=np.uint64),
                  "ts": jts, "v": jv, "x": jx})
        ts = np.concatenate([ts, jts])
        v = np.concatenate([v, jv])
        x = np.concatenate([x, jx])
    return db, t, ts, v, x


def _check(t, ts, vals, field, ops):
    req = SeriesRequest(table=t, time_field="ts", start=START, end=END,
                        interval=IV, aggs=[(op, field) for op in ops],
                        fill=FillMode.NULL)
    out = run_series(req)
    for op in ops:
        want = oracle(ts, vals, START, END, IV, op)
        got = out[(op, field)]
        for g in range(len(want)):
            assert close(got[g], want[g]), \
                f"{op}({field}) bucket {g}: got {got[g]} want {want[g]}"


def test_single_segment_int(rng):
    db, t, ts, v, x = _mkdb(rng, name="sr1")
    _check(t, ts, v, "v", OPS)
    db.close()


def test_two_segments_interleaved_int(rng):
    """Interleaved time ranges across segments force the exact overlap
    fallback in the *_join merge."""
    db, t, ts, v, x = _mkdb(rng, two_segments=True, name="sr2")
    _check(t, ts, v, "v", OPS)
    db.close()


def test_journal_overlay(rng):
    db, t, ts, v, x = _mkdb(rng, journal_rows=200, name="sr3")
    _check(t, ts, v, "v", OPS)
    db.close()


def test_float_column(rng):
    """float64 column: var/std/first/last on device, *_join via the
    exact host fallback."""
    db, t, ts, v, x = _mkdb(rng, journal_rows=50, name="sr4")
    _check(t, ts, x, "x", OPS)
    db.close()


def test_sparse_and_single_row_buckets(rng):
    """n=1 buckets: var/std NaN (reducer.go:375-378); empty buckets
    stay None under NULL fill."""
    db = knox.create_database("sr5", driver="mem", pack_size=256,
                              background_merge=False)
    t = db.create_table(Row)
    ts = np.array([1000, 1150, 1150, 1900])
    v = np.array([5, 7, -2, 9])
    t.insert({"id": np.arange(1, 5, dtype=np.uint64), "ts": ts, "v": v,
              "x": np.zeros(4)})
    t.merge()
    _check(t, ts, v, "v", OPS)
    req = SeriesRequest(table=t, time_field="ts", start=START, end=END,
                        interval=IV, aggs=[("var", "v")],
                        fill=FillMode.NULL)
    out = run_series(req)
    assert math.isnan(out[("var", "v")][0])          # single row
    assert out[("var", "v")][2] is None              # empty bucket
    db.close()


def test_ts_runs_kernel_vs_oracle(rng):
    """Device kernel direct: runs spanning pack boundaries."""
    import jax.numpy as jnp
    from knoxdb_tpu.exec import groupby as GB
    from knoxdb_tpu.ops import bitset as bs
    P, N, G = 4, 256, 8
    gids = rng.integers(-1, G + 1, (P, N)).astype(np.int32)
    ts = rng.integers(0, 20, (P, N)).astype(np.uint64)   # many collisions
    bias = np.uint64(1 << 63)
    vals = (rng.integers(-500, 500, (P, N)).astype(np.int64)
            .view(np.uint64) ^ np.uint64(1 << 63))       # keyform signed
    mask = rng.random((P, N)) < 0.8
    mw = jnp.asarray(np.stack([bs.np_pack_mask(mask[p]) for p in range(P)]))
    out = GB.group_ts_runs(jnp.asarray(gids), mw, jnp.asarray(ts),
                           jnp.asarray(vals), G, jnp.uint64(bias))
    (n_runs, f_ts, f_cnt, f_lo, f_hi, l_ts, l_cnt, l_lo, l_hi,
     i_min, i_max, i_n, i_s, i_q) = [np.asarray(a) for a in out]
    ok = mask & (gids >= 0) & (gids < G)
    for g in range(G):
        m = ok & (gids == g)
        uts = np.unique(ts[m])
        assert n_runs[g] == len(uts)
        if not len(uts):
            continue
        sums = {int(u): int((vals[m & (ts == u)].astype(object)
                             - (1 << 63)).sum()) for u in uts}
        first_s = (int(f_lo[g]) + (int(f_hi[g]) << 32)) % (1 << 64)
        assert int(f_ts[g]) == int(uts[0])
        assert first_s == sums[int(uts[0])] % (1 << 64)
        last_s = (int(l_lo[g]) + (int(l_hi[g]) << 32)) % (1 << 64)
        assert int(l_ts[g]) == int(uts[-1])
        assert last_s == sums[int(uts[-1])] % (1 << 64)
        interior = [sums[int(u)] for u in uts[1:-1]]
        assert int(i_n[g]) == len(interior)
        if interior:
            kf = [(s + (1 << 63)) % (1 << 64) for s in interior]
            assert int(i_min[g]) == min(kf)
            assert int(i_max[g]) == max(kf)
            assert float(i_s[g]) == pytest.approx(sum(interior))
