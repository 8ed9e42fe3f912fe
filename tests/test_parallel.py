"""Multi-chip pack-parallel scan on the 8-device virtual CPU mesh
(conftest sets xla_force_host_platform_device_count=8)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from knoxdb_tpu.encode import schemes as S
from knoxdb_tpu.parallel import shard as PS

pytestmark = pytest.mark.slow  # full tier only (see pytest.ini)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device")
def test_sharded_range_scan(rng):
    n_dev = len(jax.devices())
    mesh = PS.make_mesh(n_dev)
    pack_size = 1024
    P = n_dev * 3
    width = 10
    vals = rng.integers(0, 1 << width, (P, pack_size), dtype=np.uint64)
    mins = rng.integers(0, 1000, P, dtype=np.uint64)
    vals_abs = vals + mins[:, None]
    planes = np.stack([
        S.encode_bitpack(vals_abs[p], 1, int(mins[p]), width, pack_size).planes
        for p in range(P)], axis=1)     # plane-major (r4)
    valid = np.full((P, pack_size // 32), 0xFFFFFFFF, np.uint32)

    lo, hi = 600, 1600
    cnt, total = PS.sharded_range_scan(
        mesh, jnp.asarray(planes), jnp.asarray(mins), jnp.asarray(valid),
        lo, hi, width)
    m = (vals_abs >= lo) & (vals_abs <= hi)
    assert cnt == int(m.sum())
    assert total == int(vals_abs[m].astype(object).sum())


def test_graft_entry_dryrun():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    mod.dryrun_multichip(min(8, len(jax.devices())))


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device")
def test_shuffle_join(rng):
    from knoxdb_tpu.parallel import shuffle as SH
    n_dev = len(jax.devices())
    mesh = SH.Mesh(np.array(jax.devices()[:n_dev]), ("shards",))
    nl, nr = n_dev * 400, n_dev * 100
    rkeys = rng.permutation(np.arange(1, nr + 1, dtype=np.uint64))
    rvals = rng.integers(0, 1000, nr, dtype=np.uint64)
    lkeys = rng.integers(1, nr * 2, nl, dtype=np.uint64)  # ~half miss
    lvals = rng.integers(0, 1000, nl, dtype=np.uint64)
    cnt, csum = SH.shuffle_join(mesh, lkeys, lvals, rkeys, rvals,
                                skew_factor=8.0)
    # numpy oracle
    rmap = {int(k): int(v) for k, v in zip(rkeys, rvals)}
    hits = [(int(lv) + rmap[int(lk)]) for lk, lv in zip(lkeys, lvals)
            if int(lk) in rmap]
    assert cnt == len(hits)
    assert csum == sum(hits) % (1 << 64)


# ---------------------------------------------------- shuffle join (rows) --

def _oracle_pairs(lk, rk, how="inner"):
    from knoxdb_tpu.exec.join import join_keys_np
    from knoxdb_tpu.types import JoinType
    r = join_keys_np(np.asarray(lk, np.uint64), np.asarray(rk, np.uint64),
                     JoinType[how.upper()])
    return sorted(zip(r.lidx.tolist(), r.ridx.tolist()))


def test_shuffle_join_rows_oracle(rng):
    from knoxdb_tpu.parallel.shuffle import shuffle_join_rows
    from jax.sharding import Mesh
    import jax
    mesh = Mesh(np.array(jax.devices()[:8]), ("shards",))
    nl, nr = 100_000, 20_000
    rk = rng.permutation(np.arange(1, nr + 1)).astype(np.uint64)
    lk = rng.integers(1, nr * 2, nl).astype(np.uint64)
    lidx, ridx, stats = shuffle_join_rows(mesh, lk, rk)
    got = sorted(zip(lidx.tolist(), ridx.tolist()))
    assert got == _oracle_pairs(lk, rk)
    assert stats["shuffle_gbps"] > 0


def test_shuffle_join_rows_skew_salted(rng):
    """One key is 40% of the probe side AND duplicated on the build side:
    salting must engage (heavy_buckets > 0) and results stay exact."""
    from knoxdb_tpu.parallel.shuffle import shuffle_join_rows
    from jax.sharding import Mesh
    import jax
    mesh = Mesh(np.array(jax.devices()[:8]), ("shards",))
    nl = 50_000
    hot = np.uint64(777)
    lk = rng.integers(1, 1000, nl).astype(np.uint64)
    lk[: nl * 2 // 5] = hot
    rk = np.concatenate([np.arange(1, 1000, dtype=np.uint64),
                         np.full(3, hot, np.uint64)])
    lidx, ridx, stats = shuffle_join_rows(mesh, lk, rk, skew_factor=2.0)
    assert stats["heavy_buckets"] >= 1
    got = sorted(zip(lidx.tolist(), ridx.tolist()))
    assert got == _oracle_pairs(lk, rk)


@pytest.mark.parametrize("how", ["inner", "left"])
def test_shuffle_join_rows_unique(rng, how):
    """Fused unique-build path (pk join): one program, no count phase."""
    from knoxdb_tpu.parallel.shuffle import shuffle_join_rows
    from jax.sharding import Mesh
    import jax
    mesh = Mesh(np.array(jax.devices()[:8]), ("shards",))
    nl, nr = 60_000, 9_000
    rk = rng.permutation(np.arange(1, nr + 1)).astype(np.uint64)
    lk = rng.integers(1, nr * 2, nl).astype(np.uint64)
    lidx, ridx, stats = shuffle_join_rows(mesh, lk, rk, how=how,
                                          unique_build=True)
    assert stats["cap_pairs"] == 0        # count phase skipped
    got = sorted(zip(lidx.tolist(), ridx.tolist()))
    assert got == _oracle_pairs(lk, rk, how)


def test_shuffle_join_rows_unique_skew(rng):
    """Unique build + one hot probe key: salting engages, build of the
    heavy bucket replicates, result stays exact."""
    from knoxdb_tpu.parallel.shuffle import shuffle_join_rows
    from jax.sharding import Mesh
    import jax
    mesh = Mesh(np.array(jax.devices()[:8]), ("shards",))
    nl = 40_000
    hot = np.uint64(777)
    lk = rng.integers(1, 1000, nl).astype(np.uint64)
    lk[: nl * 2 // 5] = hot
    rk = rng.permutation(np.arange(1, 1000)).astype(np.uint64)
    lidx, ridx, stats = shuffle_join_rows(mesh, lk, rk, skew_factor=2.0,
                                          unique_build=True)
    assert stats["heavy_buckets"] >= 1
    got = sorted(zip(lidx.tolist(), ridx.tolist()))
    assert got == _oracle_pairs(lk, rk)


def test_shuffle_join_rows_unique_dup_fallback(rng):
    """A duplicated build key with unique_build=True must still produce
    exact results (device dup check -> general path)."""
    from knoxdb_tpu.parallel.shuffle import shuffle_join_rows
    from jax.sharding import Mesh
    import jax
    mesh = Mesh(np.array(jax.devices()[:8]), ("shards",))
    rk = np.concatenate([np.arange(1, 2000, dtype=np.uint64),
                         np.array([7, 7], np.uint64)])
    lk = rng.integers(1, 3000, 10_000).astype(np.uint64)
    lidx, ridx, _ = shuffle_join_rows(mesh, lk, rk, unique_build=True)
    got = sorted(zip(lidx.tolist(), ridx.tolist()))
    assert got == _oracle_pairs(lk, rk)


def test_shuffle_join_rows_shift_core(rng):
    """Default path rides the distributed shift core (r4): bounded key
    runs, duplicates on both sides."""
    from knoxdb_tpu.parallel.shuffle import shuffle_join_rows
    from jax.sharding import Mesh
    import jax
    mesh = Mesh(np.array(jax.devices()[:8]), ("shards",))
    # ~4.2 rows/key merged: runs stay well under SHIFT_S=16
    lk = rng.integers(1, 13_333, 40_000).astype(np.uint64)
    rk = rng.integers(1, 13_333, 16_000).astype(np.uint64)
    lidx, ridx, stats = shuffle_join_rows(mesh, lk, rk)
    assert stats["core"] == "shift"
    got = sorted(zip(lidx.tolist(), ridx.tolist()))
    assert got == _oracle_pairs(lk, rk)


def test_shuffle_join_rows_shift_fallback(rng):
    """A build-key run spanning > SHIFT_S entries must trip the
    per-shard maxneed check and fall back to the general expansion
    phases — exactly (results stay oracle-correct)."""
    from knoxdb_tpu.parallel.shuffle import shuffle_join_rows
    from jax.sharding import Mesh
    import jax
    mesh = Mesh(np.array(jax.devices()[:8]), ("shards",))
    rk = np.concatenate([np.arange(1, 2000, dtype=np.uint64),
                         np.full(40, 7, np.uint64)])      # 41-wide run
    lk = rng.integers(1, 3000, 20_000).astype(np.uint64)
    lidx, ridx, stats = shuffle_join_rows(mesh, lk, rk)
    assert stats["core"] == "general"
    got = sorted(zip(lidx.tolist(), ridx.tolist()))
    assert got == _oracle_pairs(lk, rk)


@pytest.mark.parametrize("unique", [False, True])
def test_shuffle_join_rows_keys32(rng, unique):
    """keys32 drops the hi-limb sort operand on every rung; results
    must stay identical for u32-domain keys."""
    from knoxdb_tpu.parallel.shuffle import shuffle_join_rows
    from jax.sharding import Mesh
    import jax
    mesh = Mesh(np.array(jax.devices()[:8]), ("shards",))
    nr = 9_000
    rk = rng.permutation(np.arange(1, nr + 1)).astype(np.uint64)
    if not unique:
        rk = np.concatenate([rk, rk[:500]])               # dups
    lk = rng.integers(1, nr * 2, 30_000).astype(np.uint64)
    lidx, ridx, stats = shuffle_join_rows(mesh, lk, rk,
                                          unique_build=unique,
                                          keys32=True)
    assert stats["core"] == ("unique" if unique else "shift")
    got = sorted(zip(lidx.tolist(), ridx.tolist()))
    assert got == _oracle_pairs(lk, rk)


def test_shuffle_join_rows_left(rng):
    from knoxdb_tpu.parallel.shuffle import shuffle_join_rows
    from jax.sharding import Mesh
    import jax
    mesh = Mesh(np.array(jax.devices()[:8]), ("shards",))
    lk = rng.integers(1, 200, 5000).astype(np.uint64)
    rk = np.arange(1, 100, dtype=np.uint64)   # keys >= 100 miss
    lidx, ridx, stats = shuffle_join_rows(mesh, lk, rk, how="left")
    got = sorted(zip(lidx.tolist(), ridx.tolist()))
    assert got == _oracle_pairs(lk, rk, "left")
