"""Mosaic-under-shard_map probe (VERDICT r3 next-#4).

r3 gated the Pallas group kernel OFF in the SPMD group path on the
untested assumption that Mosaic programs under shard_map might not
lower/execute on this stack. This probe answers it with data:

  1. build two identical tables (single-device scanner vs ShardedScanner
     over the full mesh — 8 virtual devices on CPU, 1 real device on
     TPU; a 1-device mesh still exercises the SPMD partitioner + Mosaic
     custom-call lowering path, which is the thing in question)
  2. run a G=1000 count/sum group query (MXU path) with
     KNOX_SPMD_PALLAS=1 four times; assert bit-identical to the
     single-device result every time (the r2 wedge discipline: wedges
     show on the SECOND process-level execution)

Exit 0 + "SPMD PALLAS PROBE PASS" -> flip config.use_spmd_pallas
default ON. Any Mosaic lowering error / drift -> keep the XLA path and
record the failure in CLAUDE.md.

Run (TPU):  timeout 2400 python probes/spmd_pallas_probe.py
Run (CPU):  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
            XLA_FLAGS=--xla_force_host_platform_device_count=8 \
            python probes/spmd_pallas_probe.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
os.environ["KNOX_SPMD_PALLAS"] = "1"


def main():
    import jax

    import knoxdb_tpu.knox as knox
    from knoxdb_tpu.parallel.engine_spmd import ShardedScanner
    from knoxdb_tpu.parallel.shard import make_mesh

    from dataclasses import dataclass

    @dataclass
    class Row:
        id: int = 0
        grp: int = 0
        val: int = 0

    ndev = len(jax.devices())
    mesh = make_mesh(ndev)
    print(f"# platform={jax.devices()[0].platform} ndev={ndev}",
          flush=True)
    n, G = 200_000, 1000
    rng = np.random.default_rng(0xA5)
    grp = rng.integers(0, G, n)
    val = rng.integers(-1 << 40, 1 << 40, n)

    def mk(name, mesh_):
        db = knox.create_database(name, driver="mem", pack_size=4096,
                                  background_merge=False, mesh=mesh_)
        t = db.create_table(Row)
        t.insert({"id": np.zeros(n, np.uint64), "grp": grp, "val": val})
        t.merge()
        return db, t

    db_s, t_s = mk("sp_s", None)
    db_m, t_m = mk("sp_m", mesh)
    h = t_m._t.segments[0]
    assert isinstance(h.scanner_(), ShardedScanner), "mesh not routed"

    want = t_s.query().group_by("grp").aggregate(("count", ""),
                                                 ("sum", "val"))
    for rep in range(4):
        t0 = time.perf_counter()
        got = t_m.query().group_by("grp").aggregate(("count", ""),
                                                    ("sum", "val"))
        dt = time.perf_counter() - t0
        assert (np.asarray(got["keys"]) == np.asarray(want["keys"])).all()
        assert (np.asarray(got["count"]) == np.asarray(want["count"])).all()
        assert [int(x) for x in got[("sum", "val")]] \
            == [int(x) for x in want[("sum", "val")]], f"rep{rep} sums"
        print(f"# rep{rep}: bit-identical ({dt:.1f}s)", flush=True)

    # r5: Mosaic SCAN fusion under shard_map (exec/scan._plan_fusion
    # now engages for ShardedScanner on TPU): count rides the MASK-ONLY
    # tree kernel, min/max the multi-agg tournament kernel, and the
    # filtered group query runs tree kernel + group kernel in ONE
    # program. All vs single-device truth, 4 repeats (wedge discipline).
    from knoxdb_tpu.knox import F

    def qw(t):
        return t.query().where(F("val") > -(1 << 39), F("grp") < 900)

    m = (val > -(1 << 39)) & (grp < 900)
    want_c = qw(t_s).count()
    assert want_c == int(m.sum())
    want_sum = qw(t_s).sum("val")
    want_min = qw(t_s).min("val")
    want_max = qw(t_s).max("val")
    wg = qw(t_s).group_by("grp").aggregate(("count", ""), ("sum", "val"))
    for rep in range(4):
        t0 = time.perf_counter()
        assert qw(t_m).count() == want_c, f"rep{rep} count"
        assert qw(t_m).sum("val") == want_sum, f"rep{rep} sum"
        assert qw(t_m).min("val") == want_min, f"rep{rep} min"
        assert qw(t_m).max("val") == want_max, f"rep{rep} max"
        gg = qw(t_m).group_by("grp").aggregate(("count", ""),
                                               ("sum", "val"))
        assert (np.asarray(gg["keys"]) == np.asarray(wg["keys"])).all()
        assert [int(x) for x in gg[("sum", "val")]] \
            == [int(x) for x in wg[("sum", "val")]], f"rep{rep} gsums"
        print(f"# scan-fusion rep{rep}: bit-identical "
              f"({time.perf_counter()-t0:.1f}s)", flush=True)

    db_s.close()
    db_m.close()
    print("SPMD PALLAS PROBE PASS", flush=True)


if __name__ == "__main__":
    main()
