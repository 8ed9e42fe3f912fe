"""TPU probe: isolate the Mosaic vector_extract crash in the count-only
group histogram (r5 top-k radix descent; 'Check failed: limits[i] <=
dim(i) (4 vs 1)' in ApplyVectorLayoutPass).

Variants (each its own pallas program, try/except JaxRuntimeError so one
crash doesn't end the run — the compile helper recovers per request):
  v1  n_chunks=0, H=256, L=32, S=16   (the crashing production shape)
  v2  n_chunks=0, H=256, L=32, S=8    (proven S at this H?)
  v3  n_chunks=1, H=256, L=32, S=16   (NC=2 family)
  v4  n_chunks=0, H=128, L=8,  S=16   (small geometry)
  v5  n_chunks=1, H=256, L=32, S=8

Usage: PYTHONPATH=/root/repo:/root/.axon_site python probes/histcrash_probe.py
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

N = 1 << 20


def main():
    import jax
    import jax.numpy as jnp

    from knoxdb_tpu.ops import pallas_group as PG

    rng = np.random.default_rng(5)
    cases = [
        ("v1 C0 H256 L32 S16", 0, 256, 32, 16),
        ("v2 C0 H256 L32 S8", 0, 256, 32, 8),
        ("v3 C1 H256 L32 S16", 1, 256, 32, 16),
        ("v4 C0 H128 L8 S16", 0, 128, 8, 16),
        ("v5 C1 H256 L32 S8", 1, 256, 32, 8),
    ]
    for name, C, H, L, S in cases:
        G = H * L
        gid_np = rng.integers(0, G, N).astype(np.int32)
        vlo = jnp.zeros(N, jnp.uint32)
        gid = jnp.asarray(gid_np)
        try:
            parts = jax.jit(lambda g, z: PG.fused_group_partials(
                g, z, z, G, L, L.bit_length() - 1, n_chunks=C,
                H=H, S=S))(gid, vlo)
            hist = np.asarray(parts).astype(np.int64).sum(axis=0)
            cnt_col = C                     # count is the last column
            got = hist.reshape(H * L, C + 1)[:, cnt_col]
            want = np.bincount(gid_np, minlength=G)
            ok = (got == want).all()
            print(f"{name}: OK exact={bool(ok)}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: CRASH {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
