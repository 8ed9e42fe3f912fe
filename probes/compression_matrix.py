"""Compression matrix: at-rest bits/val + encode rate per scheme family
(VERDICT r4 next-#4 — quantify the ALP-RD-equivalence claim and the
scheme-selection outcomes across the reference's distribution matrix).

Methodology (mirrors the r4 s8b-deletion study, PARITY.md): every
column runs the PRODUCTION encode path (pack/segment.build_segment —
analyze + cost-model scheme selection + per-pack encoding), then its
at-rest size is each pack's arrays under the segio outer codec
(zstd level 1, min(raw, compressed) per array — exactly what
store/segio.dump_segment records), plus dict blobs. bits/val =
at-rest bytes * 8 / n. Encode rate = n / (t(pk+col) - t(pk)) through
build_segment (host path, single core — reference numbers are
single-core asm; cite both honestly).

Float datasets target ALP-RD's domain (ref internal/encode/alp/rd.go,
bench.md:36-40): clustered-exponent full-mantissa doubles are exactly
the left-bits redundancy ALP-RD's 16-bit-left dictionary captures; here
they fall to keyform BITPACK whose per-pack (max-min) keyform spread
covers the same redundancy when clusters are pack-local.

Run (CPU): PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python \
           probes/compression_matrix.py [--n 1048576]
Output: one markdown table row per dataset (paste into
docs/compression.md).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

try:
    import zstandard as _zstd
    _ZC = _zstd.ZstdCompressor(level=1).compress
except ImportError:                     # pragma: no cover
    import zlib
    _ZC = lambda b: zlib.compress(b, 1)          # noqa: E731

N = 1 << 20
if "--n" in sys.argv:
    N = int(sys.argv[sys.argv.index("--n") + 1])
PACK = 1 << 16


def atrest_bytes(col) -> int:
    """Per-column at-rest size under the segio outer codec."""
    total = 0
    for p in col.packs:
        for a in (p.planes, p.values, p.ends):
            if a is not None:
                raw = np.ascontiguousarray(a).tobytes()
                total += min(len(raw), len(_ZC(raw))) + 8
        if p.dict_bytes is not None:
            blob = b"\x00".join(p.dict_bytes)
            total += min(len(blob), len(_ZC(blob))) + 8
        total += 32                      # header/min_key/width metadata
    return total


def datasets(rng):
    n = N
    out = []

    def ints(name, v):
        out.append((name, "u64" if v.dtype == np.uint64 else "i64", v))

    ints("seq", np.arange(n, dtype=np.uint64))
    ints("dups8", rng.integers(0, 256, n, dtype=np.uint64))
    runs = np.repeat(rng.integers(0, 1 << 20, n // 100 + 1,
                                  dtype=np.uint64), 100)[:n]
    ints("runs100", runs.astype(np.uint64))
    ints("rand64", rng.integers(0, 1 << 63, n, dtype=np.uint64))
    ints("uniform16", rng.integers(0, 1 << 16, n, dtype=np.uint64))
    sk = rng.integers(0, 1 << 14, n, dtype=np.uint64)
    idx = rng.choice(n, n // 1000, replace=False)
    sk[idx] = rng.integers(0, 1 << 60, len(idx), dtype=np.uint64)
    ints("skew_outlier", sk)
    pool = rng.integers(0, 1 << 48, 64, dtype=np.uint64)
    zipf = pool[np.minimum(rng.zipf(1.4, n) - 1, 63)]
    ints("zipf_dict64", zipf.astype(np.uint64))
    ints("signed_norm",
         (rng.normal(0, 1e6, n)).astype(np.int64))

    # strings
    words = np.array([f"word-{i:04d}" for i in range(1000)], object)
    out.append(("str_dict1k", "str", words[rng.integers(0, 1000, n)]))

    # floats — the ALP / ALP-RD axis
    out.append(("dec2", "f64",
                np.round(rng.normal(100, 30, n), 2)))
    out.append(("dec4_price", "f64",
                np.round(rng.uniform(0.01, 5000, n), 4)))
    out.append(("one_exp_mantissa", "f64", rng.uniform(1.0, 2.0, n)))
    te = np.where(rng.random(n) < 0.5, rng.uniform(1, 2, n),
                  rng.uniform(1024, 2048, n))
    out.append(("two_exp_mantissa", "f64", te))
    out.append(("poi_lat", "f64", rng.uniform(-90, 90, n)))
    out.append(("sensor_walk", "f64",
                20.0 + np.cumsum(rng.normal(0, 0.01, n))))
    # worst case for keyform BITPACK: many exponent clusters SHUFFLED
    # into every pack (defeats per-pack min rebasing)
    scales = 10.0 ** rng.integers(-8, 9, n)
    out.append(("multi_exp_shuffled", "f64",
                rng.uniform(1, 2, n) * scales))
    return out


def main():
    from knoxdb_tpu.pack.segment import build_segment
    from knoxdb_tpu.schema.schema import Builder
    from knoxdb_tpu.types import FieldType

    rng = np.random.default_rng(0xA17)
    rows = []
    pk = np.arange(1, N + 1, dtype=np.uint64)

    sch_pk = Builder("m").pk("id").finish()
    t_pk = []
    for _ in range(3):                   # first build warms imports/jit
        t0 = time.perf_counter()
        build_segment(sch_pk, {"id": pk}, pack_size=PACK)
        t_pk.append(time.perf_counter() - t0)
    t_pk = min(t_pk)

    for name, kind, vals in datasets(rng):
        ft = {"u64": FieldType.UINT64, "i64": FieldType.INT64,
              "f64": FieldType.FLOAT64, "str": FieldType.STRING}[kind]
        sch = Builder("m").pk("id").add("v", ft).finish()
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            seg = build_segment(sch, {"id": pk, "v": vals},
                                pack_size=PACK)
            ts.append(time.perf_counter() - t0)
        dt = max(min(ts) - t_pk, 1e-9)
        col = seg.columns["v"]
        ab = atrest_bytes(col)
        schemes = sorted({p.scheme.name for p in col.packs})
        widths = sorted({p.width for p in col.packs})
        wtag = (f"w{widths[0]}" if len(widths) == 1
                else f"w{widths[0]}-{widths[-1]}")
        rows.append((name, kind, "/".join(schemes), wtag,
                     ab * 8 / N, N / dt / 1e6))
        print(f"| {name} | {kind} | {'/'.join(schemes)} | {wtag} | "
              f"{ab * 8 / N:.2f} | {N / dt / 1e6:.0f} |", flush=True)

    print("\n# columns: dataset | type | scheme(s) | width | "
          "bits/val at-rest | encode Mvals/s")


if __name__ == "__main__":
    main()
