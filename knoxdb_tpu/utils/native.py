"""ctypes bindings for the native host kernels (native/knox_native.cc).

Builds the shared library on first import (cached under native/build);
every entry point has a numpy fallback so the package works without a
toolchain. The native side replaces the reference's encode-path SIMD
assembly on the HOST (the device side is ops/bitslice.py)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

__all__ = ["lib", "bitplane_pack", "bitplane_unpack", "analyze_u64",
           "bitset_indexes", "available"]

_ROOT = Path(__file__).resolve().parents[2]
_SRC = _ROOT / "native" / "knox_native.cc"
_SO = _ROOT / "native" / "build" / "libknox_native.so"

lib = None


def _build() -> bool:
    try:
        _SO.parent.mkdir(parents=True, exist_ok=True)
        if (not _SO.exists()
                or _SO.stat().st_mtime < _SRC.stat().st_mtime):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", str(_SO), str(_SRC)],
                check=True, capture_output=True)
        return True
    except Exception:
        return False


def _load() -> None:
    global lib
    if lib is not None or os.environ.get("KNOX_NO_NATIVE"):
        return
    if not _build():
        return
    try:
        L = ctypes.CDLL(str(_SO))
        u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        L.bitplane_pack.argtypes = [u64p, ctypes.c_int64, ctypes.c_int64,
                                    ctypes.c_int32, u32p]
        L.bitplane_unpack.argtypes = [u32p, ctypes.c_int64, ctypes.c_int64,
                                      ctypes.c_int32, u64p]
        L.analyze_u64.argtypes = [u64p, ctypes.c_int64, u64p]
        L.bitset_indexes.argtypes = [u32p, ctypes.c_int64, ctypes.c_uint32,
                                     u32p]
        L.bitset_indexes.restype = ctypes.c_int64
        lib = L
    except Exception:
        lib = None


_load()


def available() -> bool:
    return lib is not None


def bitplane_pack(values: np.ndarray, width: int, n_pad: int) -> np.ndarray:
    """u64[n] -> u32[width, n_pad//32] bitplanes."""
    n = len(values)
    w = max(width, 1)
    if lib is not None and n:
        out = np.empty((w, n_pad // 32), np.uint32)
        vals = np.ascontiguousarray(values, np.uint64)
        lib.bitplane_pack(vals, n, n_pad, width, out)
        if width == 0:
            out[:] = 0
        return out
    from ..encode.schemes import _pack_bitplanes_np
    return _pack_bitplanes_np(values, width, n_pad)


def bitplane_unpack(planes: np.ndarray, width: int, n: int) -> np.ndarray:
    if lib is not None and n:
        out = np.empty(n, np.uint64)
        p = np.ascontiguousarray(planes, np.uint32)
        lib.bitplane_unpack(p, n, p.shape[1] * 32, width, out)
        return out
    vals = np.zeros(planes.shape[1] * 32, np.uint64)
    for b in range(width):
        bits = np.unpackbits(planes[b].view(np.uint8),
                             bitorder="little").astype(np.uint64)
        vals |= bits << np.uint64(b)
    return vals[:n]


def analyze_u64(values: np.ndarray):
    """(min, max, num_runs, delta_width, pack_width, sorted)."""
    if lib is not None and len(values):
        out = np.empty(6, np.uint64)
        vals = np.ascontiguousarray(values, np.uint64)
        lib.analyze_u64(vals, len(vals), out)
        return (int(out[0]), int(out[1]), int(out[2]), int(out[3]),
                int(out[4]), bool(out[5]))
    keys = np.asarray(values, np.uint64)
    mn, mx = int(keys.min()), int(keys.max())
    runs = 1 + int((keys[1:] != keys[:-1]).sum())
    if len(keys) > 1:
        with np.errstate(over="ignore"):
            d = (keys[1:] - keys[:-1]).view(np.int64)
            zz = ((d << 1) ^ (d >> 63)).view(np.uint64)
        dw = int(zz.max()).bit_length()
        sorted_ = bool((d >= 0).all())
    else:
        dw, sorted_ = 0, True
    return mn, mx, runs, dw, (mx - mn).bit_length(), sorted_


def bitset_indexes(words: np.ndarray, base: int = 0) -> np.ndarray:
    if lib is not None:
        w = np.ascontiguousarray(words, np.uint32)
        cap = int(np.bitwise_count(w).sum()) if hasattr(np, "bitwise_count") \
            else int(sum(bin(int(x)).count("1") for x in w))
        out = np.empty(max(cap, 1), np.uint32)
        k = lib.bitset_indexes(w, len(w), base, out)
        return out[:k]
    bits = np.unpackbits(words.view(np.uint8), bitorder="little")
    return (np.flatnonzero(bits) + base).astype(np.uint32)
