"""Binary fuse / xor filter (8-bit fingerprints).

Analog of the reference fuse filters (/root/reference/internal/filter/
fuse wrapping FastFilter/xorfilter, 8/16-bit): a static membership filter
at ~9.8 bits/key with ~0.39% fpr (xor8 construction; the reference's
binary-fuse variant trades a denser layout for the same contract).
Build by hypergraph peeling over three hash positions; query = 3 loads +
xor compare. Used as a per-pack alternative to bloom when packs are
sealed (build once, never mutate).
"""

from __future__ import annotations

import numpy as np

from ..ops import hash as H

__all__ = ["XorFilter", "build", "build_bytes"]


def _mix(h: np.ndarray, seed: int) -> np.ndarray:
    return H.mix32((h ^ np.uint32(seed)).astype(np.uint32), np)


class XorFilter:
    def __init__(self, seed: int, fingerprints: np.ndarray):
        self.seed = seed
        self.fp = fingerprints            # u8[3 * block]
        self.block = len(fingerprints) // 3

    def _positions(self, h1: np.ndarray, h2: np.ndarray):
        base = (h1.astype(np.uint64) << np.uint64(32)) | h2
        hs = []
        for i in range(3):
            hi = _mix((base >> np.uint64(16 * i)).astype(np.uint32),
                      self.seed + i)
            hs.append((hi % np.uint32(self.block)).astype(np.int64)
                      + i * self.block)
        fp = (_mix(h1 ^ h2, self.seed ^ 0xABCD1234) & np.uint32(0xFF)) \
            .astype(np.uint8)
        return hs, fp

    def contains_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        (p0, p1, p2), fp = self._positions(h1, h2)
        return (self.fp[p0] ^ self.fp[p1] ^ self.fp[p2]) == fp

    def contains_limbs(self, limbs: np.ndarray) -> np.ndarray:
        h1, h2 = H.hash2_np(limbs)
        return self.contains_hashes(h1, h2)

    @property
    def nbytes(self) -> int:
        return len(self.fp)


def _try_build(h1: np.ndarray, h2: np.ndarray, block: int, seed: int):
    f = XorFilter(seed, np.zeros(3 * block, np.uint8))
    (p0, p1, p2), fp = f._positions(h1, h2)
    pos = np.stack([p0, p1, p2], axis=1)
    n = len(h1)
    m = 3 * block
    # peeling: repeatedly remove keys that are the only occupant of a slot
    count = np.bincount(pos.reshape(-1), minlength=m)
    xor_acc = np.zeros(m, np.int64)
    for k in range(n):
        for j in range(3):
            xor_acc[pos[k, j]] ^= k + 1        # store key ids (1-based)
    stack = []
    alive = np.ones(n, bool)
    queue = [s for s in range(m) if count[s] == 1]
    while queue:
        s = queue.pop()
        if count[s] != 1:
            continue
        k = xor_acc[s] - 1
        if k < 0 or not alive[k]:
            continue
        stack.append((k, s))
        alive[k] = False
        for j in range(3):
            ss = pos[k, j]
            count[ss] -= 1
            xor_acc[ss] ^= k + 1
            if count[ss] == 1:
                queue.append(ss)
    if alive.any():
        return None
    fps = np.zeros(m, np.uint8)
    for k, s in reversed(stack):
        fps[s] = fp[k] ^ fps[pos[k, 0]] ^ fps[pos[k, 1]] ^ fps[pos[k, 2]]
        # note: fps[s] included itself as 0 before assignment
    f.fp = fps
    return f


def build(limbs: np.ndarray) -> XorFilter:
    """Keyform limbs u32[L, N] (unique keys) -> xor8 filter."""
    h1, h2 = H.hash2_np(limbs)
    return _build_hashes(h1, h2)


def build_bytes(vals: list) -> XorFilter:
    from .bloom import _bytes_hashes
    h1, h2 = _bytes_hashes(vals)
    return _build_hashes(h1, h2)


def _build_hashes(h1: np.ndarray, h2: np.ndarray) -> XorFilter:
    # duplicates break peeling: dedupe on the combined 64-bit hash
    base = (h1.astype(np.uint64) << np.uint64(32)) | h2
    _, keep = np.unique(base, return_index=True)
    h1, h2 = h1[keep], h2[keep]
    n = max(len(h1), 1)
    block = max(4, int(1.23 * n / 3) + 8)
    for seed in range(100):
        f = _try_build(h1, h2, block, seed * 0x9E3779B1 & 0x7FFFFFFF)
        if f is not None:
            return f
        block = int(block * 1.1) + 1
    raise RuntimeError("xor filter construction failed")
