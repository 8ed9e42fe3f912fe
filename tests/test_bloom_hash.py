"""Hash + bloom filter tests: host/device equality, fpr sanity
(reference internal/hash + internal/filter/bloom tests)."""

import numpy as np
import jax.numpy as jnp

from knoxdb_tpu.filter import bloom
from knoxdb_tpu.ops import hash as H
from knoxdb_tpu.types import FilterType


def test_hash_host_device_equal(rng):
    limbs = rng.integers(0, 1 << 32, size=(2, 1000)).astype(np.uint32)
    hnp = H.hash32_np(limbs)
    hdev = np.asarray(H.hash32(jnp.asarray(limbs)))
    np.testing.assert_array_equal(hnp, hdev)
    a, b = H.hash2_np(limbs)
    assert not np.array_equal(a, b)


def test_hash_distribution(rng):
    limbs = np.arange(100000, dtype=np.uint32)[None, :]
    h = H.hash32_np(limbs)
    # buckets reasonably uniform
    counts = np.bincount(h % np.uint32(64), minlength=64)
    assert counts.min() > 100000 / 64 * 0.8
    assert len(np.unique(h)) > 99000


def test_bloom_no_false_negatives(rng):
    keys = rng.integers(0, 1 << 60, 5000, dtype=np.uint64)
    limbs = np.stack([(keys >> np.uint64(32)).astype(np.uint32),
                      keys.astype(np.uint32)])
    nbits = bloom.bloom_bits(len(keys), FilterType.BLOOM_2B)
    w = bloom.build_np(limbs, nbits)
    assert bloom.contains_np(w, limbs).all()


def test_bloom_fpr(rng):
    keys = rng.integers(0, 1 << 40, 16384, dtype=np.uint64)
    limbs = np.stack([(keys >> np.uint64(32)).astype(np.uint32),
                      keys.astype(np.uint32)])
    nbits = bloom.bloom_bits(len(keys), FilterType.BLOOM_2B)
    w = bloom.build_np(limbs, nbits)
    probe = rng.integers(1 << 41, 1 << 42, 20000, dtype=np.uint64)
    pl = np.stack([(probe >> np.uint64(32)).astype(np.uint32),
                   probe.astype(np.uint32)])
    fpr = bloom.contains_np(w, pl).mean()
    # reference design point: 2 B/entry -> ~0.2% fpr (docs/bloom.md)
    assert fpr < 0.01, fpr


def test_bloom_device_probe(rng):
    P = 4
    nbits = 1 << 12
    filters = np.zeros((P, nbits // 32), np.uint32)
    keysets = []
    for p in range(P):
        keys = rng.integers(0, 1 << 50, 100, dtype=np.uint64)
        keysets.append(keys)
        limbs = np.stack([(keys >> np.uint64(32)).astype(np.uint32),
                          keys.astype(np.uint32)])
        filters[p] = bloom.build_np(limbs, nbits)
    # probe first key of each pack on device
    probes = np.array([k[0] for k in keysets], np.uint64)
    pl = np.stack([(probes >> np.uint64(32)).astype(np.uint32),
                   probes.astype(np.uint32)])
    got = np.asarray(bloom.probe_device(jnp.asarray(filters), jnp.asarray(pl)))
    for p in range(P):
        assert got[p, p]  # own key always maybe-present
