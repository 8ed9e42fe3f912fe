"""FSST symbol-table codec roundtrip + compression sanity."""

import numpy as np

from knoxdb_tpu.encode import fsst


def test_roundtrip_corpus(rng):
    words = [b"http://example.com/page/", b"user_", b"transaction",
             b"abcdefgh", b"\xff\xfe escape bytes \xff"]
    samples = [words[int(i)] + str(int(x)).encode()
               for i, x in zip(rng.integers(0, len(words), 300),
                               rng.integers(0, 10**6, 300))]
    st = fsst.train(samples)
    blob = st.dump()
    st2, _ = fsst.SymbolTable.load(blob)
    total_in = total_out = 0
    for s in samples:
        c = fsst.compress(st, s)
        assert fsst.decompress(st2, c) == s
        total_in += len(s)
        total_out += len(c)
    assert total_out < total_in * 0.7, (total_out, total_in)


def test_edges():
    st = fsst.train([b"aaaa aaaa aaaa"])
    for s in (b"", b"\xff", b"\xff\xff\x00", b"zzz", bytes(range(256))):
        assert fsst.decompress(st, fsst.compress(st, s)) == s
