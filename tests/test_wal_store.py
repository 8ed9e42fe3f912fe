"""WAL, wire codec, KV store and segment serialization unit tests
(reference internal/wal tests + pkg/store/tests + pkg/schema codec tests)."""

import numpy as np
import pytest

from knoxdb_tpu.pack.segment import build_segment
from knoxdb_tpu.schema.schema import Builder
from knoxdb_tpu.schema.wire import decode_batch, encode_batch
from knoxdb_tpu.store import segio
from knoxdb_tpu.store.kv import FileStore, MemStore
from knoxdb_tpu.types import FieldType, FilterType
from knoxdb_tpu.wal.wal import Record, RecordType, RecoveryMode, Wal


def test_wal_roundtrip(tmp_path):
    w = Wal(tmp_path / "wal", max_segment=256)
    lsns = []
    for i in range(20):
        lsns.append(w.write(Record(RecordType.INSERT, entity=1, txid=i,
                                   data=bytes([i]) * 50)))
    w.sync()
    assert lsns == sorted(lsns)
    recs = list(w.records())
    assert len(recs) == 20
    assert [r.txid for r in recs] == list(range(20))
    assert all(r.data == bytes([r.txid]) * 50 for r in recs)
    # from_lsn seek
    recs2 = list(w.records(from_lsn=lsns[10]))
    assert [r.txid for r in recs2] == list(range(10, 20))
    # entity filter
    w.write(Record(RecordType.COMMIT, entity=2, txid=99))
    assert [r.txid for r in w.records(entity=2)] == [99]
    w.close()


def test_wal_gc(tmp_path):
    w = Wal(tmp_path / "wal", max_segment=128)
    last = 0
    for i in range(50):
        last = w.write(Record(RecordType.INSERT, entity=1, txid=i,
                              data=b"x" * 40))
    w.sync()
    nseg = len(w._segments)
    assert nseg > 3
    removed = w.gc(last)
    assert removed > 0
    recs = list(w.records())
    assert recs[-1].txid == 49
    w.close()


def test_wal_truncate_recovery(tmp_path):
    w = Wal(tmp_path / "wal", max_segment=1 << 20)
    for i in range(5):
        w.write(Record(RecordType.INSERT, entity=1, txid=i, data=b"ok" * 10))
    w.sync()
    w.close()
    # corrupt the tail
    seg = next((tmp_path / "wal").glob("*.seg"))
    with open(seg, "ab") as fh:
        fh.write(b"\x01garbage-partial-record")
    w2 = Wal(tmp_path / "wal")
    with pytest.raises(Exception):
        list(w2.records(mode=RecoveryMode.FAIL))
    recs = list(w2.records(mode=RecoveryMode.TRUNCATE))
    assert len(recs) == 5
    # after truncate the log is clean again
    assert len(list(w2.records(mode=RecoveryMode.FAIL))) == 5
    w2.close()


def test_wal_ignore_mode(tmp_path):
    """Reference ignore mode (wal.go:33-40, reader.go:271-279): a
    checksum-damaged but structurally-parseable record is DELIVERED
    anyway and reading continues; skip drops it and resyncs; torn
    structural damage still ends the segment."""
    w = Wal(tmp_path / "wal", max_segment=1 << 20)
    lsns = [w.write(Record(RecordType.INSERT, entity=1, txid=i,
                           data=b"payload-%d" % i))
            for i in range(5)]
    w.sync()
    w.close()
    seg = next((tmp_path / "wal").glob("*.seg"))
    # flip one body byte of record #2 (keeps header + length intact)
    hdr = 22                     # _HDR.size
    with open(seg, "r+b") as fh:
        fh.seek(lsns[2] + hdr)
        b = fh.read(1)
        fh.seek(lsns[2] + hdr)
        fh.write(bytes([b[0] ^ 0xFF]))
    w2 = Wal(tmp_path / "wal")
    with pytest.raises(Exception):
        list(w2.records(mode=RecoveryMode.FAIL))
    # skip: damaged record dropped, later records survive
    got_skip = [r.txid for r in w2.records(mode=RecoveryMode.SKIP)]
    assert got_skip == [0, 1, 3, 4]
    # ignore: damaged record delivered (corrupted body), all 5 present
    got_ign = list(w2.records(mode=RecoveryMode.IGNORE))
    assert [r.txid for r in got_ign] == [0, 1, 2, 3, 4]
    assert got_ign[2].data != b"payload-2"
    # structural tail damage under ignore: clean prefix only
    with open(seg, "ab") as fh:
        fh.write(b"\x01torn")
    assert [r.txid for r in w2.records(mode=RecoveryMode.IGNORE)] \
        == [0, 1, 2, 3, 4]
    w2.close()


def test_wire_roundtrip():
    sch = (Builder("w").pk("id")
           .add("v", FieldType.INT64)
           .add("f", FieldType.FLOAT64)
           .add("s", FieldType.STRING)
           .add("b", FieldType.BYTES)
           .add("big", FieldType.INT256)
           .finish())
    n = 7
    data = {
        "id": np.arange(n, dtype=np.uint64),
        "v": np.array([-5, 0, 3, 9, -9, 2**60, -2**60], np.int64),
        "f": np.array([0.0, -0.0, 1.5, np.inf, -np.inf, 3.14, -1e300]),
        "s": ["", "a", "héllo", "x" * 100, "q", "w", "e"],
        "b": [b"", b"\x00\xff", b"abc", b"d", b"e", b"f", b"g"],
        "big": [0, 1, -1, 10**70, -(10**70), 2**255 - 1 - 2**254, -2**255 // 2],
    }
    buf = encode_batch(sch, data, n)
    out, n2 = decode_batch(sch, buf)
    assert n2 == n
    np.testing.assert_array_equal(out["id"], data["id"])
    np.testing.assert_array_equal(out["v"], data["v"])
    np.testing.assert_array_equal(out["f"], data["f"])
    assert list(out["s"]) == data["s"]
    assert list(out["b"]) == data["b"]
    assert [int(v) for v in out["big"]] == data["big"]


def test_kv_stores(tmp_path):
    for store in (MemStore(), FileStore(tmp_path / "s")):
        b = store.bucket("t1")
        b.put(b"k1", b"v1")
        b.put(b"k2", b"v2")
        assert b.get(b"k1") == b"v1"
        assert list(b.keys()) == [b"k1", b"k2"]
        b.delete(b"k1")
        assert b.get(b"k1") is None
        store.drop_bucket("t1")


def test_segment_serialization(rng):
    sch = (Builder("s").pk("id")
           .add("v", FieldType.UINT64, filter=FilterType.BLOOM_2B)
           .add("w", FieldType.INT128)
           .finish())
    n = 1000
    data = {
        "id": np.arange(1, n + 1, dtype=np.uint64),
        "v": rng.integers(0, 50, n, dtype=np.uint64),
        "w": [int(x) * 10**25 for x in rng.integers(-50, 50, n)],
    }
    seg = build_segment(sch, data, pack_size=256)
    blob = segio.dump_segment(seg)
    seg2 = segio.load_segment(blob)
    assert seg2.nrows_total == n
    assert seg2.schema.names() == seg.schema.names()
    for name, col in seg.columns.items():
        col2 = seg2.columns[name]
        assert len(col2.packs) == len(col.packs)
        for p, p2 in zip(col.packs, col2.packs):
            assert p.scheme == p2.scheme and p.width == p2.width
            for a, b in ((p.planes, p2.planes), (p.values, p2.values),
                         (p.ends, p2.ends)):
                if a is None:
                    assert b is None
                else:
                    np.testing.assert_array_equal(a, b)
    fs, fs2 = seg.stats.fields["v"], seg2.stats.fields["v"]
    np.testing.assert_array_equal(fs.min_key, fs2.min_key)
    np.testing.assert_array_equal(fs.bloom_words, fs2.bloom_words)
    ws, ws2 = seg.stats.fields["w"], seg2.stats.fields["w"]
    assert [int(v) for v in ws.min_key] == [int(v) for v in ws2.min_key]


def test_segment_outer_compression(rng, monkeypatch):
    """KXSEG002 per-array zlib (block/compress.go analog): compressed
    blob loads bit-identically, shrinks vs raw on compressible data, and
    uncompressed (round-1 KXSEG001-style) blobs still load."""
    sch = (Builder("s").pk("id").add("v", FieldType.UINT64).finish())
    n = 4096
    data = {"id": np.arange(1, n + 1, dtype=np.uint64),
            "v": rng.integers(0, 8, n, dtype=np.uint64)}  # low entropy
    seg = build_segment(sch, data, pack_size=256)
    blob_c = segio.dump_segment(seg)
    monkeypatch.setenv("KNOX_SEG_COMPRESS", "off")
    blob_raw = segio.dump_segment(seg)
    assert blob_raw[:8] == b"KXSEG001" and blob_c[:8] == b"KXSEG002"
    assert len(blob_c) < len(blob_raw)
    for blob in (blob_c, blob_raw):
        seg2 = segio.load_segment(blob)
        for name, col in seg.columns.items():
            for p, p2 in zip(col.packs, seg2.columns[name].packs):
                for a, b in ((p.planes, p2.planes), (p.values, p2.values)):
                    if a is not None:
                        np.testing.assert_array_equal(a, b)


def test_segment_codec_variety(rng, monkeypatch):
    """r3: zstd/zlib/lzma outer codecs (reference block/compress.go:54-70
    snappy/lz4/zstd variety). Every codec round-trips bit-identically and
    blobs written under one codec load under any env setting (the array
    header records the codec; the loader ignores the knob). Unknown codec
    names raise instead of silently degrading."""
    import pytest

    from knoxdb_tpu.store.segio import _CODECS

    sch = (Builder("s").pk("id").add("v", FieldType.UINT64).finish())
    n = 4096
    data = {"id": np.arange(1, n + 1, dtype=np.uint64),
            "v": rng.integers(0, 8, n, dtype=np.uint64)}
    seg = build_segment(sch, data, pack_size=256)
    blobs = {}
    for codec in sorted(_CODECS):
        monkeypatch.setenv("KNOX_SEG_COMPRESS", codec)
        blobs[codec] = segio.dump_segment(seg)
    monkeypatch.setenv("KNOX_SEG_COMPRESS", "off")
    raw = segio.dump_segment(seg)
    for codec, blob in blobs.items():
        assert len(blob) < len(raw), codec
        seg2 = segio.load_segment(blob)   # env says 'off'; loader ignores
        for name, col in seg.columns.items():
            for p, p2 in zip(col.packs, seg2.columns[name].packs):
                for a, b in ((p.planes, p2.planes), (p.values, p2.values)):
                    if a is not None:
                        np.testing.assert_array_equal(a, b)
    monkeypatch.setenv("KNOX_SEG_COMPRESS", "lz9")
    with pytest.raises(ValueError, match="unknown KNOX_SEG_COMPRESS"):
        segio.dump_segment(seg)


def test_wal_delayed_sync(tmp_path):
    from knoxdb_tpu.wal.wal import Record, RecordType, Wal
    w = Wal(tmp_path / "wal", sync="delay", flush_interval=0.005)
    futs = [w.write_delayed(Record(RecordType.INSERT, entity=1, txid=i,
                                   data=b"d" * 20))
            for i in range(10)]
    for f in futs:
        assert f.wait(timeout=2.0), "delayed fsync did not land"
    assert w.synced_lsn >= futs[-1]._lsn
    assert len(list(w.records())) == 10
    w.close()


def test_lz4_block_codec(rng):
    """r4 native LZ4 block codec (reference compress.go:54-70 lz4):
    round-trips on adversarial inputs; the python fallback decoder
    agrees with the native one; malformed input raises."""
    from knoxdb_tpu.utils import native as NT

    cases = [
        b"",
        b"a",
        b"abcd" * 4,
        bytes(rng.integers(0, 256, 100_000, dtype=np.uint8)),  # random
        bytes(np.zeros(65_536, np.uint8)),                     # runs
        bytes(rng.integers(0, 4, 200_000, dtype=np.uint8)),    # low ent
        b"the quick brown fox " * 5000,                        # text
    ]
    for i, data in enumerate(cases):
        comp = NT.lz4_compress(data)
        out = NT.lz4_decompress(comp, len(data))
        assert out == data, f"case {i} native roundtrip"
        if NT.lib is not None:
            # python fallback decoder must agree with the native block
            saved, NT.lib = NT.lib, None
            try:
                out2 = NT.lz4_decompress(comp, len(data))
            finally:
                NT.lib = saved
            assert out2 == data, f"case {i} python decoder"
    # compressible data actually shrinks (native only)
    if NT.lib is not None:
        rep = b"0123456789abcdef" * 4096
        assert len(NT.lz4_compress(rep)) < len(rep) // 4
    import pytest
    with pytest.raises(ValueError):
        NT.lz4_decompress(b"\xf0\xff\xff", 10)   # truncated ext literals


def test_batch_view_zero_copy(rng):
    """r4 BatchView (reference view.go analog): zero-copy column views
    into the wire buffer, point field access, row dicts — all equal to
    the copying decode_batch."""
    from knoxdb_tpu.schema.wire import BatchView

    sch = (Builder("w").pk("id")
           .add("v", FieldType.INT64)
           .add("f", FieldType.FLOAT64)
           .add("s", FieldType.STRING)
           .add("b", FieldType.BYTES)
           .add("big", FieldType.INT256)
           .finish())
    n = 9
    data = {
        "id": np.arange(n, dtype=np.uint64),
        "v": rng.integers(-2**60, 2**60, n),
        "f": rng.normal(size=n) * 1e6,
        "s": ["", "a", "héllo", "x" * 99, "q", "w", "e", "r", "t"],
        "b": [bytes([i]) * i for i in range(n)],
        "big": [(-1) ** i * (10 ** 70 + i) for i in range(n)],
    }
    buf = encode_batch(sch, data, n)
    want, n2 = decode_batch(sch, buf)
    view = BatchView(sch, buf)
    assert view.nrows == n == n2

    # zero-copy: native columns view INTO the buffer, no ownership
    vcol = view.column("v")
    assert not vcol.flags["OWNDATA"] and not vcol.flags["WRITEABLE"]
    np.testing.assert_array_equal(vcol, want["v"])
    np.testing.assert_array_equal(view.column("f"), want["f"])
    assert [bytes(m) for m in view.column("b")] == list(want["b"])
    assert [int(x) for x in view.column("big")] == \
        [int(x) for x in want["big"]]
    # point access without column materialization + full row dicts
    for i in (0, 3, n - 1):
        assert view.field(i, "v") == int(want["v"][i])
        assert view.field(i, "s") == want["s"][i]
        assert view.field(i, "big") == int(want["big"][i])
        r = view.row(i)
        assert r["f"] == want["f"][i] and bytes(r["b"]) == want["b"][i]
    import pytest
    with pytest.raises(IndexError):
        view.field(n, "v")
