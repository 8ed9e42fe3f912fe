"""CLI tools end-to-end: kx (stats/merge/gc/truncate/describe/import),
packview, walview — run through their main() with captured stdout
(reference cmd/kx, cmd/packview, cmd/walview surfaces)."""

import json
from dataclasses import dataclass

import numpy as np
import pytest

import knoxdb_tpu.knox as knox


@dataclass
class Acct:
    id: int = 0
    bal: int = 0
    kind: int = 0


@pytest.fixture
def dbdir(tmp_path, rng):
    db = knox.create_database("cli", driver="file", path=str(tmp_path),
                              pack_size=256, background_merge=False)
    t = db.create_table(Acct)
    n = 600
    t.insert({"id": np.zeros(n, np.uint64),
              "bal": rng.integers(0, 10_000, n),
              "kind": rng.integers(0, 5, n)})
    t.merge()
    t.insert([Acct(bal=1, kind=9)])          # journal row
    db.close()
    return str(tmp_path)


def test_kx_stats_merge_gc(dbdir, capsys):
    from knoxdb_tpu.tools.kx import main
    assert main([dbdir, "stats"]) == 0
    out = capsys.readouterr().out
    assert "acct" in out and "rows=601" in out and "journal=1" in out

    assert main([dbdir, "merge", "acct"]) == 0
    out = capsys.readouterr().out
    assert "merged" in out
    assert main([dbdir, "stats", "acct"]) == 0
    assert "journal=0" in capsys.readouterr().out

    assert main([dbdir, "gc"]) == 0
    assert "tail_lsn=" in capsys.readouterr().out


def test_kx_describe(dbdir, capsys):
    from knoxdb_tpu.tools.kx import main
    assert main([dbdir, "describe", "acct"]) == 0
    d = json.loads(capsys.readouterr().out)
    assert d["name"] == "acct" and d["rows"] == 601
    assert {f["name"] for f in d["fields"]} == {"id", "bal", "kind"}


def test_kx_import_then_truncate(dbdir, tmp_path, capsys):
    from knoxdb_tpu.tools.kx import main
    csv = tmp_path / "more.csv"
    csv.write_text("id,bal,kind\n" +
                   "\n".join(f"0,{i},{i % 3}" for i in range(50)))
    assert main([dbdir, "import", "acct", "--csv", str(csv)]) == 0
    assert "imported 50" in capsys.readouterr().out

    db = knox.open_database("cli", driver="file", path=dbdir,
                            background_merge=False)
    assert db.table("acct").count() == 651
    db.close()

    assert main([dbdir, "truncate", "acct"]) == 0
    assert "truncated" in capsys.readouterr().out
    db = knox.open_database("cli", driver="file", path=dbdir,
                            background_merge=False)
    assert db.table("acct").count() == 0
    db.close()


def test_kx_errors(dbdir):
    from knoxdb_tpu.tools.kx import main
    with pytest.raises(SystemExit):
        main([dbdir, "truncate"])            # missing table name
    with pytest.raises(SystemExit):
        main([dbdir, "import", "acct"])      # missing --csv
    with pytest.raises(SystemExit):
        main([dbdir, "compact"])             # unknown command


def test_packview(dbdir, capsys):
    from knoxdb_tpu.tools.packview import main
    assert main([dbdir, "--packs", "--stats"]) == 0
    out = capsys.readouterr().out
    assert "acct" in out

    assert main([dbdir, "acct", "--json"]) == 0
    data = json.loads(capsys.readouterr().out)
    rec = data[0] if isinstance(data, list) else data
    assert rec["table"] == "acct"


def test_walview(dbdir, capsys):
    from knoxdb_tpu.tools.walview import main
    assert main([dbdir]) == 0
    out = capsys.readouterr().out
    assert "INSERT" in out and "COMMIT" in out
    n_all = len(out.strip().splitlines())

    assert main([dbdir, "--limit", "3"]) == 0
    out = capsys.readouterr().out
    assert len(out.strip().splitlines()) == 3
    assert n_all > 3


def test_packview_deep(dbdir, capsys):
    """r3 inspector depth: schema knobs, compression ratio, width
    histograms, stats tree, pack content dump (reference packview.go
    PrintSchema/PrintMetadata/PrintDetail/PrintContent surfaces)."""
    from knoxdb_tpu.tools.packview import main
    assert main([dbdir, "acct", "--schema", "--stats", "--packs",
                 "--json"]) == 0
    data = json.loads(capsys.readouterr().out)
    rec = data[0]
    assert rec["schema"][0]["name"] == "id"
    si = rec["segments"][0]
    ci = si["columns"]["bal"]
    assert ci["ratio"] > 0 and ci["width_hist"]
    assert "min" in ci and "max" in ci and "tree" in ci
    assert len(ci["zone_maps"]) == si["packs"]
    assert len(ci["pack_detail"]) == si["packs"]

    # content dump of pack 0
    seg_key = si["key"]
    assert main([dbdir, "acct", "--content", f"{seg_key}:0",
                 "--limit", "5"]) == 0
    out = capsys.readouterr().out
    assert "# pack 0" in out and "bal" in out
    assert len(out.strip().splitlines()) >= 7   # header + cols + 5 rows


def test_walview_filters(dbdir, capsys):
    from knoxdb_tpu.tools.walview import main
    assert main([dbdir, "--type", "insert"]) == 0
    out = capsys.readouterr().out
    lines = [l for l in out.strip().splitlines() if l.startswith("lsn=")]
    assert lines and all("INSERT" in l for l in lines)

    assert main([dbdir, "--summary"]) == 0
    out = capsys.readouterr().out
    assert "INSERT" in out and "COMMIT" in out and "# entities:" in out
