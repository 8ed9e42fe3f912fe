"""packview — inspect a database's tables, segments, packs and stats.

Analog of the reference inspector (/root/reference/cmd/packview/
packview.go): offline profiler of the storage layout.

    python -m knoxdb_tpu.tools.packview <db-path> [table] [--packs] [--stats]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def human(n: int) -> str:
    for unit in ("B", "KiB", "MiB", "GiB"):
        if n < 1024:
            return f"{n:.1f}{unit}" if isinstance(n, float) else f"{n}{unit}"
        n = n / 1024
    return f"{n:.1f}TiB"


def main(argv=None):
    ap = argparse.ArgumentParser("packview")
    ap.add_argument("path", help="database directory (file driver)")
    ap.add_argument("table", nargs="?", help="table name (default: all)")
    ap.add_argument("--packs", action="store_true", help="per-pack detail")
    ap.add_argument("--stats", action="store_true", help="zone-map stats")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)

    from ..store.kv import FileStore
    from ..store import segio

    store = FileStore(f"{args.path}/data")
    cat = store.bucket("catalog").get(b"catalog")
    if not cat:
        print("no catalog found", file=sys.stderr)
        return 1
    cat = json.loads(cat)

    out = []
    for td in cat["tables"]:
        name = td["schema"]["name"]
        if args.table and name != args.table:
            continue
        info = {"table": name, "id": td["id"], "state": td["state"],
                "fields": [f"{f['name']}:{f['type']}"
                           for f in td["schema"]["fields"]],
                "segments": []}
        try:
            b = store.bucket(f"table_{td['id']}_segments", create=False)
        except KeyError:
            b = None
        if b:
            for k, blob in b.items():
                seg = segio.load_segment(blob)
                si = {"key": k.decode(), "rows": seg.nrows_total,
                      "packs": seg.npacks, "pack_size": seg.pack_size,
                      "bytes": len(blob), "epoch": seg.epoch, "columns": {}}
                for cname, col in seg.columns.items():
                    schemes = {}
                    for p in col.packs:
                        tag = f"{p.scheme.name}{p.width or ''}"
                        schemes[tag] = schemes.get(tag, 0) + 1
                    si["columns"][cname] = {
                        "schemes": schemes, "bytes": col.nbytes}
                    if args.stats and cname in seg.stats.fields:
                        fs = seg.stats.fields[cname]
                        si["columns"][cname]["min"] = str(fs.min_key.min())
                        si["columns"][cname]["max"] = str(fs.max_key.max())
                        si["columns"][cname]["bloom"] = \
                            fs.bloom_words is not None
                    if args.packs:
                        si["columns"][cname]["pack_detail"] = [
                            {"scheme": p.scheme.name, "w": p.width,
                             "n": p.n, "bytes": p.nbytes}
                            for p in col.packs]
                info["segments"].append(si)
        out.append(info)

    if args.json:
        print(json.dumps(out, indent=2))
        return 0
    for info in out:
        print(f"table {info['table']} (id={info['id']}) "
              f"rows={info['state']['n_rows']} epoch={info['state']['epoch']}")
        print(f"  fields: {', '.join(info['fields'])}")
        for si in info["segments"]:
            print(f"  segment {si['key']}: {si['rows']} rows, "
                  f"{si['packs']} packs x {si['pack_size']}, "
                  f"{human(si['bytes'])}")
            for cname, ci in si["columns"].items():
                extra = ""
                if "min" in ci:
                    extra = f" min={ci['min']} max={ci['max']}" + \
                        (" bloom" if ci.get("bloom") else "")
                print(f"    {cname:12s} {human(ci['bytes']):>10s}  "
                      f"{ci['schemes']}{extra}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
