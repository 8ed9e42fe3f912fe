"""kx — admin CLI: stats, merge, gc (reference cmd/kx/main.go).

    python -m knoxdb_tpu.tools.kx <db-path> stats|merge|gc [table]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser("kx")
    ap.add_argument("path")
    ap.add_argument("cmd", choices=["stats", "merge", "gc"])
    ap.add_argument("table", nargs="?")
    args = ap.parse_args(argv)

    import knoxdb_tpu.knox as knox
    db = knox.open_database("kx", driver="file", path=args.path,
                            background_merge=False)
    try:
        tables = ([db.engine.table(args.table)] if args.table
                  else list(db.engine.tables.values()))
        if args.cmd == "stats":
            for t in tables:
                m = t.metrics
                print(f"{t.schema.name}: rows={t.state.n_rows} "
                      f"segments={len(t.segments)} "
                      f"journal={t.journal.nrows} merges={m.merges} "
                      f"stored={m.bytes_stored}")
        elif args.cmd == "merge":
            for t in tables:
                t.merge()
                print(f"{t.schema.name}: merged -> epoch {t.state.epoch}")
        elif args.cmd == "gc":
            db.engine.try_gc()
            print(f"wal tail_lsn={db.engine.wal.tail_lsn}")
    finally:
        db.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
