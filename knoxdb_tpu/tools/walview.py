"""walview — dump WAL records.

Analog of the reference WAL dumper (/root/reference/cmd/walview/main.go).

    python -m knoxdb_tpu.tools.walview <db-path> [--from-lsn N] [--entity N]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser("walview")
    ap.add_argument("path", help="database directory")
    ap.add_argument("--from-lsn", type=int, default=0)
    ap.add_argument("--entity", type=int, default=None)
    ap.add_argument("--mode", choices=["fail", "skip", "truncate"],
                    default="skip")
    ap.add_argument("--limit", type=int, default=0)
    args = ap.parse_args(argv)

    from ..wal.wal import RecoveryMode, Wal

    w = Wal(f"{args.path}/wal")
    mode = RecoveryMode[args.mode.upper()]
    count = 0
    for rec in w.records(from_lsn=args.from_lsn, entity=args.entity,
                         mode=mode):
        print(f"lsn={rec.lsn:>10d} {rec.type.name:<10s} entity={rec.entity} "
              f"txid={rec.txid} len={len(rec.data)}")
        count += 1
        if args.limit and count >= args.limit:
            break
    print(f"# {count} records, tail_lsn={w.tail_lsn}", file=sys.stderr)
    w.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
