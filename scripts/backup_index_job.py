#!/usr/bin/env python
"""Index backup / restore CLI — analog of the reference's
``scripts/backup_data.cpp`` (segment snapshot utility).

    python scripts/backup_index_job.py backup  --index <root> --to <dir>
    python scripts/backup_index_job.py restore --from <dir>  --index <root>

Backups are CONSISTENT: component paths resolve through CURRENT.json once,
so a snapshot taken during a compaction flip is never a mixed generation
(see nextsearch_api_spark/plans/backup.py). No Spark session needed —
this is driver-side file copying (an object-store prefix sync at scale).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# plain `python scripts/backup_index_job.py` puts scripts/ (not the repo
# root) on sys.path; spark-submit --py-files users already have the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    b = sub.add_parser("backup")
    b.add_argument("--index", required=True)
    b.add_argument("--to", required=True)
    b.add_argument("--components", nargs="*", default=None)
    r = sub.add_parser("restore")
    r.add_argument("--from", dest="src", required=True)
    r.add_argument("--index", required=True)
    args = ap.parse_args()

    from nextsearch_api_spark.plans.backup import backup_index, restore_index

    if args.cmd == "backup":
        man = backup_index(args.index, args.to, components=args.components)
    else:
        man = restore_index(args.src, args.index)
    print(json.dumps(man))


if __name__ == "__main__":
    main()
