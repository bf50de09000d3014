"""Convert a driver_mirror.py JSONL capture into MIRROR_r{N}.json."""

from __future__ import annotations

import json
import sys


def main() -> int:
    src, dst, rnd = sys.argv[1], sys.argv[2], int(sys.argv[3])
    entries = {}
    summary = None
    with open(src) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            rec = json.loads(line)
            if rec.get("summary"):
                summary = rec
            elif rec.get("entry") and rec["entry"] != "entry()":
                entries[rec["entry"]] = rec
    out = {
        "_meta": {
            "what": (
                "local mirror of the driver CORRECTNESS gate "
                "(scripts/driver_mirror.py): ONE fresh ray.init(num_cpus=32) "
                "session, every queries() entry at sf0.01 vs its "
                "oracle_sql() via DuckDB"
            ),
            "round": rnd,
            "n_entries": summary["n_entries"],
            "n_bad": summary["n_bad"],
            "total_sec": summary["total_sec"],
        }
    }
    out.update(entries)
    with open(dst, "w") as f:
        json.dump(out, f, indent=0)
    print(f"{dst}: {summary['n_entries']} entries, {summary['n_bad']} bad")
    return 0


if __name__ == "__main__":
    sys.exit(main())
