"""Mirror of the driver's correctness harness, at DRIVER parallelism.

The r03 driver ran only 50 of the 91 registry entries; the plausible
cause is a per-round wall-clock budget.  This script measures exactly
what the driver pays: ONE fresh process, ``ray.init(num_cpus=32)``
(the driver's level — pytest runs at 4, which HID the r03
``neardup_clusters`` pandas-block crash), ``entry()`` smoke, then every
``queries()`` entry at sf0.01 compared against its ``oracle_sql()`` via
DuckDB, with per-entry wall time.  Output: one JSON line per entry plus
a summary with total wall and the slowest entries — the worklist for
cutting per-entry cost.

Usage: python scripts/driver_mirror.py [--names a,b,c] [--sf DIR]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"


def _to_pandas(obj):
    import pyarrow as pa

    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _normalize(df):
    import numpy as np
    import pandas as pd

    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def _duck(sql: str, sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def main() -> int:
    sf_dir = SF_DIR
    only = None
    argv = sys.argv[1:]
    while argv:
        a = argv.pop(0)
        if a == "--sf":
            sf_dir = argv.pop(0)
        elif a == "--names":
            only = set(argv.pop(0).split(","))

    import numpy as np
    import pandas as pd

    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    t_all = time.perf_counter()
    import __ray_entry__ as E

    t0 = time.perf_counter()
    res = E.entry()
    n = res.count() if hasattr(res, "count") and not hasattr(res, "columns") \
        else len(res)
    print(json.dumps({"entry": "entry()", "rows": int(n),
                      "sec": round(time.perf_counter() - t0, 2)}), flush=True)

    queries = E.queries()
    oracles = E.oracle_sql()
    rows = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        rec = {"entry": name}
        t0 = time.perf_counter()
        try:
            got = _normalize(_to_pandas(fn(sf_dir)))
            rec["rows"] = len(got)
            sql = oracles.get(name)
            if sql is not None:
                want = _normalize(_duck(sql, sf_dir))
                rec["rows_match"] = len(got) == len(want)
                rec["schema_match"] = list(got.columns) == list(want.columns)
                ok = rec["rows_match"] and rec["schema_match"]
                if ok:
                    for c in got.columns:
                        if pd.api.types.is_float_dtype(got[c]):
                            ok &= bool(np.allclose(got[c], want[c], rtol=0,
                                                   atol=0, equal_nan=True))
                        else:
                            ok &= bool(got[c].equals(want[c]))
                rec["hash_match"] = bool(ok)
            else:
                rec["oracle"] = "rows_only"
            rec["err"] = None
        except Exception as e:  # noqa: BLE001 — harness: record, continue
            rec["err"] = f"{type(e).__name__}: {e}"
            traceback.print_exc(file=sys.stderr)
        rec["sec"] = round(time.perf_counter() - t0, 2)
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    total = time.perf_counter() - t_all
    bad = [r["entry"] for r in rows
           if r.get("err") or r.get("hash_match") is False]
    slow = sorted(rows, key=lambda r: -r["sec"])[:10]
    print(json.dumps({
        "summary": True,
        "n_entries": len(rows),
        "n_bad": len(bad),
        "bad": bad,
        "total_sec": round(total, 1),
        "slowest": [{"entry": r["entry"], "sec": r["sec"]} for r in slow],
    }), flush=True)
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
