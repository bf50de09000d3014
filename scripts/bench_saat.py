"""SAAT anytime trade-off micro-bench: stored-impact serving wall time
and overlap@10 vs the exact (budget 1.0) ranking at several postings
budgets, over the sf0.1 corpus.  Output: one JSON line per budget.

Usage: python scripts/bench_saat.py [sf_dir] (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    import numpy as np
    import pyarrow as pa

    import ray.data
    from defactonlp_ray.pipelines.queries import (
        _build_docs_index, _tmp_index_dir,
    )
    from defactonlp_ray.stages.impacts import (
        build_impact_index, saat_stored_search,
    )

    idx = _build_docs_index(sf)
    imp = _tmp_index_dir(sf, "idximpact")
    t0 = time.perf_counter()
    build_impact_index(idx, imp, concurrency=8)
    t_build = time.perf_counter() - t0

    # 500 deterministic queries over the corpus word bank
    rng = np.random.default_rng(7)
    bank = [
        "data", "query", "fast", "merge", "sort", "window", "stream",
        "batch", "hash", "join", "table", "slow", "scan", "spark", "row",
        "group", "filter", "value", "customer", "line", "agg", "order",
        "the", "index", "key",
    ]
    qs = [
        (i, sorted(rng.choice(bank, size=int(rng.integers(2, 4)),
                              replace=False).tolist()))
        for i in range(500)
    ]
    qds = pa.table({
        "query_id": pa.array([q for q, _ in qs], pa.int64()),
        "terms": pa.array([t for _, t in qs], pa.list_(pa.string())),
    })

    def run(budget):
        ds = ray.data.from_arrow(qds)
        t0 = time.perf_counter()
        rows = saat_stored_search(
            imp, ds, k=10, budget_frac=budget, concurrency=8
        ).take_all()
        sec = time.perf_counter() - t0
        top = {}
        for r in rows:
            top.setdefault(r["query_id"], set()).add(r["doc_id"])
        return sec, top

    print(json.dumps({"impact_build_sec": round(t_build, 3)}))
    _warm, exact = run(1.0)  # warm actors + exact sets
    sec_full, exact = run(1.0)
    print(json.dumps({"budget": 1.0, "sec": round(sec_full, 3),
                      "overlap": 1.0}))
    for b in (0.5, 0.25, 0.1):
        sec, top = run(b)
        ovl = [
            len(top.get(q, set()) & exact[q]) / max(1, len(exact[q]))
            for q in exact
        ]
        print(json.dumps({
            "budget": b, "sec": round(sec, 3),
            "overlap": round(float(np.mean(ovl)), 4),
        }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
