"""Benchmark driver (BASELINE.md protocol).

Plain run: one JSON line
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {phase: sec, ...}, "sf": ..., "num_cpus": N, ...}

Headline pipeline: build the segment inverted index over a deterministic
50k-page web corpus (extraction -> dedup -> doc ids -> SPIMI segments ->
stats), then BM25 top-10 for 2000 queries through the searcher actor pool;
plus per-query p95 latency on a warm single-process reader (online-serving
shape) and a few registry ops at $GRAFT_SF_DIR.

``--scaling``: same job, same input, fresh processes at two parallelism
levels (sandbox proxy for the N vs 4N-node criterion — BASELINE.json
north_rule); prints both times + efficiency = (t_lo / t_hi) / (hi/lo).
Default pair 4,16 (override DFR_SCALING_CPUS="8,32"): at 32 concurrent
workers this single machine saturates memory bandwidth (segment tasks were
measured 1.7x slower per-task at 32 than at 8 workers), a contention real
multi-node clusters do not share — 4 vs 16 measures the ENGINE's scaling,
8 vs 32 additionally measures the box.  Both results are recorded in
BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

BENCH_PAGES = int(os.environ.get("DFR_BENCH_PAGES", "50000"))
BENCH_QUERIES = 2000


def _pages_path(n: int) -> str:
    """Deterministic bench corpus, generated once and cached (untimed —
    fixture synthesis is not part of the measured pipeline).

    Rows are pure functions of (seed, i) (fixtures.py), so generation
    parallelizes over row ranges with identical output: one parquet part
    per 12.5k-row chunk, written to a temp dir and atomically renamed.
    """
    path = f"/tmp/dfr_bench_pages_{n}"
    if os.path.exists(path):
        return path
    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        ray.init(
            address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False, ignore_reinit_error=True,
            logging_level="ERROR",
        )

    @ray.remote
    def gen_chunk(start: int, end: int, out: str) -> str:
        import pyarrow.parquet as pq

        from defactonlp_ray import fixtures

        pq.write_table(fixtures.make_pages_range(start, end), out)
        return out

    tmp = path + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    chunk = 12500
    refs = [
        gen_chunk.remote(s, min(s + chunk, n), os.path.join(tmp, f"part-{s:09d}.parquet"))
        for s in range(0, n, chunk)
    ]
    ray.get(refs)
    os.replace(tmp, path)
    if owns_ray:
        ray.shutdown()
    return path


def _embeddings_path(n: int, dim: int = 64) -> str:
    """Deterministic bench embedding corpus (vec_id, embedding
    float32[dim]), generated once and cached.  Values are a pure
    function of (vec_id, j) via splitmix64 -> uniform [-0.5, 0.5), so
    chunked parallel generation concatenates identically across runs
    and CPU counts."""
    path = f"/tmp/dfr_bench_embs_{n}_{dim}"
    if os.path.exists(path):
        return path
    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        ray.init(
            address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False, ignore_reinit_error=True,
            logging_level="ERROR",
        )

    @ray.remote
    def gen_chunk(start: int, end: int, out: str) -> str:
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from defactonlp_ray.functions.hashing import splitmix64

        ids = np.arange(start, end, dtype=np.uint64)
        grid = ids[:, None] * np.uint64(dim) + np.arange(dim, dtype=np.uint64)
        vals = (
            splitmix64(grid.reshape(-1)).astype(np.float64) / 2.0**64 - 0.5
        ).astype(np.float32)
        flat = pa.array(vals, pa.float32())
        offs = pa.array(
            np.arange(0, (end - start + 1) * dim, dim, dtype=np.int32)
        )
        tbl = pa.table(
            {
                "vec_id": pa.array(ids.astype(np.int64), pa.int64()),
                "embedding": pa.ListArray.from_arrays(offs, flat),
            }
        )
        pq.write_table(tbl, out)
        return out

    tmp = path + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    chunk = 100_000
    refs = [
        gen_chunk.remote(s, min(s + chunk, n),
                         os.path.join(tmp, f"part-{s:010d}.parquet"))
        for s in range(0, n, chunk)
    ]
    import ray as _ray

    _ray.get(refs)
    os.rename(tmp, path)
    if owns_ray:
        ray.shutdown()
    return path


def machine_calibration() -> float:
    """Fixed single-core probe (seeded codec encode/decode rounds, the
    same kernels the build uses) — a host-speed denominator for
    cross-round comparison on this shared box (r03 observed 1.0-2.5x
    day-to-day drift in every absolute number; ratios of calib_sec
    between two runs estimate the host-speed ratio).  First measured on
    a NOISY late-r03 day at 2.0-2.6 s across repeats; no quiet-window
    reference exists yet — record each round's value, compare by ratio."""
    import numpy as np

    from defactonlp_ray.stages.codec import (
        pfor_decode, pfor_encode, varint_decode, varint_encode,
    )

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 1 << 20, size=1 << 15).astype(np.uint64)
    for _ in range(2):  # warm
        varint_decode(varint_encode(vals), vals.size)
    t0 = time.perf_counter()
    acc = 0
    for _ in range(20):
        b = varint_encode(vals)
        acc += int(varint_decode(b, vals.size)[-1])
        p = pfor_encode(vals)
        acc += int(pfor_decode(p)[-1])
    assert acc
    return time.perf_counter() - t0


def prev_round_calib() -> tuple[float | None, str | None]:
    """calib_sec of the LATEST recorded round (BENCH_r*.json next to this
    file), so the output carries calib_ratio_vs_prev — this run's host
    speed over last round's — letting a reader separate host drift from
    engine deltas without cross-referencing BASELINE prose."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    best: tuple[int, str] | None = None
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m:
            n = int(m.group(1))
            if best is None or n > best[0]:
                best = (n, p)
    if best is None:
        return None, None
    try:
        with open(best[1]) as f:
            doc = json.load(f)
        # the driver wraps the printed line under "parsed" (r03 layout);
        # a bare bench line has calib_sec at top level
        parsed = doc.get("parsed", doc)
        c = parsed.get("calib_sec")
        return (float(c) if c else None), f"r{best[0]:02d}"
    except (OSError, ValueError):
        return None, None


def _calib_ratio_fields(calib_sec: float) -> dict:
    prev, tag = prev_round_calib()
    if not prev:
        return {}
    return {
        "calib_ratio_vs_prev": round(calib_sec / prev, 3),
        "calib_prev_round": tag,
    }


def run_bench() -> dict:
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    calib_sec = machine_calibration()

    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import numpy as np
    import pyarrow as pa
    import ray.data
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from defactonlp_ray import fixtures
    from defactonlp_ray.pipelines import flagship
    from defactonlp_ray.pipelines import queries as Q
    from defactonlp_ray.stages import search as S

    pages_path = _pages_path(BENCH_PAGES)
    # one untimed warm-up read (page cache) per the protocol — must read
    # the actual BYTES (a parquet count() reads only footers)
    for root, _dirs, files in os.walk(pages_path):
        for f in files:
            with open(os.path.join(root, f), "rb") as fh:
                while fh.read(1 << 24):
                    pass
    if os.path.isfile(pages_path):
        with open(pages_path, "rb") as fh:
            while fh.read(1 << 24):
                pass

    timings: dict[str, float] = {}
    idx = f"/tmp/dfr_bench_idx_{BENCH_PAGES}_{num_cpus}"
    shutil.rmtree(idx, ignore_errors=True)

    t0 = time.perf_counter()
    from defactonlp_ray.sources.readers import read_pages

    # lang filter pushed into the parquet read (row-group predicate);
    # block count sized to the CPU level (default splits are far below the
    # 128MiB block target and the per-block task orchestration becomes a
    # CPU-count-independent fixed cost)
    import pyarrow.compute as _pc
    pages = ray.data.read_parquet(
        pages_path, filter=(_pc.field("lang") == "en"),
        override_num_blocks=4 * num_cpus,
    )
    index_dir, docs = flagship.build_pages_index(
        pages, idx, seg_docs=4096, lang=None, resume=False
    )
    build_sec = time.perf_counter() - t0
    timings["index_build"] = build_sec
    from defactonlp_ray.sources import manifest as mf

    n_docs = sum(r["n_docs"] for r in mf.read_manifest(index_dir).values())

    if os.environ.get("DFR_BUILD_ONLY") == "1":
        # scaling mode measures the north_rule's criterion: INDEX-BUILD
        # throughput at two cluster sizes; query phases are reported by
        # the default-size plain runs
        ray.shutdown()
        return {
            "metric": "index-build wall time (build-only scaling run)",
            "value": round(build_sec, 3),
            "unit": "sec",
            "queries": {"index_build": round(build_sec, 4)},
            "sf": sf_dir,
            "num_cpus": num_cpus,
            "bench_pages": BENCH_PAGES,
            "n_docs_indexed": n_docs,
            "build_docs_per_sec": round(n_docs / build_sec, 1),
            "query_throughput_qps": None,
            "calib_sec": round(calib_sec, 3),
            **_calib_ratio_fields(calib_sec),
        }

    queries = fixtures.make_query_terms(BENCH_QUERIES)
    qtbl = pa.table(
        {
            "query_id": pa.array([q for q, _ in queries], pa.int64()),
            "terms": pa.array([t for _, t in queries], pa.list_(pa.string())),
        }
    )
    # decode timed SEPARATELY from serving (bench protocol r03): the
    # one-time shared-index decode used to smear ~1.4 s into the 2000-
    # query number and hid round-over-round serve improvements
    t0 = time.perf_counter()
    shared_ref = ray.put(S.build_shared_index(index_dir))
    decode_sec = time.perf_counter() - t0
    timings["bm25_batch_decode"] = decode_sec

    t0 = time.perf_counter()
    qds = ray.data.from_arrow(qtbl).repartition(num_cpus)
    res = S.search(
        index_dir, qds, k=10, concurrency=min(8, num_cpus), batch_size=64,
        shared_ref=shared_ref,
    )
    n_results = res.count()
    serve_sec = time.perf_counter() - t0
    timings["bm25_batch_serve"] = serve_sec
    # decode+serve: comparable to the r01/r02 bm25_batch field
    query_sec = decode_sec + serve_sec
    timings["bm25_batch"] = query_sec

    # block-max WAND (Q2; pruning-only, result-identical to the exhaustive
    # scorer).  r03 vectorized it (interval sweep + MaxScore split): the
    # full 2000-query mix now runs beside the 200-query field kept for
    # round-over-round comparability.
    wand_q = ray.data.from_arrow(qtbl.slice(0, 200)).repartition(min(8, num_cpus))
    t0 = time.perf_counter()
    S.search(
        index_dir, wand_q, k=10, mode="wand", concurrency=min(8, num_cpus),
        batch_size=32, shared_ref=shared_ref,
    ).count()
    timings["bm25_wand_200q"] = time.perf_counter() - t0
    wand_all = ray.data.from_arrow(qtbl).repartition(num_cpus)
    t0 = time.perf_counter()
    S.search(
        index_dir, wand_all, k=10, mode="wand", concurrency=min(8, num_cpus),
        batch_size=64, shared_ref=shared_ref,
    ).count()
    timings["bm25_wand_2000q"] = time.perf_counter() - t0

    # online-serving p95: warm single-process reader, one query at a time
    reader = S.IndexReader(index_dir, preload=True)
    lat = []
    for qid, terms in queries[:20]:  # warm caches (decode), untimed
        uniq = sorted(set(terms))
        reader.dfs(uniq)
        idfs = {t: reader.idf(t) for t in uniq}
        S.score_all_taat(reader, reader.seg_ids, uniq, idfs, 10)
    for qid, terms in queries[:500]:
        uniq = sorted(set(terms))
        t0 = time.perf_counter()
        reader.dfs(uniq)
        idfs = {t: reader.idf(t) for t in uniq}
        S.score_all_taat(reader, reader.seg_ids, uniq, idfs, 10)
        lat.append(time.perf_counter() - t0)
    p95_ms = float(np.percentile(np.array(lat) * 1000.0, 95))
    timings["bm25_p95_ms"] = p95_ms

    # stored impact layout + SAAT serving (round-4 continuation): build
    # the impact index from the finished segments (two dictionary
    # passes), then the same 500-query batch through the budgeted
    # serving actors at budget 1.0 (exact quantized ranking) and 0.25
    from defactonlp_ray.stages.impacts import (
        build_impact_index, saat_stored_search,
    )

    imp_dir = index_dir + "_impacts"
    t0 = time.perf_counter()
    build_impact_index(index_dir, imp_dir, concurrency=num_cpus // 2 or 1)
    timings["saat_build"] = time.perf_counter() - t0
    saat_qs = ray.data.from_arrow(pa.table({
        "query_id": pa.array(
            [q for q, _ in queries[:500]], pa.int64()
        ),
        "terms": pa.array(
            [t for _, t in queries[:500]], pa.list_(pa.string())
        ),
    }))
    t0 = time.perf_counter()
    saat_stored_search(
        imp_dir, saat_qs, k=10, concurrency=num_cpus // 2 or 1
    ).take_all()
    timings["saat_batch_500q"] = time.perf_counter() - t0
    saat_qs2 = ray.data.from_arrow(pa.table({
        "query_id": pa.array(
            [q for q, _ in queries[:500]], pa.int64()
        ),
        "terms": pa.array(
            [t for _, t in queries[:500]], pa.list_(pa.string())
        ),
    }))
    t0 = time.perf_counter()
    saat_stored_search(
        imp_dir, saat_qs2, k=10, budget_frac=0.25,
        concurrency=num_cpus // 2 or 1,
    ).take_all()
    timings["saat_batch_500q_budget25"] = time.perf_counter() - t0

    # WAND vs TAAT on a selective (rare+head) query mix — the workload
    # block-max skipping exists for.  At this 50k-page corpus TAAT's
    # dense scatter is near-free so WAND sits within ~2x; at 1.4M docs
    # WAND is ~3x FASTER (BENCH_NOTES.md r03 table).
    import pyarrow.parquet as _pq

    dftbl = _pq.read_table(
        os.path.join(index_dir, "stats", "term_df"), columns=["term", "df"]
    ).to_pandas()
    rare = dftbl[dftbl["df"] <= dftbl["df"].quantile(0.25)]["term"].tolist()
    headt = dftbl.nlargest(100, "df")["term"].tolist()
    rng = np.random.default_rng(42)
    selq = [
        [rare[rng.integers(len(rare))], rare[rng.integers(len(rare))],
         headt[rng.integers(len(headt))]]
        for _ in range(500)
    ]

    def _run_serial(mode: str) -> float:
        fn = S.score_all_wand if mode == "wand" else S.score_all_taat
        t0 = time.perf_counter()
        for terms in selq:
            uniq = sorted(set(terms))
            reader.dfs(uniq)
            idfs = {t: reader.idf(t) for t in uniq}
            fn(reader, reader.seg_ids, uniq, idfs, 10)
        return time.perf_counter() - t0

    _run_serial("taat")  # warm
    _run_serial("wand")
    timings["taat_selective_500q"] = _run_serial("taat")
    timings["wand_selective_500q"] = _run_serial("wand")

    # static impact pruning (stages/prune.py, r04): per-term top-1000
    # postings by BM25 weight, full-corpus stats retained.  Reported as
    # (a) the one-time prune cost and (b) the SAME selective 500-query
    # mix served from the pruned index — the head-term latency lever
    # (approximate results by design; rank-exact under the pinned rule).
    from defactonlp_ray.stages.prune import prune_index as _prune

    pruned_dir = f"/tmp/dfr_bench_idxprn_{BENCH_PAGES}_{num_cpus}"
    shutil.rmtree(pruned_dir, ignore_errors=True)
    t0 = time.perf_counter()
    _prune(index_dir, pruned_dir, 1000, concurrency=min(8, num_cpus))
    timings["prune_index"] = time.perf_counter() - t0
    preader = S.IndexReader(pruned_dir, preload=True)

    def _run_pruned() -> float:
        t0 = time.perf_counter()
        for terms in selq:
            uniq = sorted(set(terms))
            preader.dfs(uniq)
            idfs = {t: preader.idf(t) for t in uniq}
            S.score_all_taat(preader, preader.seg_ids, uniq, idfs, 10)
        return time.perf_counter() - t0

    _run_pruned()  # warm
    timings["pruned_selective_500q"] = _run_pruned()

    # positional index + phrase/proximity serving (r03 operators): the
    # build overhead of positions (occurrence sort + pos_blob encode) and
    # the serving cost of the positional operators, reported as separate
    # fields — the headline value stays index_build + bm25_batch
    from defactonlp_ray.functions.tokenizer import tokenize as _tok
    from defactonlp_ray.stages import phrase as P

    idxp = f"/tmp/dfr_bench_idxpos_{BENCH_PAGES}_{num_cpus}"
    shutil.rmtree(idxp, ignore_errors=True)
    t0 = time.perf_counter()
    pages_p = ray.data.read_parquet(
        pages_path, filter=(_pc.field("lang") == "en"),
        override_num_blocks=4 * num_cpus,
    )
    flagship.build_pages_index(
        pages_p, idxp, seg_docs=4096, lang=None, resume=False, positions=True
    )
    timings["pos_index_build"] = time.perf_counter() - t0

    # deterministic 2-word phrases sampled from the corpus itself (pure
    # function of (seed, i)), so every phrase has at least one match
    seed_pages = fixtures.make_pages_range(0, 600)
    phrases = []
    for i, txt in enumerate(seed_pages["text"].to_pylist()):
        toks = _tok(txt)
        if len(toks) > 12:
            j = 3 + (i % 5)
            phrases.append(toks[j : j + 2])
    phrases = phrases[:500]
    ptbl = pa.table(
        {
            "query_id": pa.array(range(len(phrases)), pa.int64()),
            "terms": pa.array(phrases, pa.list_(pa.string())),
        }
    )
    # workload-union positional packs decoded ONCE and broadcast (the
    # shared-packs serving route) — decode reported separately, like
    # bm25_batch_decode/serve
    t0 = time.perf_counter()
    packs_ref = ray.put(
        P.build_pos_packs(idxp, {t for ts in phrases for t in ts})
    )
    timings["pos_packs_decode"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    P.phrase_search(
        idxp, ray.data.from_arrow(ptbl).repartition(min(8, num_cpus)),
        k=10, concurrency=min(8, num_cpus), batch_size=16,
        packs_ref=packs_ref,
    ).count()
    timings["phrase_batch_500q"] = time.perf_counter() - t0
    wtbl = ptbl.append_column(
        "window", pa.array([8] * len(phrases), pa.int64())
    )
    t0 = time.perf_counter()
    P.window_search(
        idxp, ray.data.from_arrow(wtbl).repartition(min(8, num_cpus)),
        k=10, concurrency=min(8, num_cpus), batch_size=16,
        packs_ref=packs_ref,
    ).count()
    timings["proximity_batch_500q"] = time.perf_counter() - t0

    # a few registry ops at the driver's sf dir (incl. the round-4
    # curation family: composed shard-prep prefix-sum pipeline and the
    # vectorized winnowing kernel)
    for name in (
        "term_stats", "dedup_docs", "tpch_q1", "events_hourly",
        "pack_windows", "winnow_fingerprints",
    ):
        t0 = time.perf_counter()
        out = Q.QUERIES[name](sf_dir)
        if hasattr(out, "count"):
            out.count()
        timings[name] = time.perf_counter() - t0

    ray.shutdown()

    total = timings["index_build"] + timings["bm25_batch"]
    return {
        "metric": "index-build + BM25 batch query wall time (headline); "
        "build docs/sec + query p95 ms in fields",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 4) for k, v in timings.items()},
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "bench_pages": BENCH_PAGES,
        "n_docs_indexed": n_docs,
        "build_docs_per_sec": round(n_docs / build_sec, 1),
        "query_throughput_qps": round(BENCH_QUERIES / query_sec, 1),
        "n_results": n_results,
        # host-speed calibration (see machine_calibration): compare
        # rounds by the RATIO of their calib_sec on this drifting box
        "calib_sec": round(calib_sec, 3),
        **_calib_ratio_fields(calib_sec),
    }


def run_scaling() -> dict:
    # scaling needs parallel compute to dominate fixed per-stage overheads
    # (~7s of driver/orchestration cost is CPU-count independent), so the
    # build-only criterion runs on a much larger corpus.  REPEATS runs per
    # level, interleaved lo/hi to decorrelate machine drift; the reported
    # efficiency comes from MEDIANS, with the paired-run min/max as spread
    # (the r01 verdict asked for exactly this tightening).
    n = int(os.environ.get("DFR_SCALING_PAGES", "1600000"))
    repeats = int(os.environ.get("DFR_SCALING_REPEATS", "3"))
    _pages_path(n)  # generate once so both levels share the input

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ, RAY_GRAFT_CPUS=str(ncpu), DFR_BENCH_PAGES=str(n),
            DFR_BUILD_ONLY="1",
        )
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True,
        )
        if proc.returncode != 0:
            # surface the child's failure — check=True alone loses the
            # child stderr and the session dies silently
            raise RuntimeError(
                f"scaling child (cpus={ncpu}) exited {proc.returncode}: "
                + proc.stderr[-2000:]
            )
        return json.loads(proc.stdout.strip().splitlines()[-1])

    cpus = os.environ.get("DFR_SCALING_CPUS", "4,16").split(",")
    n_lo, n_hi = int(cpus[0]), int(cpus[1])
    lo_runs, hi_runs = [], []
    for _ in range(repeats):
        lo_runs.append(run(n_lo))
        hi_runs.append(run(n_hi))

    def med(xs):
        xs = sorted(xs)
        m = len(xs) // 2
        return xs[m] if len(xs) % 2 else 0.5 * (xs[m - 1] + xs[m])

    b_lo = [r["queries"]["index_build"] for r in lo_runs]
    b_hi = [r["queries"]["index_build"] for r in hi_runs]
    # per-run host calibration: the paired-median protocol assumes a
    # roughly stationary window; flag the session when the single-core
    # probe itself drifted >30% across runs (session M, BASELINE.md,
    # was exactly this failure and had to be rejected by hand)
    calibs = [
        r.get("calib_sec") for r in lo_runs + hi_runs if r.get("calib_sec")
    ]
    stationary = bool(calibs) and max(calibs) / min(calibs) <= 1.3
    ratio = n_hi / n_lo
    eff_pairs = [(bl / bh) / ratio for bl, bh in zip(b_lo, b_hi)]
    eff_build = (med(b_lo) / med(b_hi)) / ratio
    eff_total = (
        med([r["value"] for r in lo_runs]) / med([r["value"] for r in hi_runs])
    ) / ratio
    return {
        "bench_pages": lo_runs[0]["bench_pages"],
        "cpus": [n_lo, n_hi],
        "repeats": repeats,
        "build_sec_lo_runs": [round(x, 2) for x in b_lo],
        "build_sec_hi_runs": [round(x, 2) for x in b_hi],
        "build_sec_lo": round(med(b_lo), 3),
        "build_sec_hi": round(med(b_hi), 3),
        "docs_per_sec_lo": round(med([r["build_docs_per_sec"] for r in lo_runs]), 1),
        "docs_per_sec_hi": round(med([r["build_docs_per_sec"] for r in hi_runs]), 1),
        "scaling_efficiency": round(eff_build, 3),
        "scaling_efficiency_spread": [
            round(min(eff_pairs), 3), round(max(eff_pairs), 3)
        ],
        "scaling_efficiency_total": round(eff_total, 3),
        "calib_sec_runs": [round(c, 3) for c in calibs],
        "window_stationary": stationary,
    }


def run_codec_probe() -> dict:
    """Compute-bound scaling probe: a fixed bag of codec tasks (varint +
    PForDelta encode/decode over L2-resident arrays) with NO data
    movement — isolates the engine/task-scheduling scaling from this
    box's shared-memory-bandwidth wall, which the string-heavy index
    build does hit past ~16 workers (BASELINE.md)."""
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "16"))
    import ray

    ray.init(
        address="local", num_cpus=num_cpus, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )

    @ray.remote
    def codec_task(seed: int, rounds: int) -> int:
        import numpy as np

        from defactonlp_ray.stages.codec import (
            pfor_decode, pfor_encode, varint_decode, varint_encode,
        )

        rng = np.random.default_rng(seed)
        vals = rng.integers(0, 1 << 20, size=1 << 15).astype(np.uint64)
        acc = 0
        for _ in range(rounds):
            b = varint_encode(vals)
            acc += varint_decode(b, vals.size)[-1]
            p = pfor_encode(vals)
            acc += pfor_decode(p)[-1]
        return int(acc)

    n_tasks, rounds = 128, 12
    ray.get([codec_task.remote(i, 1) for i in range(num_cpus)])  # warm
    t0 = time.perf_counter()
    ray.get([codec_task.remote(i, rounds) for i in range(n_tasks)])
    sec = time.perf_counter() - t0
    ray.shutdown()
    return {"sec": round(sec, 3), "num_cpus": num_cpus,
            "n_tasks": n_tasks, "rounds": rounds}


def run_scaling_codec() -> dict:
    repeats = int(os.environ.get("DFR_SCALING_REPEATS", "3"))
    cpus = os.environ.get("DFR_SCALING_CPUS", "4,16").split(",")
    n_lo, n_hi = int(cpus[0]), int(cpus[1])

    def run(ncpu: int) -> float:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--codec-probe"],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])["sec"]

    lo, hi = [], []
    for _ in range(repeats):
        lo.append(run(n_lo))
        hi.append(run(n_hi))

    def med(xs):
        xs = sorted(xs)
        m = len(xs) // 2
        return xs[m] if len(xs) % 2 else 0.5 * (xs[m - 1] + xs[m])

    ratio = n_hi / n_lo
    return {
        "probe": "codec (compute-bound, no data movement)",
        "cpus": [n_lo, n_hi],
        "sec_lo_runs": lo,
        "sec_hi_runs": hi,
        "scaling_efficiency": round((med(lo) / med(hi)) / ratio, 3),
        "pair_efficiencies": [
            round((a / b) / ratio, 3) for a, b in zip(lo, hi)
        ],
    }


def run_llmops() -> dict:
    """LLM-data-pipeline ops at bench scale (VERDICT r04 next-round #2):
    the dedup chain (minhash candidates -> exact-Jaccard verify ->
    connected-component clusters) over DFR_LLMOPS_PAGES web pages and
    the partitioned IVF-PQ ANN (build + probe) over DFR_LLMOPS_VECS
    deterministic embeddings.  One JSON line, same calibration fields as
    the main bench.  DFR_LLMOPS_DEDUP_ONLY=1 restricts to the dedup
    chain (the scaling criterion's single job)."""
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    n_pages = int(os.environ.get("DFR_LLMOPS_PAGES", "400000"))
    n_vecs = int(os.environ.get("DFR_LLMOPS_VECS", "1600000"))
    dedup_only = os.environ.get("DFR_LLMOPS_DEDUP_ONLY") == "1"
    calib_sec = machine_calibration()
    pages_path = _pages_path(n_pages)
    embs_path = None if dedup_only else _embeddings_path(n_vecs)

    import ray

    ray.init(
        address="local", num_cpus=num_cpus, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from defactonlp_ray.stages import dedup

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    # ---- dedup chain: candidates -> verify -> clusters ----
    t0 = time.perf_counter()
    pages = ray.data.read_parquet(
        pages_path, columns=["warc_ts", "text"],
        override_num_blocks=4 * num_cpus,
    )

    def addid(b: pa.Table) -> pa.Table:
        # dense unique doc id: the fixture encodes the row index in
        # warc_ts (epoch + i seconds), unique even across url-duplicate
        # rows — vectorized, partitioning-invariant
        ids = pc.divide(
            pc.cast(pc.cast(b["warc_ts"], pa.timestamp("us")), pa.int64()),
            1_000_000,
        )
        return pa.table({"doc_id": ids, "text": b["text"]})

    docs = pages.map_batches(addid, batch_format="pyarrow").materialize()
    timings["dedup_docs_prep"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    cand = dedup.minhash_lsh_candidates(
        docs, concurrency=min(16, num_cpus)
    ).materialize()
    timings["minhash_candidates"] = time.perf_counter() - t0
    counts["n_candidates"] = cand.count()

    t0 = time.perf_counter()
    ver = dedup.verify_jaccard_pairs(cand, docs, threshold=0.8).materialize()
    timings["minhash_verify"] = time.perf_counter() - t0
    counts["n_verified_pairs"] = ver.count()

    t0 = time.perf_counter()
    cc = dedup.connected_components(
        ver.select_columns(["id_a", "id_b"])
    ).materialize()
    timings["neardup_clusters_bsp"] = time.perf_counter() - t0
    counts["n_clustered_docs"] = cc.count()
    dedup_total = sum(
        timings[k] for k in
        ("minhash_candidates", "minhash_verify", "neardup_clusters_bsp")
    )
    timings["dedup_chain"] = dedup_total

    # ---- partitioned ANN: IVF-PQ build + probe ----
    if not dedup_only:
        from defactonlp_ray.stages import ann

        idx = f"/tmp/dfr_bench_ivfpq_{n_vecs}_{num_cpus}"
        shutil.rmtree(idx, ignore_errors=True)
        t0 = time.perf_counter()
        emb = ray.data.read_parquet(
            embs_path, override_num_blocks=4 * num_cpus
        )
        ann.build_ivfpq_index(emb, idx, n_lists=64, m=8, ks=16)
        timings["ivfpq_build"] = time.perf_counter() - t0
        rng = np.random.default_rng(42)
        q = (rng.random((100, 64)) - 0.5).astype(np.float64)
        t0 = time.perf_counter()
        res = ann.knn_ivfpq(idx, q, k=10, n_probe=8)
        timings["ivfpq_query_100q"] = time.perf_counter() - t0
        counts["n_ann_results"] = len(res)

    ray.shutdown()
    return {
        "metric": "LLM-ops: dedup chain + IVF-PQ ANN wall time",
        "value": round(dedup_total, 3),
        "unit": "sec",
        "queries": {k: round(v, 4) for k, v in timings.items()},
        "llmops_pages": n_pages,
        "llmops_vecs": None if dedup_only else n_vecs,
        "num_cpus": num_cpus,
        **counts,
        "calib_sec": round(calib_sec, 3),
        **_calib_ratio_fields(calib_sec),
    }


def run_scaling_llmops() -> dict:
    """Two-parallelism-level scaling of the dedup chain (the north-rule
    protocol applied to the LLM-ops family — VERDICT r04 #2): fresh
    child processes at DFR_SCALING_CPUS (default "2,8": both levels
    under this box's >=16-worker memory-bandwidth wall, the multi-node-
    honest pair per BASELINE.md), interleaved repeats, median
    efficiency + per-run host calibration."""
    n = int(os.environ.get("DFR_LLMOPS_SCALING_PAGES", "100000"))
    repeats = int(os.environ.get("DFR_SCALING_REPEATS", "3"))
    _pages_path(n)

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ, RAY_GRAFT_CPUS=str(ncpu), DFR_LLMOPS_PAGES=str(n),
            DFR_LLMOPS_DEDUP_ONLY="1",
        )
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--llmops"],
            env=env, capture_output=True, text=True,
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"llmops scaling child (cpus={ncpu}) exited "
                f"{proc.returncode}: " + proc.stderr[-2000:]
            )
        return json.loads(proc.stdout.strip().splitlines()[-1])

    cpus = os.environ.get("DFR_SCALING_CPUS", "2,8").split(",")
    n_lo, n_hi = int(cpus[0]), int(cpus[1])
    lo_runs, hi_runs = [], []
    for _ in range(repeats):
        lo_runs.append(run(n_lo))
        hi_runs.append(run(n_hi))

    def med(xs):
        xs = sorted(xs)
        m = len(xs) // 2
        return xs[m] if len(xs) % 2 else 0.5 * (xs[m - 1] + xs[m])

    c_lo = [r["queries"]["dedup_chain"] for r in lo_runs]
    c_hi = [r["queries"]["dedup_chain"] for r in hi_runs]
    calibs = [
        r.get("calib_sec") for r in lo_runs + hi_runs if r.get("calib_sec")
    ]
    stationary = bool(calibs) and max(calibs) / min(calibs) <= 1.3
    ratio = n_hi / n_lo
    eff_pairs = [(a / b) / ratio for a, b in zip(c_lo, c_hi)]
    return {
        "probe": "dedup chain (minhash candidates -> verify -> clusters)",
        "llmops_pages": n,
        "cpus": [n_lo, n_hi],
        "repeats": repeats,
        "chain_sec_lo_runs": [round(x, 2) for x in c_lo],
        "chain_sec_hi_runs": [round(x, 2) for x in c_hi],
        "chain_sec_lo": round(med(c_lo), 3),
        "chain_sec_hi": round(med(c_hi), 3),
        "scaling_efficiency": round((med(c_lo) / med(c_hi)) / ratio, 3),
        "scaling_efficiency_spread": [
            round(min(eff_pairs), 3), round(max(eff_pairs), 3)
        ],
        "calib_sec_runs": [round(c, 3) for c in calibs],
        "window_stationary": stationary,
    }


def run_spill_build() -> dict:
    """Spill-tier build measurement (VERDICT r04 next-round #3): the
    full pages->index build at DFR_SPILL_PAGES with the object store
    deliberately undersized (DFR_OBJECT_STORE_GB, 0 = Ray default) so
    the working set exceeds plasma and Ray spills blocks to disk —
    the regime a 100 TB single-tenant run hits when the corpus
    outgrows the cluster's aggregate object store.  DFR_SPILL_LAYOUT
    picks the build path: "grouped" (groupby exchange, any input
    layout — the spill-tier route) or "sorted" (zero-shuffle slice
    path over the materialized ordered corpus).  Run pairs of these
    and record both in BASELINE.md."""
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    n = int(os.environ.get("DFR_SPILL_PAGES", "3200000"))
    layout = os.environ.get("DFR_SPILL_LAYOUT", "grouped")
    store_gb = float(os.environ.get("DFR_OBJECT_STORE_GB", "4"))
    calib_sec = machine_calibration()
    pages_path = _pages_path(n)

    import ray

    kwargs = {}
    if store_gb > 0:
        kwargs["object_store_memory"] = int(store_gb * (1 << 30))
    ray.init(
        address="local", num_cpus=num_cpus, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR", **kwargs,
    )
    import pyarrow.compute as _pc
    import ray.data
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from defactonlp_ray.pipelines import flagship
    from defactonlp_ray.sources import manifest as mf
    from defactonlp_ray.stages.index_build import build_index

    idx = f"/tmp/dfr_spill_idx_{n}_{num_cpus}_{layout}"
    shutil.rmtree(idx, ignore_errors=True)
    t0 = time.perf_counter()
    pages = ray.data.read_parquet(
        pages_path, filter=(_pc.field("lang") == "en"),
        override_num_blocks=4 * num_cpus,
    )
    docs = flagship.prepare_docs(pages, lang=None)
    build_index(
        docs, idx, url_col="url", seg_docs=16384, resume=False,
        layout=layout,
    )
    build_sec = time.perf_counter() - t0
    n_docs = sum(r["n_docs"] for r in mf.read_manifest(idx).values())
    # spilled bytes: sum the session's ray_spilled_objects_* dirs (the
    # gRPC memory_summary API is unavailable in this build)
    try:
        import glob as _glob

        sess = ray._private.worker._global_node.get_session_dir_path()
        spilled_bytes = sum(
            os.path.getsize(f)
            for d in _glob.glob(os.path.join(sess, "ray_spilled_objects*"))
            for f in _glob.glob(os.path.join(d, "*"))
        )
        spilled = f"{spilled_bytes >> 20} MiB"
    except Exception:
        spilled = "unavailable"
    ray.shutdown()
    return {
        "metric": f"spill-tier index build ({layout} layout)",
        "value": round(build_sec, 3),
        "unit": "sec",
        "spill_pages": n,
        "layout": layout,
        "object_store_gb": store_gb,
        "num_cpus": num_cpus,
        "n_docs_indexed": n_docs,
        "build_docs_per_sec": round(n_docs / build_sec, 1),
        "spilled": spilled,
        "calib_sec": round(calib_sec, 3),
    }


if __name__ == "__main__":
    if "--scaling-codec" in sys.argv:
        print(json.dumps(run_scaling_codec()))
    elif "--codec-probe" in sys.argv:
        print(json.dumps(run_codec_probe()))
    elif "--spill-build" in sys.argv:
        print(json.dumps(run_spill_build()))
    elif "--scaling-llmops" in sys.argv:
        print(json.dumps(run_scaling_llmops()))
    elif "--llmops" in sys.argv:
        print(json.dumps(run_llmops()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        out = run_bench()
        if os.environ.get("DFR_SKIP_LLMOPS") != "1":
            # LLM-ops fields (VERDICT r04 #2) ride along in the plain
            # run: dedup chain at DFR_LLMOPS_PAGES (default 400k; the
            # 1.6M rows live in BASELINE.md) + IVF-PQ at 1.6M vectors
            ll = run_llmops()
            out["queries"].update(ll["queries"])
            for k in ("llmops_pages", "llmops_vecs", "n_candidates",
                      "n_verified_pairs", "n_clustered_docs",
                      "n_ann_results"):
                if k in ll:
                    out[k] = ll[k]
        print(json.dumps(out))
