"""CLI entry points — the ``ray job submit`` surface of the engine.

On a real cluster (north_rule):

    ray job submit --working-dir . -- python -m defactonlp_ray.cli \\
        build --pages s3://crawl/pages/ --index s3://idx/run1 --seg-docs 1000000
    ray job submit --working-dir . -- python -m defactonlp_ray.cli \\
        search --index s3://idx/run1 --claims claims.parquet --out results/

In this sandbox the same commands run locally (``ray.init`` is guarded —
the driver contract forbids library code from initializing Ray, so the
guard lives here, in the only process that owns a session).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = dict(
            address="local", include_dashboard=False,
            ignore_reinit_error=True, logging_level="ERROR",
        )
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)


def cmd_build(args) -> int:
    _ensure_ray(args.num_cpus)
    import ray.data

    from .pipelines.flagship import build_pages_index
    from .sources import manifest as mf
    from .sources.readers import read_pages

    pages = read_pages(args.pages, lang=args.lang or None)
    index_dir, _docs = build_pages_index(
        pages, args.index, seg_docs=args.seg_docs,
        lang=None, resume=not args.no_resume,
    )
    recs = mf.read_manifest(index_dir)
    print(json.dumps({
        "index": index_dir,
        "segments": len(recs),
        "docs": sum(r["n_docs"] for r in recs.values()),
        "postings": sum(r["n_postings"] for r in recs.values()),
    }))
    return 0


def cmd_append(args) -> int:
    _ensure_ray(args.num_cpus)
    import ray.data

    from .sources import manifest as mf
    from .stages.index_build import append_index

    docs = ray.data.read_parquet(args.docs)
    append_index(docs, args.index, seg_docs=args.seg_docs, codec=args.codec)
    recs = mf.read_manifest(args.index)
    print(json.dumps({
        "index": args.index,
        "segments": len(recs),
        "docs": sum(r["n_docs"] for r in recs.values()),
    }))
    return 0


def cmd_compact(args) -> int:
    _ensure_ray(args.num_cpus)
    from .sources import manifest as mf
    from .stages.index_build import compact_index

    merges = compact_index(
        args.index, target_seg_docs=args.target_seg_docs,
        codec=args.codec or None,
    )
    recs = mf.read_manifest(args.index)
    print(json.dumps({
        "index": args.index, "merges": merges, "segments": len(recs),
    }))
    return 0


def cmd_delete(args) -> int:
    # no Ray needed: one immutable side file (stages/deletes.py)
    import pyarrow.parquet as pq

    from .stages.deletes import delete_docs, read_deletes

    if args.ids:
        ids = [int(x) for x in args.ids.split(",")]
    elif args.ids_parquet:
        ids = pq.read_table(args.ids_parquet, columns=[args.id_col])[
            args.id_col
        ].to_pylist()
    else:
        print("delete: one of --ids / --ids-parquet is required", file=sys.stderr)
        return 2
    n = delete_docs(args.index, ids)
    print(json.dumps({
        "index": args.index, "deleted": n,
        "total_pending": int(read_deletes(args.index).size),
    }))
    return 0


def cmd_expunge(args) -> int:
    _ensure_ray(args.num_cpus)
    from .sources import manifest as mf
    from .stages.index_build import expunge_deletes

    rewritten = expunge_deletes(args.index)
    recs = mf.read_manifest(args.index)
    print(json.dumps({
        "index": args.index, "segments_rewritten": rewritten,
        "segments": len(recs),
        "docs": sum(r["n_docs"] for r in recs.values()),
    }))
    return 0


def cmd_split(args) -> int:
    _ensure_ray(args.num_cpus)
    from .sources import manifest as mf
    from .stages.index_build import split_segment

    out = split_segment(
        args.index, sid=args.sid, codec=args.codec or None
    )
    recs = mf.read_manifest(args.index)
    print(json.dumps({
        "index": args.index,
        "new_sids": list(out) if out else None,
        "segments": len(recs),
    }))
    return 0


def cmd_fsck(args) -> int:
    _ensure_ray(args.num_cpus)
    from .stages.fsck import fsck_index

    rep = fsck_index(args.index)
    n_err = int(rep["n_errors"].sum())
    print(rep.to_json(orient="records"))
    return 1 if n_err else 0


def cmd_search(args) -> int:
    _ensure_ray(args.num_cpus)
    import ray.data

    from .sources.readers import read_claims
    from .stages.evaluate import write_results
    from .stages.search import search, tokenize_queries

    claims = read_claims(args.claims)
    qds = tokenize_queries(claims, text_col=args.text_col)
    res = search(args.index, qds, k=args.k, mode=args.mode)
    if args.out:
        write_results(res, args.out)
        print(json.dumps({"out": args.out, "rows": res.count()}))
    else:
        for r in res.take(args.limit):
            print(json.dumps(r, default=str))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="defactonlp_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the inverted index from pages parquet")
    b.add_argument("--pages", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--seg-docs", type=int, default=8192)
    b.add_argument("--lang", default="en")
    b.add_argument("--no-resume", action="store_true")
    b.add_argument("--num-cpus", type=int, default=None)
    b.set_defaults(fn=cmd_build)

    a = sub.add_parser(
        "append",
        help="append a docs parquet (doc_id, text) to a finished index "
             "— new segments only, ids must exceed every indexed doc_id",
    )
    a.add_argument("--docs", required=True)
    a.add_argument("--index", required=True)
    a.add_argument("--seg-docs", type=int, default=8192)
    a.add_argument("--codec", default="varint", choices=["varint", "pfor"])
    a.add_argument("--num-cpus", type=int, default=None)
    a.set_defaults(fn=cmd_append)

    c = sub.add_parser(
        "compact",
        help="merge adjacent small segments (crash-safe; optional codec "
             "migration)",
    )
    c.add_argument("--index", required=True)
    c.add_argument("--target-seg-docs", type=int, default=32768)
    c.add_argument("--codec", default=None, choices=[None, "varint", "pfor"])
    c.add_argument("--num-cpus", type=int, default=None)
    c.set_defaults(fn=cmd_compact)

    d = sub.add_parser(
        "delete",
        help="record doc deletes (live-docs side file; masked at query "
             "time until 'expunge' applies them physically)",
    )
    d.add_argument("--index", required=True)
    d.add_argument("--ids", default=None, help="comma-separated doc_ids")
    d.add_argument("--ids-parquet", default=None)
    d.add_argument("--id-col", default="doc_id")
    d.set_defaults(fn=cmd_delete)

    e = sub.add_parser(
        "expunge",
        help="rewrite segments containing deleted docs (fresh stats, "
             "crash-safe; clears the applied delete files)",
    )
    e.add_argument("--index", required=True)
    e.add_argument("--num-cpus", type=int, default=None)
    e.set_defaults(fn=cmd_expunge)

    sp = sub.add_parser(
        "split",
        help="split one segment (default: the largest) into two at its "
             "median doc id — the inverse of compact, for hot doc ranges",
    )
    sp.add_argument("--index", required=True)
    sp.add_argument("--sid", type=int, default=None)
    sp.add_argument("--codec", default=None, choices=[None, "varint", "pfor"])
    sp.add_argument("--num-cpus", type=int, default=None)
    sp.set_defaults(fn=cmd_split)

    f = sub.add_parser(
        "fsck",
        help="verify index invariants (per-segment parallel; exit 1 on "
             "any error)",
    )
    f.add_argument("--index", required=True)
    f.add_argument("--num-cpus", type=int, default=None)
    f.set_defaults(fn=cmd_fsck)

    s = sub.add_parser("search", help="BM25 top-k over a built index")
    s.add_argument("--index", required=True)
    s.add_argument("--claims", required=True)
    s.add_argument("--text-col", default="claim")
    s.add_argument("--k", type=int, default=10)
    s.add_argument(
        "--mode", default="taat",
        choices=["taat", "wand", "auto", "tfidf", "lmd", "count"],
    )
    s.add_argument("--out", default=None)
    s.add_argument("--limit", type=int, default=20)
    s.add_argument("--num-cpus", type=int, default=None)
    s.set_defaults(fn=cmd_search)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
