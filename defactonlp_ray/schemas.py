"""Declared Arrow schemas for every logical table (SURVEY.md §1.2).

The reference's schemas are implicit (JSONL dict keys / SQLite columns —
SURVEY.md §1.1); here they are fixed ``pyarrow.Schema`` constants that
Parquet round-trips.
"""

from __future__ import annotations

import pyarrow as pa

# Authoritative input (BASELINE.json input_hint): Common-Crawl-style pages.
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# Derived doc store (replaces fever.db documents(id,text,lines)).
DOCS = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("url", pa.string()),
        ("text", pa.string()),
        ("doc_len", pa.int32()),
    ]
)

SENTENCES = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("sent_id", pa.int32()),
        ("text", pa.string()),
    ]
)

EVIDENCE = pa.list_(pa.list_(pa.struct([("page", pa.string()), ("sent", pa.int32())])))

CLAIMS = pa.schema(
    [
        ("query_id", pa.int64()),
        ("claim", pa.string()),
        ("label", pa.string()),
        ("evidence", EVIDENCE),
    ]
)

# One row per term per segment; blobs per stages/codec.py.
POSTINGS = pa.schema(
    [
        ("term", pa.string()),
        ("n", pa.int32()),           # posting count
        ("codec", pa.string()),
        ("doc_blob", pa.binary()),   # delta-gap + varint/pfor docids
        ("tf_blob", pa.binary()),
        ("dl_blob", pa.binary()),
        ("blk_last_doc", pa.list_(pa.int64())),
        ("blk_max_tf", pa.list_(pa.int32())),
        ("blk_min_dl", pa.list_(pa.int32())),
    ]
)

DOC_STATS = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("url", pa.string()),
        ("doc_len", pa.int32()),
    ]
)

TERM_DF = pa.schema([("term", pa.string()), ("df", pa.int64()), ("cf", pa.int64())])

RESULTS = pa.schema(
    [
        ("query_id", pa.int64()),
        ("rank", pa.int32()),
        ("doc_id", pa.int64()),
        ("score", pa.float64()),
    ]
)
