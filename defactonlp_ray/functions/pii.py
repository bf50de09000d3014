"""PII redaction kernels (training-data-pipeline op; C4/CCNet-style
corpus cleaning).  RE2 end-to-end: the pyarrow compute kernels here and
DuckDB's regexp functions share the RE2 dialect, so the SQL oracle uses
the IDENTICAL pattern strings — no cross-dialect translation layer.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

PII_VERSION = "pii-v1"

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b555-[0-9]{4}\b"

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"


def redact_batch(texts: pa.ChunkedArray | pa.Array) -> dict[str, pa.Array]:
    """Vectorized count + strip of both PII classes over one Arrow
    string column.  Returns {n_emails, n_phones, clean} arrays."""
    n_emails = pc.cast(pc.count_substring_regex(texts, EMAIL_RE), pa.int64())
    n_phones = pc.cast(pc.count_substring_regex(texts, PHONE_RE), pa.int64())
    clean = pc.replace_substring_regex(
        pc.replace_substring_regex(texts, EMAIL_RE, EMAIL_TOKEN),
        PHONE_RE, PHONE_TOKEN,
    )
    return {"n_emails": n_emails, "n_phones": n_phones, "clean": clean}
