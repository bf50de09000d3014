"""URL canonicalization — the standard web-crawl dedup-key transform
(RFC 3986 §6 syntax-based normalization plus the tracking-param strip
every production crawl pipeline applies; cf. the Common Crawl URL index
normalization notes).  No reference-repo counterpart (SURVEY.md §0:
/root/reference is empty); rules are pinned here and mirrored verbatim
by the SQL oracle.

Pinned rule set, applied in order:

1. scheme := lower(scheme)
2. host   := lower(host); a default port is stripped (``:443`` for
   https, ``:80`` for http)
3. the fragment (first ``#`` to end) is dropped
4. query params starting with ``utm_`` are dropped, order otherwise
   preserved; an emptied query drops its ``?``
5. trailing ``/``-runs are stripped from the path (``…/page/`` ==
   ``…/page``); a URL with no path keeps none

All steps are pandas ``.str`` kernels / vectorized regexes over the
batch — no per-row Python in the hot path (the one reshuffle is the
explode/groupby-join used to filter query params element-wise).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["canonicalize_urls"]


def canonicalize_urls(urls: pd.Series) -> pd.Series:
    """Vectorized canonical form of absolute ``scheme://host…`` URLs
    (relative URLs pass through rules 3-5 with an empty scheme/host)."""
    if not len(urls):
        return urls.astype(str)
    urls = urls.astype(str)
    part = urls.str.partition("://")
    scheme = part[0].str.lower().where(part[1] == "://", "")
    rest = part[2].where(part[1] == "://", urls)
    # the authority ends at the first of '/', '?' or '#' (RFC 3986 §3.2)
    # — stopping only at '/' would re-parse "host?q" as host and break
    # idempotence (caught by the hypothesis property test)
    ext = rest.str.extract(r"^([^/?#]*)([/?#].*)?$")
    hostport = ext[0].fillna("").str.lower()
    pathq = ext[1].fillna("")
    host = hostport.copy()
    host[scheme == "https"] = hostport.str.replace(r":443$", "", regex=True)
    host[scheme == "http"] = hostport.str.replace(r":80$", "", regex=True)
    nofrag = pathq.str.split("#", n=1).str[0]
    sp = nofrag.str.split("?", n=1)
    path = sp.str[0].str.replace(r"/+$", "", regex=True)
    query = sp.str[1]
    # element-wise utm_* filter: explode -> mask -> order-preserving rejoin
    q2 = pd.Series("", index=urls.index, dtype=object)
    has_q = query.notna()
    if has_q.any():
        parts = query[has_q].str.split("&").explode()
        kept = parts[~parts.str.startswith("utm_")]
        joined = kept.groupby(level=0).agg("&".join)
        q2.update(joined)
    out = np.where(scheme != "", scheme + "://" + host, "")
    out = out + path + np.where(q2 != "", "?" + q2, "")
    return pd.Series(out, index=urls.index, dtype=object)
