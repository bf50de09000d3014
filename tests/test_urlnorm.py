"""URL canonicalization rules (functions/urlnorm.py) — edge cases the
oracle-checked entry's synthetic variants don't reach."""

from __future__ import annotations

import pandas as pd

from defactonlp_ray.functions.urlnorm import canonicalize_urls


def test_canonicalize_rules():
    cases = {
        # scheme + host lower-cased, default https port stripped
        "HTTPS://Site.Example:443/A/B": "https://site.example/A/B",
        # path case is PRESERVED (only scheme/host fold)
        "https://x.example/CaseKept": "https://x.example/CaseKept",
        # http default port; non-default ports survive
        "http://x.example:80/a": "http://x.example/a",
        "http://x.example:8080/a": "http://x.example:8080/a",
        # fragment dropped, trailing slash-runs stripped
        "https://x.example/a///#frag": "https://x.example/a",
        # utm_* params dropped in place, order preserved
        "https://x.example/a?utm_s=1&b=2&utm_c=3&d=4": (
            "https://x.example/a?b=2&d=4"
        ),
        # all-utm query drops its '?'
        "https://x.example/a?utm_s=1&utm_c=3": "https://x.example/a",
        # bare host: no path, no trailing artifacts
        "https://X.example": "https://x.example",
        # :443 on plain http is NOT a default port
        "http://x.example:443/a": "http://x.example:443/a",
    }
    got = canonicalize_urls(pd.Series(list(cases))).tolist()
    assert got == list(cases.values())


def test_canonicalize_idempotent():
    """canonicalize(canonicalize(u)) == canonicalize(u) — the invariant
    that makes the canonical form a stable dedup key."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    frag = st.text(
        alphabet="abXY19.:/?&#=_-", min_size=0, max_size=12
    )

    @settings(max_examples=200, deadline=None)
    @given(
        scheme=st.sampled_from(["http", "HTTPS", "ftp", ""]),
        host=st.sampled_from(
            ["Site.Example", "x.y:443", "a.b:80", "H-1.example:8080"]
        ),
        rest=frag,
    )
    def prop(scheme, host, rest):
        url = (scheme + "://" if scheme else "") + host + "/" + rest
        once = canonicalize_urls(pd.Series([url])).iloc[0]
        twice = canonicalize_urls(pd.Series([once])).iloc[0]
        assert twice == once, (url, once, twice)

    prop()


def test_canonicalize_empty_and_relative():
    assert canonicalize_urls(pd.Series([], dtype=object)).tolist() == []
    # schemeless input passes through the path rules only
    got = canonicalize_urls(pd.Series(["/a/b/?utm_x=1#f"])).tolist()
    assert got == ["/a/b"]
