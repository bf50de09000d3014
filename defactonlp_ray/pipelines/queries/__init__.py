"""Driver-contract query registry (SURVEY.md §2 -> queries()/oracle_sql()).

Formerly one 22.6k-line module; split in round 5 (VERDICT r04 next-round
#6) into contiguous per-family part modules that share ONE late-bound
namespace.  Each part seeds its globals from ``_nsacc.NS`` before its
body runs — original top-level execution order is preserved — and after
all parts load the final merged namespace is injected into every part,
so call-time forward references behave exactly as in the single file.
The public surface is unchanged: both ``from defactonlp_ray.pipelines
import queries as Q`` and ``from defactonlp_ray.pipelines.queries
import q_xxx`` keep working.
"""

from __future__ import annotations

import importlib as _importlib

from . import _nsacc as _nsacc

_PARTS = [
    "p01_core",
    "p02_tpc_h_shapes",
    "p03_bm25_flagship_q1_q4",
    "p04_url_canonicalization",
    "p05_snippets_serving_stage",
    "p06_prefix_autocomplete_suggester",
    "p07_cross_fields_multi_match",
    "p08_serial_diff_pipeline_agg",
    "p09_multinomial_naive_bayes",
    "p10_zipf_law_fit",
    "p11_categorize_text_aggregation",
]

_mods = [_importlib.import_module("." + _p, __name__) for _p in _PARTS]

# Late binding: give every part the FINAL merged namespace (single-file
# call-time semantics — the last definition of a name wins everywhere).
for _m in _mods:
    vars(_m).update(_nsacc.NS)

globals().update(_nsacc.NS)
del _m, _mods


# Preserve single-module WRITE semantics too: setting an attribute on
# this package (tests monkeypatch knobs like _PMI_DOC_TERM_CAP) must
# reach the part module whose function globals actually read the name.
# PEP 562-style: swap the package's module class for one whose
# __setattr__ forwards every write to all parts + the accumulator.
import sys as _sys
import types as _types


class _SharedNamespaceModule(_types.ModuleType):
    def __setattr__(self, name, value):
        super().__setattr__(name, value)
        if name.startswith("__"):
            return
        _nsacc.NS[name] = value
        for _pm in _PART_MODULES:
            _pm.__dict__[name] = value


_PART_MODULES = [
    _sys.modules[__name__ + "." + _p] for _p in _PARTS
]
_sys.modules[__name__].__class__ = _SharedNamespaceModule
