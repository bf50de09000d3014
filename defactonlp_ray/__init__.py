"""defactonlp_ray — a Ray-Data-native inverted-index build + BM25 query engine.

A from-scratch rebuild of the document-retrieval core of DeFacto/DeFactoNLP
(FEVER 2018; arXiv:1809.00509) as a web-scale full-text engine over Parquet
web pages, per /root/repo/BASELINE.json's north_rule.  The reference repo was
unavailable at build time (SURVEY.md §0); behavior is pinned against the
pure-Python oracle in :mod:`defactonlp_ray.oracle` (SURVEY.md §5.3).

Layout
------
functions/   pure, pinned scalar/vector functions (tokenizer, normalizer,
             extractor, NER, hashing, text statistics)
stages/      Ray Data pipeline stages (codec, index build, search, dedup,
             ANN, sentences, multimodal)
sources/     readers and the checkpoint/segment manifest
pipelines/   end-to-end compositions (flagship build+search)
state/       broadcast helpers (ray.put once, read per actor)

No module in this package calls ``ray.init``/``ray.shutdown`` — the driver
owns the Ray session (see __ray_entry__.py).
"""

__version__ = "0.1.0"
