"""Single-process pure-Python BM25 oracle (SURVEY.md §5.3).

``/root/reference`` was empty at build time (SURVEY.md §0), so "reference
fixtures" are defined as the output of THIS module over the pinned fixture
corpus: no Ray, no vectorization tricks — a direct transcription of the
pinned semantics the engine must match rank- and score-identically
(float64 bit-for-bit):

* tokenizer: functions/tokenizer.tokenize (simple-v1),
* Okapi BM25 (Robertson & Walker), k1=1.2, b=0.75 per BASELINE.json:
  ``idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))``
  ``s(t,d) = idf * (tf*(k1+1)) / (tf + k1*(1 - b + b*dl/avgdl))``
* per-query accumulation in ascending-term order over UNIQUE query terms
  (SURVEY.md §7.6.2); ties broken by (-score, doc_id).

A DrQA-style tf-idf scorer (log1p tf, clipped idf — arXiv:1704.00051,
fever-baselines build_tfidf) is kept for overlap diagnostics only; BM25 and
tf-idf scores are not numerically comparable (SURVEY.md §7.6.6).
"""

from __future__ import annotations

import math
from collections import Counter

from .functions.tokenizer import tokenize

K1 = 1.2
B = 0.75
# v2: score expression pinned as idf * (weight) with
# weight = (tf*(k1+1)) / (tf + k1*(1-b+b*dl/avgdl)) — the weight is
# idf-independent so engines may precompute it per posting; the extra
# parentheses change float rounding vs v1, so goldens were regenerated.
ORACLE_VERSION = "oracle-v2"


class OracleIndex:
    """In-memory exact index over (doc_id -> text)."""

    def __init__(self, docs: dict[int, str]):
        self.doc_tf: dict[int, Counter] = {}
        self.doc_len: dict[int, int] = {}
        self.postings: dict[str, list[tuple[int, int]]] = {}
        for doc_id in sorted(docs):
            toks = tokenize(docs[doc_id])
            tf = Counter(toks)
            self.doc_tf[doc_id] = tf
            self.doc_len[doc_id] = len(toks)
            for term, c in tf.items():
                self.postings.setdefault(term, []).append((doc_id, c))
        self.n_docs = len(docs)
        total = sum(self.doc_len.values())
        self.avgdl = total / self.n_docs if self.n_docs else 0.0

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, ()))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def bm25_topk(self, terms: list[str], k: int) -> list[tuple[int, float]]:
        """Exact top-k: unique terms, ascending-term accumulation order,
        tie-break (-score, doc_id)."""
        uniq = sorted(set(terms))
        scores: dict[int, float] = {}
        for term in uniq:
            plist = self.postings.get(term)
            if not plist:
                continue
            idf = self.idf(term)
            for doc_id, tf in plist:
                dl = self.doc_len[doc_id]
                w = (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * dl / self.avgdl))
                scores[doc_id] = scores.get(doc_id, 0.0) + idf * w
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def tfidf_topk(self, terms: list[str], k: int) -> list[tuple[int, float]]:
        """DrQA-style diagnostic scorer: w(t,d) = log1p(tf) * idf_clip,
        idf_clip = max(0, ln((N - df + 0.5)/(df + 0.5))); score = q . d with
        query weights = log1p(query tf) * idf_clip."""
        qtf = Counter(terms)
        scores: dict[int, float] = {}
        for term in sorted(qtf):
            plist = self.postings.get(term)
            if not plist:
                continue
            df = len(plist)
            idf = math.log((self.n_docs - df + 0.5) / (df + 0.5))
            idf = max(idf, 0.0)
            qw = math.log1p(qtf[term]) * idf
            if qw == 0.0:
                continue
            for doc_id, tf in plist:
                dw = math.log1p(tf) * idf
                scores[doc_id] = scores.get(doc_id, 0.0) + qw * dw
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]
