"""Entry point C stand-in (SURVEY.md §3.3): RTE entailment scoring (A3)
and label classification (A4) as DETERMINISTIC stand-ins with the real
Ray execution shapes.

The reference runs an AllenNLP decomposable-attention model over each
(sentence, claim) pair, then a RandomForest over the entailment features
(arXiv:1809.00509 §2.3-§2.4).  Neither model's weights exist in this
container (SURVEY.md §0 scope note), so this module keeps the production
SHAPES — an actor-pool ``map_batches`` stage whose per-actor state loads
once in ``__init__`` (A3), and a broadcast-model stateless ``map_batches``
classifier (A4, weights shipped once via ``ray.put``) — over a pinned,
fully deterministic feature model:

* entailment features per (claim, sentence): token-overlap ratio
  (|claim ∩ sent| / |claim| over distinct tokens), negation mismatch
  (claim XOR sentence contains a negation token), length ratio
  (min/max token count);
* entailment score = overlap * (0.75 + 0.25 * len_ratio) — in [0, 1];
* label rule (A4): no scored evidence -> NOT ENOUGH INFO (the J4
  anti-join route); best score >= threshold -> REFUTES when that best
  sentence has a negation mismatch else SUPPORTS; otherwise NEI.

Swapping in real models changes ONLY the two stage bodies — the
pipeline wiring (retrieve -> sentence top-n -> entail -> label) stays.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions.tokenizer import tokenize
from .util import pool_size

ENTAIL_VERSION = "entail-v1"

NEGATIONS = frozenset({"not", "no", "never", "none", "nothing", "without"})
SUPPORT_THRESHOLD = 0.5

LABEL_SUPPORTS = "SUPPORTS"
LABEL_REFUTES = "REFUTES"
LABEL_NEI = "NOT ENOUGH INFO"


def entailment_features(
    claim_toks: list[str], sent_toks: list[str]
) -> tuple[float, bool, float]:
    """(overlap_ratio, negation_mismatch, length_ratio) — pure, pinned."""
    cset, sset = set(claim_toks), set(sent_toks)
    overlap = len(cset & sset) / len(cset) if cset else 0.0
    neg = (bool(cset & NEGATIONS)) != (bool(sset & NEGATIONS))
    lc, ls = len(claim_toks), len(sent_toks)
    len_ratio = min(lc, ls) / max(lc, ls) if max(lc, ls) else 0.0
    return overlap, neg, len_ratio


def entail_score(overlap: float, len_ratio: float) -> float:
    return overlap * (0.75 + 0.25 * len_ratio)


class EntailmentStage:
    """A3 shape: actor pool over (query_id, doc_id, sent_id, text)
    evidence sentences; claim texts broadcast once via ``ray.put`` and
    resolved in ``__init__`` (once per actor, like a model load)."""

    def __init__(self, claims_ref):
        claims = ray.get(claims_ref) if isinstance(claims_ref, ray.ObjectRef) else claims_ref
        self.claim_toks = {qid: tokenize(text) for qid, text in claims.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_q, out_d, out_s, out_score, out_neg = [], [], [], [], []
        for qid, did, sid, text in zip(
            batch["query_id"].to_pylist(),
            batch["doc_id"].to_pylist(),
            batch["sent_id"].to_pylist(),
            batch["text"].to_pylist(),
        ):
            ctoks = self.claim_toks.get(qid)
            if ctoks is None:
                continue
            overlap, neg, len_ratio = entailment_features(ctoks, tokenize(text))
            out_q.append(qid)
            out_d.append(did)
            out_s.append(sid)
            out_score.append(entail_score(overlap, len_ratio))
            out_neg.append(neg)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "doc_id": pa.array(out_d, pa.int64()),
                "sent_id": pa.array(out_s, pa.int32()),
                "entail": pa.array(out_score, pa.float64()),
                "neg_mismatch": pa.array(out_neg, pa.bool_()),
            }
        )


def score_entailment(
    sentences: "ray.data.Dataset",
    claims: dict[int, str],
    *,
    concurrency: int = 2,
    batch_size: int = 256,
) -> "ray.data.Dataset":
    """(query_id, doc_id, sent_id, text) evidence -> + entail features."""
    ref = ray.put(claims)
    return sentences.map_batches(
        EntailmentStage,
        fn_constructor_kwargs={"claims_ref": ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )


def classify_labels(
    entailed: "ray.data.Dataset",
    all_query_ids: list[int],
    *,
    threshold: float = SUPPORT_THRESHOLD,
) -> pd.DataFrame:
    """A4 shape: per-claim aggregation of entailment rows into a verdict.

    The per-claim reduce is a ``groupby(query_id).map_groups`` (pinned
    best-row pick: max entail, ties by (doc_id, sent_id)); claims with NO
    evidence rows take the J4 anti-join route to NOT ENOUGH INFO.
    """

    def verdict(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["entail", "doc_id", "sent_id"], ascending=[False, True, True]
        )
        best = g.iloc[0]
        if best["entail"] >= threshold:
            label = LABEL_REFUTES if best["neg_mismatch"] else LABEL_SUPPORTS
        else:
            label = LABEL_NEI
        return pd.DataFrame(
            {
                "query_id": [g["query_id"].iloc[0]],
                "label": [label],
                "entail_score": [float(best["entail"])],
                "n_evidence": [np.int64(len(g))],
            }
        )

    got = (
        entailed.groupby("query_id").map_groups(verdict, batch_format="pandas")
        .to_pandas()
    )
    if got.empty:  # no evidence anywhere -> every claim takes the NEI route
        got = pd.DataFrame(
            {"query_id": pd.Series([], dtype=np.int64), "label": [],
             "entail_score": pd.Series([], dtype=np.float64),
             "n_evidence": pd.Series([], dtype=np.int64)}
        )
    have = set(got["query_id"])
    missing = [q for q in all_query_ids if q not in have]
    if missing:
        got = pd.concat(
            [
                got,
                pd.DataFrame(
                    {
                        "query_id": missing,
                        "label": [LABEL_NEI] * len(missing),
                        "entail_score": [0.0] * len(missing),
                        "n_evidence": np.zeros(len(missing), dtype=np.int64),
                    }
                ),
            ],
            ignore_index=True,
        )
    got["query_id"] = got["query_id"].astype(np.int64)
    got["n_evidence"] = got["n_evidence"].astype(np.int64)
    return got.sort_values("query_id").reset_index(drop=True)
