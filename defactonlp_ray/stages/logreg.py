"""Distributed logistic-regression training (full-batch GD) over
per-document text statistics — the quality/domain-classifier training
loop of a data-curation pipeline (CCNet/fastText-style filters train
exactly this shape of linear model over cheap features).

Parallelism-invariant by construction (same device as stages/cluster):
float summation is not associative, so a naive distributed gradient
(per-block float partials reduced on the driver) depends on block
boundaries.  The spec therefore quantizes each document's gradient
contribution ONCE to ``round(g * 2^24)`` (int64); per-batch partials
are exact integer sums, the driver reduce is exact integer addition,
and the weight update divides the integer total back out — identical
at every parallelism, which the driver's value-hash gate checks.

Scale notes (10^9+ docs):
* features are computed once (one tokenizing pass) into a tiny
  (n, d+1) table that is materialized and re-streamed per iteration —
  never the text;
* each GD iteration is ONE streaming map_batches pass emitting d+1
  int64 partials per block, reduced on the driver — no shuffle;
* weights (d+1 float64) ship in the task closure per iteration —
  bytes, not data.

Gradient-quantization headroom: |per-doc gradient component| <= |x|
(sigmoid error is in [-1, 1]); with features bounded ~100 the int64
partial sum stays exact past 10^12 docs at 2^24 scaling.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

LOGREG_VERSION = "logreg-v1"

_GSHIFT = 24
_GSCALE = float(1 << _GSHIFT)
LR = 0.5
N_ITER = 15
FEATURES = ["bias", "x_len", "x_distinct", "x_meanlen"]


def doc_features(tokens: list[str]) -> list[float]:
    """THE per-doc feature spec (both routes call or mirror this):
    [bias, n_tokens/100, distinct ratio, mean token length / 10]."""
    n = len(tokens)
    if n == 0:
        return [1.0, 0.0, 0.0, 0.0]
    n_distinct = len(set(tokens))
    mean_len = sum(len(t) for t in tokens) / n
    return [1.0, n / 100.0, n_distinct / n, mean_len / 10.0]


def featurize_batch(batch: pa.Table, label_lang: str = "en") -> pa.Table:
    """Vectorized per-batch feature kernel producing the SAME floats as
    :func:`doc_features` per doc (token stats via one flatten + bincount
    + lexsort-unique; no Python loop), with y = 1 iff ``lang`` equals
    ``label_lang``."""
    import pyarrow.compute as pc

    from ..functions.tokenizer import flatten_tokens

    terms, row_idx, doc_len = flatten_tokens(batch["text"])
    n = batch.num_rows
    nt = doc_len.astype(np.float64)
    lens = pc.utf8_length(terms).to_numpy(zero_copy_only=False).astype(
        np.float64
    )
    sumlen = np.bincount(row_idx, weights=lens, minlength=n)
    tn = terms.to_numpy(zero_copy_only=False).astype(str)
    if tn.size:
        order = np.lexsort((tn, row_idx))
        ri, ts = row_idx[order], tn[order]
        first = np.ones(ri.size, dtype=bool)
        first[1:] = (ri[1:] != ri[:-1]) | (ts[1:] != ts[:-1])
        ndist = np.bincount(ri[first], minlength=n).astype(np.float64)
    else:
        ndist = np.zeros(n, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        x2 = np.where(nt > 0, ndist / nt, 0.0)
        x3 = np.where(nt > 0, sumlen / nt / 10.0, 0.0)
    X = np.stack([np.ones(n), nt / 100.0, x2, x3], axis=1)
    y = pc.equal(batch["lang"], label_lang).to_numpy(
        zero_copy_only=False
    ).astype(np.float64)
    return pa.table({
        "x": pa.array(X.tolist(), pa.list_(pa.float64())),
        "y": pa.array(y, pa.float64()),
    })


def grad_partial_q(
    X: np.ndarray, y: np.ndarray, w: np.ndarray
) -> np.ndarray:
    """Quantized full-batch gradient partial over one matrix block —
    THE update spec both routes share: per-doc gradient (sigmoid(Xw) -
    y) * x quantized to int64 at 2^24, summed exactly."""
    z = X @ w
    p = 1.0 / (1.0 + np.exp(-z))
    g = (p - y)[:, None] * X
    return np.rint(g * _GSCALE).astype(np.int64).sum(axis=0)


def fit(
    feats: "ray.data.Dataset",
    *,
    lr: float = LR,
    n_iter: int = N_ITER,
) -> tuple[np.ndarray, pd.DataFrame]:
    """Train on a dataset with columns ``x`` (list<double>, d+1 wide)
    and ``y`` (double 0/1).  Returns (weights, one-row summary with the
    rounded coefficients, doc count and training accuracy)."""
    feats = feats.materialize()
    n = feats.count()
    d = len(FEATURES)
    w = np.zeros(d, dtype=np.float64)
    for _ in range(n_iter):
        w_now = w.copy()

        def part(batch: pa.Table, w_now=w_now) -> pa.Table:
            X = np.asarray(batch["x"].to_pylist(), dtype=np.float64)
            y = np.asarray(batch["y"].to_pylist(), dtype=np.float64)
            q = grad_partial_q(X, y, w_now)
            return pa.table({"qg": pa.array([q.tolist()], pa.list_(pa.int64()))})

        parts = feats.map_batches(part, batch_format="pyarrow").take_all()
        qsum = np.zeros(d, dtype=np.int64)
        for r in parts:
            qsum += np.asarray(r["qg"], dtype=np.int64)
        w = w - lr * (qsum.astype(np.float64) / _GSCALE) / n

    w_final = w.copy()

    def acc_part(batch: pa.Table) -> pa.Table:
        X = np.asarray(batch["x"].to_pylist(), dtype=np.float64)
        y = np.asarray(batch["y"].to_pylist(), dtype=np.float64)
        pred = (X @ w_final) >= 0.0
        return pa.table({
            "correct": pa.array([int((pred == (y > 0.5)).sum())], pa.int64()),
        })

    correct = sum(
        r["correct"]
        for r in feats.map_batches(acc_part, batch_format="pyarrow").take_all()
    )
    summary = pd.DataFrame({
        "n_docs": np.array([n], dtype=np.int64),
        "accuracy": [round(correct / n, 6)],
        **{
            f"w_{name}": [round(float(w_final[i]), 6)]
            for i, name in enumerate(FEATURES)
        },
    })
    return w_final, summary
