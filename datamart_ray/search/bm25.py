"""BM25 scoring kernel (k1=1.2, b=0.75 — the reference's ES 7.8.1 defaults).

The reference configures no custom similarity (absence of ``similarity`` in
coordinator/coordinator/elasticsearch.yml), so its scores are Lucene BM25:

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfn(t,d)= tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    score   = sum over query terms of idf(t) * tfn(t, d)

We use *global* corpus statistics (N, avgdl, df summed over all index
segments), never per-partition ones, so scores are independent of both the
build parallelism and the number of segments — the rank-identity requirement
(SURVEY.md §7.3). The per-term accumulation order at query time is pinned to
the deduplicated query-term order so float sums are reproducible.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class BM25Params:
    k1: float = 1.2
    b: float = 0.75


def bm25_idf(df: float, n_docs: float, params: BM25Params = BM25Params()) -> float:
    return float(np.log1p((n_docs - df + 0.5) / (df + 0.5)))


def bm25_tf_norm(
    tf: np.ndarray,
    dl: np.ndarray,
    avgdl: float,
    params: BM25Params = BM25Params(),
) -> np.ndarray:
    """Vectorized length-normalized tf component (float64)."""
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    k1, b = params.k1, params.b
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def bm25_tf_norm_upper_bound(
    max_tf: float, min_dl: float, avgdl: float, params: BM25Params = BM25Params()
) -> float:
    """Upper bound of tf_norm over a posting chunk (block-max metadata).

    tfn is increasing in tf and decreasing in dl, so max_tf with the chunk's
    min_dl bounds every posting in the chunk. Used for block-max WAND /
    MaxScore pruning.
    """
    k1, b = params.k1, params.b
    return float(
        max_tf * (k1 + 1.0) / (max_tf + k1 * (1.0 - b + b * min_dl / avgdl))
    )


def topk_select(
    docids: np.ndarray, scores: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Pinned top-k: (score desc, docID asc) — the rank tie-break contract."""
    n = docids.size
    if n == 0:
        return docids.astype(np.int64), scores.astype(np.float64)
    if n > k:
        # partition may split score ties at the boundary arbitrarily; keep
        # every score >= the kth, then sort the slab exactly with the pinned
        # (score desc, docID asc) tie-break before truncating.
        kth = np.partition(-scores, k - 1)[k - 1]
        slab = np.flatnonzero(-scores <= kth)
        docids, scores = docids[slab], scores[slab]
    order = np.lexsort((docids, -scores))[:k]
    return docids[order].astype(np.int64), scores[order].astype(np.float64)
