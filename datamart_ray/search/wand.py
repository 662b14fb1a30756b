"""Block-max pruned top-k scoring for OR queries (BMW/MaxScore family).

The chunked posting format (index/build.py) stores per-chunk block-max
metadata (max_tf, docID range). This module uses it to skip decoding whole
chunks that provably cannot contribute a top-k document:

1. θ seeding: the term with the largest possible single-term contribution
   is scored exactly; its k-th best partial score is a valid lower bound of
   the final k-th best score (every doc's final score ≥ any partial score).
2. Chunk pruning: chunk c of term t is skipped when
       ub(c) + Σ_{t'≠t} max{ub(c') : c' of t' overlaps c's docID range} < θ
   — an upper bound on the best possible score of ANY doc inside c. Docs
   whose every chunk is pruned cannot beat θ; docs surviving in some chunk
   but pruned in another can only be under-scored below θ, which cannot
   perturb the top-k (θ only ever underestimates the true k-th score).
3. Surviving chunks are decoded and union-scored exactly as the exhaustive
   path does, preserving the pinned per-term accumulation order — results
   are rank-identical to exhaustive scoring (tested).

Chunk upper bounds use bm25_tf_norm_upper_bound with min_dl=0, which is
strictly greater than any attainable score (real docs have dl ≥ 1), so
pruning at `< θ` can never drop a true top-k member even on score ties.

All steps are vectorized over chunk-metadata arrays — no per-doc Python.
"""

from __future__ import annotations

import numpy as np

from datamart_ray.index import codec
from datamart_ray.search.bm25 import (
    BM25Params,
    bm25_tf_norm,
    bm25_tf_norm_upper_bound,
    topk_select,
)


class TermChunks:
    """Chunk metadata + lazy decode for one term."""

    def __init__(self, table):
        order = np.argsort(table["first_docid"].to_numpy(), kind="stable")
        self.first = table["first_docid"].to_numpy()[order]
        self.last = table["last_docid"].to_numpy()[order]
        self.max_tf = table["max_tf"].to_numpy()[order]
        self._docs = [table["docs"][int(i)].as_py() for i in order]
        self._tfs = [table["tfs"][int(i)].as_py() for i in order]
        self.n = len(self._docs)
        # per-chunk decode memo: a TermChunks cached by the reader (hot
        # terms) never re-decodes the same varbyte chunk twice
        self._memo: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._all: tuple[np.ndarray, np.ndarray] | None = None

    def _chunk(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        hit = self._memo.get(i)
        if hit is None:
            hit = (
                codec.decode_docids(self._docs[i]),
                codec.unpack_ints(self._tfs[i]).astype(np.int64),
            )
            self._memo[i] = hit
        return hit

    def decode(self, keep: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Decode only the chunks flagged in boolean mask `keep`."""
        idx = np.flatnonzero(keep)
        if idx.size == 0:
            e = np.empty(0, dtype=np.int64)
            return e, e
        pairs = [self._chunk(int(i)) for i in idx]
        d = [p[0] for p in pairs]
        f = [p[1] for p in pairs]
        docs = np.concatenate(d)
        tfs = np.concatenate(f)
        if docs.size > 1 and not np.all(docs[1:] > docs[:-1]):
            o = np.argsort(docs, kind="stable")
            docs, tfs = docs[o], tfs[o]
        return docs, tfs

    def decode_all(self) -> tuple[np.ndarray, np.ndarray]:
        # full-concat memo: high-df terms pay the concatenate +
        # sortedness check (and possible argsort) only once — the
        # steady-state cost of every OR query's θ seed otherwise
        # re-merges a head term's whole posting list per query
        if self._all is None:
            self._all = self.decode(np.ones(self.n, dtype=bool))
        return self._all


def _range_max_ub(tc: TermChunks, ubs: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """For each query range [a_i, b_i], max chunk ub of `tc` overlapping it.

    Chunks are docID-sorted and non-overlapping, so `first` and `last` are
    both non-decreasing: the overlapping chunks form the contiguous index
    window [searchsorted(last, a), searchsorted(first, b, 'right'))."""
    lo = np.searchsorted(tc.last, a, side="left")
    hi = np.searchsorted(tc.first, b, side="right")
    out = np.zeros(a.size, dtype=np.float64)
    nonempty = hi > lo
    if not np.any(nonempty):
        return out
    # segment max via reduceat on the flattened windows
    idx = np.flatnonzero(nonempty)
    starts = lo[idx]
    out[idx] = np.array(
        [ubs[s : e].max() for s, e in zip(starts, hi[idx])]
    )
    return out


def pruned_or_scores(
    term_chunks: dict[str, TermChunks],
    terms: list[str],
    idfs: dict[str, float],
    avgdl: float,
    k: int,
    params: BM25Params,
    doclen_of,
    allowed: np.ndarray | None = None,
    theta_memo: dict | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(docids, scores) of every doc that can reach the top-k (unsorted
    beyond that guarantee); scores are exact for all returned docs that
    belong to the true top-k.

    ``theta_memo`` (optional, engine-owned) caches the θ seed per
    (seed term, k): a reader's corpus view is immutable for the
    handle's lifetime (tombstones load at open), so the seed term's
    k-th best partial score is a constant — repeated OR queries skip
    the full-posting partial scoring pass. Only consulted when
    ``allowed`` is None (keyword filters change the reachable set)."""
    present = [t for t in terms if t in term_chunks and term_chunks[t].n]
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    if not present:
        return empty

    chunk_ub = {
        t: idfs[t]
        * np.array(
            [
                bm25_tf_norm_upper_bound(m, 0.0, avgdl, params)
                for m in term_chunks[t].max_tf
            ]
        )
        for t in present
    }
    cmax = {t: float(chunk_ub[t].max()) for t in present}

    # θ seed: exact partial scoring of the highest-impact term
    seed = max(present, key=lambda t: cmax[t])
    memo_key = (seed, k)
    if (
        allowed is None
        and theta_memo is not None
        and memo_key in theta_memo
    ):
        theta = theta_memo[memo_key]
    else:
        s_docs, s_tfs = term_chunks[seed].decode_all()
        if allowed is not None:
            from datamart_ray.search.engine import _isin_sorted

            keep = _isin_sorted(allowed, s_docs)
            s_docs, s_tfs = s_docs[keep], s_tfs[keep]
        theta = 0.0
        if s_docs.size:
            part = idfs[seed] * bm25_tf_norm(
                s_tfs, doclen_of(s_docs), avgdl, params
            )
            if part.size >= k:
                theta = float(
                    np.partition(-part, k - 1)[k - 1] * -1.0
                )
        if allowed is None and theta_memo is not None:
            while len(theta_memo) >= 64:
                theta_memo.pop(next(iter(theta_memo)))
            theta_memo[memo_key] = theta

    # chunk pruning
    keep_masks: dict[str, np.ndarray] = {}
    for t in present:
        tc = term_chunks[t]
        if theta <= 0.0:
            keep_masks[t] = np.ones(tc.n, dtype=bool)
            continue
        other = np.zeros(tc.n, dtype=np.float64)
        for t2 in present:
            if t2 == t:
                continue
            other += _range_max_ub(
                term_chunks[t2], chunk_ub[t2], tc.first, tc.last
            )
        keep_masks[t] = (chunk_ub[t] + other) >= theta

    # MaxScore term partition: walk terms by ascending cmax; a prefix
    # whose cumulative cmax stays < θ is NON-ESSENTIAL — a doc appearing
    # only in non-essential terms is bounded by that cumulative sum and
    # cannot reach the top-k, so the candidate union is built from the
    # essential terms alone (a stopword-like term's huge posting list
    # stops inflating the union; its contributions to candidate docs are
    # still added exactly below). Docs that can reach θ appear in some
    # essential term, so this drops no true top-k member.
    non_ess: set[str] = set()
    if theta > 0.0 and len(present) > 1:
        cum = 0.0
        for t in sorted(present, key=lambda t: cmax[t]):
            if cum + cmax[t] < theta and len(non_ess) < len(present) - 1:
                cum += cmax[t]
                non_ess.add(t)
            else:
                break
    essential = [t for t in present if t not in non_ess]

    # exact union scoring over surviving chunks (pinned term order)
    post = {t: term_chunks[t].decode(keep_masks[t]) for t in present}
    all_docs = np.unique(
        np.concatenate([post[t][0] for t in essential if post[t][0].size])
    ) if any(post[t][0].size for t in essential) else np.empty(0, dtype=np.int64)
    if allowed is not None and all_docs.size:
        from datamart_ray.search.engine import _isin_sorted

        all_docs = all_docs[_isin_sorted(allowed, all_docs)]
    if all_docs.size == 0:
        return empty
    dl_all = doclen_of(all_docs)
    scores = np.zeros(all_docs.size, dtype=np.float64)
    from datamart_ray.search.engine import _isin_sorted

    for t in terms:
        if t not in post:
            continue
        p_doc, p_tf = post[t]
        if p_doc.size == 0:
            continue
        keep = _isin_sorted(all_docs, p_doc)
        pos = np.searchsorted(all_docs, p_doc[keep])
        scores[pos] += idfs[t] * bm25_tf_norm(
            p_tf[keep], dl_all[pos], avgdl, params
        )
    hit = scores > 0.0
    return all_docs[hit], scores[hit]
