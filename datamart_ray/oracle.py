"""Exhaustive-scoring pure-Python BM25 oracle (the golden reference).

The analog of the reference's golden-metadata tests
(reference tests/test_profile.py style): a ~150-line, obviously-correct,
single-process implementation of the exact semantics the Ray engine must
match — same Analyzer, same BM25 formula (k1=1.2, b=0.75), same AND/OR
semantics, same (score desc, docID asc) tie-break, same top-k=50 default.

Used only in tests and for query-set golden generation; never in the data
path. The engine must be rank-identical with scores within 1e-9.
"""

from __future__ import annotations

import math
from collections import Counter

from datamart_ray.analyzer import Analyzer
from datamart_ray.search.bm25 import BM25Params

TOP_K_SIZE = 50  # reference: apiserver/apiserver/search/base.py:1


class PyBM25Oracle:
    def __init__(
        self,
        docs: list[tuple[int, str]],
        analyzer: Analyzer | None = None,
        params: BM25Params = BM25Params(),
        doc_attrs: dict[int, dict] | None = None,
    ):
        self.analyzer = analyzer or Analyzer()
        self.params = params
        self.doc_attrs = doc_attrs or {}
        self.tf: dict[int, Counter] = {}
        self.df: Counter = Counter()
        self.dl: dict[int, int] = {}
        for docid, text in docs:
            toks = self.analyzer.tokenize(text)
            c = Counter(toks)
            self.tf[docid] = c
            self.dl[docid] = len(toks)
            for t in c:
                self.df[t] += 1
        self.n_docs = len(self.tf)
        self.avgdl = (
            sum(self.dl.values()) / self.n_docs if self.n_docs else 0.0
        )

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log1p((self.n_docs - df + 0.5) / (df + 0.5))

    def search(
        self,
        query: str,
        k: int = TOP_K_SIZE,
        mode: str = "and",
        filters: dict[str, str] | None = None,
    ) -> list[tuple[int, float]]:
        terms = list(dict.fromkeys(self.analyzer.tokenize(query)))
        if not terms:
            return []
        k1, b = self.params.k1, self.params.b
        scored = []
        for docid, c in self.tf.items():
            if filters:
                attrs = self.doc_attrs.get(docid, {})
                if any(attrs.get(col) != val for col, val in filters.items()):
                    continue
            present = [t for t in terms if c.get(t, 0) > 0]
            if mode == "and" and len(present) != len(terms):
                continue
            if not present:
                continue
            dl = self.dl[docid]
            score = 0.0
            for t in terms:  # pinned accumulation order = query-term order
                tf = c.get(t, 0)
                if tf == 0:
                    continue
                tfn = (
                    tf
                    * (k1 + 1.0)
                    / (tf + k1 * (1.0 - b + b * dl / self.avgdl))
                )
                score += self.idf(t) * tfn
            scored.append((docid, score))
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]
