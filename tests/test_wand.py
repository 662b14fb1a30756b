"""Block-max pruned OR scoring must be rank-identical to exhaustive."""

import numpy as np
import pytest

from datamart_ray.corpus import generate_corpus
from datamart_ray.index.build import IndexConfig, build_index
from datamart_ray.search.bm25 import BM25Params, bm25_idf, topk_select
from datamart_ray.search.engine import SearchEngine, _score_segment


@pytest.fixture(scope="module")
def wand_index(ray_session, tmp_path_factory):
    corpus = str(tmp_path_factory.mktemp("wand_corpus"))
    # small chunk_docs → many chunks per term → pruning actually engages
    generate_corpus(corpus, n_files=600, vocab_size=500, seed=7)
    index_dir = str(tmp_path_factory.mktemp("wand_index"))
    build_index(
        corpus, index_dir, IndexConfig(chunk_docs=32, docs_per_spec=100)
    )
    return SearchEngine(index_dir)


QUERIES = [
    "qzstopneedle qzcommonneedle",
    "qzstopneedle qzuniqueneedle",
    "qzcommonneedle qzpairneedlea qzpairneedleb",
    "qzstopneedle alachbri qzfilterneedle",
    "qzstopneedle",
    "qzuniqueneedle qzneverexists",
]


@pytest.mark.parametrize("k", [3, 10, 50])
@pytest.mark.parametrize("query", QUERIES)
def test_pruned_equals_exhaustive(wand_index, query, k):
    eng = wand_index
    terms = list(dict.fromkeys(eng.analyzer.tokenize(query)))
    idfs = {t: bm25_idf(eng.df(t), eng.n_docs, eng.params) for t in terms}
    r = eng.readers[0]
    d_ex, s_ex = _score_segment(
        r, terms, idfs, eng.avgdl, "or", None, eng.params, k=None
    )
    d_pr, s_pr = _score_segment(
        r, terms, idfs, eng.avgdl, "or", None, eng.params, k=k
    )
    top_ex = topk_select(d_ex, s_ex, k)
    top_pr = topk_select(d_pr, s_pr, k)
    assert np.array_equal(top_ex[0], top_pr[0]), query
    np.testing.assert_allclose(top_ex[1], top_pr[1], rtol=0, atol=1e-12)


def test_pruning_actually_skips_chunks(wand_index):
    """The head-term query must decode fewer chunks than exist."""
    from datamart_ray.search.wand import TermChunks, pruned_or_scores

    eng = wand_index
    r = eng.readers[0]
    terms = ["qzstopneedle", "qzcommonneedle"]
    idfs = {t: bm25_idf(eng.df(t), eng.n_docs, eng.params) for t in terms}
    tcs = {t: TermChunks(r.postings_chunks(t)) for t in terms}
    decoded = {"n": 0}
    orig = TermChunks.decode

    def counting_decode(self, keep):
        decoded["n"] += int(np.sum(keep))
        return orig(self, keep)

    TermChunks.decode = counting_decode
    try:
        pruned_or_scores(
            tcs, terms, idfs, eng.avgdl, 3, BM25Params(), r.doclen_of, None
        )
    finally:
        TermChunks.decode = orig
    total = sum(tc.n for tc in tcs.values())
    # seed term decodes fully; across both terms some chunks must be pruned
    assert decoded["n"] < total + tcs[
        max(tcs, key=lambda t: tcs[t].n)
    ].n, f"no pruning happened: {decoded['n']} vs {total}"


def test_parse_query_and_execute(wand_index):
    from datamart_ray.search.query import QueryError, execute, parse_query

    plan = parse_query(
        {"keywords": ["qzcommonneedle"], "operator": "or", "size": 5}
    )
    assert plan.keywords == "qzcommonneedle" and plan.size == 5
    t = execute(wand_index, {"keywords": "qzcommonneedle", "size": 5})
    assert t.num_rows == 5

    import pytest as _pytest

    for bad in [
        "not a dict",
        {"keywords": ""},
        {"keywords": "x", "operator": "xor"},
        {"keywords": "x", "bogus": 1},
        {"keywords": "x", "size": -1},
        {"keywords": "x", "filters": {"lang": 3}},
    ]:
        with _pytest.raises(QueryError):
            parse_query(bad)


def test_and_mode_skips_chunks(wand_index):
    """Conjunction of rare+frequent must not decode all frequent chunks."""
    import numpy as np

    from datamart_ray.search import wand as wand_mod

    eng = wand_index
    decoded = {"n": 0}
    orig = wand_mod.TermChunks.decode

    def counting(self, keep):
        decoded["n"] += int(np.sum(keep))
        return orig(self, keep)

    wand_mod.TermChunks.decode = counting
    try:
        t = eng.search("qzuniqueneedle qzstopneedle", k=10, mode="and")
    finally:
        wand_mod.TermChunks.decode = orig
    assert t.num_rows == 1
    r = eng.readers[0]
    total_stop_chunks = wand_mod.TermChunks(
        r.postings_chunks("qzstopneedle")
    ).n
    # rare term decodes fully (1 chunk); stop term must decode ≤ 2 chunks
    assert decoded["n"] <= 3, (decoded["n"], total_stop_chunks)
    assert total_stop_chunks > 5
