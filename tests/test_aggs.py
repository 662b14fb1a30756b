"""top_hits / collapse / percentiles aggregations + span_near proximity:
engine vs pure-Python brute force on one small mixed-meta corpus, plus
segmentation invariance (results identical at different docs_per_spec).
"""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datamart_ray.analyzer import Analyzer
from datamart_ray.index.build import IndexConfig, build_index
from datamart_ray.search.engine import SearchEngine

N_DOCS = 400
QUERY = "red blue"
SPAN_A, SPAN_B = "red", "blue"


@pytest.fixture(scope="module")
def agg_corpus(tmp_path_factory):
    rng = np.random.default_rng(9)
    vocab = ["red", "green", "blue", "cyan", "teal", "gold"]
    langs = ["en", "fr", "de", None]
    docs = [
        " ".join(rng.choice(vocab, size=int(rng.integers(2, 25))))
        for _ in range(N_DOCS)
    ]
    doc_langs = [langs[int(rng.integers(0, 4))] for _ in range(N_DOCS)]
    vals = [int(rng.integers(0, 10_000)) for _ in range(N_DOCS)]
    path = str(tmp_path_factory.mktemp("aggc") / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(N_DOCS), type=pa.int64()),
                "text": pa.array(docs),
                "lang": pa.array(doc_langs, type=pa.string()),
                "val": pa.array(vals, type=pa.int64()),
            }
        ),
        path,
    )
    return path, docs, doc_langs, vals


def _build(path, idx, **kw):
    cfg = IndexConfig(
        analyzer=Analyzer(),
        content_col="text",
        id_col="doc_id",
        meta_cols=("lang", "val"),
        **kw,
    )
    build_index(path, idx, cfg)
    return SearchEngine(idx, lazy=False, filter_cols=("lang", "val"))


def _brute_and_scores(docs, query):
    """(doc_id -> exact BM25 score) of every AND-matching doc."""
    an = Analyzer()
    toks = [an.tokenize(d) for d in docs]
    n = len(docs)
    dl = [len(t) for t in toks]
    avgdl = sum(dl) / n
    qts = list(dict.fromkeys(an.tokenize(query)))
    df = {q: sum(1 for t in toks if q in t) for q in qts}
    out = {}
    for i, t in enumerate(toks):
        if not all(q in t for q in qts):
            continue
        s = 0.0
        for q in qts:  # query order == engine accumulation order
            tf = t.count(q)
            idf = math.log1p((n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl[i] / avgdl))
        out[i] = s
    return out


def test_grouped_top_hits_matches_brute(ray_session, agg_corpus, tmp_path):
    path, docs, doc_langs, _ = agg_corpus
    eng = _build(path, str(tmp_path / "idx"), docs_per_spec=64)
    scores = _brute_and_scores(docs, QUERY)
    per_group = 3
    groups = {}
    for i, s in scores.items():
        groups.setdefault(doc_langs[i], []).append((-s, i))
    exp = []
    for g in sorted((k for k in groups if k is not None)) + (
        [None] if None in groups else []
    ):
        for negs, i in sorted(groups[g])[:per_group]:
            exp.append((g, i, round(-negs, 6)))
    got = [
        (r.lang if isinstance(r.lang, str) else None, int(r.doc_id),
         round(r.score, 6))
        for r in eng.grouped_top_hits(QUERY, "lang", per_group=per_group)
        .to_pandas()
        .itertuples()
    ]
    assert got == exp


def test_collapse_search_matches_brute(ray_session, agg_corpus, tmp_path):
    path, docs, doc_langs, _ = agg_corpus
    eng = _build(path, str(tmp_path / "cidx"), docs_per_spec=64)
    scores = _brute_and_scores(docs, QUERY)
    best = {}
    for i, s in scores.items():
        cur = best.get(doc_langs[i])
        if cur is None or (-s, i) < cur:
            best[doc_langs[i]] = (-s, i)
    exp = sorted(best.values())[:3]
    exp = [(i, round(-negs, 6)) for negs, i in exp]
    t = eng.collapse_search(QUERY, "lang", k=3).to_pandas()
    got = [(int(r.doc_id), round(r.score, 6)) for r in t.itertuples()]
    assert got == exp
    # one row per distinct collapse key, winner's key attached
    assert t["lang"].map(lambda v: v if isinstance(v, str) else None).tolist() == [
        doc_langs[i] for i, _ in exp
    ]


def test_matched_percentiles_exact(ray_session, agg_corpus, tmp_path):
    path, docs, _, vals = agg_corpus
    eng = _build(path, str(tmp_path / "pidx"), docs_per_spec=64)
    scores = _brute_and_scores(docs, QUERY)
    matched_vals = np.array([vals[i] for i in scores], dtype=np.float64)
    qs = (0.25, 0.5, 0.75, 0.95)
    exp = np.quantile(matched_vals, qs, method="linear")
    got = eng.matched_percentiles(QUERY, "val", qs).to_pandas()
    assert np.allclose(got["value"].to_numpy(), exp, rtol=0, atol=0)
    assert got["pct"].tolist() == list(qs)


def _brute_span(docs, a, b, slop, k):
    an = Analyzer()
    toks = [an.tokenize(d) for d in docs]
    n = len(docs)
    dl = [len(t) for t in toks]
    avgdl = sum(dl) / n
    ptfs = {}
    for i, t in enumerate(toks):
        pa_ = [j for j, x in enumerate(t) if x == a]
        pb_ = [j for j, x in enumerate(t) if x == b]
        c = sum(1 for x in pa_ for y in pb_ if abs(x - y) <= slop + 1)
        if c:
            ptfs[i] = c
    df = len(ptfs)
    idf = math.log1p((n - df + 0.5) / (df + 0.5))
    scored = sorted(
        (
            (idf * c * 2.2 / (c + 1.2 * (1 - 0.75 + 0.75 * dl[i] / avgdl)), i)
            for i, c in ptfs.items()
        ),
        key=lambda x: (-x[0], x[1]),
    )[:k]
    return [(i, round(s, 6)) for s, i in scored]


def test_span_near_matches_brute_force(ray_session, agg_corpus, tmp_path):
    path, docs, _, _ = agg_corpus
    cfg = IndexConfig(
        analyzer=Analyzer(),
        content_col="text",
        id_col="doc_id",
        meta_cols=(),
        positions=True,
        docs_per_spec=64,
    )
    build_index(path, str(tmp_path / "sidx"), cfg)
    eng = SearchEngine(str(tmp_path / "sidx"), lazy=False)
    for slop in (0, 1, 3):
        got = [
            (int(r.doc_id), round(r.score, 6))
            for r in eng.span_near_search(
                f"{SPAN_A} {SPAN_B}", slop=slop, k=15
            )
            .to_pandas()
            .itertuples()
        ]
        exp = _brute_span(docs, SPAN_A, SPAN_B, slop, 15)
        assert got == exp, slop


def test_span_near_segmentation_invariance(ray_session, agg_corpus, tmp_path):
    path, docs, _, _ = agg_corpus
    outs = []
    for name, dps in (("s1", 37), ("s2", 600)):
        cfg = IndexConfig(
            analyzer=Analyzer(),
            content_col="text",
            id_col="doc_id",
            meta_cols=(),
            positions=True,
            docs_per_spec=dps,
        )
        build_index(path, str(tmp_path / name), cfg)
        eng = SearchEngine(str(tmp_path / name), lazy=False)
        outs.append(
            eng.span_near_search(f"{SPAN_A} {SPAN_B}", slop=2, k=25)
            .to_pandas()
        )
    assert outs[0].equals(outs[1])


def test_span_near_rejects_non_pair(ray_session, agg_corpus, tmp_path):
    path, _, _, _ = agg_corpus
    cfg = IndexConfig(
        analyzer=Analyzer(),
        content_col="text",
        id_col="doc_id",
        meta_cols=(),
        positions=True,
    )
    build_index(path, str(tmp_path / "ridx"), cfg)
    eng = SearchEngine(str(tmp_path / "ridx"))
    with pytest.raises(ValueError, match="two distinct"):
        eng.span_near_search("red red", slop=1)
    with pytest.raises(ValueError, match="two distinct"):
        eng.span_near_search("red blue gold", slop=1)


def test_sort_by_field_descending_string(ray_session, agg_corpus, tmp_path):
    """Regression: descending sort on a STRING docmeta column (numpy's
    sign*vals trick yields '' per element on object arrays — silent
    doc_id-order results)."""
    path, docs, doc_langs, _ = agg_corpus
    eng = _build(path, str(tmp_path / "soidx"), docs_per_spec=64)
    scores = _brute_and_scores(docs, QUERY)
    t = eng.sort_by_field(QUERY, "lang", k=10, descending=True).to_pandas()
    # expected: lang desc, doc_id asc, nulls last
    non_null = [(doc_langs[i], i) for i in scores if doc_langs[i] is not None]
    non_null.sort(key=lambda x: x[1])
    non_null.sort(key=lambda x: x[0], reverse=True)
    want = non_null[:10]
    got = [
        (r.lang, int(r.doc_id))
        for r in t.itertuples()
        if isinstance(r.lang, str)
    ]
    assert got == want[: len(got)]
    assert t["lang"].iloc[0] == max(v for v, _ in non_null)


def test_grouped_top_hits_numeric_null_one_bucket(ray_session, tmp_path):
    """Regression: numeric group keys with NULLs must form ONE missing
    bucket (NaN != NaN would split every null row into its own group)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 40
    texts = ["red blue"] * n
    vals = [None if i % 2 else 7 for i in range(n)]
    path = str(tmp_path / "nn.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), type=pa.int64()),
                "text": pa.array(texts),
                "val": pa.array(vals, type=pa.int64()),
            }
        ),
        path,
    )
    cfg = IndexConfig(
        analyzer=Analyzer(), content_col="text", id_col="doc_id",
        meta_cols=("val",), docs_per_spec=16,
    )
    build_index(path, str(tmp_path / "nnidx"), cfg)
    eng = SearchEngine(
        str(tmp_path / "nnidx"), filter_cols=("val",), lazy=False
    )
    t = eng.grouped_top_hits("red blue", "val", per_group=2).to_pandas()
    # exactly 2 winners for val=7 and 2 for the single null bucket
    assert len(t) == 4
    collapsed = eng.collapse_search("red blue", "val", k=10).to_pandas()
    assert len(collapsed) == 2  # one winner per group incl. missing


def test_suggest_phrase_uncorrectable_token_empty(ray_session, agg_corpus, tmp_path):
    """Regression: a token with no in-budget correction must yield an
    EMPTY suggestion set (the SQL twin's cross product is empty), not a
    fabricated echo-the-typo candidate."""
    path, _, _, _ = agg_corpus
    eng = _build(path, str(tmp_path / "spidx"), docs_per_spec=64)
    t = eng.suggest_phrase("qqqqqqqqqq red", max_edits=2)
    assert t.num_rows == 0
    # and a fully correctable phrase still suggests
    assert eng.suggest_phrase("redd bluu", max_edits=2).num_rows > 0


def test_alias_rejects_overlapping_docids(ray_session, agg_corpus, tmp_path):
    """Alias contract: two indices over the same (default, dense) docID
    space must be refused, not silently double-counted."""
    path, _, _, _ = agg_corpus
    a = _build(path, str(tmp_path / "al_a"), docs_per_spec=64)
    b = _build(path, str(tmp_path / "al_b"), docs_per_spec=200)
    del a, b
    with pytest.raises(ValueError, match="docID-disjoint"):
        SearchEngine([str(tmp_path / "al_a"), str(tmp_path / "al_b")])


def test_distributed_aggs_match_inprocess(ray_session, agg_corpus, tmp_path):
    """top_hits / extended_stats / histogram through the scorer-actor
    pool equal the in-process engine at any actor count."""
    from datamart_ray.search.engine import DistributedSearchEngine

    path, _, _, _ = agg_corpus
    eng = _build(path, str(tmp_path / "daidx"), docs_per_spec=40)
    deng = DistributedSearchEngine(
        str(tmp_path / "daidx"), max_actors=3,
        filter_cols=("lang", "val"),
    )
    try:
        a = eng.grouped_top_hits(QUERY, "lang", per_group=2).to_pandas()
        b = deng.grouped_top_hits(QUERY, "lang", per_group=2).to_pandas()
        assert a.equals(b)
        a = eng.matched_extended_stats(QUERY, "val").to_pandas()
        b = deng.matched_extended_stats(QUERY, "val").to_pandas()
        assert a.equals(b)
        a = eng.matched_histogram(QUERY, "val", 500).to_pandas()
        b = deng.matched_histogram(QUERY, "val", 500).to_pandas()
        assert a.equals(b)
    finally:
        deng.shutdown()


def test_range_agg_matches_brute(ray_session, agg_corpus, tmp_path):
    """range agg buckets = brute-force bucket membership over the exact
    AND match set; empty ranges kept with n=0/avg NULL."""
    path, docs, _, vals = agg_corpus
    eng = _build(path, str(tmp_path / "raidx"), docs_per_spec=60)
    edges = ((None, 2000), (2000, 6000), (6000, None), (20_000, None))
    got = eng.matched_range_agg(QUERY, "val", edges).to_pandas()
    matches = _brute_and_scores(docs, QUERY)
    mv = [vals[i] for i in matches]
    for row, (lo, hi) in zip(got.itertuples(index=False), edges):
        sel = [
            v
            for v in mv
            if (lo is None or v >= lo) and (hi is None or v < hi)
        ]
        assert row.n == len(sel)
        if sel:
            assert row.avg == pytest.approx(sum(sel) / len(sel))
        else:
            assert np.isnan(row.avg)


def test_composite_agg_pagination_walks_all_buckets(
    ray_session, agg_corpus, tmp_path
):
    """after-key pages tile the full key-ordered bucket list without
    overlap or gaps, and bucket counts match a brute groupby (null
    keys excluded via a terms filter, so the cursor compare is total)."""
    path, docs, doc_langs, vals = agg_corpus
    eng = _build(path, str(tmp_path / "caidx"), docs_per_spec=60)
    flt = {"lang": ["en", "fr", "de"]}
    matches = _brute_and_scores(docs, QUERY)
    brute: dict = {}
    for i in matches:
        if doc_langs[i] is None:
            continue
        key = (doc_langs[i], vals[i])
        brute[key] = brute.get(key, 0) + 1
    seen, after = [], None
    while True:
        t = eng.matched_composite(
            QUERY, ("lang", "val"), 3, after=after, filters=flt
        )
        if t.num_rows == 0:
            break
        assert t.num_rows <= 3
        seen.extend(
            zip(
                t["lang"].to_pylist(),
                t["val"].to_pylist(),
                t["n"].to_pylist(),
            )
        )
        after = (t["lang"][-1].as_py(), t["val"][-1].as_py())
    assert {(a, b): n for a, b, n in seen} == brute
    assert [(a, b) for a, b, _ in seen] == sorted(brute)


def test_adjacency_matrix_counts(ray_session, agg_corpus, tmp_path):
    path, docs, _, _ = agg_corpus
    eng = _build(path, str(tmp_path / "adidx"), docs_per_spec=60)
    named = (("r", "red"), ("b", "blue"), ("g", "gold"))
    got = dict(
        zip(
            eng.adjacency_matrix(named)["bucket"].to_pylist(),
            eng.adjacency_matrix(named)["n"].to_pylist(),
        )
    )
    an = Analyzer()
    toks = [set(an.tokenize(d)) for d in docs]
    sets = {n: {i for i, t in enumerate(toks) if q in t} for n, q in named}
    for n1, _ in named:
        assert got.get(n1, 0) == len(sets[n1])
    for a, b in (("r", "b"), ("r", "g"), ("b", "g")):
        assert got.get(f"{a}&{b}", 0) == len(sets[a] & sets[b])


def test_weighted_avg_exact(ray_session, agg_corpus, tmp_path):
    """Σ(v·w)/Σw with w = doclen over the exact AND match set."""
    path, docs, _, vals = agg_corpus
    eng = _build(path, str(tmp_path / "waidx"), docs_per_spec=60)
    got = eng.matched_weighted_avg(QUERY, "val").to_pandas()
    an = Analyzer()
    matches = _brute_and_scores(docs, QUERY)
    svw = sum(vals[i] * len(an.tokenize(docs[i])) for i in matches)
    sw = sum(len(an.tokenize(docs[i])) for i in matches)
    assert int(got["n"][0]) == len(matches)
    assert got["weighted_avg"][0] == pytest.approx(svw / sw)


def test_scroll_pages_tile_full_ranking(ray_session, agg_corpus, tmp_path):
    """scroll pages 0..2 concatenated == top-3·size of the ranking."""
    path, _, _, _ = agg_corpus
    eng = _build(path, str(tmp_path / "scidx"), docs_per_spec=60)
    size = 7
    full = eng.search(QUERY, k=3 * size).to_pandas()
    parts = [
        eng.scroll_page(QUERY, size, p).to_pandas() for p in range(3)
    ]
    import pandas as pd

    tiled = pd.concat(parts, ignore_index=True)
    assert tiled.equals(full.iloc[: len(tiled)].reset_index(drop=True))


def test_matrix_stats_matches_numpy(ray_session, agg_corpus, tmp_path):
    path, docs, _, vals = agg_corpus
    eng = _build(path, str(tmp_path / "msidx"), docs_per_spec=60)
    got = eng.matrix_stats("val").to_pandas()
    an = Analyzer()
    x = np.array(vals, dtype=np.float64)
    y = np.array([len(an.tokenize(d)) for d in docs], dtype=np.float64)
    assert int(got["n"][0]) == len(docs)
    assert got["mean"][0] == pytest.approx(x.mean())
    assert got["mean"][1] == pytest.approx(y.mean())
    assert got["variance"][0] == pytest.approx(x.var())
    assert got["covariance"][0] == pytest.approx(
        ((x - x.mean()) * (y - y.mean())).mean()
    )
    assert got["correlation"][0] == pytest.approx(np.corrcoef(x, y)[0, 1])


def test_distributed_range_agg_matches_inprocess(
    ray_session, agg_corpus, tmp_path
):
    from datamart_ray.search.engine import DistributedSearchEngine

    path, _, _, _ = agg_corpus
    eng = _build(path, str(tmp_path / "dridx"), docs_per_spec=40)
    deng = DistributedSearchEngine(
        str(tmp_path / "dridx"), max_actors=3,
        filter_cols=("lang", "val"),
    )
    edges = ((None, 3000), (3000, 7000), (7000, None))
    try:
        a = eng.matched_range_agg(QUERY, "val", edges).to_pandas()
        b = deng.matched_range_agg(QUERY, "val", edges).to_pandas()
        assert a.equals(b)
    finally:
        deng.shutdown()


def test_percentile_ranks_exact(ray_session, agg_corpus, tmp_path):
    path, docs, _, vals = agg_corpus
    eng = _build(path, str(tmp_path / "pridx"), docs_per_spec=60)
    probes = (0, 2500, 5000, 9999)
    got = eng.matched_percentile_ranks(QUERY, "val", probes).to_pandas()
    matches = _brute_and_scores(docs, QUERY)
    mv = sorted(vals[i] for i in matches)
    for row, p in zip(got.itertuples(index=False), probes):
        want = 100.0 * sum(1 for v in mv if v <= p) / len(mv)
        assert row.rank_pct == pytest.approx(want)


def test_facet_counts_approx_error_bound(ray_session, agg_corpus, tmp_path):
    """ES shard-approximation semantics: with a generous shard_size the
    approx facet equals the exact one with all error bounds 0; with a
    truncating shard_size every approx count underestimates by at most
    its doc_count_error_upper_bound."""
    from datamart_ray.search.engine import DistributedSearchEngine

    path, _, _, _ = agg_corpus
    _build(path, str(tmp_path / "faidx"), docs_per_spec=40)
    deng = DistributedSearchEngine(
        str(tmp_path / "faidx"), max_actors=3,
        filter_cols=("lang", "val"),
    )
    try:
        exact = deng.facet_counts(QUERY, "lang").to_pandas()
        generous = deng.facet_counts_approx(
            QUERY, "lang", size=len(exact), shard_size=100
        ).to_pandas()
        assert generous["doc_count_error_upper_bound"].eq(0).all()
        assert generous["lang"].fillna("~").tolist() == exact[
            "lang"
        ].fillna("~").tolist()
        assert generous["n"].tolist() == exact["n"].tolist()

        tight = deng.facet_counts_approx(
            QUERY, "lang", size=2, shard_size=1
        ).to_pandas()
        truth = dict(
            zip(exact["lang"].fillna("~"), exact["n"])
        )
        for r in tight.itertuples(index=False):
            key = r.lang if isinstance(r.lang, str) else "~"
            assert r.n <= truth[key]
            assert truth[key] <= r.n + r.doc_count_error_upper_bound
    finally:
        deng.shutdown()


def test_composite_agg_null_buckets_survive_cursor(
    ray_session, agg_corpus, tmp_path
):
    """Null-keyed buckets sort last (NULLS LAST) and must remain
    reachable when paginating past a non-null after-cursor."""
    path, docs, doc_langs, vals = agg_corpus
    eng = _build(path, str(tmp_path / "cnidx"), docs_per_spec=60)
    matches = _brute_and_scores(docs, QUERY)
    brute: dict = {}
    for i in matches:
        brute[(doc_langs[i], vals[i])] = (
            brute.get((doc_langs[i], vals[i]), 0) + 1
        )
    seen, after = [], None
    while True:
        t = eng.matched_composite(QUERY, ("lang", "val"), 4, after=after)
        if t.num_rows == 0:
            break
        rows = list(
            zip(
                t["lang"].to_pylist(),
                t["val"].to_pylist(),
                t["n"].to_pylist(),
            )
        )
        seen.extend(rows)
        last = rows[-1]
        if last[0] is None and after is not None and after[0] is None \
                and (last[1] == after[1]):
            break  # safety: no progress
        after = (last[0], last[1])
    assert {(a, b): n for a, b, n in seen} == brute
    # null-lang buckets actually paged through (corpus has None langs)
    assert any(a is None for a, _, _ in seen)
