"""Positional postings + phrase search (IndexConfig.positions).

Covers: the grouped varbyte position codec, Analyzer.term_positions
consistency with term_frequencies, end-to-end phrase scoring vs a pure
Python brute force, parallelism invariance of the positional build, and
the full maintenance lifecycle (delta ingest → delete → compact, both
streaming-strip and rechunk paths) on a positional index.
"""

import math
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datamart_ray.analyzer import Analyzer
from datamart_ray.index import codec
from datamart_ray.index.build import IndexConfig, build_index
from datamart_ray.search.engine import SearchEngine


def _encode_groups(groups):
    deltas, counts = [], []
    for g in groups:
        g = np.asarray(g, dtype=np.int64)
        counts.append(g.size)
        if g.size:
            d = g.copy()
            d[1:] = np.diff(g)
            deltas.append(d)
    flat = np.concatenate(deltas) if deltas else np.empty(0, np.int64)
    offsets = np.concatenate(([0], np.cumsum(counts)))
    return flat, offsets, np.asarray(counts)


def test_grouped_position_codec_roundtrip():
    rng = np.random.default_rng(3)
    groups = []
    for _ in range(500):
        c = int(rng.integers(0, 7))
        groups.append(
            np.sort(rng.choice(100_000, size=c, replace=False))
            if c
            else np.empty(0, np.int64)
        )
    deltas, offsets, counts = _encode_groups(groups)
    arr = codec.varbyte_encode_grouped(deltas, offsets)
    # chunk-level blob = concatenation of per-group streams
    blob = b"".join(arr.to_pylist())
    back = codec.decode_grouped_positions(blob, counts)
    assert np.array_equal(back, np.concatenate([g for g in groups]))
    # per-cell decode agrees with per-group slices
    for i, g in enumerate(groups):
        got = codec.decode_grouped_positions(
            arr[i].as_py(), counts[i : i + 1]
        )
        assert np.array_equal(got, g)


def test_term_positions_matches_term_frequencies_and_python():
    an = Analyzer()
    texts = [
        "The cat sat, the cat ran!",
        None,
        "",
        "a b a b a",
        "Zz zz 9 zz  zz",
    ]
    tbl, dl = an.term_positions(pa.array(texts, type=pa.string()))
    tf_tbl, dl2 = an.term_frequencies(pa.array(texts, type=pa.string()))
    assert np.array_equal(dl, dl2)
    x = (
        tbl.to_pandas()[["row_idx", "term", "tf"]]
        .sort_values(["row_idx", "term"])
        .reset_index(drop=True)
    )
    y = tf_tbl.to_pandas().sort_values(["row_idx", "term"]).reset_index(
        drop=True
    )
    y["tf"] = y["tf"].astype("int64")
    assert x.equals(y)
    # positions equal the Python tokenizer's indices
    want = {}
    for i, s in enumerate(texts):
        for j, t in enumerate(an.tokenize(s or "")):
            want.setdefault((i, t), []).append(j)
    for row in tbl.to_pylist():
        got = codec.decode_grouped_positions(
            row["pos"], np.array([row["tf"]])
        ).tolist()
        assert got == want[(row["row_idx"], row["term"])]


@pytest.fixture(scope="module")
def phrase_corpus(tmp_path_factory):
    rng = np.random.default_rng(11)
    vocab = [
        "alpha", "beta", "gamma", "delta", "eps",
        "zeta", "window", "hash", "join",
    ]
    docs = [
        " ".join(rng.choice(vocab, size=int(rng.integers(3, 40))))
        for _ in range(600)
    ]
    path = str(tmp_path_factory.mktemp("pcorp") / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), type=pa.int64()),
                "text": pa.array(docs),
            }
        ),
        path,
    )
    return path, docs


def _brute_phrase(docs, terms, k, n_total=None):
    an = Analyzer()
    toks = [an.tokenize(d) for d in docs]
    dl = np.array([len(x) for x in toks], float)
    n = n_total if n_total is not None else len(docs)
    avgdl = dl.sum() / n if n else 0.0
    m = len(terms)
    ptfs = {}
    for i, ts in enumerate(toks):
        c = sum(
            1
            for j in range(len(ts) - m + 1)
            if all(ts[j + s] == terms[s] for s in range(m))
        )
        if c:
            ptfs[i] = c
    df = len(ptfs)
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    scored = sorted(
        (
            (
                idf
                * c
                * 2.2
                / (c + 1.2 * (1 - 0.75 + 0.75 * dl[i] / avgdl)),
                i,
            )
            for i, c in ptfs.items()
        ),
        key=lambda x: (-x[0], x[1]),
    )[:k]
    return [(i, round(s, 6)) for s, i in scored]


def _build(path, idx, **kw):
    shutil.rmtree(idx, ignore_errors=True)
    cfg = IndexConfig(
        analyzer=Analyzer(),
        content_col="text",
        id_col="doc_id",
        meta_cols=(),
        positions=True,
        **kw,
    )
    build_index(path, idx, cfg)
    return SearchEngine(idx, lazy=False)


def test_phrase_search_matches_brute_force(ray_session, phrase_corpus, tmp_path):
    path, docs = phrase_corpus
    eng = _build(path, str(tmp_path / "idx"), docs_per_spec=64)
    for phrase in ["window hash", "alpha beta gamma", "gamma", "zeta zeta"]:
        got = [
            (int(r.doc_id), round(r.score, 6))
            for r in eng.phrase_search(phrase, k=12).to_pandas().itertuples()
        ]
        exp = _brute_phrase(docs, Analyzer().tokenize(phrase), 12)
        assert got == exp, phrase
    # no-match phrase → empty
    assert eng.phrase_search("alpha alpha alpha alpha alpha alpha alpha",
                             k=5).num_rows in (0, 1, 2)


def test_phrase_parallelism_invariance(ray_session, phrase_corpus, tmp_path):
    path, docs = phrase_corpus
    a = _build(path, str(tmp_path / "ia"), docs_per_spec=37, num_buckets=3)
    b = _build(path, str(tmp_path / "ib"), docs_per_spec=600, shuffle="sort")
    for phrase in ["window hash", "beta gamma"]:
        ta = a.phrase_search(phrase, k=20).to_pandas()
        tb = b.phrase_search(phrase, k=20).to_pandas()
        assert ta.equals(tb), phrase


def test_positions_refuses_salting():
    with pytest.raises(ValueError, match="salt_window"):
        IndexConfig(positions=True, salt_window=1000)


def test_phrase_lifecycle_delta_delete_compact(
    ray_session, phrase_corpus, tmp_path
):
    from datamart_ray.index.maintain import (
        compact_segments,
        delete_docs,
        ingest_delta,
    )

    path, docs = phrase_corpus
    half = len(docs) // 2
    p1 = str(tmp_path / "part1.parquet")
    p2 = str(tmp_path / "part2.parquet")
    t = pq.read_table(path)
    pq.write_table(t.slice(0, half), p1)
    pq.write_table(t.slice(half), p2)
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(
        analyzer=Analyzer(),
        content_col="text",
        id_col="doc_id",
        meta_cols=(),
        positions=True,
    )
    build_index(p1, idx, cfg)
    ingest_delta(idx, p2)
    eng = SearchEngine(idx, lazy=False)
    got = [
        (int(r.doc_id), round(r.score, 6))
        for r in eng.phrase_search("window hash", k=10)
        .to_pandas()
        .itertuples()
    ]
    exp = _brute_phrase(docs, ["window", "hash"], 10)
    assert got == exp

    # delete the current top hit, compact, re-query: its doc disappears
    victim = got[0][0]
    delete_docs(idx, [victim])
    compact_segments(idx)
    eng2 = SearchEngine(idx, lazy=False)
    res2 = eng2.phrase_search("window hash", k=10).to_pandas()
    assert victim not in set(res2["doc_id"].tolist())
    keep = [i for i in range(len(docs)) if i != victim]
    exp2 = _brute_phrase(
        [docs[i] for i in keep], ["window", "hash"], 10
    )
    # brute force re-indexes densely — map back through `keep`
    exp2 = [(keep[i], s) for i, s in exp2]
    got2 = [
        (int(r.doc_id), round(r.score, 6))
        for r in res2.itertuples()
    ]
    assert got2 == exp2

    # rechunk path preserves positions too
    compact_segments(idx, rechunk=True)
    eng3 = SearchEngine(idx, lazy=False)
    assert eng3.phrase_search("window hash", k=10).to_pandas().equals(res2)


def test_fuzzy_search_matches_brute_force(ray_session, phrase_corpus, tmp_path):
    """fuzzy_search (edit-distance expansion over the term dictionary)
    equals a brute-force OR-BM25 over the same expansion set."""
    from datamart_ray.pipelines.matching import levenshtein

    path, docs = phrase_corpus
    eng = _build(path, str(tmp_path / "fidx"), docs_per_spec=64)
    an = Analyzer()
    toks = [an.tokenize(d) for d in docs]
    vocab = sorted({t for ts in toks for t in ts})
    for query in ["alpa windoq", "hashh", "qqqqqq"]:
        qts = list(dict.fromkeys(an.tokenize(query)))
        exp_terms = sorted(
            {v for q in qts for v in vocab if levenshtein(q, v) <= 1}
        )
        got = [
            (int(r.doc_id), round(r.score, 6))
            for r in eng.fuzzy_search(query, k=15, max_edits=1)
            .to_pandas()
            .itertuples()
        ]
        # brute force OR-BM25 over exp_terms
        n = len(docs)
        dl = np.array([len(x) for x in toks], float)
        avgdl = dl.mean()
        scores = {}
        for t in exp_terms:
            df = sum(t in ts for ts in toks)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            for i, ts in enumerate(toks):
                c = ts.count(t)
                if c:
                    scores[i] = scores.get(i, 0.0) + idf * c * 2.2 / (
                        c + 1.2 * (1 - 0.75 + 0.75 * dl[i] / avgdl)
                    )
        exp = [
            (i, round(s, 6))
            for s, i in sorted(
                ((s, i) for i, s in scores.items()),
                key=lambda x: (-x[0], x[1]),
            )[:15]
        ]
        assert got == exp, query


def test_prefix_search_matches_brute_force(ray_session, phrase_corpus, tmp_path):
    path, docs = phrase_corpus
    eng = _build(path, str(tmp_path / "pidx"), docs_per_spec=64)
    an = Analyzer()
    toks = [an.tokenize(d) for d in docs]
    vocab = sorted({t for ts in toks for t in ts})
    for query in ["ga", "z", "al be", "qq"]:
        qts = list(dict.fromkeys(an.tokenize(query)))
        exp_terms = sorted(
            {v for q in qts for v in vocab if v.startswith(q)}
        )
        got = [
            (int(r.doc_id), round(r.score, 6))
            for r in eng.prefix_search(query, k=15)
            .to_pandas()
            .itertuples()
        ]
        n = len(docs)
        dl = np.array([len(x) for x in toks], float)
        avgdl = dl.mean()
        scores = {}
        for t in exp_terms:
            df = sum(t in ts for ts in toks)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            for i, ts in enumerate(toks):
                c = ts.count(t)
                if c:
                    scores[i] = scores.get(i, 0.0) + idf * c * 2.2 / (
                        c + 1.2 * (1 - 0.75 + 0.75 * dl[i] / avgdl)
                    )
        exp = [
            (i, round(s, 6))
            for s, i in sorted(
                ((s, i) for i, s in scores.items()),
                key=lambda x: (-x[0], x[1]),
            )[:15]
        ]
        assert got == exp, query


def test_distributed_phrase_rank_identical(ray_session, phrase_corpus, tmp_path):
    """Two-round distributed phrase == in-process phrase at several actor
    counts (incl. a no-match phrase, which must drain the actor cache)."""
    from datamart_ray.search.engine import DistributedSearchEngine

    path, docs = phrase_corpus
    idx = str(tmp_path / "didx")
    _build(path, idx, docs_per_spec=64)
    local = SearchEngine(idx, lazy=False)
    for n_actors in (1, 3):
        deng = DistributedSearchEngine(idx, lazy=False, max_actors=n_actors)
        try:
            for phrase in ["window hash", "beta gamma", "qq zz"]:
                a = local.phrase_search(phrase, k=15).to_pandas()
                b = deng.phrase_search(phrase, k=15).to_pandas()
                assert a.equals(b), (n_actors, phrase)
            # repeat query: cache must have been drained by round 2
            a = local.phrase_search("window hash", k=15).to_pandas()
            b = deng.phrase_search("window hash", k=15).to_pandas()
            assert a.equals(b)
        finally:
            deng.shutdown()


def test_facet_counts_matches_brute_force(ray_session, tmp_path):
    rng = np.random.default_rng(5)
    vocab = ["red", "green", "blue", "cyan", "teal"]
    langs = ["en", "fr", "de"]
    docs = [
        " ".join(rng.choice(vocab, size=int(rng.integers(2, 15))))
        for _ in range(400)
    ]
    doc_langs = [langs[int(rng.integers(0, 3))] for _ in range(400)]
    path = str(tmp_path / "fc.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(400), type=pa.int64()),
                "text": pa.array(docs),
                "lang": pa.array(doc_langs),
            }
        ),
        path,
    )
    idx = str(tmp_path / "fcidx")
    cfg = IndexConfig(
        analyzer=Analyzer(),
        content_col="text",
        id_col="doc_id",
        meta_cols=("lang",),
        docs_per_spec=64,
    )
    build_index(path, idx, cfg)
    eng = SearchEngine(idx, lazy=False)
    an = Analyzer()
    toks = [set(an.tokenize(d)) for d in docs]
    for query, mode in [("red blue", "and"), ("cyan teal", "or")]:
        qts = set(an.tokenize(query))
        if mode == "and":
            matched = [i for i, ts in enumerate(toks) if qts <= ts]
        else:
            matched = [i for i, ts in enumerate(toks) if qts & ts]
        want = {}
        for i in matched:
            want[doc_langs[i]] = want.get(doc_langs[i], 0) + 1
        exp = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
        got = [
            (r.lang, int(r.n))
            for r in eng.facet_counts(query, "lang", mode=mode)
            .to_pandas()
            .itertuples()
        ]
        assert got == exp, (query, mode)


def test_facet_counts_null_bucket_ties(ray_session, tmp_path):
    """A NULL facet value whose count ties a string value's count must
    sort after it (DuckDB NULLS LAST), not raise TypeError."""
    docs = ["red blue", "red blue", "red blue", "red blue"]
    path = str(tmp_path / "fn.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(4), type=pa.int64()),
                "text": pa.array(docs),
                "lang": pa.array(["en", "en", None, None]),
            }
        ),
        path,
    )
    idx = str(tmp_path / "fnidx")
    cfg = IndexConfig(
        analyzer=Analyzer(), content_col="text", id_col="doc_id",
        meta_cols=("lang",), docs_per_spec=8,
    )
    build_index(path, idx, cfg)
    eng = SearchEngine(idx, lazy=False)
    got = eng.facet_counts("red", "lang").to_pandas()
    assert got["lang"].tolist() == ["en", None]
    assert got["n"].tolist() == [2, 2]


def test_fuzzy1_includes_nonascii_terms(ray_session, tmp_path):
    """An ASCII query must still expand to non-ASCII dictionary terms one
    CHARACTER edit away (cafe ~ café): the byte-matrix fast path excludes
    them, so a DP side-band must cover them."""
    from datamart_ray.pipelines.matching import levenshtein

    an = Analyzer(token_chars="a-zé")
    docs = ["cafe menu", "café menu", "cart menu", "cafés here"]
    path = str(tmp_path / "na.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), type=pa.int64()),
                "text": pa.array(docs),
            }
        ),
        path,
    )
    idx = str(tmp_path / "naidx")
    cfg = IndexConfig(
        analyzer=an, content_col="text", id_col="doc_id",
        meta_cols=(), docs_per_spec=8,
    )
    build_index(path, idx, cfg)
    eng = SearchEngine(idx, lazy=False)
    vocab = sorted({t for d in docs for t in an.tokenize(d)})
    for q in ["cafe", "menu", "cart"]:
        fast = eng._fuzzy_candidates(q, 1)
        slow = {v for v in vocab if levenshtein(q, v) <= 1}
        assert fast == slow, (q, fast ^ slow)
    assert "café" in eng._fuzzy_candidates("cafe", 1)


def test_prefix_successor_bounds():
    from datamart_ray.search.engine import _prefix_successor

    assert _prefix_successor("s") == "t"
    assert _prefix_successor("ab") == "ac"
    # last char at the codepoint ceiling: carry into the previous char
    assert _prefix_successor("a" + chr(0x10FFFF)) == "b"
    assert _prefix_successor(chr(0x10FFFF)) is None
    # the bound must sort ABOVE a term whose next char is non-BMP and
    # above the literal q+'￿' string (both dropped by the old bound)
    vocab = np.array(sorted(["s", "s\U0001F600x", "s￿", "szzz", "t"]))
    lo = int(np.searchsorted(vocab, "s"))
    hi = int(np.searchsorted(vocab, _prefix_successor("s")))
    assert set(vocab[lo:hi]) == {"s", "s\U0001F600x", "s￿", "szzz"}


def test_fuzzy1_fast_path_differential(ray_session, tmp_path):
    """Dense random vocab over a 3-letter alphabet (many terms within one
    edit of each other): the vectorized edit-1 expansion must equal the
    Levenshtein-DP definition for every probed query."""
    from datamart_ray.pipelines.matching import levenshtein

    rng = np.random.default_rng(9)
    alpha = np.array(list("abc"))
    terms = sorted(
        {
            "".join(rng.choice(alpha, size=int(rng.integers(1, 6))))
            for _ in range(300)
        }
    )
    docs = [" ".join(rng.choice(terms, size=8)) for _ in range(120)]
    path = str(tmp_path / "dv.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), type=pa.int64()),
                "text": pa.array(docs),
            }
        ),
        path,
    )
    idx = str(tmp_path / "dvidx")
    cfg = IndexConfig(
        analyzer=Analyzer(), content_col="text", id_col="doc_id",
        meta_cols=(), docs_per_spec=32,
    )
    build_index(path, idx, cfg)
    eng = SearchEngine(idx, lazy=False)
    vocab = sorted({t for d in docs for t in d.split()})
    queries = ["a", "ab", "abc", "cba", "aabb", "ccccc", "bbbbbb", "x", "xa"]
    queries += ["".join(rng.choice(alpha, size=int(rng.integers(1, 7))))
                for _ in range(25)]
    for q in queries:
        fast = eng._fuzzy_candidates(q, 1)
        slow = {v for v in vocab if levenshtein(q, v) <= 1}
        assert fast == slow, (q, fast ^ slow)


def _slop_chain_exists(ts, terms, start, slop):
    """True when SOME in-order chain from `start` (ts[start]==terms[0])
    places terms[i+1] within slop+1 positions after terms[i] — full
    backtracking, the specification the engine must match."""

    def rec(cur, ti):
        if ti == len(terms):
            return True
        for q in range(cur + 1, cur + 2 + slop):
            if q < len(ts) and ts[q] == terms[ti] and rec(q, ti + 1):
                return True
        return False

    return rec(start, 1)


def _brute_slop(docs, toks, terms, slop, k):
    n = len(docs)
    dl = np.array([len(x) for x in toks], float)
    avgdl = dl.mean()
    ptfs = {}
    for i, ts in enumerate(toks):
        cnt = sum(
            1
            for p in range(len(ts))
            if ts[p] == terms[0]
            and _slop_chain_exists(ts, terms, p, slop)
        )
        if cnt:
            ptfs[i] = cnt
    df = len(ptfs)
    if not df:
        return []
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    scored = sorted(
        (
            (
                idf * c * 2.2
                / (c + 1.2 * (1 - 0.75 + 0.75 * dl[i] / avgdl)),
                i,
            )
            for i, c in ptfs.items()
        ),
        key=lambda x: (-x[0], x[1]),
    )[:k]
    return [(i, round(s, 6)) for s, i in scored]


def test_phrase_slop_matches_brute_force(ray_session, phrase_corpus, tmp_path):
    """Sloppy ordered phrase == brute-force EXISTS-any-chain definition
    (full backtracking oracle — a greedy-walk oracle would mask the
    3-term stranded-chain false negative)."""
    path, docs = phrase_corpus
    eng = _build(path, str(tmp_path / "sidx"), docs_per_spec=64)
    an = Analyzer()
    toks = [an.tokenize(d) for d in docs]

    for phrase, slop in [
        ("window hash", 2),
        ("window hash", 0),
        ("alpha beta gamma", 1),
        ("alpha beta gamma", 2),
        ("zeta join", 3),
        ("window hash join", 2),
    ]:
        got = [
            (int(r.doc_id), round(r.score, 6))
            for r in eng.phrase_search(phrase, k=12, slop=slop)
            .to_pandas()
            .itertuples()
        ]
        exp = _brute_slop(
            docs, toks, Analyzer().tokenize(phrase), slop, 12
        )
        assert got == exp, (phrase, slop)


def test_phrase_slop_backtracking_chain(ray_session, tmp_path):
    """Regression: doc 'a b b x c' with phrase 'a b c' slop=1 matches
    only via the SECOND b (a@0→b@2→c@4, both gaps 2 ≤ slop+1); a greedy
    forward walk takes b@1, overshoots, and wrongly drops the doc."""
    docs = [
        "aa bb bb xx cc",  # matches only by backtracking to the 2nd bb
        "aa bb cc",  # consecutive chain (sanity)
        "aa bb xx xx cc",  # no chain at slop=1 (cc is 3 past bb)
    ]
    path = str(tmp_path / "bt.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), type=pa.int64()),
                "text": pa.array(docs),
            }
        ),
        path,
    )
    eng = _build(path, str(tmp_path / "btidx"), docs_per_spec=8)
    got = eng.phrase_search("aa bb cc", k=10, slop=1).to_pandas()
    assert sorted(got["doc_id"].tolist()) == [0, 1]


# ---------------------------------------------------------------------------
# match_phrase_prefix / bool query / numeric range filters (round 3)
# ---------------------------------------------------------------------------

def _brute_phrase_prefix(docs, exact, prefix, k):
    """Brute-force match_phrase_prefix: tf = start positions where the
    exact tokens run consecutively and the next token startswith(prefix)."""
    an = Analyzer()
    toks = [an.tokenize(d) for d in docs]
    dl = np.array([len(x) for x in toks], float)
    n = len(docs)
    avgdl = dl.sum() / n if n else 0.0
    m = len(exact) + 1
    ptfs = {}
    for i, ts in enumerate(toks):
        c = sum(
            1
            for j in range(len(ts) - m + 1)
            if all(ts[j + s] == exact[s] for s in range(m - 1))
            and ts[j + m - 1].startswith(prefix)
        )
        if c:
            ptfs[i] = c
    df = len(ptfs)
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    scored = sorted(
        (
            (
                idf * c * 2.2
                / (c + 1.2 * (1 - 0.75 + 0.75 * dl[i] / avgdl)),
                i,
            )
            for i, c in ptfs.items()
        ),
        key=lambda x: (-x[0], x[1]),
    )[:k]
    return [(i, round(s, 6)) for s, i in scored]


def test_phrase_prefix_matches_brute_force(
    ray_session, phrase_corpus, tmp_path
):
    path, docs = phrase_corpus
    eng = _build(path, str(tmp_path / "ppidx"), docs_per_spec=64)
    cases = [
        ("window ha", ["window"], "ha"),     # exact + expanding prefix
        ("alpha b", ["alpha"], "b"),         # beta expansion
        ("gam", [], "gam"),                  # pure prefix (m == 1)
        ("window hash jo", ["window", "hash"], "jo"),  # 3-slot
    ]
    for phrase, exact, prefix in cases:
        got = [
            (int(r.doc_id), round(r.score, 6))
            for r in eng.phrase_prefix_search(phrase, k=12)
            .to_pandas()
            .itertuples()
        ]
        assert got == _brute_phrase_prefix(docs, exact, prefix, 12), phrase
    # prefix with no dictionary expansion → empty
    assert eng.phrase_prefix_search("window qz", k=5).num_rows == 0


def _brute_bool(docs, must, should, must_not, k):
    an = Analyzer()
    toks = [an.tokenize(d) for d in docs]
    dl = np.array([len(x) for x in toks], float)
    n = len(docs)
    avgdl = dl.sum() / n if n else 0.0
    dfs = {}
    for ts in toks:
        for t in set(ts):
            dfs[t] = dfs.get(t, 0) + 1
    score_terms = sorted(set(must) | set(should))
    out = []
    for i, ts in enumerate(toks):
        s = set(ts)
        if must and not all(t in s for t in must):
            continue
        if not must and not any(t in s for t in should):
            continue
        if any(t in s for t in must_not):
            continue
        sc = 0.0
        for t in score_terms:
            tf = ts.count(t)
            if not tf:
                continue
            idf = math.log(1 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            sc += idf * tf * 2.2 / (
                tf + 1.2 * (1 - 0.75 + 0.75 * dl[i] / avgdl)
            )
        out.append((sc, i))
    out.sort(key=lambda x: (-x[0], x[1]))
    return [(i, round(s, 6)) for s, i in out[:k]]


def test_bool_search_matches_brute_force(
    ray_session, phrase_corpus, tmp_path
):
    path, docs = phrase_corpus
    eng = _build(path, str(tmp_path / "blidx"), docs_per_spec=64)
    cases = [
        ("window", "hash join", "zeta"),
        ("window hash", "", "eps"),     # must-only + exclusion
        ("", "alpha beta", "gamma"),    # no must → ≥1 should
        ("delta", "delta eps", ""),     # clause-duplicated term
        ("window", "", ""),             # plain must
    ]
    for must, should, must_not in cases:
        got = [
            (int(r.doc_id), round(r.score, 6))
            for r in eng.bool_search(
                must=must, should=should, must_not=must_not, k=15
            )
            .to_pandas()
            .itertuples()
        ]
        an = Analyzer()
        exp = _brute_bool(
            docs,
            list(dict.fromkeys(an.tokenize(must))),
            list(dict.fromkeys(an.tokenize(should))),
            list(dict.fromkeys(an.tokenize(must_not))),
            15,
        )
        assert got == exp, (must, should, must_not)
    # all-excluded and empty-clause edge cases
    assert eng.bool_search(must="window", must_not="window").num_rows == 0
    assert eng.bool_search().num_rows == 0


def test_bool_minimum_should_match(ray_session, phrase_corpus, tmp_path):
    """minimum_should_match gates candidates on ≥n distinct should
    terms, in both the no-must and the must+should paths; scores of
    survivors are unchanged vs the plain bool query."""
    path, docs = phrase_corpus
    eng = _build(path, str(tmp_path / "msmidx"), docs_per_spec=64)
    an = Analyzer()
    toks = [set(an.tokenize(d)) for d in docs]
    for must, should, n in [
        ("", "alpha beta gamma", 2),
        ("", "alpha beta gamma", 3),
        ("window", "alpha beta eps", 2),
    ]:
        must_t = an.tokenize(must)
        should_t = an.tokenize(should)
        got = eng.bool_search(
            must=must, should=should, k=10_000, minimum_should_match=n
        ).to_pandas()
        want_ids = sorted(
            i
            for i, s in enumerate(toks)
            if all(t in s for t in must_t)
            and sum(t in s for t in should_t) >= n
        )
        assert sorted(got["doc_id"].tolist()) == want_ids, (must, should, n)
        # survivors score identically to the un-gated bool query
        base = eng.bool_search(must=must, should=should, k=10_000)
        base_scores = dict(
            zip(base["doc_id"].to_pylist(), base["score"].to_pylist())
        )
        for r in got.itertuples():
            assert abs(base_scores[r.doc_id] - r.score) < 1e-12
    # n greater than the clause count → empty
    assert eng.bool_search(
        should="alpha beta", k=10, minimum_should_match=3
    ).num_rows == 0


def test_wildcard_search_matches_expansion(
    ray_session, phrase_corpus, tmp_path
):
    """wildcard_search == OR-scored union of the dictionary terms the
    pattern matches (verified against Python fnmatch over the corpus
    vocabulary), including leading-wildcard, ?-only, exact-term (no
    wildcard) and no-match patterns."""
    import fnmatch

    from datamart_ray.search.engine import _segment_wildcard_terms

    path, docs = phrase_corpus
    eng = _build(path, str(tmp_path / "wcidx"), docs_per_spec=64)
    an = Analyzer()
    vocab = sorted({t for d in docs for t in an.tokenize(d)})
    for pat in ["*a", "?eta", "w*ow", "z?ta", "alpha", "q*", "*e*a*"]:
        want_terms = sorted(
            t for t in vocab if fnmatch.fnmatchcase(t, pat)
        )
        got_terms = sorted(
            {
                t
                for r in eng.readers
                for t in _segment_wildcard_terms(r, pat)
            }
        )
        assert got_terms == want_terms, pat
        got = eng.wildcard_search(pat, k=10_000).to_pandas()
        if not want_terms:
            assert got.empty
            continue
        exp = eng._score_expanded(want_terms, 10_000, None).to_pandas()
        assert got.equals(exp), pat
    # invalid characters are rejected, not silently unmatched
    import pytest as _pytest

    with _pytest.raises(ValueError):
        eng.wildcard_search("bad%pattern")


def test_regexp_search_matches_expansion(
    ray_session, phrase_corpus, tmp_path
):
    """regexp_search == OR-scored union of the dictionary terms the
    anchored RE2 pattern matches (verified against Python re over the
    corpus vocabulary), including top-level alternation (which voids
    the literal-prefix dictionary bound), quantified literals, char
    classes and no-match patterns."""
    import re as _re

    from datamart_ray.search.engine import (
        _regex_literal_prefix,
        _segment_regexp_terms,
    )

    # prefix soundness: every match of the pattern starts with the lit
    assert _regex_literal_prefix("al(pha|so)") == "al"
    assert _regex_literal_prefix("alpha|beta") == ""
    assert _regex_literal_prefix("alp?ha") == "al"
    assert _regex_literal_prefix("a[lb]pha") == "a"
    assert _regex_literal_prefix("ab{2,3}c") == "a"
    assert _regex_literal_prefix(r"a\|b") == "a"  # escaped pipe
    assert _regex_literal_prefix("(a|b)c") == ""

    path, docs = phrase_corpus
    eng = _build(path, str(tmp_path / "rxidx"), docs_per_spec=64)
    an = Analyzer()
    vocab = sorted({t for d in docs for t in an.tokenize(d)})
    for pat in [
        "al(pha|so)", "alpha|beta", ".e.a", "w.*w", "[gd]...a",
        "zz+", "gamma",
    ]:
        rx = _re.compile(f"^(?:{pat})$")
        want_terms = sorted(t for t in vocab if rx.match(t))
        got_terms = sorted(
            {
                t
                for r in eng.readers
                for t in _segment_regexp_terms(r, pat)
            }
        )
        assert got_terms == want_terms, pat
        got = eng.regexp_search(pat, k=10_000).to_pandas()
        if not want_terms:
            assert got.empty
            continue
        exp = eng._score_expanded(want_terms, 10_000, None).to_pandas()
        assert got.equals(exp), pat


def test_explain_contribs_sum_to_score(
    ray_session, phrase_corpus, tmp_path
):
    """explain()'s per-(doc, term) contribs reproduce tf exactly and sum
    to the doc's search score; docs outside the requested set are
    absent."""
    path, docs = phrase_corpus
    eng = _build(path, str(tmp_path / "exidx"), docs_per_spec=64)
    q = "window hash join"
    top = eng.search(q, k=8, mode="or").to_pandas()
    ids = top["doc_id"].tolist()
    ex = eng.explain(q, ids).to_pandas()
    assert set(ex["doc_id"]) == set(ids)
    an = Analyzer()
    for r in ex.itertuples():
        assert r.tf == an.tokenize(docs[r.doc_id]).count(r.term)
    sums = ex.groupby("doc_id")["contrib"].sum()
    for r in top.itertuples():
        assert abs(sums[r.doc_id] - r.score) < 1e-9
    # empty doc set and unknown-term query
    assert eng.explain(q, []).num_rows == 0
    assert eng.explain("zzzznothere", ids).num_rows == 0


def test_facet_stats_counts_and_means(
    ray_session, phrase_corpus, tmp_path
):
    """facet_stats bucket counts match facet_counts; avg_score equals
    the brute mean of the exhaustive match scores per bucket."""
    path, docs = phrase_corpus
    idx = str(tmp_path / "fsidx")
    shutil.rmtree(idx, ignore_errors=True)
    # index with a lang meta column derived from doc_id parity
    import pyarrow.parquet as pq_

    src = pq_.read_table(path)
    langs = ["even" if i % 2 == 0 else "odd" for i in range(len(docs))]
    p2 = str(tmp_path / "docs2.parquet")
    pq_.write_table(src.append_column("lang", pa.array(langs)), p2)
    cfg = IndexConfig(
        analyzer=Analyzer(), content_col="text", id_col="doc_id",
        meta_cols=("lang",), docs_per_spec=64,
    )
    build_index(p2, idx, cfg)
    eng = SearchEngine(idx, filter_cols=("lang",), lazy=False)
    q = "window hash"
    st = eng.facet_stats(q, "lang", mode="or").to_pandas()
    fc = eng.facet_counts(q, "lang", mode="or").to_pandas()
    assert dict(zip(st["lang"], st["n"])) == dict(zip(fc["lang"], fc["n"]))
    full = eng.search(q, k=10_000, mode="or").to_pandas()
    full["lang"] = ["even" if i % 2 == 0 else "odd" for i in full["doc_id"]]
    want = full.groupby("lang")["score"].mean()
    for r in st.itertuples():
        assert abs(want[r.lang] - r.avg_score) < 1e-9


def test_term_suggest_ranking(ray_session, tmp_path):
    """Suggestions rank distance asc → df desc → term, exclude the
    exact input term, and respect size."""
    import pyarrow.parquet as pq_

    docs = (
        ["windom common"] * 5      # dist 1 from 'window', df 5
        + ["window common"] * 9    # dist 0 — excluded
        + ["windox common"] * 7    # dist 1, df 7 → ranks before windom
        + ["winded common"] * 8    # dist 2, df 8 → after any dist-1
    )
    path = str(tmp_path / "sg.parquet")
    pq_.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), type=pa.int64()),
                "text": pa.array(docs),
            }
        ),
        path,
    )
    eng = _build(path, str(tmp_path / "sgidx"), docs_per_spec=16)
    out = eng.suggest("window", size=3, max_edits=2).to_pandas()
    assert out["suggestion"].tolist() == ["windox", "windom", "winded"]
    assert out["distance"].tolist() == [1, 1, 2]
    assert out["df"].tolist() == [7, 5, 8]
    assert eng.suggest("window", size=1)["suggestion"].to_pylist() == [
        "windox"
    ]
    # no candidates within the edit budget
    assert eng.suggest("qqqqqqqq", size=3).num_rows == 0


def test_numeric_range_filter(ray_session, tmp_path):
    docs = [f"needle common{i % 3}" for i in range(40)]
    sizes = list(range(40))
    path = str(tmp_path / "rng.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(40), type=pa.int64()),
                "text": pa.array(docs),
                "size": pa.array(sizes, type=pa.int64()),
            }
        ),
        path,
    )
    idx = str(tmp_path / "rngidx")
    cfg = IndexConfig(
        analyzer=Analyzer(),
        content_col="text",
        id_col="doc_id",
        meta_cols=("size",),
        docs_per_spec=16,
    )
    build_index(path, idx, cfg)
    eng = SearchEngine(idx, filter_cols=("size",), lazy=False)
    hits = eng.search("needle", k=50, filters={"size": (10, 19)})
    assert sorted(hits["doc_id"].to_pylist()) == list(range(10, 20))
    # half-open bounds
    lo = eng.search("needle", k=50, filters={"size": (35, None)})
    assert sorted(lo["doc_id"].to_pylist()) == list(range(35, 40))
    hi = eng.search("needle", k=50, filters={"size": (None, 4)})
    assert sorted(hi["doc_id"].to_pylist()) == list(range(5))
    # range + bool compose
    b = eng.bool_search(
        must="needle", must_not="common0", k=50,
        filters={"size": (0, 10)},
    )
    assert sorted(b["doc_id"].to_pylist()) == [
        i for i in range(11) if i % 3 != 0
    ]


def test_search_after_equals_offset_pages(ray_session, phrase_corpus, tmp_path):
    """Cursor pagination == offset pagination under the strict
    (score desc, doc_id asc) total order, across segments and pages,
    in both AND and OR modes."""
    path, docs = phrase_corpus
    eng = _build(path, str(tmp_path / "saidx"), docs_per_spec=64)
    for mode in ("and", "or"):
        full = eng.search("window hash", k=10_000, mode=mode).to_pandas()
        cursor = None
        got = []
        while True:
            page = eng.search(
                "window hash", k=7, mode=mode, search_after=cursor
            ).to_pandas()
            if not len(page):
                break
            got.append(page)
            cursor = (
                float(page["score"].iloc[-1]),
                int(page["doc_id"].iloc[-1]),
            )
        paged = pd.concat(got, ignore_index=True)
        assert paged["doc_id"].tolist() == full["doc_id"].tolist(), mode
        assert np.allclose(paged["score"], full["score"]), mode


def test_more_like_this_matches_brute_force(
    ray_session, phrase_corpus, tmp_path
):
    path, docs = phrase_corpus
    eng = _build(path, str(tmp_path / "mltidx"), docs_per_spec=64)
    an = Analyzer()
    toks = [an.tokenize(d) for d in docs]
    dl = np.array([len(x) for x in toks], float)
    n = len(docs)
    avgdl = dl.sum() / n
    dfs = {}
    for ts in toks:
        for t in set(ts):
            dfs[t] = dfs.get(t, 0) + 1
    seed = 7
    # brute: top max_query_terms by (tf*idf desc, term), OR-score, excl seed
    stf = {}
    for t in toks[seed]:
        stf[t] = stf.get(t, 0) + 1
    w = sorted(
        (
            (-f * math.log(1 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5)), t)
            for t, f in stf.items()
        )
    )
    qterms = sorted(t for _, t in w[:5])
    exp = []
    for i, ts in enumerate(toks):
        if i == seed:
            continue
        sc = 0.0
        for t in qterms:
            tf = ts.count(t)
            if tf:
                idf = math.log(1 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
                sc += idf * tf * 2.2 / (
                    tf + 1.2 * (1 - 0.75 + 0.75 * dl[i] / avgdl)
                )
        if sc > 0:
            exp.append((sc, i))
    exp.sort(key=lambda x: (-x[0], x[1]))
    exp = [(i, round(s, 6)) for s, i in exp[:12]]
    got = [
        (int(r.doc_id), round(r.score, 6))
        for r in eng.more_like_this(
            docs[seed], k=12, max_query_terms=5, exclude=seed
        )
        .to_pandas()
        .itertuples()
    ]
    assert got == exp


def test_match_positions_matches_brute_force(
    ray_session, phrase_corpus, tmp_path
):
    path, docs = phrase_corpus
    eng = _build(path, str(tmp_path / "mpidx"), docs_per_spec=64)
    an = Analyzer()
    doc_ids = [3, 11, 42, 77]
    got = eng.match_positions("window hash", doc_ids).to_pandas()
    exp = []
    for d in sorted(doc_ids):
        ts = an.tokenize(docs[d])
        for term in ["hash", "window"]:
            exp += [
                (d, term, i) for i, t in enumerate(ts) if t == term
            ]
    exp.sort()
    assert list(map(tuple, got.itertuples(index=False))) == exp


def test_numeric_facet_matches_brute_force(ray_session, tmp_path):
    docs = ["needle"] * 30 + ["haystack"] * 10
    sizes = list(range(0, 400, 10))
    path = str(tmp_path / "nf.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(40), type=pa.int64()),
                "text": pa.array(docs),
                "size": pa.array(sizes, type=pa.int64()),
            }
        ),
        path,
    )
    idx = str(tmp_path / "nfidx")
    cfg = IndexConfig(
        analyzer=Analyzer(),
        content_col="text",
        id_col="doc_id",
        meta_cols=("size",),
        docs_per_spec=16,
    )
    build_index(path, idx, cfg)
    eng = SearchEngine(idx, filter_cols=("size",), lazy=False)
    got = eng.numeric_facet("needle", "size", 100).to_pandas()
    # docs 0..29 have sizes 0,10,...,290 → bins 0:10, 100:10, 200:10
    assert got["bin_lo"].tolist() == [0, 100, 200]
    assert got["n"].tolist() == [10, 10, 10]


def test_distributed_bool_rank_identical(ray_session, phrase_corpus, tmp_path):
    """DistributedSearchEngine.bool_search == SearchEngine.bool_search
    at multiple actor counts (global-df protocol)."""
    from datamart_ray.search.engine import DistributedSearchEngine

    path, docs = phrase_corpus
    idx = str(tmp_path / "dbidx")
    eng = _build(path, idx, docs_per_spec=48)  # several segments
    ref = eng.bool_search(
        must="window", should="hash join", must_not="zeta", k=15
    ).to_pandas()
    for max_actors in (1, 3):
        deng = DistributedSearchEngine(idx, lazy=False, max_actors=max_actors)
        try:
            got = deng.bool_search(
                must="window", should="hash join", must_not="zeta", k=15
            ).to_pandas()
        finally:
            deng.shutdown()
        assert got["doc_id"].tolist() == ref["doc_id"].tolist(), max_actors
        assert np.allclose(got["score"], ref["score"]), max_actors


def test_rescore_window_semantics(ray_session, phrase_corpus, tmp_path):
    """ES rescore: docs outside the base window are never promoted; in
    the window, final = qw*bm25 + rw*phrase_bm25 exactly; ranking is
    (final desc, doc_id asc)."""
    path, docs = phrase_corpus
    eng = _build(path, str(tmp_path / "idx"), docs_per_spec=64)
    window, qw, rw = 8, 1.0, 2.0
    base = eng.search("window hash", k=window, mode="or").to_pandas()
    ph = eng.phrase_search("window hash", k=eng.n_docs).to_pandas()
    pmap = dict(zip(ph["doc_id"], ph["score"]))
    out = eng.rescore_search(
        "window hash", "window hash", window_size=window, k=window,
        query_weight=qw, rescore_weight=rw, mode="or",
    ).to_pandas()
    assert set(out["doc_id"]) <= set(base["doc_id"])  # window only
    assert any(d in pmap for d in out["doc_id"])  # non-vacuous bonus
    want = {
        d: qw * s + rw * pmap.get(d, 0.0)
        for d, s in zip(base["doc_id"], base["score"])
    }
    for d, s in zip(out["doc_id"], out["score"]):
        assert s == pytest.approx(want[d])
    keys = list(zip((-out["score"]).tolist(), out["doc_id"].tolist()))
    assert keys == sorted(keys)


def test_rescore_phrase_df_sidecar_parity(
    ray_session, phrase_corpus, tmp_path
):
    """The phrase-df sidecar fast path must be BIT-IDENTICAL to the
    full phrase leg: a fresh engine (cold memo, warm sidecar) probes
    only window docs with the cached global df; a committed mutation
    bumps the index version and invalidates the sidecar."""
    import json

    path, docs = phrase_corpus
    idx = str(tmp_path / "idx")
    eng = _build(path, idx, docs_per_spec=64)
    kw = dict(window_size=8, k=8, query_weight=1.0,
              rescore_weight=2.0, mode="or")
    cold = eng.rescore_search("window hash", "window hash", **kw)
    # first call wrote the sidecar
    side = os.path.join(idx, "phrase_df.json")
    obj = json.load(open(side))
    assert obj["entries"]  # df persisted
    # a FRESH engine (new process analog: empty memo) hits the sidecar
    eng2 = SearchEngine(idx)
    assert eng2._phrase_df_lookup(
        eng2.analyzer.tokenize("window hash")
    ) is not None
    warm = eng2.rescore_search("window hash", "window hash", **kw)
    assert warm.equals(cold)  # identical ids AND float-exact scores

    # committed mutation → version bump → sidecar invalid → full leg
    from datamart_ray.index.maintain import delete_docs

    victim = cold["doc_id"].to_pylist()[0]
    delete_docs(idx, [victim])
    eng3 = SearchEngine(idx)
    assert eng3._phrase_df_lookup(
        eng3.analyzer.tokenize("window hash")
    ) is None
    after = eng3.rescore_search("window hash", "window hash", **kw)
    assert victim not in after["doc_id"].to_pylist()
    # and the full leg re-persisted a fresh-version entry
    obj2 = json.load(open(side))
    assert obj2["version"] != obj["version"]
