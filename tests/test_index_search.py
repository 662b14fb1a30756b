"""End-to-end: corpus → segmented index build → BM25 engine vs exhaustive
pure-Python oracle — the rank-identity gate (SURVEY.md §5.2)."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from datamart_ray.corpus import generate_corpus, reference_queries
from datamart_ray.index.build import IndexConfig, build_index
from datamart_ray.index.manifest import read_manifest
from datamart_ray.oracle import PyBM25Oracle


@pytest.fixture(scope="module")
def built_index(ray_session, corpus_dir, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("index"))
    manifest = build_index(
        corpus_dir,
        index_dir,
        IndexConfig(chunk_docs=64, docs_per_spec=50),
    )
    return index_dir, manifest


@pytest.fixture(scope="module")
def oracle(corpus_dir):
    t = pq.read_table(corpus_dir)
    docs = [(i, s) for i, s in enumerate(t["content"].to_pylist())]
    attrs = {
        i: {"lang": lang} for i, lang in enumerate(t["lang"].to_pylist())
    }
    return PyBM25Oracle(docs, doc_attrs=attrs)


def test_manifest_stats(built_index, oracle, corpus_dir):
    index_dir, manifest = built_index
    segs = manifest["segments"]
    assert len(segs) >= 1
    total_docs = 0
    total_dl = 0
    for seg in segs:
        m = read_manifest(os.path.join(index_dir, "segments", seg))
        total_docs += m["n_docs"]
        total_dl += m["total_doclen"]
        assert m["n_terms"] > 0
        assert len(m["sha256_rollup"]) == 64
    assert total_docs == oracle.n_docs
    assert total_dl == sum(oracle.dl.values())


def test_sha256_invariant(built_index, corpus_dir):
    """Per-row invariant: docmeta sha256 == sha256 of source content."""
    import hashlib

    index_dir, manifest = built_index
    src = pq.read_table(corpus_dir)
    expected = {
        i: hashlib.sha256(s.encode()).hexdigest()
        for i, s in enumerate(src["content"].to_pylist())
    }
    seen = {}
    for seg in manifest["segments"]:
        meta = pq.read_table(
            os.path.join(index_dir, "segments", seg, "docmeta"),
            columns=["doc_id", "sha256"],
        )
        for d, s in zip(meta["doc_id"].to_pylist(), meta["sha256"].to_pylist()):
            seen[d] = s
    assert seen == expected


@pytest.mark.parametrize("q", reference_queries(), ids=lambda q: q["name"])
def test_rank_identity_inprocess(built_index, oracle, q):
    from datamart_ray.search.engine import SearchEngine

    index_dir, _ = built_index
    eng = SearchEngine(index_dir)
    filters = {"lang": q["lang"]} if "lang" in q else None
    got = eng.search(q["query"], k=50, mode=q["mode"], filters=filters)
    want = oracle.search(q["query"], k=50, mode=q["mode"], filters=filters)
    got_ids = got["doc_id"].to_pylist()
    got_scores = got["score"].to_pylist()
    assert got_ids == [d for d, _ in want], q["name"]
    assert np.allclose(
        got_scores, [s for _, s in want], rtol=0, atol=1e-9
    ), q["name"]


def test_rank_identity_distributed(built_index, oracle):
    from datamart_ray.search.engine import DistributedSearchEngine

    index_dir, _ = built_index
    eng = DistributedSearchEngine(index_dir)
    try:
        for q in reference_queries():
            filters = {"lang": q["lang"]} if "lang" in q else None
            got = eng.search(q["query"], k=50, mode=q["mode"], filters=filters)
            want = oracle.search(q["query"], k=50, mode=q["mode"], filters=filters)
            assert got["doc_id"].to_pylist() == [d for d, _ in want], q["name"]
            assert np.allclose(
                got["score"].to_pylist(),
                [s for _, s in want],
                atol=1e-9,
            ), q["name"]
    finally:
        eng.shutdown()


def test_tie_break_is_docid_asc(built_index, oracle):
    """Docs 20/21 have identical content → identical scores → docID order."""
    from datamart_ray.search.engine import SearchEngine

    index_dir, _ = built_index
    eng = SearchEngine(index_dir)
    got = eng.search("qztieneedle", k=50)
    ids = got["doc_id"].to_pylist()
    scores = got["score"].to_pylist()
    assert len(ids) == 2
    assert ids[0] < ids[1]
    assert scores[0] == scores[1]


def test_multi_segment_scores_match_single_segment(
    ray_session, corpus_dir, tmp_path_factory, oracle
):
    """Scores must not depend on segmentation (global df/N/avgdl)."""
    from datamart_ray.search.engine import SearchEngine

    index_dir = str(tmp_path_factory.mktemp("index_multiseg"))
    manifest = build_index(
        corpus_dir,
        index_dir,
        IndexConfig(chunk_docs=32, docs_per_spec=40, segment_docs=90),
    )
    assert len(manifest["segments"]) >= 2
    eng = SearchEngine(index_dir)
    for q in reference_queries():
        filters = {"lang": q["lang"]} if "lang" in q else None
        got = eng.search(q["query"], k=50, mode=q["mode"], filters=filters)
        want = oracle.search(q["query"], k=50, mode=q["mode"], filters=filters)
        assert got["doc_id"].to_pylist() == [d for d, _ in want], q["name"]
        assert np.allclose(
            got["score"].to_pylist(), [s for _, s in want], atol=1e-9
        ), q["name"]


def test_resume_skips_committed_segments(
    ray_session, corpus_dir, tmp_path_factory
):
    """Kill-and-resume: a second build run skips every committed segment and
    produces an identical index (manifest-level equality)."""
    import json

    cfg = IndexConfig(chunk_docs=32, docs_per_spec=40, segment_docs=90)
    d1 = str(tmp_path_factory.mktemp("index_full"))
    m1 = build_index(corpus_dir, d1, cfg)
    assert m1["built"] and not m1["resumed_skipped"]

    # simulate a partial build: drop the last segment, then resume
    import shutil

    last = m1["segments"][-1]
    shutil.rmtree(os.path.join(d1, "segments", last))
    m2 = build_index(corpus_dir, d1, cfg)
    assert m2["built"] == [last]
    assert set(m2["resumed_skipped"]) == set(m1["segments"]) - {last}

    # resumed index must equal a from-scratch build, segment by segment
    d2 = str(tmp_path_factory.mktemp("index_fresh"))
    build_index(corpus_dir, d2, cfg)
    for seg in m1["segments"]:
        a = read_manifest(os.path.join(d1, "segments", seg))
        b = read_manifest(os.path.join(d2, "segments", seg))
        for key in ("n_docs", "total_doclen", "n_terms", "n_postings", "sha256_rollup"):
            assert a[key] == b[key], (seg, key)


def test_lazy_reader_matches_eager(ray_session, tmp_path):
    """lazy=True (filtered per-term reads + LRU) must return identical
    results to the eager whole-table reader."""
    from datamart_ray.corpus import generate_corpus, reference_queries
    from datamart_ray.index.build import IndexConfig, build_index
    from datamart_ray.search.engine import SearchEngine

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, n_files=300, vocab_size=2000, n_output_files=4)
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, IndexConfig(docs_per_spec=100))
    eager = SearchEngine(idx)
    lazy = SearchEngine(idx, lazy=True)
    for q in reference_queries():
        f = {"lang": q["lang"]} if "lang" in q else None
        a = eager.search(q["query"], k=50, mode=q["mode"], filters=f)
        b = lazy.search(q["query"], k=50, mode=q["mode"], filters=f)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), q
        assert a["score"].to_pylist() == b["score"].to_pylist(), q
    # repeated query exercises the LRU hit path
    q0 = reference_queries()[0]
    c = lazy.search(q0["query"], k=50, mode=q0["mode"])
    d = lazy.search(q0["query"], k=50, mode=q0["mode"])
    assert c["doc_id"].to_pylist() == d["doc_id"].to_pylist()

    # the r3 lazy path serves terms from the mmap posting-heap sidecar
    # (built atomically on first lazy open)
    from datamart_ray.index.heap import HEAP_FILE, PostingHeap

    seg = lazy.readers[0].seg_dir
    assert os.path.exists(os.path.join(seg, HEAP_FILE))
    assert lazy.readers[0]._heap is not None
    # heap slices == the filtered-read fallback, term by term
    fallback = SearchEngine(idx, lazy=True)
    for r in fallback.readers:
        r._heap = None
        r._lazy_cache.clear()
    heap = PostingHeap(seg)
    for term in ("qzcommonneedle", "qzuniqueneedle", "qznoterm"):
        a = heap.chunks(term)
        b = fallback.readers[0]._lazy_chunks(term)
        assert a.num_rows == b.num_rows, term
        if a.num_rows:
            ak = a.sort_by("first_docid").to_pydict()
            bk = b.sort_by("first_docid").to_pydict()
            assert ak == bk, term


def test_distributed_engine_actor_packing(ray_session, tmp_path):
    """max_actors < n_segments packs several readers per scorer actor;
    results stay identical to one-actor-per-segment."""
    from datamart_ray.corpus import generate_corpus, reference_queries
    from datamart_ray.index.build import IndexConfig, build_index
    from datamart_ray.search.engine import DistributedSearchEngine

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, n_files=120, vocab_size=800, n_output_files=4)
    idx = str(tmp_path / "idx")
    build_index(
        corpus, idx, IndexConfig(docs_per_spec=30, segment_docs=30)
    )
    wide = DistributedSearchEngine(idx)  # one actor per segment
    assert len(wide.actors) == 4
    packed = DistributedSearchEngine(idx, max_actors=2)
    assert len(packed.actors) == 2
    for q in reference_queries()[:6]:
        a = wide.search(q["query"], k=50, mode=q["mode"])
        b = packed.search(q["query"], k=50, mode=q["mode"])
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), q
        assert a["score"].to_pylist() == b["score"].to_pylist(), q
    wide.shutdown()
    packed.shutdown()


def test_distributed_expanded_search_parity(ray_session, tmp_path):
    """Distributed wildcard/prefix/fuzzy (expansion round → global-df
    round → per-actor OR scoring) and minimum_should_match bool are
    rank-identical to the in-process engine at every actor count."""
    from datamart_ray.corpus import generate_corpus
    from datamart_ray.index.build import IndexConfig, build_index
    from datamart_ray.search.engine import (
        DistributedSearchEngine,
        SearchEngine,
    )

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, n_files=120, vocab_size=800, n_output_files=4)
    idx = str(tmp_path / "idx")
    build_index(
        corpus, idx, IndexConfig(docs_per_spec=30, segment_docs=30)
    )
    local = SearchEngine(idx, lazy=False)
    for n_act in (1, 2, 4):
        deng = DistributedSearchEngine(idx, max_actors=n_act, lazy=False)
        cases = [
            ("wildcard", lambda e: e.wildcard_search("qz*needle", k=25)),
            ("prefix", lambda e: e.prefix_search("qz", k=25)),
            # one deletion from qzcommonneedle → edit distance 1
            ("fuzzy", lambda e: e.fuzzy_search("qzcommonneedl", k=25)),
            (
                "msm",
                lambda e: e.bool_search(
                    should="qzcommonneedle qzfilterneedle qzuniqueneedle",
                    k=100,
                    minimum_should_match=2,
                ),
            ),
        ]
        for name, run in cases:
            a = run(local)
            b = run(deng)
            assert a.num_rows > 0, (name, "vacuous case")
            assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), (
                name, n_act,
            )
            assert a["score"].to_pylist() == b["score"].to_pylist(), (
                name, n_act,
            )
        deng.shutdown()


def test_search_many_matches_serial(ray_session, tmp_path):
    from datamart_ray.corpus import generate_corpus, reference_queries
    from datamart_ray.index.build import IndexConfig, build_index
    from datamart_ray.search.engine import DistributedSearchEngine

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, n_files=150, vocab_size=900, n_output_files=3)
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, IndexConfig(docs_per_spec=50, segment_docs=60))
    eng = DistributedSearchEngine(idx)
    qs = [
        {"query": q["query"], "mode": q["mode"], "k": 50,
         "filters": {"lang": q["lang"]} if "lang" in q else None}
        for q in reference_queries()
    ]
    batch = eng.search_many(qs)
    for q, b in zip(qs, batch):
        a = eng.search(
            q["query"], k=50, mode=q["mode"], filters=q["filters"]
        )
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), q
        assert a["score"].to_pylist() == b["score"].to_pylist(), q
    # empty-term query yields an empty table, not an error
    assert eng.search_many([{"query": "!!!"}])[0].num_rows == 0
    eng.shutdown()

    # in-process batch API parity: same query-dict shape, same results
    from datamart_ray.search.engine import SearchEngine

    ip = SearchEngine(idx)
    for q, b in zip(qs, ip.search_many(qs)):
        a = ip.search(
            q["query"], k=50, mode=q["mode"], filters=q["filters"]
        )
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), q
        assert a["score"].to_pylist() == b["score"].to_pylist(), q


def test_auto_lazy_threshold(ray_session, tmp_path, monkeypatch):
    """lazy='auto' picks eager for small segments and the mmap-heap lazy
    mode once a segment's posting count crosses AUTO_LAZY_POSTINGS."""
    from datamart_ray.corpus import generate_corpus
    from datamart_ray.index.build import IndexConfig, build_index
    from datamart_ray.search import engine as eng_mod

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, n_files=60, vocab_size=300, n_output_files=1)
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, IndexConfig(docs_per_spec=30))

    auto = eng_mod.SearchEngine(idx)  # default lazy="auto"
    assert all(not r.lazy for r in auto.readers)  # small → eager

    monkeypatch.setattr(eng_mod, "AUTO_LAZY_POSTINGS", 1)
    big = eng_mod.SearchEngine(idx)
    assert all(r.lazy for r in big.readers)  # "giant" → lazy + heap
    assert all(r._heap is not None for r in big.readers)
    a = auto.search("qzcommonneedle", k=10, mode="or")
    b = big.search("qzcommonneedle", k=10, mode="or")
    assert a.to_pydict() == b.to_pydict()


def test_posting_heap_multichunk_groups(tmp_path):
    """Regression: a CHUNKED sorted posting table (the >2 GiB giant-
    segment shape, where take() cannot recombine) must not shift heap
    batch ids — write_table used to emit one record batch per CHUNK
    while the index assumed one per group. Injected via the _postings
    test seam with chunk boundaries straddling group cuts."""
    import pyarrow as pa

    from datamart_ray.index.heap import PostingHeap, build_posting_heap

    rng = np.random.RandomState(7)
    terms, payload = [], []
    for ti in range(40):
        for r in range(int(rng.randint(1, 9))):
            terms.append(f"t{ti:03d}")
            payload.append(f"{ti}:{r}".encode())
    # chunk the TERM-SORTED stream at awkward boundaries (sizes 3,7,3,7…)
    batches, i, k = [], 0, 0
    while i < len(terms):
        j = min(i + (3 if k % 2 == 0 else 7), len(terms))
        batches.append(
            pa.record_batch(
                {
                    "term": pa.array(terms[i:j]),
                    "first_docid": pa.array(
                        list(range(i, j)), type=pa.int64()
                    ),
                    "docs": pa.array(payload[i:j], type=pa.binary()),
                }
            )
        )
        i, k = j, k + 1
    t = pa.Table.from_batches(batches)
    assert t["term"].num_chunks > 1
    seg = str(tmp_path / "seg")
    os.makedirs(seg)
    build_posting_heap(seg, target_rows=5, _postings=t)
    heap = PostingHeap(seg, build=False)
    # every term must round-trip its exact rows
    want: dict[str, list[bytes]] = {}
    for term, pl in zip(terms, payload):
        want.setdefault(term, []).append(pl)
    for term, pls in want.items():
        got = heap.chunks(term)
        assert got["term"].to_pylist() == [term] * len(pls), term
        assert got["docs"].to_pylist() == pls, term
    assert heap.chunks("zz_absent").num_rows == 0


def test_posting_heap_reads_pre_nb_sidecar(tmp_path):
    """Sidecars written before the multi-chunk fix lack the 'nb' batch
    count column; PostingHeap must default it to 1 per group."""
    import pyarrow as pa

    from datamart_ray.index.heap import (
        HEAP_IDX_FILE,
        PostingHeap,
        build_posting_heap,
    )

    t = pa.table(
        {
            "term": pa.array(["a", "a", "b", "c", "c", "c"]),
            "first_docid": pa.array(range(6), type=pa.int64()),
            "docs": pa.array([f"p{i}".encode() for i in range(6)]),
        }
    )
    seg = str(tmp_path / "seg")
    os.makedirs(seg)
    build_posting_heap(seg, target_rows=2, _postings=t)
    idx_path = os.path.join(seg, HEAP_IDX_FILE)
    idx = pq.read_table(idx_path)
    assert idx["nb"].to_pylist() == [1, 1, 1]
    pq.write_table(idx.drop_columns(["nb"]), idx_path)  # legacy shape
    heap = PostingHeap(seg, build=False)
    assert heap.chunks("a")["docs"].to_pylist() == [b"p0", b"p1"]
    assert heap.chunks("c")["docs"].to_pylist() == [b"p3", b"p4", b"p5"]


def test_boosting_search_demotes_not_excludes(built_index):
    """ES boosting-query semantics: the negative clause rescales, never
    filters — the match set equals the plain OR match set, demoted docs
    score exactly ×negative_boost, others are untouched."""
    from datamart_ray.search.engine import SearchEngine
    from datamart_ray.corpus import MARKER_COMMON, MARKER_PAIR_A

    index_dir, _ = built_index
    eng = SearchEngine(index_dir)
    n = eng.n_docs
    plain = eng.search(MARKER_COMMON, k=n, mode="or").to_pandas()
    boosted = eng.boosting_search(
        MARKER_COMMON, MARKER_PAIR_A, 0.5, k=n, mode="or"
    ).to_pandas()
    assert set(plain["doc_id"]) == set(boosted["doc_id"])
    neg_docs = set(
        eng.search(MARKER_PAIR_A, k=n, mode="or").to_pandas()["doc_id"]
    )
    p = plain.set_index("doc_id")["score"]
    b = boosted.set_index("doc_id")["score"]
    demoted = [d for d in b.index if d in neg_docs]
    kept = [d for d in b.index if d not in neg_docs]
    assert demoted and kept  # non-vacuous both ways
    assert np.allclose(b[demoted], p[demoted] * 0.5)
    assert np.allclose(b[kept], p[kept])


def test_function_score_multiplier_exact(built_index):
    """function_score field_value_factor(log1p, multiply): every score
    equals the plain OR score × ln(1 + factor × doclen)."""
    from datamart_ray.search.engine import SearchEngine
    from datamart_ray.corpus import MARKER_COMMON

    index_dir, _ = built_index
    eng = SearchEngine(index_dir)
    n = eng.n_docs
    plain = eng.search(MARKER_COMMON, k=n, mode="or").to_pandas()
    fs = eng.function_score_search(
        MARKER_COMMON, "doclen", 0.01, k=n, mode="or"
    ).to_pandas()
    assert set(plain["doc_id"]) == set(fs["doc_id"])
    dl = {}
    for r in eng.readers:
        dl.update(zip(r._doc_ids.tolist(), r._doclens.tolist()))
    p = plain.set_index("doc_id")["score"]
    f = fs.set_index("doc_id")["score"]
    for d in f.index:
        assert f[d] == pytest.approx(p[d] * np.log1p(0.01 * dl[d]))


def test_autocomplete_prefix_and_rank(built_index):
    """Completion suggester: every suggestion has the prefix, global df
    equals SearchEngine.df, ranking is (df desc, term asc)."""
    from datamart_ray.search.engine import SearchEngine

    index_dir, _ = built_index
    eng = SearchEngine(index_dir)
    out = eng.autocomplete("qz", size=10).to_pandas()
    assert len(out) > 1
    assert all(t.startswith("qz") for t in out["term"])
    for t, d in zip(out["term"], out["df"]):
        assert d == eng.df(t)
    rows = list(zip((-out["df"]).tolist(), out["term"].tolist()))
    assert rows == sorted(rows)


def test_facet_cardinality_exact(built_index):
    """Cardinality agg == exact distinct over the full match set."""
    from datamart_ray.search.engine import SearchEngine
    from datamart_ray.corpus import MARKER_COMMON
    import pyarrow.parquet as pq

    index_dir, _ = built_index
    eng = SearchEngine(index_dir)
    card = eng.facet_cardinality(
        MARKER_COMMON, ("lang",), mode="and"
    ).to_pandas()
    docs = set(
        eng.search(MARKER_COMMON, k=eng.n_docs, mode="or").to_pandas()[
            "doc_id"
        ]
    )
    langs = set()
    for r in eng.readers:
        ids = r._doc_ids.tolist()
        for i, lang in zip(ids, r._meta["lang"].to_pylist()):
            if i in docs:
                langs.add(lang)
    assert card.loc[0, "field"] == "lang"
    assert card.loc[0, "cardinality"] == len(langs)


def test_terms_filter_membership(built_index):
    """List-valued filter = ES `terms` query: results ⊆ docs whose lang
    is in the value set; equals the union of per-value equality runs."""
    from datamart_ray.search.engine import SearchEngine
    from datamart_ray.corpus import MARKER_COMMON

    index_dir, _ = built_index
    eng = SearchEngine(index_dir)
    n = eng.n_docs
    langs = ["python", "go"]
    multi = eng.search(
        MARKER_COMMON, k=n, mode="or", filters={"lang": langs}
    ).to_pandas()
    single = set()
    for lg in langs:
        single |= set(
            eng.search(
                MARKER_COMMON, k=n, mode="or", filters={"lang": lg}
            ).to_pandas()["doc_id"]
        )
    assert set(multi["doc_id"]) == single and len(multi)


def test_sort_by_field_order(built_index):
    """Field sort: same match set as search(), ordered by doclen desc
    with doc_id ascending tiebreak."""
    from datamart_ray.search.engine import SearchEngine
    from datamart_ray.corpus import MARKER_COMMON

    index_dir, _ = built_index
    eng = SearchEngine(index_dir)
    n = eng.n_docs
    full = eng.sort_by_field(
        MARKER_COMMON, "doclen", k=n, descending=True, mode="and"
    ).to_pandas()
    match = set(
        eng.search(MARKER_COMMON, k=n, mode="or").to_pandas()["doc_id"]
    )
    assert set(full["doc_id"]) == match
    keys = list(zip((-full["doclen"]).tolist(), full["doc_id"].tolist()))
    assert keys == sorted(keys)


def test_phrase_suggest_beats_tokens(built_index):
    """Phrase suggester composes per-token corrections: a one-edit
    misspelling of two markers suggests the correct phrase first."""
    from datamart_ray.search.engine import SearchEngine
    from datamart_ray.corpus import MARKER_COMMON, MARKER_PAIR_A

    index_dir, _ = built_index
    eng = SearchEngine(index_dir)
    bad = MARKER_COMMON[:-1] + "x" + " " + MARKER_PAIR_A[:-1] + "q"
    out = eng.suggest_phrase(bad, size=3, max_edits=2).to_pandas()
    assert out.loc[0, "phrase"] == f"{MARKER_COMMON} {MARKER_PAIR_A}"


def test_distributed_rescored_search_parity(built_index):
    """Distributed boosting/function_score (exhaustive per-actor scoring
    with global idfs, then the rescore, then local top-k) is
    rank-identical to the in-process engine at every actor count —
    the rescore reads only segment-local state, so it commutes with
    actor packing."""
    from datamart_ray.search.engine import (
        DistributedSearchEngine,
        SearchEngine,
    )
    from datamart_ray.corpus import MARKER_COMMON, MARKER_PAIR_A

    index_dir, _ = built_index
    eng = SearchEngine(index_dir)
    n = eng.n_docs
    b_want = eng.boosting_search(
        MARKER_COMMON, MARKER_PAIR_A, 0.5, k=n, mode="or"
    )
    f_want = eng.function_score_search(
        MARKER_COMMON, "doclen", 0.01, k=n, mode="or"
    )
    for n_act in (1, None):
        deng = DistributedSearchEngine(index_dir, max_actors=n_act)
        try:
            b_got = deng.boosting_search(
                MARKER_COMMON, MARKER_PAIR_A, 0.5, k=n, mode="or"
            )
            assert b_got["doc_id"].to_pylist() == b_want[
                "doc_id"
            ].to_pylist()
            assert np.allclose(
                b_got["score"].to_numpy(), b_want["score"].to_numpy()
            )
            f_got = deng.function_score_search(
                MARKER_COMMON, "doclen", 0.01, k=n, mode="or"
            )
            assert f_got["doc_id"].to_pylist() == f_want[
                "doc_id"
            ].to_pylist()
            assert np.allclose(
                f_got["score"].to_numpy(), f_want["score"].to_numpy()
            )
        finally:
            deng.shutdown()


def test_match_count_and_constant_score(built_index):
    """_count equals the match-set sizes of exhaustive search;
    constant_score scores every match exactly the boost, docID order."""
    from datamart_ray.search.engine import SearchEngine
    from datamart_ray.corpus import MARKER_COMMON

    index_dir, _ = built_index
    eng = SearchEngine(index_dir)
    n = eng.n_docs
    or_docs = set(
        eng.search(MARKER_COMMON, k=n, mode="or").to_pandas()["doc_id"]
    )
    assert eng.match_count(MARKER_COMMON, mode="or") == len(or_docs)
    assert eng.match_count("qzneverexists", mode="or") == 0
    cs = eng.constant_score_search(
        MARKER_COMMON, 2.5, k=n, mode="or"
    ).to_pandas()
    assert set(cs["doc_id"]) == or_docs
    assert (cs["score"] == 2.5).all()
    assert cs["doc_id"].is_monotonic_increasing



def test_index_alias_rank_identity(corpus_dir, tmp_path):
    """ES index-alias analog: an engine over [indexA, indexB] (one
    corpus split in two, disjoint explicit docIDs) ranks identically
    to one combined index — global N/Σdl/df are computed across
    aliased indices. Mismatched analyzer configs are rejected."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from datamart_ray.analyzer import Analyzer
    from datamart_ray.corpus import MARKER_COMMON, MARKER_HEAD
    from datamart_ray.index.build import IndexConfig, build_index
    from datamart_ray.search.engine import SearchEngine

    files = sorted(glob.glob(os.path.join(corpus_dir, "*.parquet")))
    t = pq.read_table(files)
    t = t.append_column(
        "doc_id", pa.array(range(t.num_rows), type=pa.int64())
    )
    half = t.num_rows // 2
    full_p = str(tmp_path / "full.parquet")
    half_a = str(tmp_path / "a.parquet")
    half_b = str(tmp_path / "b.parquet")
    pq.write_table(t, full_p)
    pq.write_table(t.slice(0, half), half_a)
    pq.write_table(t.slice(half), half_b)
    cfg = IndexConfig(chunk_docs=64, docs_per_spec=50, id_col="doc_id")
    idx_f, idx_a, idx_b = (
        str(tmp_path / "if"), str(tmp_path / "ia"), str(tmp_path / "ib")
    )
    build_index(full_p, idx_f, cfg)
    build_index(half_a, idx_a, cfg)
    build_index(half_b, idx_b, cfg)
    combined = SearchEngine(idx_f)
    aliased = SearchEngine([idx_a, idx_b])
    assert aliased.n_docs == combined.n_docs
    assert aliased.avgdl == pytest.approx(combined.avgdl)
    for q, mode in [
        (f"{MARKER_COMMON} {MARKER_HEAD}", "or"),
        (MARKER_COMMON, "and"),
    ]:
        got = aliased.search(q, k=50, mode=mode)
        want = combined.search(q, k=50, mode=mode)
        assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
        assert np.allclose(
            got["score"].to_numpy(), want["score"].to_numpy(), atol=1e-12
        )
    other = str(tmp_path / "io")
    build_index(
        half_a,
        other,
        IndexConfig(
            analyzer=Analyzer(min_token_len=2),
            chunk_docs=64,
            id_col="doc_id",
        ),
    )
    with pytest.raises(ValueError, match="different analyzer"):
        SearchEngine([idx_a, other])
    # distributed engine honors the same alias contract
    from datamart_ray.search.engine import DistributedSearchEngine

    deng = DistributedSearchEngine([idx_a, idx_b], max_actors=2)
    try:
        got = deng.search(MARKER_COMMON, k=50, mode="and")
        want = combined.search(MARKER_COMMON, k=50, mode="and")
        assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
        assert np.allclose(
            got["score"].to_numpy(), want["score"].to_numpy(), atol=1e-9
        )
    finally:
        deng.shutdown()


def test_get_source_from_index(ray_session, tmp_path):
    """ES GET /_source analog: stored content round-trips from the
    index alone; deleted docs are omitted; indexes built without
    store_source refuse clearly."""
    import pyarrow.parquet as pq

    from datamart_ray.corpus import generate_corpus
    from datamart_ray.index.build import IndexConfig, build_index
    from datamart_ray.index.maintain import delete_docs
    from datamart_ray.search.engine import SearchEngine

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, n_files=80, vocab_size=400, n_output_files=2)
    idx = str(tmp_path / "idx")
    build_index(
        corpus, idx,
        IndexConfig(docs_per_spec=30, segment_docs=40, store_source=True),
    )
    src = pq.read_table(corpus, columns=["content"])["content"].to_pylist()
    eng = SearchEngine(idx)
    ids = [0, 7, 39, 41, 79]
    t = eng.get_source(ids)
    assert t["doc_id"].to_pylist() == ids
    assert t["_source"].to_pylist() == [src[i] for i in ids]
    # deleted doc disappears from GET
    delete_docs(idx, [7])
    t2 = SearchEngine(idx).get_source(ids)
    assert t2["doc_id"].to_pylist() == [0, 39, 41, 79]
    # index without stored source refuses
    idx2 = str(tmp_path / "idx2")
    build_index(corpus, idx2, IndexConfig(docs_per_spec=30))
    import pytest as _pytest

    with _pytest.raises(KeyError, match="store_source"):
        SearchEngine(idx2).get_source([0])


def test_profile_search_rank_identical(ray_session, tmp_path):
    """ES profile-API analog: same primitives as search, so the result
    is rank-identical; all four phases report non-negative wall time."""
    from datamart_ray.corpus import generate_corpus
    from datamart_ray.index.build import IndexConfig, build_index
    from datamart_ray.search.engine import SearchEngine

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, n_files=120, vocab_size=600, n_output_files=2)
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, IndexConfig(docs_per_spec=40, segment_docs=60))
    eng = SearchEngine(idx)
    for q, mode in (
        ("qzcommonneedle", "or"),
        ("qzcommonneedle qzpairneedlea", "and"),
        ("", "or"),
    ):
        res, prof = eng.profile_search(q, k=20, mode=mode)
        want = eng.search(q, k=20, mode=mode)
        assert res["doc_id"].to_pylist() == want["doc_id"].to_pylist()
        assert res["score"].to_pylist() == want["score"].to_pylist()
        assert prof["phase"].to_pylist() == [
            "analyze", "stats", "score_segments", "merge_topk",
        ]
        assert all(m >= 0 for m in prof["ms"].to_pylist())
