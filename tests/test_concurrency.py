"""Concurrent maintenance safety (VERDICT r3 "Next round" #7).

Delta ingest / compaction / snapshot each commit atomically, but until
r4 nothing pinned what happens when they OVERLAP. These tests pin:

- two concurrent ``ingest_delta`` calls serialize under the per-index
  advisory write lock (``index_dir/.write.lock``) instead of racing on
  segment names / docID bases — both land, disjoint IDs, invariant ok;
- a searcher opened BEFORE a compaction keeps serving bit-identical
  results all the way through the segment-dir swap (committed segments
  are immutable; POSIX keeps the old view alive for the open reader);
- searchers opened DURING the swap always see a full consistent view
  (the pre- or post-compaction live set, never a torn mix);
- index.json carries a monotonic ``version`` that bumps on every
  committed mutation (build → delta → compact), so caches can detect
  view changes without diffing segment listings.
"""

import os
import threading
import time

import pytest

from datamart_ray.corpus import generate_corpus
from datamart_ray.index.build import IndexConfig, build_index
from datamart_ray.index.maintain import (
    compact_segments,
    delete_docs,
    ingest_delta,
    verify_index_invariant,
)
from datamart_ray.index.manifest import (
    current_index_version,
    index_write_lock,
)
from datamart_ray.search.engine import SearchEngine

QUERY = "qzcommonneedle"


def _live_ids(idx, k=500):
    return SearchEngine(idx).search(QUERY, k=k)["doc_id"].to_pylist()


def test_concurrent_ingest_delta_serializes(ray_session, tmp_path):
    base = str(tmp_path / "a")
    extra_b = str(tmp_path / "b")
    extra_c = str(tmp_path / "c")
    generate_corpus(base, n_files=60, vocab_size=600, n_output_files=2)
    generate_corpus(extra_b, n_files=40, vocab_size=600, n_output_files=2)
    generate_corpus(extra_c, n_files=40, vocab_size=600, n_output_files=2)
    idx = str(tmp_path / "idx")
    build_index(base, idx, IndexConfig(docs_per_spec=50))

    results, errors = {}, []

    def ingest(name, path):
        try:
            results[name] = ingest_delta(
                idx, path, IndexConfig(docs_per_spec=50)
            )
        except Exception as e:  # pragma: no cover - failure detail
            errors.append((name, e))

    threads = [
        threading.Thread(target=ingest, args=("b", extra_b)),
        threading.Thread(target=ingest, args=("c", extra_c)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    added = results["b"]["added"] + results["c"]["added"]
    assert len(added) == 2 and len(set(added)) == 2, added

    eng = SearchEngine(idx)
    assert eng.n_docs == 60 + 40 + 40
    # docIDs unique across the three segments (no base collision)
    import numpy as np

    ids = np.concatenate([r._doc_ids for r in eng.readers])
    assert np.unique(ids).size == ids.size
    audit = verify_index_invariant(idx)
    assert all(v["docmeta_ok"] for v in audit.values()), audit


def test_write_lock_blocks_mutators(ray_session, tmp_path):
    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, n_files=40, vocab_size=400, n_output_files=1)
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, IndexConfig(docs_per_spec=50))
    victim = _live_ids(idx)[0]

    done = threading.Event()

    def deleter():
        delete_docs(idx, [victim])
        done.set()

    with index_write_lock(idx):
        t = threading.Thread(target=deleter)
        t.start()
        time.sleep(0.4)
        assert not done.is_set(), "mutator ran despite held write lock"
    t.join(timeout=10)
    assert done.is_set(), "mutator never ran after lock release"
    assert victim not in _live_ids(idx)


def test_search_during_compaction_consistent(ray_session, tmp_path):
    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, n_files=120, vocab_size=800, n_output_files=3)
    idx = str(tmp_path / "idx")
    # 3 segments so the compaction swap is a real multi-dir replace
    build_index(
        corpus, idx, IndexConfig(docs_per_spec=40, segment_docs=50)
    )
    before = _live_ids(idx)
    victims = before[:3]
    delete_docs(idx, victims)
    live = set(before) - set(victims)

    pre = SearchEngine(idx)  # opened before the compaction starts
    baseline = pre.search(QUERY, k=500)
    base_ids = baseline["doc_id"].to_pylist()
    base_scores = baseline["score"].to_pylist()
    assert set(base_ids) == live

    err = []

    def compact():
        try:
            compact_segments(idx)
        except Exception as e:  # pragma: no cover
            err.append(e)

    t = threading.Thread(target=compact)
    t.start()
    saw = set()
    while t.is_alive():
        # pre-opened reader: bit-identical through the swap
        r = pre.search(QUERY, k=500)
        assert r["doc_id"].to_pylist() == base_ids
        assert r["score"].to_pylist() == base_scores
        # fresh reader mid-swap: ALWAYS a full consistent live set
        # (scores may differ post-compaction — stats recomputed — but
        # the doc set is invariant)
        got = set(_live_ids(idx))
        assert got == live, (
            f"torn view: missing {live - got}, extra {got - live}"
        )
        saw.add(len(got))
    t.join()
    assert not err, err
    assert set(_live_ids(idx)) == live
    post = SearchEngine(idx)
    assert len(post.readers) == 1
    assert post.n_docs == 120 - len(victims)


def test_index_version_monotonic(ray_session, tmp_path):
    corpus = str(tmp_path / "a")
    extra = str(tmp_path / "b")
    generate_corpus(corpus, n_files=40, vocab_size=400, n_output_files=1)
    generate_corpus(extra, n_files=30, vocab_size=400, n_output_files=1)
    idx = str(tmp_path / "idx")
    assert current_index_version(idx) == 0
    build_index(corpus, idx, IndexConfig(docs_per_spec=50))
    v1 = current_index_version(idx)
    assert v1 >= 1
    ingest_delta(idx, extra, IndexConfig(docs_per_spec=50))
    v2 = current_index_version(idx)
    assert v2 > v1
    compact_segments(idx)
    v3 = current_index_version(idx)
    assert v3 > v2
    # tombstone deletes change the served view without touching the
    # segment list — they MUST bump too (version-keyed engine caches
    # would otherwise serve deleted docs forever)
    victim = _live_ids(idx)[:1]
    assert delete_docs(idx, victim) == 1
    v4 = current_index_version(idx)
    assert v4 > v3
    # idempotent re-delete commits nothing → no bump
    assert delete_docs(idx, victim) == 0
    assert current_index_version(idx) == v4


def test_search_on_demand_cache_and_sweep(ray_session, tmp_path):
    """search_on_demand: (a) an empty/missing watch root is steady
    state, not an error; (b) the version-keyed engine cache reopens
    after a tombstone delete; (c) the same file swept under a different
    path spelling never re-ingests."""
    from datamart_ray.index.maintain import search_on_demand

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, n_files=40, vocab_size=400, n_output_files=1)
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, IndexConfig(docs_per_spec=50))

    # (a) missing, then empty, watch roots: query served, no ingest
    missing = str(tmp_path / "not_yet")
    t, rep = search_on_demand(idx, missing, QUERY, k=500)
    assert rep["added"] == [] and t.num_rows > 0
    os.makedirs(missing)
    t, rep = search_on_demand(idx, missing, QUERY, k=500)
    assert rep["added"] == [] and t.num_rows > 0

    # (c) re-sweeping the ALREADY-INDEXED corpus under ./relative and
    # symlinked spellings: known-file skip, never a duplicate segment
    link = str(tmp_path / "corpus_link")
    os.symlink(corpus, link)
    before = set(_live_ids(idx))
    t1, rep = search_on_demand(idx, link, QUERY, k=500)
    assert rep["added"] == [], rep
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        t1b, rep = search_on_demand(idx, "corpus", QUERY, k=500)
    finally:
        os.chdir(cwd)
    assert rep["added"] == [], rep
    assert set(_live_ids(idx)) == before
    assert t1b["doc_id"].to_pylist() == t1["doc_id"].to_pylist()

    # (b) delete a matching doc: the cached engine must be reopened
    # (version bumped), so the doc disappears from the next answer
    victims = t1["doc_id"].to_pylist()[:2]
    assert delete_docs(idx, victims) == 2
    t2, rep = search_on_demand(idx, missing, QUERY, k=500)
    assert rep["added"] == []
    assert not set(victims) & set(t2["doc_id"].to_pylist()), (
        "stale cached engine served tombstoned docs"
    )


def test_distributed_open_retries_vanished_segment(
    ray_session, tmp_path, monkeypatch
):
    """DistributedSearchEngine.__init__ vs the compaction swap: when a
    listed segment dir vanishes before the scorer actors' eager load,
    the open must re-list and succeed (not crash with RayActorError)."""
    from datamart_ray.search import engine as eng_mod

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, n_files=60, vocab_size=400, n_output_files=2)
    idx = str(tmp_path / "idx")
    build_index(
        corpus, idx, IndexConfig(docs_per_spec=30, segment_docs=30)
    )
    want = SearchEngine(idx).search(QUERY, k=500)

    real = eng_mod._alias_union
    calls = {"n": 0}

    def stale_once(index_dir):
        manifest, analyzer, seg_dirs = real(index_dir)
        calls["n"] += 1
        if calls["n"] == 1:
            # simulate the superseded dir a compaction just deleted
            seg_dirs = seg_dirs + [
                os.path.join(idx, "segments", "seg-99999")
            ]
        return manifest, analyzer, seg_dirs

    monkeypatch.setattr(eng_mod, "_alias_union", stale_once)
    dist = eng_mod.DistributedSearchEngine(idx, max_actors=2)
    got = dist.search(QUERY, k=500)
    assert calls["n"] >= 2, "open never re-listed after the vanish"
    assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
    assert got["score"].to_pylist() == want["score"].to_pylist()
