"""Tombstone deletes + incremental delta ingest."""

import os

import numpy as np
import pyarrow as pa
import pytest

from datamart_ray.corpus import generate_corpus
from datamart_ray.index.build import IndexConfig, build_index
from datamart_ray.index.maintain import delete_docs, delete_where, ingest_delta
from datamart_ray.search.engine import SearchEngine


@pytest.fixture()
def small_index(ray_session, tmp_path):
    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, n_files=120, vocab_size=800, n_output_files=3)
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, IndexConfig(docs_per_spec=50))
    return corpus, idx


def test_delete_docs_removes_from_results(small_index):
    _, idx = small_index
    eng = SearchEngine(idx)
    before = eng.search("qzcommonneedle", k=50)["doc_id"].to_pylist()
    assert len(before) > 2
    victims = before[:2]
    n = delete_docs(idx, victims)
    assert n == 2
    eng2 = SearchEngine(idx)
    after = eng2.search("qzcommonneedle", k=50)["doc_id"].to_pylist()
    assert set(after) == set(before) - set(victims)
    # surviving docs keep identical scores (stats not rewritten)
    s_before = dict(
        zip(before, eng.search("qzcommonneedle", k=50)["score"].to_pylist())
    )
    s_after = dict(
        zip(after, eng2.search("qzcommonneedle", k=50)["score"].to_pylist())
    )
    for d in after:
        assert abs(s_before[d] - s_after[d]) < 1e-12
    # idempotent
    assert delete_docs(idx, victims) == 0


def test_delete_where_and_or_mode(small_index):
    _, idx = small_index
    n = delete_where(idx, "lang", "python")
    assert n > 0
    eng = SearchEngine(idx)
    hits = eng.search("qzstopneedle qzcommonneedle", k=200, mode="or")
    assert len(hits) > 0
    got = eng.search("qzstopneedle", k=500, mode="or").num_rows
    # docs 20/21 carry TIE_CONTENT without the marker → up to 2 fewer hits
    assert eng.n_docs - n - 2 <= got <= eng.n_docs - n


def test_ingest_delta_appends_segment(ray_session, tmp_path):
    corpus_a = str(tmp_path / "a")
    corpus_b = str(tmp_path / "b")
    generate_corpus(corpus_a, n_files=80, vocab_size=500, n_output_files=2)
    generate_corpus(corpus_b, n_files=40, vocab_size=500, n_output_files=1, seed=43)
    idx = str(tmp_path / "idx")
    build_index(corpus_a, idx, IndexConfig(docs_per_spec=50))
    n_before = SearchEngine(idx).n_docs
    res = ingest_delta(idx, corpus_b, IndexConfig(docs_per_spec=50))
    assert res["added"] == ["seg-00001"]
    eng = SearchEngine(idx)
    assert eng.n_docs == n_before + 40
    # dense docIDs don't collide across segments
    all_ids = np.concatenate([r._doc_ids for r in eng.readers])
    assert np.unique(all_ids).size == all_ids.size
    # re-ingesting the same files is a no-op
    res2 = ingest_delta(idx, corpus_b, IndexConfig(docs_per_spec=50))
    assert res2["added"] == []


def test_resume_rebuilds_on_input_change(ray_session, tmp_path):
    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, n_files=60, vocab_size=400, n_output_files=2)
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(docs_per_spec=50)
    build_index(corpus, idx, cfg)
    # grow the input: same dir, extra file → seg-00000's file list changes
    generate_corpus(
        str(tmp_path / "extra"), n_files=30, vocab_size=400, n_output_files=1, seed=9
    )
    os.rename(
        str(tmp_path / "extra" / "corpus-00000.parquet"),
        os.path.join(corpus, "corpus-99999.parquet"),
    )
    m = build_index(corpus, idx, cfg)
    assert m["built"]  # stale segment rebuilt, not wrongly skipped
    assert SearchEngine(idx).n_docs == 90


def test_compaction_makes_deletes_permanent(ray_session, tmp_path):
    """delete → compact → single segment, stats shrink, scores reflect
    the smaller corpus, results still match a fresh oracle of survivors."""
    import pyarrow.parquet as pq

    from datamart_ray.index.maintain import compact_segments
    from datamart_ray.oracle import PyBM25Oracle

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, n_files=100, vocab_size=600, n_output_files=2)
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(docs_per_spec=40, segment_docs=60)  # → 2 segments
    build_index(corpus, idx, cfg)
    eng0 = SearchEngine(idx)
    assert len(eng0.readers) == 2

    victims = eng0.search("qzcommonneedle", k=5)["doc_id"].to_pylist()[:3]
    delete_docs(idx, victims)
    m = compact_segments(idx, cfg)
    assert m["n_deleted"] == 3
    assert m["compacted_from"] == ["seg-00000", "seg-00001"]

    eng = SearchEngine(idx)
    assert len(eng.readers) == 1
    assert eng.n_docs == 100 - 3

    # oracle over the surviving docs only — scores must match exactly
    src = pq.read_table(corpus)
    survivors = [
        (i, s)
        for i, s in enumerate(src["content"].to_pylist())
        if i not in set(victims)
    ]
    oracle = PyBM25Oracle(survivors)
    for q, mode in [("qzcommonneedle", "and"), ("qzstopneedle qzpairneedlea", "or")]:
        got = eng.search(q, k=50, mode=mode)
        want = oracle.search(q, k=50, mode=mode)
        assert got["doc_id"].to_pylist() == [d for d, _ in want], q
        assert np.allclose(
            got["score"].to_pylist(), [s for _, s in want], atol=1e-9
        ), q


def test_delete_compact_delta_docid_uniqueness(ray_session, tmp_path):
    """ADVICE high: delta after delete+compact must not reuse surviving
    doc IDs (base = max docID + 1, not sum of shrunken n_docs)."""
    from datamart_ray.index.maintain import compact_segments

    corpus_a = str(tmp_path / "a")
    corpus_b = str(tmp_path / "b")
    generate_corpus(corpus_a, n_files=60, vocab_size=500, n_output_files=2)
    generate_corpus(
        corpus_b, n_files=20, vocab_size=500, n_output_files=1, seed=43
    )
    idx = str(tmp_path / "idx")
    build_index(corpus_a, idx, IndexConfig(docs_per_spec=30))
    delete_docs(idx, [3, 10, 17, 40, 55])
    compact_segments(idx)
    res = ingest_delta(idx, corpus_b, IndexConfig(docs_per_spec=30))
    assert res["added"]
    eng = SearchEngine(idx)
    all_ids = np.concatenate([r._doc_ids for r in eng.readers])
    assert np.unique(all_ids).size == all_ids.size
    # delta IDs start past the original corpus max (59), despite deletes
    assert all_ids.max() == 59 + 20
    assert eng.n_docs == 60 - 5 + 20


def test_compact_preserves_committed_config(ray_session, tmp_path):
    """ADVICE medium: compact(config=None) keeps the committed analyzer
    instead of silently swapping in the default one."""
    from datamart_ray.analyzer import Analyzer
    from datamart_ray.index.maintain import compact_segments

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, n_files=40, vocab_size=300, n_output_files=1)
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(
        analyzer=Analyzer(stem="porter"), docs_per_spec=20
    )
    build_index(corpus, idx, cfg)
    before = SearchEngine(idx).search("running qzcommonneedle", mode="or")
    compact_segments(idx)  # config=None → must load committed config
    eng = SearchEngine(idx)
    assert eng.analyzer.stem == "porter"
    after = eng.search("running qzcommonneedle", mode="or")
    assert after["doc_id"].to_pylist() == before["doc_id"].to_pylist()
    assert np.allclose(
        after["score"].to_pylist(), before["score"].to_pylist(), atol=1e-12
    )


def test_compact_swap_is_crash_safe(ray_session, tmp_path):
    """ADVICE medium: after compaction the merged segment lives under a
    fresh name; readers follow index.json, and an interrupted swap (old
    dirs still on disk) neither duplicates docs nor loses data."""
    import shutil

    from datamart_ray.index.maintain import _gc_orphan_segments, compact_segments
    from datamart_ray.index.manifest import (
        active_segments,
        list_committed_segments,
    )

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, n_files=60, vocab_size=400, n_output_files=2)
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, IndexConfig(docs_per_spec=30, segment_docs=40))
    n0 = SearchEngine(idx).n_docs
    # simulate a crash mid-swap: re-create a stale old segment dir AFTER
    # compaction committed the new one and repointed index.json
    old_dirs = active_segments(idx)
    backup = str(tmp_path / "backup-seg")
    shutil.copytree(old_dirs[0], backup)
    compact_segments(idx)
    stale = os.path.join(idx, "segments", os.path.basename(old_dirs[0]))
    shutil.copytree(backup, stale)
    # index.json is the authority: stale dir is invisible to readers
    assert len(active_segments(idx)) == 1
    eng = SearchEngine(idx)
    assert eng.n_docs == n0
    assert len(list_committed_segments(idx)) == 2
    # and gc removes the orphan
    removed = _gc_orphan_segments(idx)
    assert removed == [os.path.basename(old_dirs[0])]
    assert len(list_committed_segments(idx)) == 1


def test_compaction_rechunk_path_equivalent(ray_session, tmp_path):
    """Default streaming chunk-strip and full rechunk produce identical
    search results after deletes."""
    from datamart_ray.index.maintain import compact_segments
    import shutil

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, n_files=80, vocab_size=500, n_output_files=2)
    for mode in (False, True):
        idx = str(tmp_path / f"idx_{mode}")
        build_index(
            corpus, idx, IndexConfig(docs_per_spec=40, segment_docs=50)
        )
        delete_docs(idx, [1, 5, 9, 33])
        compact_segments(idx, rechunk=mode)
    a = SearchEngine(str(tmp_path / "idx_False"))
    b = SearchEngine(str(tmp_path / "idx_True"))
    for q, m in [("qzcommonneedle", "and"), ("qzstopneedle qzpairneedlea", "or")]:
        ra = a.search(q, k=100, mode=m)
        rb = b.search(q, k=100, mode=m)
        assert ra["doc_id"].to_pylist() == rb["doc_id"].to_pylist(), q
        assert ra["score"].to_pylist() == rb["score"].to_pylist(), q
    assert a.n_docs == b.n_docs == 76


def test_lifecycle_marathon_delta_delete_compact(ray_session, tmp_path):
    """Three delete→compact→delta cycles: doc IDs stay globally unique,
    crashed-compact leftovers are tolerated, and final results match an
    exhaustive oracle over the surviving docs."""
    import pyarrow.parquet as pq

    from datamart_ray.index.maintain import compact_segments
    from datamart_ray.oracle import PyBM25Oracle

    idx = str(tmp_path / "idx")
    corpora = []
    for i in range(4):
        c = str(tmp_path / f"c{i}")
        generate_corpus(
            c, n_files=40, vocab_size=400, n_output_files=1, seed=50 + i
        )
        corpora.append(c)
    build_index(corpora[0], idx, IndexConfig(docs_per_spec=20))

    alive: dict[int, str] = {}  # doc_id → content
    t = pq.read_table(corpora[0])
    for i, s in enumerate(t["content"].to_pylist()):
        alive[i] = s
    next_id = 40
    for cycle, corpus in enumerate(corpora[1:]):
        # delete two live docs, compact, then ingest the next corpus
        victims = sorted(alive)[cycle : cycle + 2]
        delete_docs(idx, victims)
        for v in victims:
            del alive[v]
        # leave a fake stale tmp dir — compact must tolerate it
        import os

        os.makedirs(
            os.path.join(idx, "segments", ".tmp-compact"), exist_ok=True
        )
        compact_segments(idx)
        ingest_delta(idx, corpus, IndexConfig(docs_per_spec=20))
        t = pq.read_table(corpus)
        for i, s in enumerate(t["content"].to_pylist()):
            alive[next_id + i] = s
        next_id += 40

    eng = SearchEngine(idx)
    all_ids = np.concatenate([r._doc_ids for r in eng.readers])
    assert np.unique(all_ids).size == all_ids.size
    assert eng.n_docs == len(alive) == 160 - 6
    oracle = PyBM25Oracle(sorted(alive.items()))
    for q, mode in [
        ("qzcommonneedle", "and"),
        ("qzstopneedle qzpairneedlea", "or"),
    ]:
        got = eng.search(q, k=100, mode=mode)
        want = oracle.search(q, k=100, mode=mode)
        assert got["doc_id"].to_pylist() == [d for d, _ in want], q
        assert np.allclose(
            got["score"].to_pylist(), [s for _, s in want], atol=1e-9
        ), q


def test_verify_index_invariant(ray_session, tmp_path):
    from datamart_ray.index.maintain import verify_index_invariant
    import pyarrow.parquet as pq

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, n_files=50, vocab_size=300, n_output_files=2)
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, IndexConfig(docs_per_spec=25))
    rep = verify_index_invariant(idx)
    assert all(
        v["docmeta_ok"] and v["source_ok"] for v in rep.values()
    ), rep
    # corrupt one docmeta sha → the audit catches it
    import glob

    f = glob.glob(f"{idx}/segments/seg-00000/docmeta/*.parquet")[0]
    t = pq.read_table(f)
    bad = t.set_column(
        t.schema.get_field_index("sha256"),
        "sha256",
        pa.array(["0" * 64] * t.num_rows),
    )
    pq.write_table(bad, f)
    rep2 = verify_index_invariant(idx)
    assert not all(v["docmeta_ok"] for v in rep2.values())


def test_rebuild_preserves_delta_segments(ray_session, tmp_path):
    """ADVICE r2 medium: build → delta → build(resume) → compact must not
    lose the delta docs. The rebuild's index.json must keep active
    segments whose files are outside its input; compact then merges all
    of them instead of gc'ing the delta as an orphan."""
    from datamart_ray.index.maintain import compact_segments

    corpus_a = str(tmp_path / "a")
    corpus_b = str(tmp_path / "b")
    generate_corpus(corpus_a, n_files=60, vocab_size=400, n_output_files=2)
    generate_corpus(
        corpus_b, n_files=20, vocab_size=400, n_output_files=1, seed=43
    )
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(docs_per_spec=30)
    build_index(corpus_a, idx, cfg)
    ingest_delta(idx, corpus_b, cfg)
    assert SearchEngine(idx).n_docs == 80

    # re-run the original build (the "resume" a crashed driver retries)
    m = build_index(corpus_a, idx, cfg)
    assert m["built"] == []  # seg-00000 resumed
    assert "seg-00001" in m["segments"]  # delta segment preserved
    assert m["preserved"] == ["seg-00001"]
    eng = SearchEngine(idx)
    assert eng.n_docs == 80  # delta docs still searchable

    # compact must merge, not delete, the delta
    cm = compact_segments(idx)
    assert cm["n_docs"] == 80
    assert SearchEngine(idx).n_docs == 80

    # rebuilding from the ORIGINAL input after compaction is ambiguous
    # (the compacted segment covers files both in and out of the input)
    with pytest.raises(ValueError, match="inside and outside"):
        build_index(corpus_a, idx, cfg)


def test_rebuild_docid_collision_refused(ray_session, tmp_path):
    """A grown rebuild whose dense docIDs would reach into a preserved
    delta segment's range is refused instead of corrupting the index."""
    corpus_a = str(tmp_path / "a")
    corpus_b = str(tmp_path / "b")
    generate_corpus(corpus_a, n_files=40, vocab_size=300, n_output_files=1)
    generate_corpus(
        corpus_b, n_files=20, vocab_size=300, n_output_files=1, seed=43
    )
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(docs_per_spec=30)
    build_index(corpus_a, idx, cfg)
    ingest_delta(idx, corpus_b, cfg)  # delta docIDs 40..59
    # grow the original input past the delta base (40 → 50 docs)
    generate_corpus(
        str(tmp_path / "extra"), n_files=10, vocab_size=300,
        n_output_files=1, seed=9,
    )
    os.rename(
        str(tmp_path / "extra" / "corpus-00000.parquet"),
        os.path.join(corpus_a, "corpus-99999.parquet"),
    )
    with pytest.raises(ValueError, match="collide"):
        build_index(corpus_a, idx, cfg)


def test_snapshot_restore_point_in_time(small_index, tmp_path):
    """ES snapshot analog: a snapshot taken after deletes restores a
    point-in-time view — later mutations (more deletes + compaction) of
    the ORIGINAL never leak into the restored index. Torn snapshots
    (no snapshot.json) and non-empty targets are refused."""
    from datamart_ray.index.maintain import (
        compact_segments,
        snapshot_index,
        restore_index,
    )

    _, idx = small_index
    eng = SearchEngine(idx)
    before = eng.search("qzcommonneedle", k=200)["doc_id"].to_pylist()
    assert len(before) > 4
    delete_docs(idx, before[:2])
    at_snap = SearchEngine(idx).search("qzcommonneedle", k=200)
    snap = str(tmp_path / "snap")
    manifest = snapshot_index(idx, snap)
    assert manifest["segments"]
    # mutate the original AFTER the snapshot
    delete_docs(idx, before[2:4])
    compact_segments(idx)
    mutated = SearchEngine(idx).search("qzcommonneedle", k=200)
    assert set(mutated["doc_id"].to_pylist()) == set(
        at_snap["doc_id"].to_pylist()
    ) - set(before[2:4])
    # restore → exactly the at-snapshot view (ids AND scores)
    dest = str(tmp_path / "restored")
    restore_index(snap, dest)
    got = SearchEngine(dest).search("qzcommonneedle", k=200)
    assert got["doc_id"].to_pylist() == at_snap["doc_id"].to_pylist()
    assert np.allclose(
        got["score"].to_numpy(), at_snap["score"].to_numpy(), atol=0
    )
    # refusals: non-empty target, torn snapshot
    with pytest.raises(ValueError, match="not empty"):
        restore_index(snap, dest)
    os.remove(os.path.join(snap, "snapshot.json"))
    with pytest.raises(ValueError, match="torn"):
        restore_index(snap, str(tmp_path / "restored2"))


def test_delete_by_query_matches_search_set(small_index):
    from datamart_ray.index.maintain import delete_by_query

    _, idx = small_index
    eng = SearchEngine(idx)
    matched = set(
        eng.search("qzcommonneedle", k=eng.n_docs, mode="and")[
            "doc_id"
        ].to_pylist()
    )
    assert matched
    n = delete_by_query(idx, "qzcommonneedle", mode="and")
    assert n == len(matched)
    eng2 = SearchEngine(idx)
    assert eng2.search("qzcommonneedle", k=50).num_rows == 0
    # unrelated docs survive
    assert eng2.search("qzuniqueneedle", k=5).num_rows == 1
    # idempotent
    assert delete_by_query(idx, "qzcommonneedle") == 0


def test_reindex_replays_tombstones(small_index, tmp_path):
    from datamart_ray.index.maintain import delete_by_query, reindex

    corpus, idx = small_index
    n_del = delete_by_query(idx, "qzcommonneedle")
    assert n_del > 0
    dest = str(tmp_path / "re_idx")
    res = reindex(corpus, idx, dest, IndexConfig(docs_per_spec=30))
    assert res["replayed_tombstones"] == n_del
    src_eng, dst_eng = SearchEngine(idx), SearchEngine(dest)
    # live doc set identical; deleted docs stay deleted in the new index
    assert dst_eng.search("qzcommonneedle", k=50).num_rows == 0
    for q in ("qzuniqueneedle", "qzfilterneedle"):
        a = src_eng.search(q, k=50).to_pandas()
        b = dst_eng.search(q, k=50).to_pandas()
        assert a["doc_id"].tolist() == b["doc_id"].tolist(), q


def test_distributed_facet_matches_inprocess(small_index):
    from datamart_ray.search.engine import DistributedSearchEngine

    _, idx = small_index
    eng = SearchEngine(idx)
    deng = DistributedSearchEngine(idx, max_actors=3)
    try:
        for q, mode in (("qzcommonneedle", "and"), ("qzstopneedle qzcommonneedle", "or")):
            a = eng.facet_counts(q, "lang", mode=mode).to_pandas()
            b = deng.facet_counts(q, "lang", mode=mode).to_pandas()
            assert a.equals(b), (q, mode)
    finally:
        deng.shutdown()


def test_tiered_merge_keeps_big_segments(ray_session, tmp_path):
    """Tiered policy merges only the smallest segments: the count drops
    to max_segments, the biggest segment survives untouched, deletes in
    merged segments become permanent, and search results are identical
    (rank + score) to the pre-merge view."""
    from datamart_ray.index.maintain import (
        delete_docs,
        tiered_merge,
        verify_index_invariant,
    )
    from datamart_ray.index.manifest import active_segments, read_manifest

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, n_files=150, vocab_size=800, n_output_files=6)
    idx = str(tmp_path / "idx")
    # tiny segment budget => one segment per input file (6 segments)
    build_index(
        corpus, idx, IndexConfig(docs_per_spec=30, segment_docs=30)
    )
    segs = active_segments(idx)
    assert len(segs) >= 4
    sizes = {
        os.path.basename(d): read_manifest(d)["n_docs"] for d in segs
    }
    biggest = max(sizes, key=lambda s: sizes[s])
    eng = SearchEngine(idx)
    before = eng.search("qzcommonneedle", k=50)
    victims = before["doc_id"].to_pylist()[:2]
    delete_docs(idx, victims)
    want = SearchEngine(idx).search("qzcommonneedle", k=50)

    res = tiered_merge(idx, max_segments=2)
    assert res["merged"], "policy should have merged something"
    after_segs = [os.path.basename(d) for d in active_segments(idx)]
    assert len(after_segs) == 2
    # the largest segment must survive unless it was itself a victim
    if biggest not in res["merged"]:
        assert biggest in after_segs
    # live doc accounting: the merged segment holds exactly the merged
    # segments' docs minus the tombstones it folded in permanently
    merged_dir = [
        d
        for d in active_segments(idx)
        if os.path.basename(d) == res["segment"]
    ][0]
    mm = read_manifest(merged_dir)
    assert mm["n_docs"] == sum(sizes[v] for v in res["merged"]) - mm[
        "n_deleted"
    ]
    # rank identity vs the pre-merge view (stats fold only inside the
    # merged segments, scores may shift; order must not)
    got = SearchEngine(idx).search("qzcommonneedle", k=50)
    assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
    audit = verify_index_invariant(idx)
    assert all(v["docmeta_ok"] for v in audit.values())
    # within budget => no-op
    assert tiered_merge(idx, max_segments=2)["merged"] == []


def test_lineage_records_cover_active_segments(ray_session, tmp_path):
    from datamart_ray.index.maintain import delete_docs, lineage_records
    from datamart_ray.index.manifest import active_segments

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, n_files=120, vocab_size=800, n_output_files=2)
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, IndexConfig(docs_per_spec=40))
    delete_docs(idx, [0, 1, 2])
    t = lineage_records(idx).to_pandas()
    assert len(t) == len(active_segments(idx))
    assert (t["n_live_docs"] == t["n_docs"] - t["n_tombstones"]).all()
    assert int(t["n_docs"].sum()) == 120
    assert int(t["n_tombstones"].sum()) == 3
    assert (t["sha256_rollup"].str.len() == 64).all()
    assert (t["n_source_files"] > 0).all()


def test_search_on_demand_ingests_then_serves(ray_session, tmp_path):
    """Query-triggered ingest (the reference's on-demand discovery
    analog): never-seen source files become a delta segment before the
    query is answered; a steady-state repeat is metadata-only."""
    from datamart_ray.index.maintain import search_on_demand

    corpus_a = str(tmp_path / "a")
    corpus_b = str(tmp_path / "b")
    generate_corpus(corpus_a, n_files=60, vocab_size=600, n_output_files=2)
    generate_corpus(corpus_b, n_files=40, vocab_size=600, n_output_files=2)
    idx = str(tmp_path / "idx")
    build_index(corpus_a, idx, IndexConfig(docs_per_spec=50))
    n_before = SearchEngine(idx).search("qzcommonneedle", k=500).num_rows

    t, report = search_on_demand(
        idx, [corpus_a, corpus_b], "qzcommonneedle", k=500
    )
    assert len(report["added"]) == 1
    assert t.num_rows > n_before  # corpus_b's marker docs are served
    assert SearchEngine(idx).n_docs == 100

    # steady state: everything known -> no new segment, same answer
    t2, report2 = search_on_demand(
        idx, [corpus_a, corpus_b], "qzcommonneedle", k=500
    )
    assert report2["added"] == []
    assert t2["doc_id"].to_pylist() == t["doc_id"].to_pylist()
    assert t2["score"].to_pylist() == t["score"].to_pylist()
