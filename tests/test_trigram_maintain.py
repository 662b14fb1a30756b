"""Trigram-index lifecycle: tombstone deletes, compaction, tiered
merge bounding delta-segment accumulation, and serving consistency
through a live compaction (the test_concurrency.py pattern)."""

import os
import threading

import numpy as np
import pyarrow.parquet as pq
import pytest

from datamart_ray.corpus import generate_corpus
from datamart_ray.index import trigram as tg
from datamart_ray.index.trigram_maintain import (
    read_tri_tombstones,
    trigram_compact,
    trigram_delete_docs,
    trigram_delete_matching,
)

NEEDLE = "qzcommonneedle"


@pytest.fixture()
def built(ray_session, tmp_path):
    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, n_files=200, vocab_size=500, n_repos=6,
                    seed=7, n_output_files=2)
    idx = str(tmp_path / "idx")
    # several segments so compaction is a real multi-dir merge
    tg.build_trigram_index(
        corpus, idx,
        tg.TrigramConfig(text_col="content", segment_docs=60),
    )
    return corpus, idx


def _hit_ids(idx_dir, corpus, **kw):
    t = tg.TrigramIndex(idx_dir, corpus).substring_search(NEEDLE, **kw)
    return t["doc_id"].to_pylist()


def test_delete_hides_doc_pre_and_post_compaction(built):
    corpus, idx = built
    before = _hit_ids(idx, corpus)
    assert len(before) > 3
    victims = before[:2]
    assert trigram_delete_docs(idx, victims) == 2
    assert trigram_delete_docs(idx, victims) == 0  # idempotent
    live = [d for d in before if d not in victims]

    # pre-compaction: tombstone filter on every search path
    handle = tg.TrigramIndex(idx, corpus)
    assert handle.substring_search(NEEDLE)["doc_id"].to_pylist() == live
    assert (
        handle.regexp_search("qzcommonneedl[e]")["doc_id"].to_pylist()
        == live
    )
    g = handle.grep(NEEDLE)
    assert set(g["doc_id"].to_pylist()) == set(live)
    # streaming full-scan verify path filters too
    import datamart_ray.index.trigram as tgmod

    old_cap = tgmod.VERIFY_FETCH_CAP
    try:
        tgmod.VERIFY_FETCH_CAP = -1
        assert (
            handle.substring_search(NEEDLE)["doc_id"].to_pylist()
            == live
        )
    finally:
        tgmod.VERIFY_FETCH_CAP = old_cap

    # compaction makes the delete physical
    out = trigram_compact(idx)
    assert out["merged"]
    assert read_tri_tombstones(idx).size == 0
    assert _hit_ids(idx, corpus) == live
    # postings no longer contain the victims at all
    seg_root = os.path.join(idx, "segments")
    import json

    with open(os.path.join(idx, "trigram_index.json")) as f:
        man = json.load(f)
    assert len(man["segments"]) == 1
    pt = pq.read_table(
        os.path.join(seg_root, man["segments"][0], "postings")
    )
    from datamart_ray.index import codec

    for blob in pt["docs"].to_pylist():
        ids = codec.decode_docids(blob)
        assert not np.isin(np.asarray(victims), ids).any()


def test_delete_matching_and_out_of_range_ids(built):
    corpus, idx = built
    before = _hit_ids(idx, corpus)
    n = trigram_delete_matching(idx, corpus, "qzuniqueneedle")
    assert n == 1
    # dense indexes ignore ids outside every planned file range
    assert trigram_delete_docs(idx, [10_000_000]) == 0
    assert len(_hit_ids(idx, corpus)) == len(before)


def test_tiered_compact_bounds_delta_segments(ray_session, tmp_path):
    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, n_files=120, vocab_size=400, seed=3,
                    n_output_files=1)
    idx = str(tmp_path / "idx")
    tg.build_trigram_index(
        corpus, idx, tg.TrigramConfig(text_col="content")
    )
    # delta-heavy ingest: 4 extra single-file deltas
    import json

    for i in range(4):
        d = str(tmp_path / f"delta{i}")
        generate_corpus(d, n_files=30, vocab_size=400, seed=50 + i,
                        n_output_files=1)
        tg.trigram_ingest_delta(idx, d)
    with open(os.path.join(idx, "trigram_index.json")) as f:
        man = json.load(f)
    assert len(man["segments"]) == 5
    srcs = [corpus] + [str(tmp_path / f"delta{i}") for i in range(4)]
    before = tg.TrigramIndex(idx, srcs).substring_search(NEEDLE)

    out = trigram_compact(idx, max_segments=2)
    with open(os.path.join(idx, "trigram_index.json")) as f:
        man2 = json.load(f)
    assert len(man2["segments"]) == 2
    # the big base segment was NOT rewritten (smallest-first merge)
    assert man["segments"][0] in man2["segments"]
    after = tg.TrigramIndex(idx, srcs).substring_search(NEEDLE)
    assert after.equals(before)
    # a second tiered pass is a no-op
    out2 = trigram_compact(idx, max_segments=2)
    assert out2["merged"] == []


def test_search_during_trigram_compaction_consistent(built):
    corpus, idx = built
    before = _hit_ids(idx, corpus)
    victims = before[:2]
    trigram_delete_docs(idx, victims)
    live = [d for d in before if d not in victims]

    pre = tg.TrigramIndex(idx, corpus)  # opened before the compaction
    base = pre.substring_search(NEEDLE)
    assert base["doc_id"].to_pylist() == live

    err = []

    def compact():
        try:
            trigram_compact(idx)
        except Exception as e:  # pragma: no cover
            err.append(e)

    t = threading.Thread(target=compact)
    t.start()
    while t.is_alive():
        # pre-opened reader: bit-identical through the swap
        r = pre.substring_search(NEEDLE)
        assert r.equals(base)
        # fresh reader mid-swap: always a full consistent live set
        got = _hit_ids(idx, corpus)
        assert got == live, f"torn view: {got} vs {live}"
    t.join()
    assert not err, err
    assert _hit_ids(idx, corpus) == live


def test_cli_trigram_delete_compact(ray_session, tmp_path, capsys):
    import json

    from datamart_ray.__main__ import main

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, n_files=80, vocab_size=400, seed=5,
                    n_output_files=1)
    idx = str(tmp_path / "idx")
    assert main(["trigram-build", "--input", corpus, "--index", idx,
                 "--text-col", "content"]) == 0
    capsys.readouterr()
    assert main(["grep", "--index", idx, "--corpus", corpus,
                 "--pattern", NEEDLE, "--json"]) == 0
    hits = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    victim = hits[0]["doc_id"]
    assert main(["trigram-delete", "--index", idx,
                 "--ids", str(victim)]) == 0
    assert json.loads(
        capsys.readouterr().out.strip().splitlines()[-1]
    ) == {"deleted": 1}
    assert main(["trigram-compact", "--index", idx]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["merged"]
    assert main(["grep", "--index", idx, "--corpus", corpus,
                 "--pattern", NEEDLE, "--json"]) == 0
    hits2 = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1]
    )
    assert victim not in [h["doc_id"] for h in hits2]
    assert len(hits2) == len(hits) - sum(
        1 for h in hits if h["doc_id"] == victim
    )


def test_snapshot_restore_verify(built, tmp_path, capsys):
    import json

    from datamart_ray.__main__ import main
    from datamart_ray.index.trigram_maintain import (
        trigram_restore,
        trigram_snapshot,
        trigram_verify_invariant,
    )

    corpus, idx = built
    before = _hit_ids(idx, corpus)
    trigram_delete_docs(idx, [before[0]])  # tombstone travels with snap

    snap = str(tmp_path / "snap")
    s = trigram_snapshot(idx, snap)
    assert s["segments"]
    # torn-snapshot refusal
    with pytest.raises(ValueError, match="not a snapshot"):
        trigram_restore(str(tmp_path / "nothing"), str(tmp_path / "x"))
    # restore → identical serving, including the tombstone
    dest = str(tmp_path / "restored")
    trigram_restore(snap, dest)
    got = _hit_ids(dest, corpus)
    assert got == _hit_ids(idx, corpus) == before[1:]
    # non-empty destination refused
    with pytest.raises(ValueError, match="not empty"):
        trigram_restore(snap, dest)
    # invariant audit green on both
    for d in (idx, dest):
        v = trigram_verify_invariant(d)
        assert v and all(
            x["counts_ok"] and x["postings_ok"] and x["ranges_ok"]
            for x in v.values()
        ), v
    # CLI verify exits 0 and prints the audit
    assert main(["trigram-verify", "--index", dest]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert all(v["counts_ok"] for v in out.values())


def test_verify_catches_corruption(built, tmp_path):
    import json

    from datamart_ray.index.trigram_maintain import (
        trigram_verify_invariant,
    )

    corpus, idx = built
    man = json.load(open(os.path.join(idx, "trigram_index.json")))
    seg = man["segments"][0]
    pdir = os.path.join(idx, "segments", seg, "postings")
    f0 = sorted(
        f for f in os.listdir(pdir) if f.endswith(".parquet")
    )[0]
    t = pq.read_table(os.path.join(pdir, f0))
    # corrupt: claim one more df than the blob holds
    import pyarrow as pa

    df = t["df"].to_pylist()
    df[0] += 1
    t2 = t.set_column(
        t.schema.get_field_index("df"),
        "df",
        pa.array(df, type=pa.int32()),
    )
    pq.write_table(t2, os.path.join(pdir, f0))
    v = trigram_verify_invariant(idx)
    assert not (
        v[seg]["counts_ok"] and v[seg]["postings_ok"]
    )


def test_distributed_index_respects_tombstones_and_compaction(built):
    """DistributedTrigramIndex (actor-pool candidates) filters
    tombstoned ids exactly like the in-process handle, and a reopened
    distributed handle serves the compacted view identically."""
    corpus, idx = built
    before = _hit_ids(idx, corpus)
    victim = before[0]
    trigram_delete_docs(idx, [victim])
    live = before[1:]

    d = tg.DistributedTrigramIndex(idx, corpus, n_actors=2)
    try:
        got = d.substring_search(NEEDLE)["doc_id"].to_pylist()
        assert got == live
    finally:
        d.shutdown()

    trigram_compact(idx)
    d2 = tg.DistributedTrigramIndex(idx, corpus, n_actors=2)
    try:
        got2 = d2.substring_search(NEEDLE)
        assert got2["doc_id"].to_pylist() == live
        ref = tg.TrigramIndex(idx, corpus).substring_search(NEEDLE)
        assert got2.equals(ref)
    finally:
        d2.shutdown()


def test_grep_on_demand_and_cli_ingest_from(
    ray_session, tmp_path, capsys
):
    """Query-triggered ingest (the trigram search_on_demand analog):
    never-seen parquet under the watch root becomes a delta segment
    before the grep is served; a second sweep is metadata-only and the
    version-keyed handle cache is reused."""
    import json

    import pyarrow as pa

    from datamart_ray.__main__ import main
    from datamart_ray.index.trigram_maintain import grep_on_demand

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, n_files=60, vocab_size=300, seed=2,
                    n_output_files=1)
    idx = str(tmp_path / "idx")
    tg.build_trigram_index(
        corpus, idx, tg.TrigramConfig(text_col="content")
    )
    watch = tmp_path / "watch"
    watch.mkdir()
    hits0, rep0 = grep_on_demand(idx, str(watch), NEEDLE)
    n0 = hits0.num_rows
    assert n0 > 0

    pq.write_table(
        pa.table({"content": pa.array(
            [f"fresh {NEEDLE} via watch root", "no match"]
        )}),
        str(watch / "new.parquet"),
    )
    hits1, rep1 = grep_on_demand(idx, str(watch), NEEDLE)
    assert hits1.num_rows == n0 + 1
    # steady state: nothing new, same result, cached handle
    hits2, rep2 = grep_on_demand(idx, str(watch), NEEDLE)
    assert hits2.equals(hits1)

    # CLI --ingest-from on grep
    pq.write_table(
        pa.table({"content": pa.array([f"second {NEEDLE} delta"])}),
        str(watch / "new2.parquet"),
    )
    assert main([
        "grep", "--index", idx, "--corpus", corpus,
        "--pattern", NEEDLE, "--json",
        "--ingest-from", str(watch),
    ]) == 0
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(rows) == n0 + 2


def test_compact_crash_between_repoint_and_prune_never_resurrects(
    built, monkeypatch
):
    """The swap-order contract: a compactor dying after the manifest
    repoint but before the tombstone prune leaves stale tombstones for
    already-dropped docs (harmless no-op filter) — the deleted doc must
    stay invisible. (The pre-fix order — prune first — would resurrect
    it.)"""
    import datamart_ray.index.trigram_maintain as tm

    corpus, idx = built
    before = _hit_ids(idx, corpus)
    victim = before[0]
    trigram_delete_docs(idx, [victim])
    live = before[1:]

    real_write = tm._write_tombstones
    calls = {"n": 0}

    def dying_write(index_dir, ids):
        # the delete above already committed; the next write is the
        # compactor's prune — die there
        calls["n"] += 1
        raise RuntimeError("simulated crash before tombstone prune")

    monkeypatch.setattr(tm, "_write_tombstones", dying_write)
    with pytest.raises(RuntimeError, match="simulated crash"):
        trigram_compact(idx)
    monkeypatch.setattr(tm, "_write_tombstones", real_write)

    # the manifest repoint committed; tombstones are stale but the
    # victim is physically gone from the new segment AND still
    # filtered — never visible either way
    assert calls["n"] == 1
    assert _hit_ids(idx, corpus) == live
    assert read_tri_tombstones(idx).size >= 1  # stale, harmless
    # a later successful compact converges the state
    out = trigram_compact(idx)
    assert _hit_ids(idx, corpus) == live


def test_trigram_reindex_replays_tombstones(built, tmp_path):
    from datamart_ray.index.trigram_maintain import (
        trigram_lineage,
        trigram_reindex,
    )

    corpus, idx = built
    before = _hit_ids(idx, corpus)
    victim = before[0]
    trigram_delete_docs(idx, [victim])

    dest = str(tmp_path / "reidx")
    out = trigram_reindex(corpus, idx, dest)
    assert out["replayed_tombstones"] == 1
    # destination serves the same live set; delete survived the rebuild
    assert _hit_ids(dest, corpus) == before[1:]

    # lineage: one row per segment, tombstone counted in-range
    lin = trigram_lineage(dest).to_pylist()
    assert len(lin) == 1  # default segment_docs → one segment
    assert lin[0]["n_tombstones_in_range"] == 1
    assert lin[0]["n_pairs"] > 0
    # lineage of the compacted source records merge ancestry
    trigram_compact(idx)
    lin2 = trigram_lineage(idx).to_pylist()
    assert len(lin2) == 1 and lin2[0]["merged_from"]

    # deletes made PHYSICAL by the compaction must STILL survive a
    # later reindex (tri_dropped.parquet replay — without it, the
    # rebuild from the unchanged source parquet would resurrect them)
    from datamart_ray.index.trigram_maintain import read_tri_dropped

    assert victim in read_tri_dropped(idx).tolist()
    dest2 = str(tmp_path / "reidx2")
    out2 = trigram_reindex(None, idx, dest2)
    assert out2["replayed_tombstones"] == 1
    assert _hit_ids(dest2, corpus) == before[1:]

    # a non-fresh destination is refused (checkpoint-resume would keep
    # old-config segments under unchanged (base, n_docs) names)
    with pytest.raises(ValueError, match="not fresh"):
        trigram_reindex(None, idx, dest)
    # a source_path that does not match the recorded plan is refused
    other = str(tmp_path / "othersrc")
    generate_corpus(other, n_files=10, vocab_size=100, seed=99,
                    n_output_files=1)
    with pytest.raises(ValueError, match="recorded file plan"):
        trigram_reindex(other, idx, str(tmp_path / "reidx3"))
