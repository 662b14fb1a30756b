"""Literal kill-and-resume: SIGKILL a builder subprocess mid-build, then
resume in a fresh process — the index must equal a from-scratch build
(SURVEY.md §5.2 E2E: 'kill after partial build → resume → same index')."""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

from datamart_ray.corpus import generate_corpus
from datamart_ray.index.build import IndexConfig, build_index
from datamart_ray.index.manifest import read_manifest

BUILD_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from datamart_ray.index.build import IndexConfig, build_index
build_index({corpus!r}, {idx!r},
            IndexConfig(docs_per_spec=30, segment_docs=60))
ray.shutdown()
"""


def test_sigkill_midbuild_then_resume(ray_session, tmp_path):
    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, n_files=180, vocab_size=500, n_output_files=6)
    idx = str(tmp_path / "idx")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = BUILD_SCRIPT.format(repo=repo, corpus=corpus, idx=idx)

    seg0 = os.path.join(idx, "segments", "seg-00000", "MANIFEST.json")
    # one retry: under heavy machine load a fresh Ray session in the
    # subprocess can occasionally fail to start before committing anything
    for attempt in range(2):
        proc = subprocess.Popen(
            [sys.executable, "-c", script],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        # wait until at least one segment commits, then SIGKILL the builder
        deadline = time.time() + 240
        while time.time() < deadline and not os.path.exists(seg0):
            if proc.poll() is not None:
                break  # finished before we could kill — still a valid resume
            time.sleep(0.2)
        if proc.poll() is None:
            proc.send_signal(signal.SIGKILL)
            proc.wait()
        if os.path.exists(seg0):
            break
        time.sleep(5)  # builder died without committing — retry once
    assert os.path.exists(seg0), "no segment committed before kill"

    committed_before = sorted(
        d
        for d in os.listdir(os.path.join(idx, "segments"))
        if d.startswith("seg-")
        and os.path.exists(
            os.path.join(idx, "segments", d, "MANIFEST.json")
        )
    )

    # resume in THIS process (fresh Ray session via the shared fixture)
    cfg = IndexConfig(docs_per_spec=30, segment_docs=60)
    m = build_index(corpus, idx, cfg)
    assert set(m["resumed_skipped"]) >= set(committed_before)
    assert sorted(m["segments"]) == sorted(
        m["built"] + m["resumed_skipped"]
    )

    # resumed index must equal a from-scratch build
    fresh = str(tmp_path / "fresh")
    build_index(corpus, fresh, cfg)
    for seg in m["segments"]:
        a = read_manifest(os.path.join(idx, "segments", seg))
        b = read_manifest(os.path.join(fresh, "segments", seg))
        for key in (
            "n_docs",
            "total_doclen",
            "n_terms",
            "n_postings",
            "sha256_rollup",
        ):
            assert a[key] == b[key], (seg, key)


def test_empty_parquet_file_skipped(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, n_files=30, vocab_size=300, n_output_files=1)
    empty = pa.table(
        {
            c: pa.array([], type=pa.string())
            for c in ("repo", "path", "commit", "lang", "content")
        }
    )
    pq.write_table(empty, os.path.join(corpus, "corpus-zzz-empty.parquet"))
    idx = str(tmp_path / "idx")
    m = build_index(corpus, idx, IndexConfig(docs_per_spec=20))
    total = sum(
        read_manifest(os.path.join(idx, "segments", s))["n_docs"]
        for s in m["segments"]
    )
    assert total == 30


def test_multi_megabyte_documents(ray_session, tmp_path):
    """Wide rows (multi-MB content) must index and query without blowup."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datamart_ray.search.engine import SearchEngine

    big = ("bigtoken " * 150_000) + " qzbigneedle"  # ~1.4 MB
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array([big, big + " extra", "tiny doc qzbigneedle"]),
        }
    )
    src = str(tmp_path / "big.parquet")
    pq.write_table(docs, src)
    idx = str(tmp_path / "idx")
    build_index(
        src,
        idx,
        IndexConfig(content_col="text", id_col="doc_id", meta_cols=()),
    )
    eng = SearchEngine(idx)
    hits = eng.search("qzbigneedle", k=10)
    assert hits.num_rows == 3
    # the tiny doc wins: same tf, far smaller dl
    assert hits["doc_id"].to_pylist()[0] == 2


def test_resumable_sink_skips_committed_shards(ray_session, tmp_path):
    """Crash-resume contract of the generic output sink: committed
    shards are skipped on re-run, uncommitted partials are wiped and
    rewritten, and the union of committed shards is exactly the input."""
    import os
    import shutil

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data as rd

    from datamart_ray.sources.sink import (
        SHARD_COL,
        committed_shards,
        read_resumable_output,
        write_parquet_resumable,
    )

    src = str(tmp_path / "src.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(1000), pa.int64()),
                "v": pa.array(np.arange(1000) * 3),
            }
        ),
        src,
    )
    out = str(tmp_path / "out")
    make = lambda: rd.read_parquet(src)

    r1 = write_parquet_resumable(make, out, "doc_id", n_shards=8)
    assert sorted(r1["written"]) == list(range(8))
    assert committed_shards(out) == set(range(8))

    # simulate a crash: drop two markers, leave one's files partial
    os.remove(os.path.join(out, "_SUCCESS.3"))
    os.remove(os.path.join(out, "_SUCCESS.5"))
    shutil.rmtree(os.path.join(out, f"{SHARD_COL}=5"))

    r2 = write_parquet_resumable(make, out, "doc_id", n_shards=8)
    assert r2["written"] == [3, 5]
    assert r2["skipped"] == [0, 1, 2, 4, 6, 7]
    assert committed_shards(out) == set(range(8))

    back = read_resumable_output(out).to_pandas()
    assert len(back) == 1000
    assert sorted(back["doc_id"].tolist()) == list(range(1000))
    assert (back.sort_values("doc_id")["v"].to_numpy()
            == np.arange(1000) * 3).all()

    # fully committed => pure no-op
    r3 = write_parquet_resumable(make, out, "doc_id", n_shards=8)
    assert r3["written"] == []


def test_resumable_sink_refuses_layout_change(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    import ray.data as rd

    from datamart_ray.sources.sink import write_parquet_resumable

    src = str(tmp_path / "src.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(range(100), pa.int64())}), src
    )
    out = str(tmp_path / "out")
    make = lambda: rd.read_parquet(src)
    write_parquet_resumable(make, out, "doc_id", n_shards=8)
    with pytest.raises(ValueError, match="cannot resume"):
        write_parquet_resumable(make, out, "doc_id", n_shards=16)
