"""Disk-state budget: LRU-by-mtime eviction (VERDICT r3 "Next round" #8).

Mirrors the reference coordinator's policy
(coordinator/coordinator/cache.py:39-137): over the high-water mark,
keep the newest entries that fit under low = 0.33 * high, evict the
rest — and never touch the active index itself.
"""

import json
import os
import subprocess
import sys

from datamart_ray.corpus import generate_corpus
from datamart_ray.index.build import IndexConfig, build_index
from datamart_ray.index.heap import HEAP_FILE, build_posting_heap
from datamart_ray.index.maintain import snapshot_index
from datamart_ray.index.manifest import active_segments
from datamart_ray.prune import prune_state, scan_state
from datamart_ray.search.engine import SearchEngine


def _write_artifact(root, name, size, mtime):
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, name)
    with open(path, "wb") as f:
        f.write(b"x" * size)
    os.utime(path, (mtime, mtime))
    return path


def test_prune_evicts_oldest_until_low_water(tmp_path):
    root = str(tmp_path / "artifacts")
    # 4 artifacts, 1000 bytes each, strictly increasing mtime
    paths = [
        _write_artifact(root, f"a{i}.parquet", 1000, 1_000_000 + i)
        for i in range(4)
    ]
    # total 4000 > high 3500 → keep newest under low = 1155 → only a3
    rep = prune_state(artifact_roots=[root], high_bytes=3500)
    assert rep["total_bytes"] == 4000
    evicted = {e["path"] for e in rep["evicted"]}
    assert evicted == set(paths[:3]), rep
    assert os.path.exists(paths[3])
    assert all(not os.path.exists(p) for p in paths[:3])

    # under budget → no-op
    rep2 = prune_state(artifact_roots=[root], high_bytes=3500)
    assert rep2["evicted"] == []


def test_prune_nested_key_dirs(tmp_path):
    """The REAL artifact layout is {root}/{family}/{key}/file.parquet
    (ivf_centroids, pq_codebooks, profile_index, idx): each key dir is
    ONE eviction unit, removed whole — never a file inside it."""
    root = str(tmp_path / "artifacts")
    key_dirs = []
    for i, (fam, key) in enumerate(
        [
            ("ivf_centroids", "aaaa"),
            ("pq_codebooks", "bbbb"),
            ("idx", "cccc"),
        ]
    ):
        d = os.path.join(root, fam, key)
        _write_artifact(d, "part0.parquet", 600, 1_000_000 + 2 * i)
        _write_artifact(d, "part1.parquet", 400, 1_000_000 + 2 * i + 1)
        key_dirs.append(d)
    # in-flight temp entries directly under a family dir are invisible
    _write_artifact(
        os.path.join(root, "ivf_centroids"),
        "stray.tmp.123", 10_000, 1_000_000,
    )

    entries = scan_state(artifact_roots=[root])
    assert {e["path"] for e in entries} == set(key_dirs)
    assert all(e["bytes"] == 1000 for e in entries)
    # recency = newest contained file, so key_dirs[2] is newest;
    # low = 0.5 * 2500 = 1250 keeps exactly the newest key dir
    rep = prune_state(
        artifact_roots=[root], high_bytes=2500, low_frac=0.5
    )
    evicted = {e["path"] for e in rep["evicted"]}
    assert evicted == set(key_dirs[:2]), rep
    assert not os.path.isdir(key_dirs[0]) and not os.path.isdir(key_dirs[1])
    # survivor kept INTACT — both files present
    assert sorted(os.listdir(key_dirs[2])) == [
        "part0.parquet", "part1.parquet"
    ]


def test_prune_dry_run_and_env_budget(tmp_path, monkeypatch):
    root = str(tmp_path / "artifacts")
    paths = [
        _write_artifact(root, f"a{i}.bin", 500, 2_000_000 + i)
        for i in range(3)
    ]
    monkeypatch.setenv("DATAMART_RAY_MAX_CACHE_BYTES", "1000")
    rep = prune_state(artifact_roots=[root], dry_run=True)
    assert rep["high_bytes"] == 1000
    assert len(rep["evicted"]) >= 2
    assert all(os.path.exists(p) for p in paths), "dry run deleted files"


def test_prune_sidecars_not_index(ray_session, tmp_path):
    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, n_files=80, vocab_size=600, n_output_files=2)
    idx = str(tmp_path / "idx")
    build_index(
        corpus, idx, IndexConfig(docs_per_spec=40, segment_docs=50)
    )
    segs = active_segments(idx)
    assert len(segs) >= 2
    for d in segs:
        build_posting_heap(d)
    entries = scan_state(index_dirs=[idx])
    assert {e["kind"] for e in entries} == {"sidecar"}
    assert len(entries) == len(segs)

    baseline = SearchEngine(idx).search("qzcommonneedle", k=50)

    rep = prune_state(index_dirs=[idx], high_bytes=1)
    assert len(rep["evicted"]) >= 1
    # newest sidecar may survive under low-water; evicted ones are gone
    for e in rep["evicted"]:
        assert not os.path.exists(e["path"])
    # the index itself is untouched and still serves identically,
    # including in lazy mode (sidecar rebuilt atomically on open)
    after = SearchEngine(idx).search("qzcommonneedle", k=50)
    assert after.equals(baseline)
    lazy = SearchEngine(idx, lazy=True).search("qzcommonneedle", k=50)
    assert lazy["doc_id"].to_pylist() == baseline["doc_id"].to_pylist()
    for d in segs:
        assert os.path.isfile(os.path.join(d, "MANIFEST.json"))


def test_prune_snapshots_opt_in(ray_session, tmp_path):
    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, n_files=40, vocab_size=400, n_output_files=1)
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, IndexConfig(docs_per_spec=50))
    snaps = str(tmp_path / "snaps")
    snapshot_index(idx, os.path.join(snaps, "s1"))
    snapshot_index(idx, os.path.join(snaps, "s2"))
    os.utime(os.path.join(snaps, "s1"), (1_000_000, 1_000_000))

    # snapshots are invisible unless their root is explicitly passed
    assert scan_state(artifact_roots=[snaps]) == []
    rep = prune_state(artifact_roots=[snaps], high_bytes=1)
    assert rep["evicted"] == []
    assert os.path.isdir(os.path.join(snaps, "s1"))

    entries = scan_state(snapshot_dirs=[snaps])
    assert {e["kind"] for e in entries} == {"snapshot"}
    rep = prune_state(snapshot_dirs=[snaps], high_bytes=1)
    evicted = {os.path.basename(e["path"]) for e in rep["evicted"]}
    assert "s1" in evicted  # oldest goes first
    assert not os.path.isdir(os.path.join(snaps, "s1"))


def test_prune_cli(ray_session, tmp_path):
    root = str(tmp_path / "artifacts")
    for i in range(3):
        _write_artifact(root, f"a{i}.bin", 400, 3_000_000 + i)
    out = subprocess.run(
        [
            sys.executable, "-m", "datamart_ray", "prune",
            "--artifacts", root, "--max-bytes", "600", "--dry-run",
        ],
        capture_output=True, text=True, timeout=120,
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert out.returncode == 0, out.stderr
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    # high=600 < total=1200; low=198 fits no 400-byte entry → evict all
    assert rep["dry_run"] and len(rep["evicted"]) == 3
