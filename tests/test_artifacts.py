"""Persistent-artifact root resolution (VERDICT r3 #3): trained
IVF/PQ artifacts live under a configurable root — shared storage via
$DATAMART_RAY_ARTIFACT_ROOT, an opt-in `_datamart_artifacts` dir beside
the corpus, or the /tmp single-node fallback — written once with the
atomic-commit pattern and REUSED by a second process pointed at the
same corpus."""

import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_embeddings(dirpath) -> str:
    rng = np.random.default_rng(7)
    emb = rng.standard_normal((48, 8)).round(3).tolist()
    t = pa.table(
        {
            "vec_id": pa.array(range(48), pa.int64()),
            "embedding": pa.array(emb, pa.list_(pa.float64())),
        }
    )
    path = str(dirpath / "embeddings.parquet")
    pq.write_table(t, path, row_group_size=16)
    return path


def test_artifact_root_resolution(tmp_path, monkeypatch):
    from datamart_ray.util import artifact_root

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    path = str(corpus / "embeddings.parquet")

    # no env, no sibling dir → /tmp fallback
    monkeypatch.delenv("DATAMART_RAY_ARTIFACT_ROOT", raising=False)
    assert artifact_root(path) == "/tmp/datamart_artifacts"

    # opt-in sibling dir beside the corpus wins over the fallback
    beside = corpus / "_datamart_artifacts"
    beside.mkdir()
    assert artifact_root(path) == str(beside)

    # explicit env root wins over everything
    monkeypatch.setenv("DATAMART_RAY_ARTIFACT_ROOT", str(tmp_path / "art"))
    assert artifact_root(path) == str(tmp_path / "art")


def test_ivf_artifact_written_beside_corpus_and_reused(
    ray_session, tmp_path, monkeypatch
):
    """Train once → artifact under the corpus's `_datamart_artifacts`;
    a second call AND a second PROCESS both reload it (no retrain: the
    artifact file's mtime never changes)."""
    from datamart_ray.stages.similarity import (
        _centroid_artifact_path,
        ivf_centroids,
    )

    monkeypatch.delenv("DATAMART_RAY_ARTIFACT_ROOT", raising=False)
    path = _write_embeddings(tmp_path)
    (tmp_path / "_datamart_artifacts").mkdir()

    c1 = ivf_centroids(str(tmp_path), n_clusters=4, iters=3)
    art = _centroid_artifact_path(path, 4, 3, 1)
    assert art.startswith(str(tmp_path / "_datamart_artifacts"))
    assert os.path.exists(art)
    mtime = os.stat(art).st_mtime_ns

    c2 = ivf_centroids(str(tmp_path), n_clusters=4, iters=3)
    np.testing.assert_array_equal(c1, c2)
    assert os.stat(art).st_mtime_ns == mtime  # reloaded, not rewritten

    # second process: the artifact-hit path needs no Ray session, so a
    # fresh interpreter pointed at the same corpus dir must reload the
    # identical centroids without touching the file
    code = (
        "import numpy as np\n"
        "from datamart_ray.stages.similarity import ivf_centroids\n"
        f"c = ivf_centroids({str(tmp_path)!r}, n_clusters=4, iters=3)\n"
        f"ref = np.load({str(tmp_path / 'c1.npy')!r})\n"
        "assert np.array_equal(c, ref), 'second process saw different centroids'\n"
        "print('REUSED-OK')\n"
    )
    np.save(str(tmp_path / "c1.npy"), c1)
    env = dict(os.environ)
    env.pop("DATAMART_RAY_ARTIFACT_ROOT", None)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        env=env,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "REUSED-OK" in out.stdout
    assert os.stat(art).st_mtime_ns == mtime


def test_pq_codebook_artifact_under_env_root(
    ray_session, tmp_path, monkeypatch
):
    """$DATAMART_RAY_ARTIFACT_ROOT redirects the PQ codebook artifact;
    retrain is skipped on the second call."""
    from datamart_ray.stages.similarity import (
        _pq_codebook_path,
        pq_codebooks,
    )

    path = _write_embeddings(tmp_path)
    root = tmp_path / "shared_art"
    monkeypatch.setenv("DATAMART_RAY_ARTIFACT_ROOT", str(root))
    cb1 = pq_codebooks(str(tmp_path), m_subspaces=2, n_codes=4, iters=2)
    art = _pq_codebook_path(path, 2, 4, 2, 1)
    assert art.startswith(str(root))
    assert os.path.exists(art)
    mtime = os.stat(art).st_mtime_ns
    cb2 = pq_codebooks(str(tmp_path), m_subspaces=2, n_codes=4, iters=2)
    np.testing.assert_array_equal(cb1, cb2)
    assert os.stat(art).st_mtime_ns == mtime
