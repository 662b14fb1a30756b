"""HTTP service layer: the reference apiserver's route surface
(apiserver/apiserver/main.py:139-153) over the Ray-Data engine —
health/version/statistics, search (BM25 + phrase), grep (trigram),
metadata/download by docID, profile, augment, sessions, and upload
(delta ingest visible to subsequent searches)."""

import json
import threading
import urllib.request

import pytest

from datamart_ray.corpus import generate_corpus
from datamart_ray.index import trigram as tg
from datamart_ray.index.build import IndexConfig, build_index
from datamart_ray.service import create_server


def _get(port, path):
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}"
        ) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(port, path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def served(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("svc")
    corpus = str(root / "corpus")
    generate_corpus(corpus, n_files=150, vocab_size=500, seed=9,
                    n_output_files=2)
    idx = str(root / "idx")
    build_index(corpus, idx, IndexConfig(positions=True))
    tri = str(root / "tri")
    tg.build_trigram_index(
        corpus, tri, tg.TrigramConfig(text_col="content")
    )
    httpd, port = create_server(
        index_dir=idx,
        corpus=corpus,
        tri_index=tri,
        sf_dir="/root/testdata/sf0.001",
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield port, corpus, idx, tri, root
    httpd.shutdown()


def test_health_version_statistics(served):
    port = served[0]
    assert _get(port, "/health") == (200, {"status": "ok"})
    s, v = _get(port, "/version")
    assert s == 200 and v["engine"] == "datamart_ray"
    s, st = _get(port, "/statistics")
    assert s == 200
    assert st["bm25"]["n_docs"] == 150
    assert st["trigram"]["n_segments"] >= 1


def test_search_matches_engine(served):
    port, corpus, idx = served[0], served[1], served[2]
    from datamart_ray.search.engine import SearchEngine

    eng = SearchEngine(idx)
    want = eng.search("qzcommonneedle", k=5, mode="or").to_pylist()
    s, got = _post(
        port, "/search",
        {"query": "qzcommonneedle", "k": 5, "mode": "or"},
    )
    assert s == 200 and got["results"] == want
    s, ph = _post(
        port, "/search",
        {"query": "qzcommonneedle", "k": 5, "kind": "phrase"},
    )
    assert s == 200 and len(ph["results"]) > 0


def test_grep_matches_index(served):
    port, corpus, _, tri = served[0], served[1], served[2], served[3]
    want = tg.TrigramIndex(tri, corpus).substring_search(
        "qzcommonneedle"
    ).to_pylist()
    s, got = _post(port, "/grep", {"pattern": "qzcommonneedle"})
    assert s == 200 and got["results"] == want
    s, lines = _post(
        port, "/grep",
        {"pattern": "qzpairneedle[ab]", "regex": True, "lines": True},
    )
    assert s == 200 and lines["results"]
    assert {"doc_id", "line_no", "line", "n_matches"} <= set(
        lines["results"][0]
    )


def test_metadata_download_404(served):
    port = served[0]
    s, meta = _get(port, "/metadata/3")
    assert s == 200 and meta["doc_id"] == 3
    s, row = _get(port, "/download/3")
    assert s == 200 and "content" in row
    s, _err = _get(port, "/metadata/999999")
    assert s == 404
    s, _err = _get(port, "/nope")
    assert s == 404


def test_profile_and_augment(served):
    port = served[0]
    s, prof = _post(port, "/profile", {"table": "customer"})
    assert s == 200 and len(prof["columns"]) > 0
    assert {"column", "n_rows", "semantic_type"} <= set(
        prof["columns"][0]
    )
    s, aug = _post(port, "/augment", {"task": "join", "limit": 5})
    assert s == 200 and len(aug["rows"]) == 5


def test_sessions(served):
    port = served[0]
    s, new = _post(port, "/session/new", {})
    assert s == 200
    sid = new["id"]
    _post(
        port, "/search",
        {"query": "qzcommonneedle", "k": 3, "mode": "or",
         "session": sid},
    )
    s, got = _get(port, f"/session/{sid}")
    assert s == 200
    assert got["queries"] == [{"query": "qzcommonneedle", "n": 3}]
    s, _ = _get(port, "/session/doesnotexist")
    assert s == 404


def test_upload_delta_served(served):
    port, corpus, idx, tri, root = served
    import pyarrow as pa
    import pyarrow.parquet as pq

    delta = str(root / "delta.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([10_000], type=pa.int64()),
                "repo": pa.array(["svc"]),
                "path": pa.array(["d.py"]),
                "lang": pa.array(["python"]),
                "content": pa.array(
                    ["qzservicedelta needle qzcommonneedle"]
                ),
            }
        ),
        delta,
    )
    s, out = _post(port, "/upload", {"path": delta})
    assert s == 200 and "bm25" in out and "trigram" in out
    s, got = _post(
        port, "/search", {"query": "qzservicedelta", "k": 5}
    )
    assert s == 200 and len(got["results"]) == 1
    s, g2 = _post(port, "/grep", {"pattern": "qzservicedelta"})
    assert s == 200 and len(g2["results"]) == 1
    # statistics reflect the new doc
    s, st = _get(port, "/statistics")
    assert st["bm25"]["n_docs"] == 151


def test_metadata_download_404_after_delete(ray_session, tmp_path):
    """ES get-after-delete contract: a tombstoned doc 404s from
    /metadata and /download exactly as it vanishes from /search."""
    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, n_files=60, vocab_size=300, seed=4,
                    n_output_files=1)
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, IndexConfig())
    from datamart_ray.index.maintain import delete_docs

    delete_docs(idx, [5])
    httpd, port = create_server(index_dir=idx, corpus=corpus)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        s, _ = _get(port, "/metadata/5")
        assert s == 404
        s, _ = _get(port, "/download/5")
        assert s == 404
        s, ok = _get(port, "/metadata/6")
        assert s == 200 and ok["doc_id"] == 6
    finally:
        httpd.shutdown()
