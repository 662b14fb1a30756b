"""E2E determinism: the index and all query results must be identical
regardless of build parallelism knobs — task granularity (docs_per_spec),
shuffle partition count (num_buckets), and shuffle strategy (bucket vs
global sort). This is the sandbox evidence for 'scores do not depend on
the cluster size' (SURVEY.md §5.2 E2E layer)."""

import os

import numpy as np
import pytest

from datamart_ray.corpus import generate_corpus, reference_queries
from datamart_ray.index.build import IndexConfig, build_index
from datamart_ray.index.manifest import read_manifest
from datamart_ray.search.engine import SearchEngine

VARIANTS = [
    IndexConfig(docs_per_spec=37, num_buckets=7, chunk_docs=64),
    IndexConfig(docs_per_spec=200, num_buckets=64, chunk_docs=64),
    IndexConfig(docs_per_spec=64, chunk_docs=64, shuffle="sort"),
    # head-term salting: every term spread over ~n_docs/40 buckets
    IndexConfig(docs_per_spec=64, num_buckets=16, chunk_docs=64, salt_window=40),
]


@pytest.fixture(scope="module")
def variant_indexes(ray_session, tmp_path_factory):
    corpus = str(tmp_path_factory.mktemp("inv_corpus"))
    generate_corpus(corpus, n_files=180, vocab_size=900, n_output_files=4)
    dirs = []
    for i, cfg in enumerate(VARIANTS):
        d = str(tmp_path_factory.mktemp(f"inv_idx_{i}"))
        build_index(corpus, d, cfg)
        dirs.append(d)
    return dirs


def test_stats_and_lineage_identical(variant_indexes):
    manifests = [
        read_manifest(os.path.join(d, "segments", "seg-00000"))
        for d in variant_indexes
    ]
    base = manifests[0]
    for m in manifests[1:]:
        for key in (
            "n_docs",
            "total_doclen",
            "n_terms",
            "n_postings",
            "sha256_rollup",
        ):
            assert m[key] == base[key], key


def test_all_query_results_identical(variant_indexes):
    engines = [SearchEngine(d) for d in variant_indexes]
    for q in reference_queries():
        filters = {"lang": q["lang"]} if "lang" in q else None
        results = [
            e.search(q["query"], k=50, mode=q["mode"], filters=filters)
            for e in engines
        ]
        base = results[0]
        for r in results[1:]:
            assert (
                r["doc_id"].to_pylist() == base["doc_id"].to_pylist()
            ), q["name"]
            np.testing.assert_array_equal(
                np.asarray(r["score"]), np.asarray(base["score"]),
                err_msg=q["name"],
            )


def test_tercile_ranges_block_invariance(ray_session):
    """Distributed exact quantiles are independent of block structure."""
    import ray.data as rd

    from datamart_ray.pipelines.ranges import tercile_ranges

    path = "/root/testdata/sf0.001/lineitem.parquet"
    a = tercile_ranges(
        rd.read_parquet(path, columns=["l_quantity"]), "l_quantity"
    )
    b = tercile_ranges(
        rd.read_parquet(path, columns=["l_quantity"]).repartition(7),
        "l_quantity",
    )
    c = tercile_ranges(
        rd.read_parquet(path, columns=["l_quantity"]).repartition(1),
        "l_quantity",
    )
    assert a == b == c


def test_kmeans_ranges_block_and_cap_invariance(ray_session, monkeypatch):
    """Exact-Lloyd KMeans ranges are identical across block layouts AND
    across the driver-local vs distributed-probe paths (cap=0 forces the
    per-iteration remote-probe path the 100-TB shape uses)."""
    import ray.data as rd

    from datamart_ray.pipelines import ranges as rmod

    path = "/root/testdata/sf0.001/orders.parquet"
    ds = lambda: rd.read_parquet(path, columns=["o_totalprice"])  # noqa: E731
    a = rmod.kmeans_1d_ranges(ds(), "o_totalprice")
    b = rmod.kmeans_1d_ranges(ds().repartition(7), "o_totalprice")
    monkeypatch.setattr(rmod, "KM_DISTINCT_CAP", 0)
    c = rmod.kmeans_1d_ranges(ds(), "o_totalprice")
    assert a == b == c
    assert len(a) == 3 and all(r["gte"] <= r["lte"] for r in a)


def test_kmeans_ranges_small_cluster_dropped(ray_session):
    """The reference's 10%-minimum rule: a tight 3-cluster synthetic with
    one cluster under 10% drops that cluster (float idiom mirrored)."""
    import pandas as pd

    import ray.data as rd

    from datamart_ray.pipelines.ranges import kmeans_1d_ranges

    vals = [1.0] * 50 + [100.0] * 45 + [1000.0] * 5
    ds = rd.from_pandas(pd.DataFrame({"x": vals}))
    out = kmeans_1d_ranges(ds, "x")
    assert [r["n"] for r in out] == [50, 45]
    assert out[0]["gte"] == out[0]["lte"] == 1.0
    assert out[1]["gte"] == out[1]["lte"] == 100.0
