"""Mini-driver: run every queries() entry and compare to its oracle_sql()
via DuckDB on the same parquet tables — the shape of the real correctness
gate (row count + schema + order-insensitive values)."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod

SF_DIR = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    if not isinstance(df, pd.DataFrame):
        df = df.to_pandas()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )
    return df


def _assert_repr_equal(got: pd.DataFrame, want: pd.DataFrame, name: str):
    """Driver-faithful compare: the real gate value-hashes canonical
    representations, so dtype KIND must match exactly — a nullable
    Int64/pd.NA column and DuckDB's float64/NaN materialization of a
    NULL BIGINT hash differently even though assert_frame_equal
    (check_dtype=False) calls them equal (the round-4 red-row bug)."""
    import numpy as np

    for c in got.columns:
        g, w = got[c], want[c]
        gk = g.dtype.kind if hasattr(g.dtype, "kind") else "X"
        wk = w.dtype.kind if hasattr(w.dtype, "kind") else "X"
        # pandas extension dtypes (Int64, boolean, string) have kind but
        # are NOT the numpy representation DuckDB's .df() emits — treat
        # any extension dtype as a representation mismatch.
        g_ext = pd.api.types.is_extension_array_dtype(g.dtype)
        w_ext = pd.api.types.is_extension_array_dtype(w.dtype)
        assert g_ext == w_ext and gk == wk, (
            f"{name}.{c}: representation mismatch "
            f"{g.dtype!r} vs oracle {w.dtype!r} — the driver's value-hash "
            "distinguishes these even when values compare equal"
        )
        if gk == "f":
            ga, wa = g.to_numpy(np.float64), w.to_numpy(np.float64)
            both_nan = np.isnan(ga) & np.isnan(wa)
            close = np.isclose(ga, wa, rtol=0, atol=1e-9)
            assert bool(np.all(both_nan | close)), f"{name}.{c}: values differ"
        elif gk in "iub":
            assert (g.to_numpy() == w.to_numpy()).all(), (
                f"{name}.{c}: values differ"
            )
        else:
            pd.testing.assert_series_equal(
                g, w, check_dtype=False, check_names=False, obj=f"{name}.{c}"
            )


def test_gate_flags_nullable_int_vs_float_nan():
    """Regression for the round-4 red driver rows: the gate must FAIL a
    nullable Int64/pd.NA engine column against the oracle's float64/NaN
    (the driver's value-hash distinguishes them; the old
    check_dtype=False compare did not)."""
    got = pd.DataFrame({"v": pd.array([1, None, 3], dtype="Int64")})
    want = pd.DataFrame({"v": [1.0, float("nan"), 3.0]})
    with pytest.raises(AssertionError, match="representation mismatch"):
        _assert_repr_equal(got, want, "regress")
    # and equal representations pass, NaN-for-NaN
    _assert_repr_equal(want.copy(), want, "regress_ok")


NAMES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(ray_session, con, name):
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    if name not in sqls:
        # rows-only entry: must run and produce a stable, typed result
        res = _normalize(qs[name](SF_DIR))
        assert len(res.columns) > 0
        return
    got = _normalize(qs[name](SF_DIR))
    want = _normalize(con.execute(sqls[name]).df())
    assert list(got.columns) == list(want.columns), name
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    _assert_repr_equal(got, want, name)


def test_entry_smoke(ray_session):
    res = entrymod.entry()
    n = res.num_rows if hasattr(res, "num_rows") else len(res)
    assert n >= 0
    cols = (
        set(res.column_names)
        if hasattr(res, "column_names")
        else set(res.columns)
    )
    assert cols == {"doc_id", "score"}


def test_cli_build_search_delete_compact(ray_session, tmp_path, capsys):
    """The operational CLI drives build → search → delete → compact →
    search with consistent results (in-process: the guarded ray.init
    sees the session fixture and does not own it)."""
    import json

    from datamart_ray.__main__ import main
    from datamart_ray.corpus import generate_corpus

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, n_files=80, vocab_size=500, n_output_files=2)
    idx = str(tmp_path / "idx")
    assert main(["build", "--input", corpus, "--index", idx]) == 0
    manifest = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert manifest["built"] == ["seg-00000"]

    assert main(
        ["search", "--index", idx, "--query", "qzcommonneedle",
         "--mode", "or", "--json"]
    ) == 0
    hits = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(hits) > 2
    victim = hits[0]["doc_id"]

    assert main(
        ["delete", "--index", idx, "--ids", str(victim)]
    ) == 0
    assert json.loads(
        capsys.readouterr().out.strip().splitlines()[-1]
    ) == {"deleted": 1}
    assert main(["compact", "--index", idx]) == 0
    capsys.readouterr()
    assert main(
        ["search", "--index", idx, "--query", "qzcommonneedle",
         "--mode", "or", "--json"]
    ) == 0
    hits2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert victim not in [h["doc_id"] for h in hits2]


def test_cli_dedup_knn_kwsearch(ray_session, capsys):
    """The r3 CLI additions drive the dedup / ANN / keyword-search
    pipelines end-to-end."""
    import json

    from datamart_ray.__main__ import main

    sf = "/root/testdata/sf0.001"
    assert main(["knn", "--sf", sf, "--k", "3"]) == 0
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(rows) == 9  # 3 queries x k=3

    assert main(["dedup", "--sf", sf, "--method", "minhash"]) == 0
    json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    assert main(["kwsearch", "--sf", sf, "--query", "id"]) == 0
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert {r["candidate_table"] for r in rows} == {
        "events", "documents", "embeddings"
    }


def test_cli_sample_pack_sessionize_decontaminate(ray_session, capsys):
    """The r3 training-data CLI additions run end-to-end and print
    valid JSON."""
    import json

    from datamart_ray.__main__ import main

    sf = "/root/testdata/sf0.001"
    assert main(["sample", "--sf", sf, "--rates", "en=0.5"]) == 0
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rows and set(rows[0]) == {"doc_id", "lang"}

    assert main(["pack", "--sf", sf, "--window", "512"]) == 0
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rows and rows[0]["window_id"] == 0

    assert main(["sessionize", "--sf", sf, "--gap-sec", "3600"]) == 0
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rows and set(rows[0]) >= {"user_id", "session_id", "n_events"}

    assert main(
        ["decontaminate", "--sf", sf, "--benchmark-ids", "0,1"]
    ) == 0
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rows and rows[0]["doc_id"] == 0

    assert main(
        ["dedup", "--sf", sf, "--method", "ngram", "--survivors"]
    ) == 0
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rows and set(rows[0]) == {"doc_id", "kept_id"}
