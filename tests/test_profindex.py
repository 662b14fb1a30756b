"""Profile-index search + query variable constraints.

Golden-plan tests mirror the reference's tests/test_search.py style:
a query document in, an exact parsed plan out."""

import math

import pytest

from datamart_ray.search.query import (
    QueryError,
    VariableConstraints,
    parse_query,
    parse_variables,
)


def test_parse_temporal_variable_golden():
    cons = parse_variables(
        [
            {
                "type": "temporal_variable",
                "start": "2019-01-01",
                "end": "2019-12-31",
                "granularity": "day",
            }
        ]
    )
    assert cons.granularity == "day"
    lo, hi = cons.temporal_window
    assert lo == 1546300800.0  # 2019-01-01T00:00:00Z
    assert hi == 1577750400.0  # 2019-12-31T00:00:00Z


def test_parse_temporal_open_end_and_errors():
    cons = parse_variables(
        [{"type": "temporal_variable", "start": "2019-01-01"}]
    )
    assert cons.temporal_window[1] == math.inf
    with pytest.raises(QueryError):
        parse_variables(
            [
                {
                    "type": "temporal_variable",
                    "start": "2020-01-01",
                    "end": "2019-01-01",
                }
            ]
        )
    with pytest.raises(QueryError):
        parse_variables(
            [{"type": "temporal_variable", "start": "not a date"}]
        )
    with pytest.raises(QueryError):
        parse_variables(
            [{"type": "temporal_variable", "granularity": "fortnight"}]
        )


def test_parse_geospatial_variable_golden():
    cons = parse_variables(
        [
            {
                "type": "geospatial_variable",
                "latitude1": 40.8,
                "latitude2": 40.6,
                "longitude1": -73.9,
                "longitude2": -74.1,
            }
        ]
    )
    assert cons.bbox == (-74.1, -73.9, 40.6, 40.8)  # normalized
    # incomplete bounds are skipped, not an error (reference behavior)
    assert parse_variables(
        [{"type": "geospatial_variable", "latitude1": 1.0}]
    ).bbox is None


def test_parse_tabular_and_unknown():
    cons = parse_variables(
        [{"type": "tabular_variable", "columns": [0, 2]}]
    )
    assert cons.tabular_columns == (0, 2)
    with pytest.raises(QueryError):
        parse_variables([{"type": "tabular_variable", "columns": ["a"]}])
    with pytest.raises(QueryError):
        parse_variables([{"type": "beverage_variable"}])
    with pytest.raises(QueryError):
        parse_variables("nope")


def test_parse_query_with_variables_golden():
    plan = parse_query(
        {
            "keywords": "taxi trips",
            "variables": [
                {"type": "temporal_variable", "start": "2019-01-01"},
                {"type": "tabular_variable", "columns": [1]},
            ],
        }
    )
    assert plan.keywords == "taxi trips"
    assert isinstance(plan.variables, VariableConstraints)
    assert plan.variables.tabular_columns == (1,)
    assert plan.variables.temporal_window[0] == 1546300800.0


def test_join_candidates_with_constraints(ray_session):
    from datamart_ray.pipelines.profindex import search_join_candidates

    sf = "/root/testdata/sf0.001"
    base = search_join_candidates(sf)
    assert len(base) > 0
    assert set(base.columns) == {
        "query_column", "candidate_table", "candidate_column", "score",
    }
    # tabular constraint: restrict pivots to orders column 0 (o_orderkey)
    only_first = search_join_candidates(
        sf,
        variables=[{"type": "tabular_variable", "columns": [0]}],
    )
    assert set(only_first["query_column"]) <= {"o_orderkey"}
    # temporal constraint far in the future drops all datetime pivots
    no_time = search_join_candidates(
        sf,
        variables=[
            {"type": "temporal_variable", "start": "2300-01-01"}
        ],
    )
    assert "o_orderdate" not in set(no_time["query_column"])
    # a window covering everything changes nothing
    wide = search_join_candidates(
        sf,
        variables=[
            {"type": "temporal_variable", "start": "1970-01-01"}
        ],
    )
    assert wide.equals(base)


def test_union_candidates_reference_rules(ray_session):
    from datamart_ray.pipelines.profindex import search_union_candidates

    out = search_union_candidates("/root/testdata/sf0.001")
    # every listed table matched at least 2 columns (union.py:177-179)
    assert (out["n_matched"] > 1).all()
    assert (out["score"] > 0).all()
    # scores are sorted descending
    assert list(out["score"]) == sorted(out["score"], reverse=True)


def test_spatial_candidates_bbox_variable(ray_session):
    from datamart_ray.pipelines.spatial import search_spatial_candidates

    sf = "/root/testdata/sf0.001"
    base = search_spatial_candidates(sf)
    assert len(base) > 0 and (base["score"] > 0).all()
    # an explicit geospatial_variable bbox flows through the parser
    # (x plays longitude, y latitude in the derived point space)
    custom = search_spatial_candidates(
        sf,
        variables=[
            {
                "type": "geospatial_variable",
                "longitude1": 0.0, "longitude2": 100.0,
                "latitude1": -100.0, "latitude2": 100.0,
            }
        ],
    )
    # a bbox covering everything scores every source at ~full coverage
    assert len(custom) == len(
        search_spatial_candidates(
            sf,
            variables=[
                {
                    "type": "geospatial_variable",
                    "longitude1": 0.0, "longitude2": 100.0,
                    "latitude1": -100.0, "latitude2": 100.0,
                }
            ],
        )
    )
    # a bbox far outside the data returns nothing
    nowhere = search_spatial_candidates(
        sf,
        variables=[
            {
                "type": "geospatial_variable",
                "longitude1": 5000.0, "longitude2": 6000.0,
                "latitude1": 5000.0, "latitude2": 6000.0,
            }
        ],
    )
    assert len(nowhere) == 0


def test_keyword_bm25_boost_and_gate(ray_session):
    """id^10 field boost and the multi_match operator:'and' gate
    (reference search/__init__.py:55-77)."""
    from datamart_ray.pipelines.profindex import keyword_search_bm25

    sf = "/root/testdata/sf0.001"
    out = keyword_search_bm25(sf, queries=("orders", "id", "zzzznope id"))
    # 'orders' hits the id field (weight 10) of exactly the orders table
    o = out[out["query"] == "orders"]
    assert list(o["candidate_table"]) == ["orders"]
    # the boosted id-field score dwarfs any unboosted single-term score
    # (id field w=10 vs attr w=1)
    assert float(o["score"].iloc[0]) > 5 * float(
        out[out["query"] == "id"]["score"].max()
    )
    # AND semantics: a query containing a never-matching term returns 0 rows
    assert len(out[out["query"] == "zzzznope id"]) == 0
    # deterministic across calls (cached artifact path)
    again = keyword_search_bm25(sf, queries=("orders", "id", "zzzznope id"))
    assert out.equals(again)


def test_interleave_k2_parity(ray_session):
    """Golden-plan test of the reference's exact result combination
    (search/__init__.py:412-425): pairwise zip join-first, longer-list
    tail appended, truncate to k."""
    from datamart_ray.pipelines.profindex import (
        interleave_ranked_results,
        search_augmentation_interleaved,
    )

    j = ["j1", "j2", "j3"]
    u = ["u1"]
    assert interleave_ranked_results(j, u) == ["j1", "u1", "j2", "j3"]
    assert interleave_ranked_results(u, j) == ["u1", "j1", "j2", "j3"]
    assert interleave_ranked_results(j, [], k=2) == ["j1", "j2"]
    assert interleave_ranked_results([], [], k=2) == []

    out = search_augmentation_interleaved("/root/testdata/sf0.001")
    assert len(out) > 0
    # join-first pairwise alternation over the zipped prefix
    n_join = (out["source"] == "join").sum()
    n_union = (out["source"] == "union").sum()
    prefix = out.head(2 * min(n_join, n_union))
    assert list(prefix["source"][::2].unique()) == ["join"]
    assert list(prefix["source"][1::2].unique()) == ["union"]
    assert list(out["rank"]) == list(range(len(out)))
