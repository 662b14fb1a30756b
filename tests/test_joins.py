"""Unit tests for join primitives (broadcast, anti/semi, bucketed hash)."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from datamart_ray.pipelines.joins import (
    anti_semi_filter,
    broadcast_join,
    hash_join,
)


@pytest.fixture()
def left_right(ray_session):
    left = rd.from_items(
        [{"k": i % 7, "lval": i} for i in range(100)]
    )
    right = rd.from_items(
        [{"rk": k, "rval": k * 10} for k in range(5)]  # keys 5,6 unmatched
    )
    return left, right


def _expected(how):
    l = pd.DataFrame({"k": [i % 7 for i in range(100)], "lval": range(100)})
    r = pd.DataFrame({"rk": range(5), "rval": [k * 10 for k in range(5)]})
    return l.merge(r, how=how, left_on="k", right_on="rk")


def _norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("how", ["inner", "left"])
def test_hash_join_matches_pandas(left_right, how):
    left, right = left_right
    got = hash_join(
        left, right, left_on="k", right_on="rk", how=how, num_buckets=4
    ).to_pandas()
    want = _expected(how)
    pd.testing.assert_frame_equal(
        _norm(got), _norm(want), check_dtype=False
    )


def test_hash_join_multi_key(ray_session):
    left = rd.from_items(
        [{"a": i % 3, "b": i % 2, "x": i} for i in range(30)]
    )
    right = rd.from_items(
        [{"a": a, "b": b, "y": a * 10 + b} for a in range(3) for b in range(2)]
    )
    got = hash_join(left, right, left_on=["a", "b"], num_buckets=4).to_pandas()
    assert len(got) == 30
    assert (got["y"] == got["a"] * 10 + got["b"]).all()


def test_hash_join_rejects_column_overlap(ray_session):
    a = rd.from_items([{"k": 1, "v": 1}])
    b = rd.from_items([{"k": 1, "v": 2}])
    with pytest.raises(ValueError, match="overlapping"):
        hash_join(a, b, left_on="k")


def test_broadcast_join_and_anti(ray_session):
    big = rd.from_items([{"k": i % 4, "v": i} for i in range(20)])
    small = pd.DataFrame({"k": [0, 1], "name": ["zero", "one"]})
    j = broadcast_join(big, small, on="k").to_pandas()
    assert len(j) == 10
    assert set(j["name"]) == {"zero", "one"}

    kept = anti_semi_filter(big, {0, 1}, on="k").to_pandas()
    assert len(kept) == 10 and set(kept["k"]) == {0, 1}
    dropped = anti_semi_filter(big, {0, 1}, on="k", anti=True).to_pandas()
    assert len(dropped) == 10 and set(dropped["k"]) == {2, 3}


def test_hash_join_int_dtypes_survive(left_right):
    left, right = left_right
    got = hash_join(left, right, left_on="k", right_on="rk").to_pandas()
    assert got["k"].dtype == np.int64
    assert got["rval"].dtype == np.int64


def test_interval_join_shuffle_matches_broadcast(ray_session):
    """The band-partitioned big-big range join equals the broadcast path
    (overlapping intervals, values in multiple windows)."""
    import numpy as np
    import pandas as pd

    import ray.data as rd

    from datamart_ray.pipelines.joins import (
        interval_join_aggregate,
        interval_join_shuffle,
    )

    rng = np.random.default_rng(11)
    vals = rng.uniform(-100, 1100, size=5000)
    big = rd.from_items([{"x": float(v)} for v in vals])
    k = np.arange(25, dtype=np.float64)
    iv_df = pd.DataFrame(
        {
            "window_id": k.astype(np.int64),
            "lo": k * 40.0 - 30.0,
            "hi": k * 40.0 + 55.0,  # overlapping
        }
    )
    a = interval_join_aggregate(big, iv_df, "x")
    b = interval_join_shuffle(
        big, rd.from_pandas(iv_df), "x"
    )
    pd.testing.assert_frame_equal(a, b)
    # explicit band width exercising heavy replication
    c = interval_join_shuffle(
        big, rd.from_pandas(iv_df), "x", band_width=13.0
    )
    pd.testing.assert_frame_equal(a, c)


def test_detect_hot_keys_finds_dominant_key(ray_session):
    from datamart_ray.pipelines.joins import detect_hot_keys

    # key 42 holds half the rows; the rest are near-uniform
    rows = [{"k": 42, "v": i} for i in range(2000)]
    rows += [{"k": i % 400, "v": i} for i in range(2000)]
    ds = rd.from_items(rows).repartition(8)
    hot = detect_hot_keys(ds, "k", num_buckets=64)
    assert 42 in set(hot.tolist())
    # uniform keys (~5-6 rows each vs cut 4*4000/64=250) must not appear
    assert len(hot) <= 3


def test_hash_join_salted_matches_unsalted(ray_session):
    """Hot-key salting (probe salt + build replication) must not change
    the inner-join output set — including duplicate build-side rows on
    both hot and cold keys."""
    rng = np.random.default_rng(7)
    ks = np.where(rng.random(3000) < 0.5, 42, rng.integers(0, 50, 3000))
    left = rd.from_items(
        [{"k": int(k), "lval": i} for i, k in enumerate(ks)]
    ).repartition(6)
    # duplicate key rows on the build side (1:N fan-out through the join)
    right_rows = [{"k": k, "rval": k * 10 + d} for k in range(45) for d in range(2)]
    right = rd.from_items(right_rows).repartition(3)

    want = (
        hash_join(left, right, left_on="k", num_buckets=32)
        .to_pandas()
    )
    got = hash_join(
        left,
        right,
        left_on="k",
        num_buckets=32,
        hot_keys=np.array([42]),
    ).to_pandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)
    # sanity: the hot key genuinely dominates and fans out 1:2
    assert (want["k"] == 42).sum() == 2 * (ks == 42).sum()


def test_hash_join_auto_hot_keys(ray_session):
    """hot_keys='auto' (detection inside the join) matches unsalted."""
    rows = [{"k": 5, "lval": i} for i in range(1500)]
    rows += [{"k": i % 30, "lval": -i} for i in range(300)]
    left = rd.from_items(rows).repartition(6)
    right = rd.from_items(
        [{"k": k, "rval": k * 2} for k in range(30)]
    ).repartition(2)
    want = hash_join(left, right, left_on="k", num_buckets=32).to_pandas()
    got = hash_join(
        left, right, left_on="k", num_buckets=32, hot_keys="auto"
    ).to_pandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)
    with pytest.raises(ValueError, match="array or 'auto'"):
        hash_join(left, right, left_on="k", hot_keys="always")


def test_hash_join_salted_tiny_bucket_count(ray_session):
    """num_buckets < SALT_FANOUT clamps the fan-out instead of raising —
    'auto' must not become a data-dependent crash on small clusters."""
    left = rd.from_items(
        [{"k": 1 if i % 2 else i % 5, "v": i} for i in range(400)]
    ).repartition(4)
    right = rd.from_items([{"k": k, "w": k} for k in range(5)])
    want = hash_join(left, right, left_on="k", num_buckets=4).to_pandas()
    got = hash_join(
        left, right, left_on="k", num_buckets=4, hot_keys=np.array([1])
    ).to_pandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)


def test_detect_hot_keys_reserved_name(ray_session):
    from datamart_ray.pipelines.joins import detect_hot_keys

    ds = rd.from_items([{"__hh_n": 1}])
    with pytest.raises(ValueError, match="reserved"):
        detect_hot_keys(ds, "__hh_n")


def test_hash_join_salted_rejects_outer_and_multikey(ray_session):
    a = rd.from_items([{"k": 1, "v": 1}])
    b = rd.from_items([{"k": 1, "w": 2}])
    with pytest.raises(ValueError, match="inner"):
        hash_join(a, b, left_on="k", how="left", hot_keys=[1])
    c = rd.from_items([{"k": 1, "j": 1, "v": 1}])
    d = rd.from_items([{"k": 1, "j": 1, "w": 2}])
    with pytest.raises(ValueError, match="single-column"):
        hash_join(c, d, left_on=["k", "j"], hot_keys=[1])
