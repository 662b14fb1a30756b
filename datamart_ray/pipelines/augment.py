"""Augmentation — the reference's `/augment` product surface
(apiserver/apiserver/augment.py:52-231 dispatching to
lib_augmentation/datamart_augmentation/augmentation.py join()/union()),
re-expressed as Ray pipelines:

- :func:`augment_join`: join the input dataset with a companion, the
  companion's non-key columns AGGREGATED per join key first (the
  reference aggregates companion columns when the key is not unique —
  augmentation.py:376-623's agg-join); one map-side combine + the
  bucketed hash join.
- :func:`augment_union`: schema-align the companion to the input via the
  greedy 1-1 column matches (union.py:164-175 seen-set logic) and append
  (augmentation.py:625-700), tagging provenance.

Both carry an ``augmentation_info``-style metadata dict (the reference's
qualities payload) alongside the Dataset.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Sum

from datamart_ray.pipelines.joins import hash_join
from datamart_ray.util import ensure_fast_shuffle, round_away, to_units


def augment_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_on: str,
    right_on: str,
    sum_cols: dict[str, int],
    how: str = "inner",
) -> tuple[rd.Dataset, dict]:
    """Left dataset + per-key aggregated companion: for each companion
    value column, emit count and an exact fixed-point sum (scale from
    ``sum_cols``). Returns (augmented Dataset, augmentation_info)."""
    ensure_fast_shuffle()

    def combine(t: pa.Table) -> pa.Table:
        cols = {right_on: t[right_on]}
        for c, scale in sum_cols.items():
            cols[f"{c}_u"] = pa.array(
                to_units(
                    t[c].to_numpy(zero_copy_only=False), scale
                )
            )
        cols["__n"] = pa.array(np.ones(t.num_rows, dtype=np.int64))
        part = pa.table(cols)
        aggs = [(f"{c}_u", "sum") for c in sum_cols] + [("__n", "sum")]
        out = part.group_by(right_on).aggregate(aggs)
        return out.rename_columns(
            [right_on, *[f"{c}_u" for c in sum_cols], "n_rows"]
        )

    agg_right = right.map_batches(combine, batch_format="pyarrow")
    # second (global) combine: batch partials of the same key re-merge
    aggs = [Sum(f"{c}_u", alias_name=f"{c}_u") for c in sum_cols]
    aggs.append(Sum("n_rows", alias_name="n_rows"))
    agg_right = agg_right.groupby(right_on).aggregate(*aggs)
    joined = hash_join(
        left, agg_right, left_on=left_on, right_on=right_on, how=how
    )
    info = {
        "type": "join",
        "left_columns": [left_on],
        "right_columns": [right_on],
        "agg_columns": sorted(sum_cols),
    }
    return joined, info


def augment_union(
    left: rd.Dataset,
    right: rd.Dataset,
    column_map: dict[str, str],
    source_names: tuple[str, str],
) -> tuple[rd.Dataset, dict]:
    """Append the companion under the input's schema: companion columns
    renamed through the greedy match ``column_map`` (right name → left
    name), unmatched columns dropped, provenance tagged."""
    keep_left = list(column_map.values())

    def tag(name: str, rename: dict | None):
        def fn(t: pa.Table) -> pa.Table:
            if rename:
                t = t.select(list(rename)).rename_columns(
                    [rename[c] for c in t.select(list(rename)).column_names]
                )
            else:
                t = t.select(keep_left)
            return t.append_column(
                "source",
                pa.array([name] * t.num_rows, type=pa.string()),
            )

        return fn

    l = left.map_batches(tag(source_names[0], None), batch_format="pyarrow")
    r = right.map_batches(
        tag(source_names[1], dict(column_map)), batch_format="pyarrow"
    )
    info = {
        "type": "union",
        "left_columns_names": [[v] for v in column_map.values()],
        "right_columns_names": [[k] for k in column_map],
    }
    return l.union(r), info


# ----------------------------------------------------------------------
# Oracle-gated entries (fixed tasks — the reference's explicit-task mode)
# ----------------------------------------------------------------------

def ag_join_orders_lineitem(sf_dir: str) -> pd.DataFrame:
    """Augment `orders` with per-order lineitem aggregates (the agg-join
    the reference performs when the companion key repeats)."""
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    lineitem = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_quantity", "l_extendedprice"],
    )
    joined, info = augment_join(
        orders,
        lineitem,
        left_on="o_orderkey",
        right_on="l_orderkey",
        sum_cols={"l_quantity": 100, "l_extendedprice": 100},
    )
    assert info["type"] == "join"
    out = joined.to_pandas()
    out = out.rename(
        columns={
            "l_quantity_u": "sum_qty_u",
            "l_extendedprice_u": "sum_price_u",
        }
    )
    out = out[
        ["o_orderkey", "o_custkey", "n_rows", "sum_qty_u", "sum_price_u"]
    ]
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("o_orderkey").reset_index(drop=True)


def ag_left_join_customer_events(sf_dir: str) -> pd.DataFrame:
    """LEFT augmentation join — the reference's actual /augment
    semantics (augmentation.py's join keeps every INPUT row whether or
    not companion data matched): customer rows augmented with per-user
    event aggregates; ~90% of customers have no events on these
    fixtures, so the null path is exercised non-vacuously. Unmatched
    aggregates surface as count 0 / sum NULL, matching the SQL twin's
    LEFT JOIN + COALESCE(count)."""
    customer = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]
    )
    joined, info = augment_join(
        customer,
        events,
        left_on="c_custkey",
        right_on="user_id",
        sum_cols={"value": 100},
        how="left",
    )
    assert info["type"] == "join"
    out = joined.to_pandas()
    out = out.rename(columns={"value_u": "sum_value_u"})
    out["n_rows"] = out["n_rows"].fillna(0).astype("int64")
    # sum stays NULL (NaN) for unmatched customers — float64, because
    # the twin's nullable-BIGINT sum arrives as float64 via fetchdf and
    # the driver's value hash is dtype-sensitive
    out["sum_value_u"] = out["sum_value_u"].astype("float64")
    out = out[["c_custkey", "c_nationkey", "n_rows", "sum_value_u"]]
    for c in ("c_custkey", "c_nationkey"):
        out[c] = out[c].astype("int64")
    return out.sort_values("c_custkey").reset_index(drop=True)


AG_LEFT_JOIN_SQL = """
    SELECT c_custkey, c_nationkey,
           COALESCE(e.n_rows, 0) AS n_rows,
           e.sum_value_u
    FROM customer LEFT JOIN (
        SELECT user_id,
               count(*) AS n_rows,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_value_u
        FROM events GROUP BY user_id
    ) e ON e.user_id = c_custkey
    ORDER BY c_custkey
"""


AG_JOIN_SQL = """
    SELECT o_orderkey, o_custkey,
           count(*) AS n_rows,
           CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_qty_u,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_price_u
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderkey, o_custkey
    ORDER BY o_orderkey
"""


def ag_union_customer_supplier(sf_dir: str) -> pd.DataFrame:
    """Augment-by-union: supplier appended under customer's schema via
    the greedy column matches (name/nationkey/acctbal), provenance
    tagged; output = per-source row counts + exact acctbal sum (the
    compact verifiable summary of the unioned table)."""
    customer = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_name", "c_nationkey", "c_acctbal"],
    )
    supplier = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_name", "s_nationkey", "s_acctbal"],
    )
    unioned, info = augment_union(
        customer,
        supplier,
        column_map={
            "s_name": "c_name",
            "s_nationkey": "c_nationkey",
            "s_acctbal": "c_acctbal",
        },
        source_names=("customer", "supplier"),
    )
    assert info["type"] == "union"

    def summarize(t: pa.Table) -> pa.Table:
        u = to_units(
            t["c_acctbal"].to_numpy(zero_copy_only=False), 100
        )
        part = pa.table(
            {
                "source": t["source"],
                "bal_u": pa.array(u),
                "__n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )
        return (
            part.group_by("source")
            .aggregate([("bal_u", "sum"), ("__n", "sum")])
            .rename_columns(["source", "bal_u", "n"])
        )

    out = (
        unioned.map_batches(summarize, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("bal_u", alias_name="bal_u"), Sum("n", alias_name="n")
        )
        .to_pandas()
    )
    out["sum_acctbal"] = round_away(out["bal_u"] / 100.0, 2)
    out["n"] = out["n"].astype("int64")
    return (
        out[["source", "n", "sum_acctbal"]]
        .sort_values("source")
        .reset_index(drop=True)
    )


AG_UNION_SQL = """
    WITH u AS (
        SELECT c_acctbal AS bal, 'customer' AS source FROM customer
        UNION ALL
        SELECT s_acctbal AS bal, 'supplier' AS source FROM supplier
    )
    SELECT source, count(*) AS n,
           ROUND(CAST(sum(CAST(floor(bal * 100 + 0.5) AS BIGINT))
                      AS BIGINT) / 100.0, 2) AS sum_acctbal
    FROM u
    GROUP BY source
    ORDER BY source
"""
