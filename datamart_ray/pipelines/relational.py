"""Relational operator pipelines over the TPC-H-ish test tables.

Each ``q_*`` function is the Ray-Data expression of an operator family from
SURVEY.md §2 (reference file:line cited per function); each has a DuckDB SQL
twin in :data:`SQL` with identical column names so the driver's
row-count/schema/value-hash comparison passes.

Float determinism: every summed money/value column is converted to int64
fixed-point units *before* the shuffle (``to_units`` / ``units_sql``) —
integer sums are associative, so Ray's parallel tree-sum and DuckDB's
sequential sum agree bit-for-bit; the final divide+ROUND is a single
identical float op on both sides. Non-summed floats use ``round_away``
(DuckDB ROUND semantics).

All pipelines stream: inputs are column-pruned ``read_parquet``; only final
(small) aggregate results are materialized to pandas.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from datamart_ray.pipelines.joins import (
    anti_semi_filter,
    broadcast_join,
    broadcast_lookup_join,
    hash_join,
    read_small,
)
from datamart_ray.util import ensure_fast_shuffle, round_away, to_units, units_sql


# Join-side broadcast threshold: a ≤5M-row skinny key map (two int64
# columns ≈ 80 MB) ships to each node once via the object store; above
# it the partitioned hash join keeps both sides distributed. Planned
# from parquet FOOTER row counts — no data is read to decide.
BROADCAST_ROWS = 5_000_000


def _p(sf_dir: str, table: str) -> str:
    return f"{sf_dir}/{table}.parquet"


def _revenue_units(t: pa.Table) -> pa.Array:
    rev = pc.multiply(
        t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
    )
    return pa.array(to_units(rev.to_numpy(zero_copy_only=False), 10000))


_REV_U_SQL = units_sql("l_extendedprice * (1 - l_discount)", 10000)


def q01_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-style grouped aggregate (A1/A2: perform_aggregations,
    reference lib_augmentation/.../augmentation.py:250-336; mean_stddev,
    lib_profiler/.../numerical.py:17-33). The vectorized map_batches emits
    fixed-point partials; the groupby is the only shuffle."""
    ensure_fast_shuffle()
    ds = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.less_equal(t["l_shipdate"], pa.scalar(pd.Timestamp("1998-09-02")))
        )
        part = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_u": pa.array(
                    to_units(t["l_quantity"].to_numpy(zero_copy_only=False), 100)
                ),
                "price_u": pa.array(
                    to_units(
                        t["l_extendedprice"].to_numpy(zero_copy_only=False), 100
                    )
                ),
                "disc_u": _revenue_units(t),
            }
        )
        # map-side combine: one partial row per (flag, status) per batch
        return (
            part.group_by(["l_returnflag", "l_linestatus"])
            .aggregate(
                [("qty_u", "sum"), ("price_u", "sum"), ("disc_u", "sum"),
                 ("qty_u", "count")]
            )
            .rename_columns(
                ["l_returnflag", "l_linestatus", "qty_u", "price_u",
                 "disc_u", "count_order"]
            )
        )

    g = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_u", alias_name="qty_u"),
            Sum("price_u", alias_name="price_u"),
            Sum("disc_u", alias_name="disc_u"),
            Sum("count_order", alias_name="count_order"),
        )
        .to_pandas()
    )
    n = g["count_order"].astype("int64")
    out = pd.DataFrame(
        {
            "l_returnflag": g["l_returnflag"],
            "l_linestatus": g["l_linestatus"],
            "sum_qty": round_away(g["qty_u"] / 100.0, 2),
            "sum_base_price": round_away(g["price_u"] / 100.0, 2),
            "sum_disc_price": round_away(g["disc_u"] / 10000.0, 2),
            "avg_qty": round_away(g["qty_u"] / n / 100.0, 4),
            "avg_price": round_away(g["price_u"] / n / 100.0, 4),
            "count_order": n,
        }
    )
    return out


def q02_revenue_by_nation(sf_dir: str) -> pd.DataFrame:
    """Multi-way equi join (J1, reference augmentation.py:376-623).

    Scale shape: (1) pre-aggregate revenue per orderkey *before* any join
    (the combiner pattern — shrinks the fact side to one row per key);
    (2) the fact ⋈ orders join strategy is PLANNED FROM FOOTER
    STATISTICS: when the orders table's parquet-metadata row count is
    below BROADCAST_ROWS the (o_orderkey → n_nationkey) side is built
    driver-side and broadcast (zero shuffles in the whole query), else
    the explicit partitioned hash join runs big-big (that path is
    exercised by tj_hourly_rollup_join / ag_join at every scale);
    (3) customer and nation ride as broadcast lookups (dimension-sized).
    """
    def prep_combine(t: pa.Table) -> pa.Table:
        # map-side combine: partial revenue per orderkey within the batch
        # (~4 lineitems/order → the join's left side shrinks before the
        # shuffle; exact because units are integers)
        part = pa.table(
            {"l_orderkey": t["l_orderkey"], "rev_u": _revenue_units(t)}
        )
        return (
            part.group_by("l_orderkey")
            .aggregate([("rev_u", "sum")])
            .rename_columns(["l_orderkey", "rev_u"])
        )

    lineitem = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).map_batches(prep_combine, batch_format="pyarrow")
    customer = read_small(_p(sf_dir, "customer"), ["c_custkey", "c_nationkey"])
    nation = read_small(_p(sf_dir, "nation"), ["n_nationkey", "n_name"])
    # the exchange carries the int nation KEY, not the name string —
    # names are mapped back onto the 25-row final aggregate
    dim = customer.merge(
        nation, left_on="c_nationkey", right_on="n_nationkey"
    )[["c_custkey", "n_nationkey"]]
    import pyarrow.dataset as pads

    n_orders = pads.dataset(_p(sf_dir, "orders")).count_rows()  # footers
    if n_orders <= BROADCAST_ROWS:
        # two skinny int columns ≤ BROADCAST_ROWS rows: build the
        # (o_orderkey → n_nationkey) map driver-side and broadcast it —
        # the whole query then runs with ZERO shuffles
        odf = read_small(
            _p(sf_dir, "orders"), ["o_orderkey", "o_custkey"]
        ).merge(dim, left_on="o_custkey", right_on="c_custkey")[
            ["o_orderkey", "n_nationkey"]
        ]
        j = broadcast_lookup_join(
            lineitem,
            odf["o_orderkey"].to_numpy(),
            odf["n_nationkey"].to_numpy(),
            on="l_orderkey",
            value_col="n_nationkey",
            keep_cols=["rev_u"],
        )
    else:
        orders = rd.read_parquet(
            _p(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"]
        )
        # dims ride onto orders with zero shuffle (broadcast lookup)
        orders_nation = broadcast_join(
            orders, dim, on="o_custkey", right_on="c_custkey"
        ).select_columns(["o_orderkey", "n_nationkey"])
        # the one all-to-all: fact ⋈ orders on the shared key
        j = hash_join(
            lineitem,
            orders_nation,
            left_on="l_orderkey",
            right_on="o_orderkey",
        )
    # map-side combine before the final (tiny) groupby
    partial = j.map_batches(
        lambda t: t.group_by("n_nationkey").aggregate([("rev_u", "sum")])
        .rename_columns(["n_nationkey", "rev_u"]),
        batch_format="pyarrow",
    )
    g = (
        partial.groupby("n_nationkey")
        .aggregate(Sum("rev_u", alias_name="rev_u"))
        .to_pandas()
    )
    name_of = dict(zip(nation["n_nationkey"], nation["n_name"]))
    return pd.DataFrame(
        {
            "n_name": g["n_nationkey"].map(name_of),
            "revenue": round_away(g["rev_u"] / 10000.0, 2),
        }
    )


def q03_topk_orders(sf_dir: str) -> pd.DataFrame:
    """Top-k by aggregate (K1, reference TOP_K_SIZE=50 search/base.py:1):
    groupby-sum then global sort + limit; ordering on the exact integer
    sum with (value desc, key asc) tie-break is fully deterministic."""
    ensure_fast_shuffle()
    ds = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda t: pa.table(
            {"l_orderkey": t["l_orderkey"], "rev_u": _revenue_units(t)}
        ),
        batch_format="pyarrow",
    )
    agg = ds.groupby("l_orderkey").aggregate(Sum("rev_u", alias_name="rev_u"))
    top = agg.sort(["rev_u", "l_orderkey"], descending=[True, False]).limit(10)
    g = top.to_pandas()
    return pd.DataFrame(
        {
            "l_orderkey": g["l_orderkey"],
            "revenue": round_away(g["rev_u"] / 10000.0, 2),
        }
    )


def q04_union_accounts(sf_dir: str) -> pd.DataFrame:
    """Union/append of two tables with schema alignment (U1, reference
    union(), augmentation.py:626-761), then an aggregate over the union."""
    ensure_fast_shuffle()

    def project(side: str, col: str):
        def fn(t: pa.Table) -> pa.Table:
            bal = t[col].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "side": pa.array([side] * t.num_rows),
                    "bal_u": pa.array(to_units(bal, 100)),
                    "acctbal": t[col],
                }
            )

        return fn

    cust = rd.read_parquet(
        _p(sf_dir, "customer"), columns=["c_acctbal"]
    ).map_batches(project("customer", "c_acctbal"), batch_format="pyarrow")
    supp = rd.read_parquet(
        _p(sf_dir, "supplier"), columns=["s_acctbal"]
    ).map_batches(project("supplier", "s_acctbal"), batch_format="pyarrow")
    g = (
        cust.union(supp)
        .groupby("side")
        .aggregate(
            Count(alias_name="n"),
            Sum("bal_u", alias_name="bal_u"),
            Min("acctbal", alias_name="min_bal"),
            Max("acctbal", alias_name="max_bal"),
        )
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "side": g["side"],
            "n": g["n"].astype("int64"),
            "total_bal": round_away(g["bal_u"] / 100.0, 2),
            "min_bal": round_away(g["min_bal"], 2),
            "max_bal": round_away(g["max_bal"], 2),
        }
    )


def q05_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Exact distinct count (A3, reference profile_types.py:180-182):
    dedup shuffle on (event_type, user_id) then count per group."""
    ensure_fast_shuffle()
    ds = rd.read_parquet(
        _p(sf_dir, "events"), columns=["event_type", "user_id"]
    )
    pairs = ds.groupby(["event_type", "user_id"]).aggregate(
        Count(alias_name="_n")
    )
    out = (
        pairs.groupby("event_type")
        .aggregate(Count(alias_name="n_users"))
        .to_pandas()
    )
    out["n_users"] = out["n_users"].astype("int64")
    return out


def q06_daily_event_rollup(sf_dir: str) -> pd.DataFrame:
    """Temporal binning + rollup (M13/A6, reference temporal alignment
    augmentation.py:134-231 and get_temporal_resolution temporal.py:36-57):
    vectorized day-truncation inside map_batches, then the groupby."""
    ensure_fast_shuffle()
    ds = rd.read_parquet(
        _p(sf_dir, "events"), columns=["ts", "event_type", "value"]
    )

    def day_bin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": pc.floor_temporal(t["ts"], unit="day"),
                "event_type": t["event_type"],
                "value_u": pa.array(
                    to_units(t["value"].to_numpy(zero_copy_only=False), 1000000)
                ),
            }
        )

    g = (
        ds.map_batches(day_bin, batch_format="pyarrow")
        .groupby(["day", "event_type"])
        .aggregate(Count(alias_name="n"), Sum("value_u", alias_name="value_u"))
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "day": g["day"],
            "event_type": g["event_type"],
            "n": g["n"].astype("int64"),
            "sum_value": round_away(g["value_u"] / 1000000.0, 4),
        }
    )


def q07_filter_parts(sf_dir: str) -> pd.DataFrame:
    """Predicate pushdown + projection (S1/M6: prune at the read — the
    filter rides into the parquet scan as an Arrow dataset expression)."""
    ds = rd.read_parquet(
        _p(sf_dir, "part"),
        columns=["p_partkey", "p_brand", "p_size", "p_retailprice"],
        filter=(pc.field("p_size") >= 40),
    )
    out = ds.to_pandas()
    out = out[["p_partkey", "p_brand", "p_size", "p_retailprice"]]
    out["p_retailprice"] = round_away(out["p_retailprice"], 2)
    out["p_size"] = out["p_size"].astype("int64")
    return out


def q08_customers_without_orders(sf_dir: str) -> pd.DataFrame:
    """Anti join via broadcast key set (SEMI/ANTI, reference
    search/join.py:505-508 must_not exclusion)."""
    order_cust = set(
        read_small(_p(sf_dir, "orders"), ["o_custkey"])["o_custkey"]
    )
    cust = rd.read_parquet(
        _p(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    )
    out = (
        anti_semi_filter(cust, order_cust, on="c_custkey", anti=True)
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    if out.empty:  # an empty groupby loses its schema — pin it
        return pd.DataFrame(
            {
                "c_mktsegment": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64"),
            }
        )
    out["n"] = out["n"].astype("int64")
    return out


_QTY_U = units_sql("l_quantity", 100)
_PRICE_U = units_sql("l_extendedprice", 100)

SQL: dict[str, str] = {
    "q01_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               ROUND(sum({_QTY_U}) / 100.0, 2) AS sum_qty,
               ROUND(sum({_PRICE_U}) / 100.0, 2) AS sum_base_price,
               ROUND(sum({_REV_U_SQL}) / 10000.0, 2) AS sum_disc_price,
               ROUND(sum({_QTY_U}) / count(*) / 100.0, 4) AS avg_qty,
               ROUND(sum({_PRICE_U}) / count(*) / 100.0, 4) AS avg_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q02_revenue_by_nation": f"""
        SELECT n_name, ROUND(sum({_REV_U_SQL}) / 10000.0, 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "q03_topk_orders": f"""
        SELECT l_orderkey, ROUND(sum({_REV_U_SQL}) / 10000.0, 2) AS revenue
        FROM lineitem
        GROUP BY l_orderkey
        ORDER BY sum({_REV_U_SQL}) DESC, l_orderkey
        LIMIT 10
    """,
    "q04_union_accounts": f"""
        WITH u AS (
            SELECT 'customer' AS side, c_acctbal AS acctbal FROM customer
            UNION ALL
            SELECT 'supplier' AS side, s_acctbal AS acctbal FROM supplier
        )
        SELECT side, count(*) AS n,
               ROUND(sum({units_sql('acctbal', 100)}) / 100.0, 2) AS total_bal,
               ROUND(min(acctbal), 2) AS min_bal,
               ROUND(max(acctbal), 2) AS max_bal
        FROM u GROUP BY side
    """,
    "q05_distinct_users": """
        SELECT event_type, count(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type
    """,
    "q06_daily_event_rollup": f"""
        SELECT date_trunc('day', ts) AS day, event_type,
               count(*) AS n,
               ROUND(sum({units_sql('value', 1000000)}) / 1000000.0, 4) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "q07_filter_parts": """
        SELECT p_partkey, p_brand, CAST(p_size AS BIGINT) AS p_size,
               ROUND(p_retailprice, 2) AS p_retailprice
        FROM part WHERE p_size >= 40
    """,
    "q08_customers_without_orders": """
        SELECT c_mktsegment, count(*) AS n
        FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        GROUP BY c_mktsegment
    """,
}

QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_revenue_by_nation": q02_revenue_by_nation,
    "q03_topk_orders": q03_topk_orders,
    "q04_union_accounts": q04_union_accounts,
    "q05_distinct_users": q05_distinct_users,
    "q06_daily_event_rollup": q06_daily_event_rollup,
    "q07_filter_parts": q07_filter_parts,
    "q08_customers_without_orders": q08_customers_without_orders,
}
