"""Column profiling — the Ray analog of the reference's datamart_profiler
core (lib_profiler/datamart_profiler/core.py:100-710).

One streaming pass computes per-column moments (A2 mean/stddev,
numerical.py:17-33; A11 missing ratios, profile_types.py:92-109) as
per-batch partials merged on the driver (partial+final pattern — the only
scalable shape for "profile every column of 100 TB"). Exact distinct counts
(A3, profile_types.py:180-182) ride a second, hash-reduced shuffle: per
batch we emit unique (column, value-hash) pairs, then count distinct hashes
per column — value payloads never move, only 64-bit hashes.

Semantic typing mirrors the reference's thresholds: categorical when
distinct/rows ≤ 0.1 (profile_types.py:62), identifier-by-name heuristic
(profile_types.py:219-229).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count

from datamart_ray.util import ensure_fast_shuffle, round_away, to_units, units_sql

ENUM_THRESHOLD = 0.1  # reference: profile_types.py:62

# table → [(column, mean_scale, sq_scale)] — fixed-point scales chosen so
# int64 sums stay exact: mean uses `mean_scale` units; stddev uses the
# coarser `sq_scale` units so Σu² < 2^63 even at sf0.1 row counts. A
# population stddev over sq_scale units is the *defined* op on both sides
# (the SQL twin uses the identical units), so results hash-match.
PROFILE_COLUMNS: dict[str, list[tuple[str, int | None, int | None]]] = {
    "lineitem": [
        ("l_quantity", 100, 100),
        ("l_extendedprice", 100, 1),
        ("l_discount", 100, 10000),
        ("l_returnflag", None, None),
        ("l_linestatus", None, None),
    ],
    "customer": [
        ("c_acctbal", 100, 10),
        ("c_mktsegment", None, None),
        ("c_name", None, None),
    ],
}


def _partials(cols):
    def fn(t: pa.Table) -> pa.Table:
        rows = {
            "column": [],
            "n_rows": [],
            "n_nulls": [],
            "sum_u": [],
            "sum_sq": [],
            "sum_squ": [],
            "min_num": [],
            "max_num": [],
        }
        for name, scale, sq_scale in cols:
            col = t[name]
            n = len(col)
            nulls = col.null_count
            if scale is not None:
                vals = col.drop_null().to_numpy(zero_copy_only=False)
                if vals.size:
                    su = int(to_units(vals, scale).sum())
                    squ = to_units(vals, sq_scale)
                    ssum = int(squ.sum())
                    ssq = int(np.dot(squ, squ))  # exact: scales chosen so
                    # max(u^2)*n < 2^63 (see PROFILE_COLUMNS)
                    mn = float(vals.min())
                    mx = float(vals.max())
                else:
                    su = ssum = ssq = 0
                    mn = mx = np.nan
            else:
                su, ssum, ssq, mn, mx = 0, 0, 0, np.nan, np.nan
            rows["column"].append(name)
            rows["n_rows"].append(n)
            rows["n_nulls"].append(nulls)
            rows["sum_u"].append(su)
            rows["sum_sq"].append(ssq)
            rows["sum_squ"].append(ssum)
            rows["min_num"].append(mn)
            rows["max_num"].append(mx)
        return pa.table(rows)

    return fn


def _distinct_hashes(cols):
    def fn(t: pa.Table) -> pa.Table:
        out_col, out_hash = [], []
        for name, _, _ in cols:
            vals = t[name].drop_null()
            arr = vals.to_numpy(zero_copy_only=False)
            h = np.unique(pd.util.hash_array(arr))
            out_col.append(np.full(h.size, name, dtype=object))
            out_hash.append(h.view(np.int64))
        return pa.table(
            {
                "column": pa.array(np.concatenate(out_col), type=pa.string()),
                "h": pa.array(np.concatenate(out_hash)),
            }
        )

    return fn


def profile_table(sf_dir: str, table: str = "lineitem") -> pd.DataFrame:
    """Per-column profile: (column, n_rows, n_nulls, n_distinct, mean,
    min_num, max_num, semantic_type)."""
    ensure_fast_shuffle()
    cols = PROFILE_COLUMNS[table]
    names = [c[0] for c in cols]
    ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=names)

    parts = (
        ds.map_batches(_partials(cols), batch_format="pyarrow").to_pandas()
    )
    agg = parts.groupby("column", sort=False).agg(
        n_rows=("n_rows", "sum"),
        n_nulls=("n_nulls", "sum"),
        sum_u=("sum_u", "sum"),
        sum_sq=("sum_sq", "sum"),
        sum_squ=("sum_squ", "sum"),
        min_num=("min_num", "min"),
        max_num=("max_num", "max"),
    )

    duniq = (
        rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=names)
        .map_batches(_distinct_hashes(cols), batch_format="pyarrow")
        .groupby(["column", "h"])
        .aggregate(Count(alias_name="_n"))
        .groupby("column")
        .aggregate(Count(alias_name="n_distinct"))
        .to_pandas()
        .set_index("column")
    )

    rows = []
    for name, scale, sq_scale in cols:
        a = agg.loc[name]
        nd = int(duniq.loc[name, "n_distinct"])
        n = int(a["n_rows"])
        non_null = n - int(a["n_nulls"])
        if scale is not None:
            mean = round_away(
                np.array([a["sum_u"] / non_null / float(scale)]), 4
            )[0] if non_null else np.nan
            # population stddev over exact integer sums (identical op
            # sequence to the SQL twin; A2, reference numerical.py:17-33)
            ssq = float(a["sum_sq"])
            ssum = float(a["sum_squ"])
            mean_u = ssum / non_null
            var_u = max(ssq / non_null - mean_u * mean_u, 0.0)
            std = round_away(
                np.array([np.sqrt(var_u) / float(sq_scale)]), 4
            )[0] if non_null else np.nan
            stype = "numerical"
        else:
            mean = np.nan
            std = np.nan
            stype = (
                "categorical"
                if nd <= ENUM_THRESHOLD * max(non_null, 1)
                else "text"
            )
        if name.endswith(("_id", "key")) and nd == non_null:
            stype = "identifier"  # reference profile_types.py:219-229
        rows.append(
            {
                "column": name,
                "n_rows": n,
                "n_nulls": int(a["n_nulls"]),
                "n_distinct": nd,
                "mean": mean,
                "std": std,
                "min_num": round_away(np.array([a["min_num"]]), 4)[0]
                if scale is not None
                else np.nan,
                "max_num": round_away(np.array([a["max_num"]]), 4)[0]
                if scale is not None
                else np.nan,
                "semantic_type": stype,
            }
        )
    out = pd.DataFrame(rows)
    for c in ("n_rows", "n_nulls", "n_distinct"):
        out[c] = out[c].astype("int64")
    return out


def profile_lineitem(sf_dir: str) -> pd.DataFrame:
    return profile_table(sf_dir, "lineitem")


def profile_sql(table: str = "lineitem") -> str:
    cols = PROFILE_COLUMNS[table]
    selects = []
    for name, scale, sq_scale in cols:
        if scale is not None:
            mean = (
                f"ROUND(sum({units_sql(name, scale)})"
                f" / count({name}) / {scale}.0, 4)"
            )
            u = units_sql(name, sq_scale)
            # identical op sequence to the Ray side: ssq/n - (ssum/n)^2
            std = (
                f"ROUND(sqrt(greatest("
                f"sum({u} * {u})::DOUBLE / count({name})"
                f" - (sum({u})::DOUBLE / count({name}))"
                f" * (sum({u})::DOUBLE / count({name})), 0.0))"
                f" / {sq_scale}.0, 4)"
            )
            mn = f"ROUND(min({name}), 4)"
            mx = f"ROUND(max({name}), 4)"
            stype = "'numerical'"
        else:
            mean = "NULL::DOUBLE"
            std = "NULL::DOUBLE"
            mn = "NULL::DOUBLE"
            mx = "NULL::DOUBLE"
            stype = f"""CASE WHEN count(DISTINCT {name})
                <= {ENUM_THRESHOLD} * greatest(count({name}), 1)
                THEN 'categorical' ELSE 'text' END"""
        ident = (
            f"CASE WHEN '{name}' LIKE '%\\_id' ESCAPE '\\'"
            f" OR '{name}' LIKE '%key' THEN"
            f" CASE WHEN count(DISTINCT {name}) = count({name})"
            f" THEN 'identifier' ELSE {stype} END ELSE {stype} END"
        )
        selects.append(
            f"""SELECT '{name}' AS "column",
                count(*) AS n_rows,
                count(*) - count({name}) AS n_nulls,
                count(DISTINCT {name}) AS n_distinct,
                {mean} AS mean, {std} AS std,
                {mn} AS min_num, {mx} AS max_num,
                {ident} AS semantic_type
                FROM {table}"""
        )
    return " UNION ALL ".join(selects)
