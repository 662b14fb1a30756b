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

# (table → profiled columns, numeric scale for fixed-point exactness)
PROFILE_COLUMNS: dict[str, list[tuple[str, int | None]]] = {
    "lineitem": [
        ("l_quantity", 100),
        ("l_extendedprice", 100),
        ("l_discount", 100),
        ("l_returnflag", None),
        ("l_linestatus", None),
    ],
    "customer": [
        ("c_acctbal", 100),
        ("c_mktsegment", None),
        ("c_name", None),
    ],
}


def _partials(cols: list[tuple[str, int | None]]):
    def fn(t: pa.Table) -> pa.Table:
        rows = {
            "column": [],
            "n_rows": [],
            "n_nulls": [],
            "sum_u": [],
            "min_num": [],
            "max_num": [],
        }
        for name, scale in cols:
            col = t[name]
            n = len(col)
            nulls = col.null_count
            if scale is not None:
                vals = col.drop_null().to_numpy(zero_copy_only=False)
                su = int(to_units(vals, scale).sum()) if vals.size else 0
                mn = float(vals.min()) if vals.size else np.nan
                mx = float(vals.max()) if vals.size else np.nan
            else:
                su, mn, mx = 0, np.nan, np.nan
            rows["column"].append(name)
            rows["n_rows"].append(n)
            rows["n_nulls"].append(nulls)
            rows["sum_u"].append(su)
            rows["min_num"].append(mn)
            rows["max_num"].append(mx)
        return pa.table(rows)

    return fn


def _distinct_hashes(cols: list[tuple[str, int | None]]):
    def fn(t: pa.Table) -> pa.Table:
        out_col, out_hash = [], []
        for name, _ in cols:
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
    names = [c for c, _ in cols]
    ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=names)

    parts = (
        ds.map_batches(_partials(cols), batch_format="pyarrow").to_pandas()
    )
    agg = parts.groupby("column", sort=False).agg(
        n_rows=("n_rows", "sum"),
        n_nulls=("n_nulls", "sum"),
        sum_u=("sum_u", "sum"),
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
    for name, scale in cols:
        a = agg.loc[name]
        nd = int(duniq.loc[name, "n_distinct"])
        n = int(a["n_rows"])
        non_null = n - int(a["n_nulls"])
        if scale is not None:
            mean = round_away(
                np.array([a["sum_u"] / non_null / float(scale)]), 4
            )[0] if non_null else np.nan
            stype = "numerical"
        else:
            mean = np.nan
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
    for name, scale in cols:
        if scale is not None:
            mean = (
                f"ROUND(sum({units_sql(name, scale)})"
                f" / count({name}) / {scale}.0, 4)"
            )
            mn = f"ROUND(min({name}), 4)"
            mx = f"ROUND(max({name}), 4)"
            stype = "'numerical'"
        else:
            mean = "NULL::DOUBLE"
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
                {mean} AS mean, {mn} AS min_num, {mx} AS max_num,
                {ident} AS semantic_type
                FROM {table}"""
        )
    return " UNION ALL ".join(selects)
