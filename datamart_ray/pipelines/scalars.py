"""Scalar-function operators (SURVEY.md §2.8) + temporal-resolution
detection (A6).

- :func:`json_extract_rollup` — JSON (de)serialization scalar coverage
  (reference common.py:132-144): extract ``$.k`` from the events ``props``
  JSON column per batch, bucket it, aggregate. DuckDB twin uses
  ``json_extract``.
- :func:`temporal_resolution` — the reference's resolution detector
  (get_temporal_resolution, lib_profiler/datamart_profiler/temporal.py:
  36-57): the coarsest granularity whose average values-per-bin stays
  below the 1.05 threshold; per-granularity bin counts are distinct-count
  aggregates (one pass per granularity over the pruned ts column).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count

from datamart_ray.util import ensure_fast_shuffle, round_away

RESOLUTION_THRESHOLD = 1.05  # reference temporal.py:36-57
GRANULARITIES = ("year", "month", "day", "hour", "minute", "second")


def json_extract_rollup(sf_dir: str) -> pd.DataFrame:
    """Decade buckets of props.k: (k_bucket, n, sum_k)."""
    ensure_fast_shuffle()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["props"])

    def extract(t: pa.Table) -> pa.Table:
        # null props / missing / null k → -1 (the SQL twin coalesces the
        # same way); bucket via floor division on BOTH sides (DuckDB's
        # integer // truncates toward zero, so the twin uses floor(k/10.0)).
        # Fast path: one Arrow regex kernel extracts the integer property
        # (vectorized, no per-row json.loads); rows the regex cannot
        # handle (nested/quoted/float forms) fall back to real JSON
        # parsing so semantics stay identical to json_extract.
        s = pc.fill_null(t["props"].combine_chunks(), "")
        m = pc.extract_regex(s, r'"k"\s*:\s*(?P<k>-?\d+)[,}\s]')
        kstr = pc.struct_field(m, "k")
        ok = pc.is_valid(kstr).to_numpy(zero_copy_only=False)
        ks = np.full(t.num_rows, -1, dtype=np.int64)
        if ok.any():
            ks[ok] = pc.cast(
                pc.drop_null(kstr), pa.int64()
            ).to_numpy(zero_copy_only=False)
        if not ok.all():
            vals = s.to_pylist()
            for i in np.flatnonzero(~ok):
                v = vals[i]
                if v:
                    parsed = json.loads(v).get("k")
                    if parsed is not None:
                        # match the twin's CAST(... AS BIGINT): DuckDB
                        # rounds half away from zero; Python int() would
                        # truncate (5.5 → 5 vs DuckDB 6). ADVICE r2.
                        # (coerce BEFORE sign — k may be a numeric string)
                        f = float(parsed)
                        ks[i] = int(
                            np.sign(f) * np.floor(abs(f) + 0.5)
                        )
        part = pa.table(
            {"k_bucket": pa.array(ks // 10), "k": pa.array(ks)}
        )
        return (
            part.group_by("k_bucket")
            .aggregate([("k", "count"), ("k", "sum")])
            .rename_columns(["k_bucket", "n", "sum_k"])
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(extract, batch_format="pyarrow")
        .groupby("k_bucket")
        .aggregate(Sum("n", alias_name="n"), Sum("sum_k", alias_name="sum_k"))
        .to_pandas()
    )
    for c in ("k_bucket", "n", "sum_k"):
        out[c] = out[c].astype("int64")
    return out.sort_values("k_bucket").reset_index(drop=True)


JSON_SQL = """
    WITH kv AS (
        SELECT coalesce(
            CAST(json_extract(props, '$.k') AS BIGINT), -1
        ) AS k
        FROM events
    )
    SELECT CAST(floor(k / 10.0) AS BIGINT) AS k_bucket,
           count(*) AS n,
           CAST(sum(k) AS BIGINT) AS sum_k
    FROM kv
    GROUP BY 1
    ORDER BY k_bucket
"""


def temporal_resolution(sf_dir: str) -> pd.DataFrame:
    """Per-granularity bin statistics over events.ts + the detected
    resolution (coarsest granularity with avg ≤ threshold, else the
    finest). Output: (granularity, n_bins, avg_per_bin, is_detected)."""
    ensure_fast_shuffle()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    n_rows = ds.count()
    rows = []
    for g in GRANULARITIES:
        binned = ds.map_batches(
            lambda t, g=g: pa.table(
                {"b": pc.floor_temporal(t["ts"], unit=g)}
            ),
            batch_format="pyarrow",
        )
        n_bins = (
            binned.groupby("b")
            .aggregate(Count(alias_name="_n"))
            .count()
        )
        rows.append(
            {
                "granularity": g,
                "n_bins": int(n_bins),
                "avg_per_bin": float(n_rows) / n_bins,
            }
        )
    detected = None
    for r in rows:  # coarsest-first order
        if r["avg_per_bin"] <= RESOLUTION_THRESHOLD:
            detected = r["granularity"]
            break
    if detected is None:
        detected = GRANULARITIES[-1]
    out = pd.DataFrame(rows)
    out["avg_per_bin"] = round_away(out["avg_per_bin"], 4)
    out["is_detected"] = (out["granularity"] == detected)
    out["n_bins"] = out["n_bins"].astype("int64")
    return out


def temporal_resolution_sql() -> str:
    parts = []
    for g in GRANULARITIES:
        parts.append(
            f"""SELECT '{g}' AS granularity,
                count(DISTINCT date_trunc('{g}', ts)) AS n_bins,
                count(*)::DOUBLE / count(DISTINCT date_trunc('{g}', ts))
                    AS raw_avg
                FROM events"""
        )
    stats = " UNION ALL ".join(parts)
    order = ", ".join(f"('{g}', {i})" for i, g in enumerate(GRANULARITIES))
    return f"""
        WITH stats AS ({stats}),
        ord(granularity, pos) AS (VALUES {order}),
        s AS (
            SELECT stats.*, ord.pos FROM stats JOIN ord USING (granularity)
        ),
        det AS (
            SELECT coalesce(
                (SELECT granularity FROM s
                 WHERE raw_avg <= {RESOLUTION_THRESHOLD}
                 ORDER BY pos LIMIT 1),
                '{GRANULARITIES[-1]}') AS g
        )
        SELECT granularity, n_bins, ROUND(raw_avg, 4) AS avg_per_bin,
               granularity = det.g AS is_detected
        FROM s, det
        ORDER BY pos
    """


def strftime_rollup(sf_dir: str) -> pd.DataFrame:
    """§2.8 date-format scalar coverage: strftime keys computed by the
    Arrow kernel (identical format strings to the DuckDB twin), rolled up
    per month key with a distinct-day count — the common 'partition key
    from a timestamp' pattern."""
    ensure_fast_shuffle()
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderdate"])

    def keys(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["o_orderdate"], pa.timestamp("us"))
        part = pa.table(
            {
                "month_key": pc.strftime(ts, format="%Y-%m"),
                "day_key": pc.strftime(ts, format="%Y-%m-%d"),
            }
        )
        return (
            part.group_by(["month_key", "day_key"])
            .aggregate([("day_key", "count")])
            .rename_columns(["month_key", "day_key", "n"])
        )

    parts = (
        ds.map_batches(keys, batch_format="pyarrow")
        .to_pandas()
        .groupby(["month_key", "day_key"], as_index=False)["n"]
        .sum()
    )
    out = parts.groupby("month_key", as_index=False).agg(
        n=("n", "sum"), n_days=("day_key", "nunique")
    )
    for c in ("n", "n_days"):
        out[c] = out[c].astype("int64")
    return out.sort_values("month_key").reset_index(drop=True)


STRFTIME_SQL = """
    SELECT strftime(o_orderdate, '%Y-%m') AS month_key,
           count(*) AS n,
           count(DISTINCT strftime(o_orderdate, '%Y-%m-%d')) AS n_days
    FROM orders
    GROUP BY 1
    ORDER BY month_key
"""
