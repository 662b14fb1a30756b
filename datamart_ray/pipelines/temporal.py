"""Temporal join operators (SURVEY.md §2.4 J2/J3).

- :func:`asof_join_events` — true as-of join: for each purchase event, the
  most recent prior click by the same user. The Ray shape is the canonical
  bucketed as-of: hash-partition both sides by key (`groupby(user_id)`),
  sort within group by ts, `pd.merge_asof` per group. The reference's
  temporal-alignment join (augmentation.py:134-231) coarsens timestamps to
  a shared resolution and equi-joins — :func:`rollup_join_events` mirrors
  that exact semantics (bin both sides to the hour, equi join).

Oracles: DuckDB ``ASOF JOIN`` / date_trunc equi join respectively.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count

from datamart_ray.util import ensure_fast_shuffle, round_away, to_units, units_sql


def asof_join_events(sf_dir: str) -> pd.DataFrame:
    """(purchase event_id, ts, user_id, most-recent prior click event_id).

    Partitioning assumption (documented per SURVEY.md custom-operator
    rule): each user's events fit one group — true by construction for
    user-keyed streams; salt by time-range for pathological hot keys."""
    ensure_fast_shuffle()
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
        filter=(
            (pc.field("event_type") == "purchase")
            | (pc.field("event_type") == "click")
        ),
    )

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["event_type"] == "purchase"][
            ["event_id", "ts", "user_id"]
        ].sort_values(["ts", "event_id"])
        right = g[g["event_type"] == "click"][["event_id", "ts"]].rename(
            columns={"event_id": "click_event_id", "ts": "click_ts"}
        )
        # pin tie semantics: one click per timestamp (max event_id), since
        # as-of "latest ≤ ts" is ambiguous across equal timestamps
        right = (
            right.groupby("click_ts", as_index=False)["click_event_id"]
            .max()
            .sort_values("click_ts")
        )
        if left.empty:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                    "click_event_id": pd.Series([], dtype="float64"),
                }
            )
        m = pd.merge_asof(
            left,
            right,
            left_on="ts",
            right_on="click_ts",
            direction="backward",
            allow_exact_matches=True,
        )
        return m[["event_id", "user_id", "click_event_id"]]

    out = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .to_pandas()
    )
    out = out.sort_values("event_id").reset_index(drop=True)
    out["event_id"] = out["event_id"].astype("int64")
    out["user_id"] = out["user_id"].astype("int64")
    # click_event_id stays float64 (NaN = no prior click), matching SQL NULL
    return out


ASOF_SQL = """
    WITH clicks AS (
        SELECT user_id, ts, max(event_id) AS event_id
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    )
    SELECT p.event_id AS event_id, p.user_id AS user_id,
           c.event_id AS click_event_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
"""


def rollup_join_events(sf_dir: str) -> pd.DataFrame:
    """Reference-style temporal-resolution join (J2, augmentation.py:
    134-231): both sides binned to the hour, equi join on (user, hour),
    aggregated to counts — 'how many views in the same hour as each
    purchase hour'."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id", "event_type"]
    )

    def hour_bin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "hour": pc.floor_temporal(t["ts"], unit="hour"),
                "user_id": t["user_id"],
                "event_type": t["event_type"],
            }
        )

    binned = ds.map_batches(hour_bin, batch_format="pyarrow")
    purchases = binned.filter(
        expr="event_type == 'purchase'"
    ).groupby(["user_id", "hour"]).aggregate(Count(alias_name="n_purchases"))
    views = binned.filter(expr="event_type == 'view'").groupby(
        ["user_id", "hour"]
    ).aggregate(Count(alias_name="n_views"))

    from datamart_ray.pipelines.joins import hash_join

    j = hash_join(purchases, views, left_on=["user_id", "hour"])
    out = j.to_pandas().sort_values(["user_id", "hour"]).reset_index(drop=True)
    out["user_id"] = out["user_id"].astype("int64")
    out["n_purchases"] = out["n_purchases"].astype("int64")
    out["n_views"] = out["n_views"].astype("int64")
    return out


ROLLUP_SQL = """
    WITH p AS (
        SELECT user_id, date_trunc('hour', ts) AS hour,
               count(*) AS n_purchases
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ),
    v AS (
        SELECT user_id, date_trunc('hour', ts) AS hour, count(*) AS n_views
        FROM events WHERE event_type = 'view' GROUP BY 1, 2
    )
    SELECT p.user_id, p.hour, p.n_purchases, v.n_views
    FROM p JOIN v USING (user_id, hour)
    ORDER BY p.user_id, p.hour
"""
