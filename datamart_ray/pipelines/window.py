"""Windowed aggregates over event streams — the streaming-window custom
operator (graft brief: "windowed aggregate / streaming window"; the
reference's closest analog is the temporal aggregation chain,
lib_profiler/datamart_profiler/temporal.py + the hourly rollups).

:func:`sliding_window_counts` computes, for EVERY event, the number of
events by the same user inside the trailing window
``[ts - window, ts]`` — SQL ``count(*) OVER (PARTITION BY user_id ORDER
BY ts RANGE BETWEEN INTERVAL .. PRECEDING AND CURRENT ROW)`` semantics
(RANGE framing: all ts-peers count, regardless of row order).

Ray shape (scale-safe): ONE shuffle on a user-hash shard key
(~4×CPUs groups, never per-user dispatch); each shard task sorts its
rows once and answers every window with two vectorized ``searchsorted``
calls per user segment. Timestamps are compared as integer epoch
microseconds — no float round-off at window edges.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from datamart_ray.util import ensure_fast_shuffle


def sliding_window_counts(
    sf_dir: str, window_sec: int = 3600
) -> pd.DataFrame:
    """(event_id, user_id, n_window) for every event in `events`."""
    ensure_fast_shuffle()
    from datamart_ray.stages.dedup import _num_shards

    n_shards = _num_shards()
    window_us = np.int64(window_sec) * np.int64(1_000_000)
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )

    def prep(t: pa.Table) -> pa.Table:
        e = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        users = t["user_id"].to_numpy(zero_copy_only=False)
        shard = (
            pd.util.hash_array(users.astype(np.int64)) % n_shards
        ).astype(np.int64)
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts_us": e,
                "shard": pa.array(shard),
            }
        )

    def count_windows(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["user_id", "ts_us", "event_id"], kind="mergesort"
        )
        users = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        n = len(g)
        out = np.empty(n, dtype=np.int64)
        bounds = np.r_[
            0, np.flatnonzero(users[1:] != users[:-1]) + 1, n
        ]
        for i in range(bounds.size - 1):
            s, e = bounds[i], bounds[i + 1]
            seg = ts[s:e]
            # RANGE frame: [ts_i - window, ts_i], peers inclusive
            lo = np.searchsorted(seg, seg - window_us, side="left")
            hi = np.searchsorted(seg, seg, side="right")
            out[s:e] = hi - lo
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": users,
                "n_window": out,
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(count_windows, batch_format="pandas")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def sliding_window_sql(window_sec: int = 3600) -> str:
    return f"""
        SELECT event_id, user_id,
               count(*) OVER (
                   PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL {window_sec} SECOND PRECEDING
                         AND CURRENT ROW
               ) AS n_window
        FROM events
        ORDER BY event_id
    """


def sessionize(sf_dir: str, gap_sec: int = 14400) -> pd.DataFrame:
    """Gap-based sessionization of `events`: a user's events ordered by
    (ts, event_id) start a NEW session whenever the gap from the previous
    event exceeds `gap_sec` (strict). Output one row per session:
    (user_id, session_id, n_events, start_ts, end_ts), session_id a
    per-user 0-based ordinal.

    Same scale shape as :func:`sliding_window_counts`: ONE user-hash
    shard shuffle (never per-user dispatch), then each shard sorts once
    and derives session ids with a single vectorized cumsum over
    new-session flags; per-(user, session) aggregates are grouped inside
    the shard, so the exchange carries events once and emits only
    session rows. Integer-µs gap comparisons — no float round-off."""
    ensure_fast_shuffle()
    from datamart_ray.stages.dedup import _num_shards

    n_shards = _num_shards()
    gap_us = np.int64(gap_sec) * np.int64(1_000_000)
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )

    def prep(t: pa.Table) -> pa.Table:
        e = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        users = t["user_id"].to_numpy(zero_copy_only=False)
        shard = (
            pd.util.hash_array(users.astype(np.int64)) % n_shards
        ).astype(np.int64)
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts_us": e,
                "shard": pa.array(shard),
            }
        )

    def to_sessions(g: pd.DataFrame) -> pd.DataFrame:
        n = len(g)
        if n == 0:
            # empty shard block after the shuffle (same contract as
            # count_windows above): base[starts] would index size-0
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype=np.int64),
                    "session_id": pd.Series([], dtype=np.int64),
                    "n_events": pd.Series([], dtype=np.int64),
                    "start_ts": pd.Series([], dtype="datetime64[us]"),
                    "end_ts": pd.Series([], dtype="datetime64[us]"),
                }
            )
        g = g.sort_values(
            ["user_id", "ts_us", "event_id"], kind="mergesort"
        )
        users = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        new_sess = np.ones(n, dtype=np.int64)
        if n > 1:
            same_user = users[1:] == users[:-1]
            new_sess[1:] = (~same_user) | (ts[1:] - ts[:-1] > gap_us)
        cum = np.cumsum(new_sess)
        # per-user ordinal: cumsum minus the cumsum entering the user
        starts = np.r_[0, np.flatnonzero(users[1:] != users[:-1]) + 1]
        base = np.zeros(n, dtype=np.int64)
        base[starts] = cum[starts] - 1  # cum value just before the user
        np.maximum.accumulate(base, out=base)
        sid = cum - 1 - base
        df = pd.DataFrame(
            {"user_id": users, "session_id": sid, "ts_us": ts}
        )
        out = df.groupby(["user_id", "session_id"], as_index=False).agg(
            n_events=("ts_us", "size"),
            start_us=("ts_us", "min"),
            end_us=("ts_us", "max"),
        )
        out["start_ts"] = out["start_us"].astype("datetime64[us]")
        out["end_ts"] = out["end_us"].astype("datetime64[us]")
        return out[
            ["user_id", "session_id", "n_events", "start_ts", "end_ts"]
        ]

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(to_sessions, batch_format="pandas")
        .to_pandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )


def sessionize_sql(gap_sec: int = 14400) -> str:
    """DuckDB twin: LAG gap flags → running SUM → per-session aggregate."""
    return f"""
        WITH o AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR ts - LAG(ts) OVER w
                                > INTERVAL {gap_sec} SECOND
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
            SELECT user_id, ts,
                   SUM(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) - 1 AS session_id
            FROM o
        )
        SELECT user_id,
               CAST(session_id AS BIGINT) AS session_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MIN(ts) AS start_ts,
               MAX(ts) AS end_ts
        FROM s
        GROUP BY 1, 2
        ORDER BY 1, 2
    """


def date_hist_pipeline(sf_dir: str) -> pd.DataFrame:
    """ES ``date_histogram`` (fixed_interval = 1 day over purchase
    events) with the two classic PIPELINE sub-aggregations:
    ``cumulative_sum`` and ``derivative`` of the bucket doc count
    (first bucket's derivative is NULL, as in ES).

    Ray shape (scale-safe): column-pruned read → per-batch partial
    day-count tables (Arrow ``value_counts``, no row ever leaves the
    batch) → one small groupby-sum over ~n_days rows. The pipeline
    aggregations run on the driver over the tiny bucket frame — that
    is the ES semantics too (pipeline aggs post-process sibling bucket
    lists, never documents)."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def part(t: pa.Table) -> pa.Table:
        m = pc.fill_null(pc.equal(t["event_type"], "purchase"), False)
        day = pc.floor_temporal(
            pc.cast(t.filter(m)["ts"], pa.timestamp("us")), unit="day"
        )
        vc = pc.value_counts(day.combine_chunks())
        return pa.table(
            {
                "day": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    agg = ds.map_batches(part, batch_format="pyarrow").groupby("day").sum("n")
    pdf = (
        agg.to_pandas()
        .rename(columns={"sum(n)": "n"})
        .sort_values("day")
        .reset_index(drop=True)
    )
    pdf["n"] = pdf["n"].astype("int64")
    pdf["cum_n"] = pdf["n"].cumsum().astype("int64")
    # float64/NaN, NOT nullable Int64/pd.NA: DuckDB's .df() materializes
    # the twin's (n - LAG(n))::BIGINT NULL as float64 NaN, and the
    # driver's value-hash distinguishes the two representations.
    pdf["deriv"] = pdf["n"].diff().astype("float64")
    return pdf


def date_hist_pipeline_sql() -> str:
    """DuckDB twin: GROUP BY day + window-function pipeline stage."""
    return """
        WITH b AS (
            SELECT date_trunc('day', ts) AS day, count(*)::BIGINT AS n
            FROM events
            WHERE event_type = 'purchase'
            GROUP BY 1
        )
        SELECT day, n,
               (SUM(n) OVER (ORDER BY day
                    ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_n,
               (n - LAG(n) OVER (ORDER BY day))::BIGINT AS deriv
        FROM b
        ORDER BY day
    """


MOVING_WINDOW = 7  # trailing buckets (inclusive of current)


def moving_avg_daily(sf_dir: str) -> pd.DataFrame:
    """ES ``moving_fn`` (unweightedAvg) pipeline aggregation over the
    daily purchase date_histogram: trailing MOVING_WINDOW-bucket mean
    of the doc count, window inclusive of the current bucket. The
    sibling bucket list is tiny (n_days rows), so the pipeline stage
    runs on the driver — same placement ES gives pipeline aggs. The
    mean is Σwindow/|window| with an integer numerator, one float
    division per bucket."""
    base = date_hist_pipeline(sf_dir)[["day", "n"]]
    n = base["n"].to_numpy(dtype=np.int64)
    cs = np.concatenate([[0], np.cumsum(n)])
    idx = np.arange(n.size)
    lo = np.maximum(0, idx - (MOVING_WINDOW - 1))
    wsum = cs[idx + 1] - cs[lo]
    wlen = idx + 1 - lo
    from datamart_ray.util import round_away

    out = base.copy()
    out["moving_avg"] = round_away(
        pd.Series(wsum.astype(np.float64) / wlen), 4
    )
    return out


def moving_avg_sql() -> str:
    return f"""
        WITH b AS (
            SELECT date_trunc('day', ts) AS day, count(*)::BIGINT AS n
            FROM events
            WHERE event_type = 'purchase'
            GROUP BY 1
        )
        SELECT day, n,
               ROUND(
                   (SUM(n) OVER w)::DOUBLE / (COUNT(n) OVER w), 4
               ) AS moving_avg
        FROM b
        WINDOW w AS (ORDER BY day
                     ROWS BETWEEN {MOVING_WINDOW - 1} PRECEDING
                     AND CURRENT ROW)
        ORDER BY day
    """


def bucket_selector_daily(sf_dir: str) -> pd.DataFrame:
    """ES ``bucket_selector`` pipeline aggregation: keep only the daily
    purchase buckets whose doc count exceeds the all-bucket mean. The
    predicate is evaluated by integer cross-multiplication
    (n · n_buckets > Σn) so both sides stay float-free."""
    base = date_hist_pipeline(sf_dir)[["day", "n"]]
    n = base["n"].to_numpy(dtype=np.int64)
    keep = n * np.int64(n.size) > np.int64(n.sum())
    return base[keep].reset_index(drop=True)


def bucket_selector_sql() -> str:
    return """
        WITH b AS (
            SELECT date_trunc('day', ts) AS day, count(*)::BIGINT AS n
            FROM events
            WHERE event_type = 'purchase'
            GROUP BY 1
        )
        SELECT day, n FROM b
        WHERE n * (SELECT count(*) FROM b) > (SELECT sum(n) FROM b)
        ORDER BY day
    """


FUNNEL_A = "view"
FUNNEL_B = "purchase"
FUNNEL_WINDOW_SEC = 3600 * 24


def funnel_counts(
    sf_dir: str,
    step_a: str = FUNNEL_A,
    step_b: str = FUNNEL_B,
    window_sec: int = FUNNEL_WINDOW_SEC,
) -> pd.DataFrame:
    """Event-funnel conversion — the product-analytics sequence
    operator: step 1 = users with a `step_a` event, step 2 = users
    with a `step_b` event at most `window_sec` AFTER one of their
    `step_a` events (0 ≤ Δt ≤ window). Timestamps compare as integer
    epoch microseconds (no float edges).

    Ray shape: the event scan is pruned to the two step types, ONE
    user-hash shard shuffle co-locates each user's events (~4×CPUs
    groups, never per-user dispatch), each shard answers its users
    with two sorts + one vectorized searchsorted per user segment,
    and only two integers per shard ride back to the driver."""
    ensure_fast_shuffle()
    from datamart_ray.stages.dedup import _num_shards

    n_shards = _num_shards()
    window_us = np.int64(window_sec) * np.int64(1_000_000)
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "ts"],
    )

    def prep(t: pa.Table) -> pa.Table:
        m = pc.is_in(
            t["event_type"],
            value_set=pa.array(sorted({step_a, step_b})),
        )
        t = t.filter(pc.fill_null(m, False))
        users = t["user_id"].to_numpy(zero_copy_only=False)
        shard = (
            pd.util.hash_array(users.astype(np.int64)) % n_shards
        ).astype(np.int64)
        return pa.table(
            {
                "user_id": t["user_id"],
                "is_a": pc.equal(t["event_type"], step_a),
                "ts_us": pc.cast(
                    pc.cast(t["ts"], pa.timestamp("us")), pa.int64()
                ),
                "shard": pa.array(shard),
            }
        )

    def shard_counts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us"], kind="mergesort")
        users = g["user_id"].to_numpy()
        is_a = g["is_a"].to_numpy()
        ts = g["ts_us"].to_numpy()
        n_a_users = 0
        n_conv = 0
        bounds = np.flatnonzero(
            np.concatenate([[True], users[1:] != users[:-1]])
        )
        ends = np.append(bounds[1:], users.size)
        for lo, hi in zip(bounds, ends):
            a_ts = ts[lo:hi][is_a[lo:hi]]
            if not a_ts.size:
                continue
            n_a_users += 1
            b_ts = ts[lo:hi][~is_a[lo:hi]]
            if not b_ts.size:
                continue
            # any B in [a, a+window] for some a: vectorized window probe
            j = np.searchsorted(b_ts, a_ts)  # first B >= a
            ok = (j < b_ts.size) & (b_ts[np.minimum(j, b_ts.size - 1)]
                                    <= a_ts + window_us)
            if ok.any():
                n_conv += 1
        return pd.DataFrame({"n_a": [n_a_users], "n_conv": [n_conv]})

    parts = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(shard_counts)
        .to_pandas()
    )
    n_a = int(parts["n_a"].sum())
    n_conv = int(parts["n_conv"].sum())
    return pd.DataFrame(
        {
            "step": [step_a, f"{step_a}->{step_b}"],
            "n_users": pd.array([n_a, n_conv], dtype="int64"),
        }
    )


def funnel_sql(
    step_a: str = FUNNEL_A,
    step_b: str = FUNNEL_B,
    window_sec: int = FUNNEL_WINDOW_SEC,
) -> str:
    return f"""
        WITH a AS (
            SELECT user_id, ts FROM events
            WHERE event_type = '{step_a}'
        ),
        b AS (
            SELECT user_id, ts FROM events
            WHERE event_type = '{step_b}'
        ),
        conv AS (
            SELECT DISTINCT a.user_id
            FROM a JOIN b ON a.user_id = b.user_id
                 AND b.ts >= a.ts
                 AND b.ts <= a.ts + INTERVAL {window_sec} SECOND
        )
        SELECT '{step_a}' AS step,
               (SELECT count(DISTINCT user_id) FROM a)::BIGINT AS n_users
        UNION ALL
        SELECT '{step_a}->{step_b}',
               (SELECT count(*) FROM conv)::BIGINT
    """


COHORT_WEEK_US = np.int64(7 * 24 * 3600) * np.int64(1_000_000)
COHORT_MAX_WEEKS = 4


def retention_cohorts(
    sf_dir: str,
    max_weeks: int = COHORT_MAX_WEEKS,
) -> pd.DataFrame:
    """Retention-cohort matrix — the standard activity-retention
    analysis: users are cohorted by the WEEK of their first event
    (floor(first_ts / 7d) in epoch weeks), and each later event marks
    its user active in week Δ = floor((ts − first_ts)/7d) since entry.
    Output one row per (cohort_week, week_offset ≤ max_weeks):
    distinct active users.

    Ray shape: one user-hash shard shuffle co-locates each user's
    events; per shard one sort finds first_ts per user vectorized and
    the (cohort, offset) pairs reduce to per-shard partial DISTINCT
    counts — the exchange back to the driver is O(cohorts × weeks)
    integers per shard, never events."""
    ensure_fast_shuffle()
    from datamart_ray.stages.dedup import _num_shards

    n_shards = _num_shards()
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def prep(t: pa.Table) -> pa.Table:
        e = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        users = t["user_id"].to_numpy(zero_copy_only=False)
        shard = (
            pd.util.hash_array(users.astype(np.int64)) % n_shards
        ).astype(np.int64)
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts_us": e,
                "shard": pa.array(shard),
            }
        )

    def shard_cohorts(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "cohort_week": pd.Series([], dtype=np.int64),
                "week_offset": pd.Series([], dtype=np.int64),
                "n_users": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(["user_id", "ts_us"], kind="mergesort")
        users = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        starts = np.concatenate(
            [[True], users[1:] != users[:-1]]
        )
        first_idx = np.maximum.accumulate(
            np.where(starts, np.arange(users.size), 0)
        )
        first_ts = ts[first_idx]
        cohort = first_ts // COHORT_WEEK_US
        offset = (ts - first_ts) // COHORT_WEEK_US
        keep = offset <= max_weeks
        df = pd.DataFrame(
            {
                "cohort_week": cohort[keep],
                "week_offset": offset[keep],
                "user_id": users[keep],
            }
        )
        # per-shard DISTINCT: users are shard-local, so distinct here
        # is globally distinct
        out = (
            df.drop_duplicates()
            .groupby(["cohort_week", "week_offset"], as_index=False)
            .size()
            .rename(columns={"size": "n_users"})
        )
        return out.astype(
            {
                "cohort_week": np.int64,
                "week_offset": np.int64,
                "n_users": np.int64,
            }
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(shard_cohorts, batch_format="pandas")
        .to_pandas()
        .groupby(["cohort_week", "week_offset"], as_index=False)["n_users"]
        .sum()
        .sort_values(["cohort_week", "week_offset"])
        .reset_index(drop=True)
    )
    for c in ("cohort_week", "week_offset", "n_users"):
        out[c] = out[c].astype("int64")
    return out


def retention_cohorts_sql(max_weeks: int = COHORT_MAX_WEEKS) -> str:
    # epoch-week arithmetic on integer microseconds, like the engine
    week = int(COHORT_WEEK_US)
    return f"""
        WITH ev AS (
            SELECT user_id, epoch_us(ts::TIMESTAMP) AS ts_us FROM events
        ),
        firsts AS (
            SELECT user_id, min(ts_us) AS first_us FROM ev GROUP BY 1
        ),
        marks AS (
            SELECT DISTINCT
                   f.first_us // {week} AS cohort_week,
                   (e.ts_us - f.first_us) // {week} AS week_offset,
                   e.user_id
            FROM ev e JOIN firsts f USING (user_id)
            WHERE (e.ts_us - f.first_us) // {week} <= {max_weeks}
        )
        SELECT cohort_week::BIGINT AS cohort_week,
               week_offset::BIGINT AS week_offset,
               count(*)::BIGINT AS n_users
        FROM marks
        GROUP BY 1, 2
        ORDER BY cohort_week, week_offset
    """


SERIAL_DIFF_LAG = 7  # weekly seasonality differencing


def serial_diff_daily(sf_dir: str, lag: int = SERIAL_DIFF_LAG) -> pd.DataFrame:
    """ES ``serial_diff`` pipeline aggregation: lag-`lag` differencing
    of the daily purchase counts (the seasonality-removal transform;
    first `lag` buckets are NULL as in ES). Integer-exact."""
    base = date_hist_pipeline(sf_dir)[["day", "n"]]
    n = base["n"].to_numpy(dtype=np.int64)
    out = base.copy()
    diff = np.full(n.size, np.nan)
    if n.size > lag:
        diff[lag:] = (n[lag:] - n[:-lag]).astype(np.float64)
    # float64/NaN matches DuckDB's .df() materialization of the twin's
    # ::BIGINT NULL column (nullable Int64/pd.NA hashes differently).
    out["diff"] = diff
    return out


def serial_diff_sql(lag: int = SERIAL_DIFF_LAG) -> str:
    return f"""
        WITH b AS (
            SELECT date_trunc('day', ts) AS day, count(*)::BIGINT AS n
            FROM events
            WHERE event_type = 'purchase'
            GROUP BY 1
        )
        SELECT day, n,
               (n - LAG(n, {lag}) OVER (ORDER BY day))::BIGINT AS diff
        FROM b
        ORDER BY day
    """


def normalize_daily(sf_dir: str) -> pd.DataFrame:
    """ES ``normalize`` pipeline aggregation (method range): daily
    purchase counts rescaled to [0, 1] by (n − min) / (max − min)
    over the sibling bucket list. Integer numerator/denominator, one
    division per bucket, rounded like every float twin."""
    from datamart_ray.util import round_away

    base = date_hist_pipeline(sf_dir)[["day", "n"]]
    n = base["n"].to_numpy(dtype=np.int64)
    lo, hi = int(n.min()), int(n.max())
    out = base.copy()
    if hi > lo:
        out["norm"] = round_away(
            pd.Series((n - lo).astype(np.float64) / float(hi - lo)), 4
        )
    else:
        out["norm"] = 0.0
    return out


def normalize_sql() -> str:
    return """
        WITH b AS (
            SELECT date_trunc('day', ts) AS day, count(*)::BIGINT AS n
            FROM events
            WHERE event_type = 'purchase'
            GROUP BY 1
        ),
        mm AS (SELECT min(n) AS lo, max(n) AS hi FROM b)
        SELECT day, n,
               CASE WHEN hi > lo
                    THEN ROUND((n - lo)::DOUBLE / (hi - lo), 4)
                    ELSE 0.0 END AS norm
        FROM b CROSS JOIN mm
        ORDER BY day
    """
