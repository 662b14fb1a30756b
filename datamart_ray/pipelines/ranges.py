"""Coverage ranges + range-overlap candidate scoring (SURVEY.md §2: A4, J4).

- :func:`coverage_ranges` — the numeric coverage analog of the reference's
  KMeans range clustering (get_numerical_ranges,
  lib_profiler/datamart_profiler/numerical.py:36-84): k=3 equal-frequency
  (tercile) intervals per column — the SQL-exact fast variant. Computed as
  a distributed value-count groupby + a driver-side walk over the
  (value, count) table; at extreme cardinality swap in a quantile sketch.
- :func:`kmeans_ranges` (r4) — ST4 at FULL parity: true weighted 1-D
  Lloyd KMeans (k=3, 10%-minimum clusters, [5th, 95th]-percentile
  bounds, reference float idioms mirrored) in exact fixed-point integer
  arithmetic, bit-identical to its DuckDB recursive-CTE twin at any
  scale/parallelism. Only init deviates (deterministic tercile medians
  instead of sklearn's seeded k-means++ — sklearn is not available and
  its RNG is not a public contract).
- :func:`range_overlap_scores` — the numerical join-candidate search
  (get_numerical_join_search_results, apiserver/apiserver/search/
  join.py:125-226): score(candidate) = Σ over range pairs of
  overlap_length / total_query_coverage, accumulated in pinned
  (query_range, candidate_range) order so float sums match the ordered
  SQL aggregate.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
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


# ---- true KMeans coverage ranges (ST4 full parity) ------------------------
#
# The reference's get_numerical_ranges (lib_profiler/datamart_profiler/
# numerical.py:36-84) runs sklearn KMeans(k=3, random_state=0) on the raw
# values, drops clusters under 10% of the data, and emits each kept
# cluster's [5th, 95th] percentile as a range. `kmeans_ranges` is the
# from-scratch distributed analog: a weighted 1-D Lloyd fixed-point over
# the (value, count) table in EXACT fixed-point integer arithmetic
# (2-decimal units, rational centroids compared cross-multiplied), so the
# engine and the DuckDB recursive-CTE twin agree bit-for-bit at any scale
# and any parallelism. Init is deterministic (tercile medians) instead of
# sklearn's seeded k-means++ — documented substitution; everything
# downstream (min-size filter, percentile bounds, range ordering) mirrors
# the reference exactly, including its float idioms int(0.05*len) /
# int(0.95*len) and `len(cluster) < 0.1*n`.
#
# Scale shape: ONE groupby(value).count() shuffle bounds all later work by
# the column's distinct-value count (money grids are bounded regardless of
# row count). Below KM_DISTINCT_CAP distinct values the Lloyd loop runs on
# driver-local arrays; above it, per-block prefix tables are pinned in the
# object store once and each iteration fans out one tiny
# (count, sum) probe task per block — the iteration traffic is
# O(blocks), never O(rows).

KM_ITERS = 30
KM_UNITS = 100
KM_DISTINCT_CAP = 5_000_000


def _ceil_div(a: int, b: int) -> int:
    """Exact ceil(a/b) for Python ints, b > 0 (a may be negative)."""
    return -((-a) // b)


def _prep_vc_block(t: pa.Table, column: str) -> dict | None:
    """One sorted distinct-value block -> exact prefix tables.

    Returns v (int64 value units, ascending), pn (inclusive count
    prefix, int64), pv (inclusive sum(v*n) prefix — int64 when provably
    overflow-safe, else Python-int object array)."""
    import pyarrow.compute as pc

    t = t.drop_null()
    if t.num_rows == 0:
        return None
    vals = t.column(0).to_numpy(zero_copy_only=False).astype(np.float64)
    # half-away-from-zero, matching the twin's CAST(round(x*U) AS
    # HUGEINT): np.round is half-to-even and diverges on exact .5
    # products (e.g. 0.125 * 100)
    v = round_away(vals * KM_UNITS, 0).astype(np.int64)
    n = t.column(1).to_numpy(zero_copy_only=False).astype(np.int64)
    tot_n = int(n.sum(dtype=np.int64))
    pn = np.cumsum(n)
    vmax = int(np.abs(v).max()) if len(v) else 0
    if vmax * tot_n < 2**62:
        pv = np.cumsum(v * n)
    else:  # exact Python-int fallback for giant-count blocks
        acc, out = 0, []
        for vi, ni in zip(v.tolist(), n.tolist()):
            acc += vi * ni
            out.append(acc)
        pv = np.array(out, dtype=object)
    return {"v": v, "pn": pn, "pv": pv}


def _block_le(blk: dict, t12: int, t23: int) -> tuple:
    """(count, sum_vn) of values <= t12 and <= t23 in one block (exact)."""
    out = []
    for t in (t12, t23):
        j = int(np.searchsorted(blk["v"], t, side="right"))
        if j == 0:
            out.extend((0, 0))
        else:
            out.extend((int(blk["pn"][j - 1]), int(blk["pv"][j - 1])))
    return tuple(out)


# module-level remote (registered once) — a per-call @ray.remote inside
# le() re-exported a fresh closure every Lloyd iteration (~31/run)
@ray.remote
def _block_le_remote(b: dict, t12: int, t23: int) -> tuple:
    return _block_le(b, t12, t23)


class _ExactVC:
    """Exact rank/interval arithmetic over the sorted distinct-value
    blocks of one column, local or distributed (same kernel both ways)."""

    def __init__(self, ds: rd.Dataset, column: str):
        import ray

        ensure_fast_shuffle()
        vc = (
            ds.groupby(column)
            .aggregate(Count(alias_name="n"))
            .sort(column)
        )
        refs = vc.to_arrow_refs()

        @ray.remote
        def prep(t: pa.Table):
            return _prep_vc_block(t, column)

        prepped_refs = [prep.remote(r) for r in refs]

        @ray.remote
        def meta(b):
            # one round collects (first value, weighted count, distinct
            # count) together — a separate distinct-size task per block
            # would double the scheduling round trips
            if b is None:
                return None
            return (int(b["v"][0]), int(b["pn"][-1]), len(b["v"]))

        metas = ray.get([meta.remote(p) for p in prepped_refs])
        order = sorted(
            (i for i, m in enumerate(metas) if m is not None),
            key=lambda i: metas[i][0],
        )
        self._counts = [metas[i][1] for i in order]
        self.n_total = sum(self._counts)
        self._cum = np.cumsum(np.array(self._counts, dtype=np.int64))
        self._refs = [prepped_refs[i] for i in order]
        self.n_distinct = sum(metas[i][2] for i in order)
        # local fast path: pull blocks when the distinct table is small
        self._local = None
        if self.n_distinct <= KM_DISTINCT_CAP:
            self._local = ray.get(self._refs)
        # above-cap: the same 2-3 blocks get probed across ~31 Lloyd
        # iterations as thresholds converge — keep a tiny LRU so
        # value_at_rank doesn't re-ship a full prefix block per call
        self._blk_cache: "OrderedDict[int, dict]" = OrderedDict()

    def le(self, t12: int, t23: int) -> tuple:
        """Global exact (n<=t12, s<=t12, n<=t23, s<=t23)."""
        import ray

        if self._local is not None:
            parts = [_block_le(b, t12, t23) for b in self._local]
        else:
            parts = ray.get(
                [
                    _block_le_remote.remote(r, t12, t23)
                    for r in self._refs
                ]
            )
        n12 = sum(p[0] for p in parts)
        s12 = sum(p[1] for p in parts)
        n23 = sum(p[2] for p in parts)
        s23 = sum(p[3] for p in parts)
        return n12, s12, n23, s23

    def value_at_rank(self, r: int) -> int:
        """Exact value units at global 0-based weighted rank r."""
        import ray

        bi = int(np.searchsorted(self._cum, r, side="right"))
        base = int(self._cum[bi] - self._counts[bi])
        if self._local is not None:
            b = self._local[bi]
        elif bi in self._blk_cache:
            b = self._blk_cache[bi]
            self._blk_cache.move_to_end(bi)
        else:
            b = ray.get(self._refs[bi])
            self._blk_cache[bi] = b
            while len(self._blk_cache) > 4:
                self._blk_cache.popitem(last=False)
        j = int(np.searchsorted(b["pn"], r - base, side="right"))
        return int(b["v"][j])


def kmeans_1d_ranges(ds: rd.Dataset, column: str) -> list[dict]:
    """Weighted exact-arithmetic 1-D Lloyd (k=3) over one numeric column
    Dataset; returns the reference-shaped kept ranges."""
    vcx = _ExactVC(ds, column)
    N = vcx.n_total
    if N == 0:
        return []
    # deterministic init: the median value of each tercile
    cents = [
        (vcx.value_at_rank((2 * i + 1) * N // 6), 1) for i in range(3)
    ]  # centroid i as exact rational (s_i, m_i)
    _, S_total, _, _ = vcx.le(2**63 - 2, 2**63 - 2)
    for _ in range(KM_ITERS):
        (s1, m1), (s2, m2), (s3, m3) = cents
        # v < (c_i+c_j)/2  <=>  v <= ceil(num/den) - 1  (exact ints)
        t12 = _ceil_div(s1 * m2 + s2 * m1, 2 * m1 * m2) - 1
        t23 = _ceil_div(s2 * m3 + s3 * m2, 2 * m2 * m3) - 1
        n12, sv12, n23, sv23 = vcx.le(t12, t23)
        nn = (n12, n23 - n12, N - n23)
        ss = (sv12, sv23 - sv12, S_total - sv23)
        cents = [
            (ss[i], nn[i]) if nn[i] > 0 else cents[i] for i in range(3)
        ]
    (s1, m1), (s2, m2), (s3, m3) = cents
    t12 = _ceil_div(s1 * m2 + s2 * m1, 2 * m1 * m2) - 1
    t23 = _ceil_div(s2 * m3 + s3 * m2, 2 * m2 * m3) - 1
    n12, _, n23, _ = vcx.le(t12, t23)
    starts = (0, n12, n23)
    sizes = (n12, n23 - n12, N - n23)
    out = []
    for start, sz in zip(starts, sizes):
        # the reference's float idioms, mirrored exactly
        if sz == 0 or float(sz) < 0.1 * float(N):
            continue
        idx_lo = int(0.05 * float(sz))
        idx_hi = int(0.95 * float(sz))
        out.append(
            {
                "rng": len(out),
                "gte": vcx.value_at_rank(start + idx_lo) / KM_UNITS,
                "lte": vcx.value_at_rank(start + idx_hi) / KM_UNITS,
                "n": sz,
            }
        )
    return out


def kmeans_ranges(sf_dir: str) -> pd.DataFrame:
    """True-KMeans coverage ranges for every RANGE_COLUMNS column."""
    rows = []
    for label, table, column in RANGE_COLUMNS:
        ds = rd.read_parquet(
            f"{sf_dir}/{table}.parquet", columns=[column]
        )
        for r in kmeans_1d_ranges(ds, column):
            rows.append({"column": label, **r})
    if not rows:  # every column all-NULL/empty → the twin's zero rows
        return pd.DataFrame(
            {
                "column": pd.Series(dtype="object"),
                "rng": pd.Series(dtype="int64"),
                "gte": pd.Series(dtype="float64"),
                "lte": pd.Series(dtype="float64"),
                "n": pd.Series(dtype="int64"),
            }
        )
    out = pd.DataFrame(rows)
    out["rng"] = out["rng"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out


def _kmeans_sql_for(table: str, column: str, label: str) -> str:
    """The exact recursive-CTE twin of kmeans_1d_ranges: HUGEINT
    fixed-point units, cross-multiplied rational boundaries, the same
    deterministic tercile-median init and KM_ITERS Lloyd steps."""
    its = KM_ITERS
    return f"""
        WITH RECURSIVE
        vc AS MATERIALIZED (
          SELECT CAST(round({column} * {KM_UNITS}) AS HUGEINT) AS v,
                 CAST(count(*) AS HUGEINT) AS n
          FROM {table} WHERE {column} IS NOT NULL GROUP BY 1
        ),
        tot AS (SELECT sum(n) AS nt FROM vc),
        ranked AS MATERIALIZED (
          SELECT v, n, sum(n) OVER (ORDER BY v) - n AS cum0 FROM vc
        ),
        init AS (
          SELECT
            (SELECT v FROM ranked, tot
             WHERE cum0 <= (1*nt)//6 AND cum0 + n > (1*nt)//6) AS c1,
            (SELECT v FROM ranked, tot
             WHERE cum0 <= (3*nt)//6 AND cum0 + n > (3*nt)//6) AS c2,
            (SELECT v FROM ranked, tot
             WHERE cum0 <= (5*nt)//6 AND cum0 + n > (5*nt)//6) AS c3
        ),
        iter AS (
          SELECT 0 AS it, c1 AS s1, CAST(1 AS HUGEINT) AS m1,
                 c2 AS s2, CAST(1 AS HUGEINT) AS m2,
                 c3 AS s3, CAST(1 AS HUGEINT) AS m3
          FROM init
          UNION ALL
          SELECT it + 1,
            COALESCE((SELECT sum(v*n) FROM vc
                      WHERE 2*v*m1*m2 < s1*m2 + s2*m1), s1),
            COALESCE((SELECT sum(n) FROM vc
                      WHERE 2*v*m1*m2 < s1*m2 + s2*m1), m1),
            COALESCE((SELECT sum(v*n) FROM vc
                      WHERE 2*v*m1*m2 >= s1*m2 + s2*m1
                        AND 2*v*m2*m3 < s2*m3 + s3*m2), s2),
            COALESCE((SELECT sum(n) FROM vc
                      WHERE 2*v*m1*m2 >= s1*m2 + s2*m1
                        AND 2*v*m2*m3 < s2*m3 + s3*m2), m2),
            COALESCE((SELECT sum(v*n) FROM vc
                      WHERE 2*v*m2*m3 >= s2*m3 + s3*m2), s3),
            COALESCE((SELECT sum(n) FROM vc
                      WHERE 2*v*m2*m3 >= s2*m3 + s3*m2), m3)
          FROM iter WHERE it < {its}
        ),
        fin AS (SELECT * FROM iter WHERE it = {its}),
        cl1 AS (SELECT v, n, sum(n) OVER (ORDER BY v) AS cw
                FROM vc, fin WHERE 2*v*m1*m2 < s1*m2 + s2*m1),
        cl2 AS (SELECT v, n, sum(n) OVER (ORDER BY v) AS cw
                FROM vc, fin WHERE 2*v*m1*m2 >= s1*m2 + s2*m1
                              AND 2*v*m2*m3 < s2*m3 + s3*m2),
        cl3 AS (SELECT v, n, sum(n) OVER (ORDER BY v) AS cw
                FROM vc, fin WHERE 2*v*m2*m3 >= s2*m3 + s3*m2),
        sizes AS (
          SELECT 1 AS ci, (SELECT max(cw) FROM cl1) AS sz
          UNION ALL SELECT 2, (SELECT max(cw) FROM cl2)
          UNION ALL SELECT 3, (SELECT max(cw) FROM cl3)
        ),
        bounds AS (
          SELECT s.ci, s.sz,
            CASE s.ci
              WHEN 1 THEN (SELECT min(v) FROM cl1 WHERE cw >
                CAST(floor(0.05 * CAST(s.sz AS DOUBLE)) AS HUGEINT))
              WHEN 2 THEN (SELECT min(v) FROM cl2 WHERE cw >
                CAST(floor(0.05 * CAST(s.sz AS DOUBLE)) AS HUGEINT))
              ELSE (SELECT min(v) FROM cl3 WHERE cw >
                CAST(floor(0.05 * CAST(s.sz AS DOUBLE)) AS HUGEINT))
            END AS vlo,
            CASE s.ci
              WHEN 1 THEN (SELECT min(v) FROM cl1 WHERE cw >
                CAST(floor(0.95 * CAST(s.sz AS DOUBLE)) AS HUGEINT))
              WHEN 2 THEN (SELECT min(v) FROM cl2 WHERE cw >
                CAST(floor(0.95 * CAST(s.sz AS DOUBLE)) AS HUGEINT))
              ELSE (SELECT min(v) FROM cl3 WHERE cw >
                CAST(floor(0.95 * CAST(s.sz AS DOUBLE)) AS HUGEINT))
            END AS vhi
          FROM sizes s
        )
        SELECT '{label}' AS "column",
               row_number() OVER (ORDER BY ci) - 1 AS rng,
               CAST(vlo AS DOUBLE) / {KM_UNITS} AS gte,
               CAST(vhi AS DOUBLE) / {KM_UNITS} AS lte,
               CAST(sz AS BIGINT) AS n
        FROM bounds, tot
        WHERE sz IS NOT NULL
          AND NOT (CAST(sz AS DOUBLE) < 0.1 * CAST(nt AS DOUBLE))
    """


def kmeans_ranges_sql() -> str:
    return " UNION ALL ".join(
        f"SELECT * FROM ({_kmeans_sql_for(t, c, label)})"
        for label, t, c in RANGE_COLUMNS
    )
