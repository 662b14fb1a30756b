"""Schema matching + spatial nearest join (SURVEY.md §2: J7/U4, J3).

- :func:`column_similarity` / :func:`union_column_matches` — the
  union-candidate search analog (reference get_unionable_datasets,
  apiserver/apiserver/search/union.py:50-233): all-pairs column-name
  similarity (1 - levenshtein/maxlen, matching DuckDB's ``levenshtein``)
  then greedy 1-1 matching over descending similarity (reference
  union.py:164-175 seen-set logic, U4).
- :func:`nearest_point_join` — nearest spatial join (reference KDTree
  join, augmentation.py:342-370, 416-443): the small side is broadcast
  (ST5), each batch probes it vectorized; grid bucketing replaces a
  KDTree since the probe set is broadcast-sized and numpy-pairwise is
  exact and deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from datamart_ray.util import ensure_fast_shuffle, round_away


def levenshtein(a: str, b: str) -> int:
    """Classic DP edit distance (insert/delete/substitute, unit costs) —
    semantics identical to DuckDB's levenshtein()."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb),
                )
            )
        prev = cur
    return prev[-1]


def column_similarity(a: str, b: str) -> float:
    """1 - lev/maxlen ∈ [0, 1] (the reference's Levenshtein similarity
    idea, union.py:13-22, with DuckDB-reproducible arithmetic)."""
    m = max(len(a), len(b))
    return 1.0 - levenshtein(a, b) / m if m else 1.0


def schema_pair_similarities(
    left_cols: list[str], right_cols: list[str], min_sim: float = 0.0
) -> pd.DataFrame:
    rows = []
    for a in left_cols:
        for b in right_cols:
            s = column_similarity(a, b)
            if s >= min_sim:
                rows.append((a, b, s))
    out = pd.DataFrame(rows, columns=["left_col", "right_col", "sim"])
    return out.sort_values(
        ["sim", "left_col", "right_col"], ascending=[False, True, True]
    ).reset_index(drop=True)


def greedy_one_to_one(pairs: pd.DataFrame) -> pd.DataFrame:
    """Greedy 1-1 matching over descending (sim, left, right) — the
    reference's seen_1/seen_2 loop (union.py:164-175)."""
    seen_l: set[str] = set()
    seen_r: set[str] = set()
    keep = []
    for _, row in pairs.iterrows():
        if row["left_col"] in seen_l or row["right_col"] in seen_r:
            continue
        seen_l.add(row["left_col"])
        seen_r.add(row["right_col"])
        keep.append(row)
    return pd.DataFrame(keep).reset_index(drop=True)


def union_column_matches(sf_dir: str) -> pd.DataFrame:
    """Greedy 1-1 matches between customer and supplier schemas with
    sim ≥ 0.3 (both have *_name, *_nationkey, *_acctbal … the classic
    unionability case)."""
    import pyarrow.parquet as pq

    left = pq.read_schema(f"{sf_dir}/customer.parquet").names
    right = pq.read_schema(f"{sf_dir}/supplier.parquet").names
    pairs = schema_pair_similarities(left, right, min_sim=0.3)
    out = greedy_one_to_one(pairs)
    out["sim"] = round_away(out["sim"], 4)
    return out[["left_col", "right_col", "sim"]]


def union_matches_sql(sf_dir: str) -> str:
    """DuckDB twin: same pairs, same greedy matching expressed with
    window functions (rank by sim desc then names; a pair survives iff
    no better-ranked surviving pair uses either column — computed via a
    recursive CTE)."""
    import pyarrow.parquet as pq

    left = pq.read_schema(f"{sf_dir}/customer.parquet").names
    right = pq.read_schema(f"{sf_dir}/supplier.parquet").names
    lv = ", ".join(f"('{c}')" for c in left)
    rv = ", ".join(f"('{c}')" for c in right)
    return f"""
        WITH RECURSIVE l(left_col) AS (VALUES {lv}),
        r(right_col) AS (VALUES {rv}),
        pairs AS (
            SELECT left_col, right_col,
                   1.0 - levenshtein(left_col, right_col)::DOUBLE
                       / greatest(length(left_col), length(right_col)) AS sim
            FROM l, r
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                ORDER BY sim DESC, left_col, right_col
            ) AS rk
            FROM pairs WHERE sim >= 0.3
        ),
        greedy(rk, left_col, right_col, sim, used_l, used_r) AS (
            SELECT rk, left_col, right_col, sim,
                   [left_col], [right_col]
            FROM ranked WHERE rk = 1
            UNION ALL
            SELECT x.rk, x.left_col, x.right_col, x.sim,
                   CASE WHEN list_contains(g.used_l, x.left_col)
                          OR list_contains(g.used_r, x.right_col)
                        THEN g.used_l
                        ELSE list_append(g.used_l, x.left_col) END,
                   CASE WHEN list_contains(g.used_l, x.left_col)
                          OR list_contains(g.used_r, x.right_col)
                        THEN g.used_r
                        ELSE list_append(g.used_r, x.right_col) END
            FROM greedy g JOIN ranked x ON x.rk = g.rk + 1
        )
        SELECT left_col, right_col, ROUND(sim, 4) AS sim
        FROM (
            SELECT g.*, lag(used_l, 1) OVER (ORDER BY rk) AS prev_l,
                   lag(used_r, 1) OVER (ORDER BY rk) AS prev_r
            FROM greedy g
        )
        WHERE rk = 1
           OR (NOT list_contains(prev_l, left_col)
               AND NOT list_contains(prev_r, right_col))
    """


# ----------------------------------------------------------------------
# J3: nearest spatial join (broadcast probe, no shuffle)
# ----------------------------------------------------------------------

def nearest_point_join(sf_dir: str, k_left: int = 500) -> pd.DataFrame:
    """For each 'left' point (derived deterministically from part rows),
    the nearest 'right' point (from supplier rows) by squared euclidean
    distance, ties broken by right id asc. The right side is broadcast
    (``ray.put`` once); each batch probes it with one vectorized
    distance matrix — the KDTree-join shape (J3) without the tree."""
    ensure_fast_shuffle()
    import pyarrow.parquet as pq

    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_acctbal"]
    )
    r_id = supp["s_suppkey"].to_numpy()
    r_x = (supp["s_suppkey"].to_numpy() % 100).astype(np.float64)
    r_y = supp["s_acctbal"].to_numpy().astype(np.float64) / 100.0
    ref = ray.put((r_id, np.stack([r_x, r_y], axis=1)))

    ds = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_size", "p_retailprice"],
        filter=(pa.compute.field("p_partkey") <= k_left),
    )

    def probe(t: pa.Table) -> pa.Table:
        rid, R = ray.get(ref)
        lx = (t["p_size"].to_numpy(zero_copy_only=False) % 100).astype(
            np.float64
        )
        ly = t["p_retailprice"].to_numpy(zero_copy_only=False) / 100.0
        L = np.stack([lx, ly], axis=1)
        d2 = (
            (L**2).sum(axis=1)[:, None]
            - 2.0 * (L @ R.T)
            + (R**2).sum(axis=1)[None, :]
        )
        # deterministic argmin with id-asc tie-break: order columns by
        # (distance, rid) via lexsort per row
        best = np.empty(L.shape[0], dtype=np.int64)
        bestd = np.empty(L.shape[0], dtype=np.float64)
        for i in range(L.shape[0]):  # rows per batch are few (k_left cap)
            o = np.lexsort((rid, d2[i]))
            best[i] = rid[o[0]]
            bestd[i] = d2[i][o[0]]
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "nearest_suppkey": pa.array(best),
                "dist2": pa.array(np.maximum(bestd, 0.0)),
            }
        )

    out = ds.map_batches(probe, batch_format="pyarrow").to_pandas()
    out["dist2"] = round_away(out["dist2"], 4)
    return out.sort_values("p_partkey").reset_index(drop=True)


def nearest_sql(k_left: int = 500) -> str:
    return f"""
        WITH l AS (
            SELECT p_partkey,
                   (p_size % 100)::DOUBLE AS x,
                   p_retailprice / 100.0 AS y
            FROM part WHERE p_partkey <= {k_left}
        ),
        r AS (
            SELECT s_suppkey,
                   (s_suppkey % 100)::DOUBLE AS x,
                   s_acctbal / 100.0 AS y
            FROM supplier
        )
        SELECT p_partkey, s_suppkey AS nearest_suppkey,
               ROUND(greatest(
                   (l.x*l.x + l.y*l.y) - 2.0*(l.x*r.x + l.y*r.y)
                   + (r.x*r.x + r.y*r.y), 0.0), 4) AS dist2
        FROM l, r
        QUALIFY row_number() OVER (
            PARTITION BY p_partkey
            ORDER BY (l.x*l.x + l.y*l.y) - 2.0*(l.x*r.x + l.y*r.y)
                     + (r.x*r.x + r.y*r.y), s_suppkey
        ) = 1
        ORDER BY p_partkey
    """
