"""Textual join-candidate search (SURVEY.md §2.4 J6) — the Lazo analog.

The reference scores joinability of textual columns with MinHash
containment sketches held in the external Lazo server
(get_textual_join_search_results, apiserver/apiserver/search/join.py:
334-425; sketches lib_profiler/datamart_profiler/core.py:502-557). Here:

- exact path (oracle-gated): containment(A→B) = |A∩B| / |A| over the
  columns' distinct-value sets, computed as per-column distinct shuffles
  (values leave as hashes) + a driver-side pairwise intersect over the
  (small) distinct sets;
- sketch path: `stages.dedup.minhash_signature` over the same value sets
  gives the O(1)-size mergeable summary for cross-dataset search at scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from datamart_ray.util import ensure_fast_shuffle, round_away

# (label, table, column) — categorical/text columns in the "index"
TEXT_COLUMNS: list[tuple[str, str, str]] = [
    ("lineitem.l_returnflag", "lineitem", "l_returnflag"),
    ("lineitem.l_linestatus", "lineitem", "l_linestatus"),
    ("orders.o_orderstatus", "orders", "o_orderstatus"),
    ("customer.c_mktsegment", "customer", "c_mktsegment"),
    ("part.p_brand", "part", "p_brand"),
    ("orders.o_orderpriority", "orders", "o_orderpriority"),
]


def _distinct_values(sf_dir: str, table: str, column: str) -> set[str]:
    ensure_fast_shuffle()
    ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=[column])
    vals = ds.unique(column)
    return {v for v in vals if v is not None}


def column_containment_scores(sf_dir: str) -> pd.DataFrame:
    """All ordered column pairs with containment > 0."""
    sets = {
        label: _distinct_values(sf_dir, t, c) for label, t, c in TEXT_COLUMNS
    }
    rows = []
    for a_label, a_vals in sets.items():
        for b_label, b_vals in sets.items():
            if a_label == b_label or not a_vals:
                continue
            inter = len(a_vals & b_vals)
            if inter:
                rows.append(
                    {
                        "query_col": a_label,
                        "candidate_col": b_label,
                        "n_common": inter,
                        "containment": inter / len(a_vals),
                    }
                )
    out = pd.DataFrame(
        rows, columns=["query_col", "candidate_col", "n_common", "containment"]
    )
    if len(out):
        out["n_common"] = out["n_common"].astype("int64")
        out["containment"] = round_away(out["containment"], 4)
    return out.sort_values(["query_col", "candidate_col"]).reset_index(
        drop=True
    )


def containment_sql() -> str:
    cte = " UNION ALL ".join(
        f"SELECT '{label}' AS col, {c}::VARCHAR AS v FROM {t} "
        f"WHERE {c} IS NOT NULL GROUP BY 2"
        for label, t, c in TEXT_COLUMNS
    )
    return f"""
        WITH vals AS ({cte}),
        sizes AS (SELECT col, count(*) AS n FROM vals GROUP BY col),
        pairs AS (
            SELECT a.col AS query_col, b.col AS candidate_col,
                   count(*) AS n_common
            FROM vals a JOIN vals b ON a.v = b.v AND a.col != b.col
            GROUP BY 1, 2
        )
        SELECT query_col, candidate_col, n_common,
               ROUND(n_common / sizes.n::DOUBLE, 4) AS containment
        FROM pairs JOIN sizes ON sizes.col = pairs.query_col
        WHERE n_common > 0
        ORDER BY query_col, candidate_col
    """
