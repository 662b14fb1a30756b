"""Converter / profiling transforms (SURVEY.md §2: S13, M2, A7, K7).

Each op has a DuckDB twin with bit-matched semantics; float bin edges are
computed with the identical sequence of IEEE ops on both sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from datamart_ray.util import ensure_fast_shuffle, round_away, to_units


def _p(sf_dir: str, table: str) -> str:
    return f"{sf_dir}/{table}.parquet"


# ----------------------------------------------------------------------
# S13: pivot/melt — wide measure columns → long (measure, value) rows
# (reference pivot converter, lib_materialize/.../pivot.py:10-38)
# ----------------------------------------------------------------------

MELT_MEASURES = ("l_quantity", "l_extendedprice", "l_discount")


def melt_lineitem(sf_dir: str) -> pd.DataFrame:
    """Unpivot the three measure columns of a lineitem slice into long
    (orderkey, linenumber, measure, value) rows — one input row → M output
    rows via vectorized Arrow column stacking (no Python row loop). The
    slice (orderkey < 1000) keeps the oracle comparison small."""
    ensure_fast_shuffle()
    ds = rd.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", *MELT_MEASURES],
        filter=(pc.field("l_orderkey") < 1000),
    )

    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        keys_ok = pa.concat_arrays(
            [t["l_orderkey"].combine_chunks()] * len(MELT_MEASURES)
        )
        keys_ln = pa.concat_arrays(
            [
                pc.cast(t["l_linenumber"], pa.int64()).combine_chunks()
            ] * len(MELT_MEASURES)
        )
        measures = pa.array(
            [m for m in MELT_MEASURES for _ in range(n)], type=pa.string()
        )
        values = pa.concat_arrays(
            [pc.cast(t[m], pa.float64()).combine_chunks() for m in MELT_MEASURES]
        )
        return pa.table(
            {
                "l_orderkey": keys_ok,
                "l_linenumber": keys_ln,
                "measure": measures,
                "value": values,
            }
        )

    out = ds.map_batches(melt, batch_format="pyarrow").to_pandas()
    out["value"] = round_away(out["value"], 4)
    return out


MELT_SQL = f"""
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           measure, ROUND(value, 4) AS value
    FROM (
        SELECT l_orderkey, l_linenumber, {", ".join(MELT_MEASURES)}
        FROM lineitem WHERE l_orderkey < 1000
    ) UNPIVOT (value FOR measure IN ({", ".join(MELT_MEASURES)}))
"""


# ----------------------------------------------------------------------
# A7: fixed-bin numeric histogram (reference core.py:330-461)
# ----------------------------------------------------------------------

HIST_BINS = 10


def histogram_extendedprice(sf_dir: str) -> pd.DataFrame:
    """10-bin histogram of l_extendedprice: pass 1 computes global
    min/max (tiny aggregate), pass 2 bins per batch and sums partial
    counts — the reference's plot histogram as partial+final."""
    ensure_fast_shuffle()
    col = "l_extendedprice"
    ds = rd.read_parquet(_p(sf_dir, "lineitem"), columns=[col])
    mm = ds.aggregate(
        Min(col, alias_name="mn"), Max(col, alias_name="mx")
    )
    mn, mx = float(mm["mn"]), float(mm["mx"])
    span = mx - mn

    def bin_batch(t: pa.Table) -> pa.Table:
        x = t[col].to_numpy(zero_copy_only=False)
        # identical op sequence to the SQL twin: (x - mn) * BINS / span
        b = np.floor((x - mn) * HIST_BINS / span)
        b = np.minimum(b, HIST_BINS - 1).astype(np.int64)
        counts = np.bincount(b, minlength=HIST_BINS)
        return pa.table(
            {
                "bin": pa.array(np.arange(HIST_BINS, dtype=np.int64)),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    g = (
        ds.map_batches(bin_batch, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    g["n"] = g["n"].astype("int64")
    return g[g["n"] > 0].reset_index(drop=True)


HIST_SQL = f"""
    WITH s AS (
        SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
        FROM lineitem
    )
    SELECT CAST(least(floor((l_extendedprice - mn) * {HIST_BINS}
                            / (mx - mn)), {HIST_BINS - 1}) AS BIGINT) AS bin,
           count(*) AS n
    FROM lineitem, s
    GROUP BY 1
    HAVING count(*) > 0
"""


# ----------------------------------------------------------------------
# K7: top-5 categorical values (reference most_common(5), core.py:427)
# ----------------------------------------------------------------------

def top5_brands(sf_dir: str) -> pd.DataFrame:
    ensure_fast_shuffle()
    out = (
        rd.read_parquet(_p(sf_dir, "part"), columns=["p_brand"])
        .groupby("p_brand")
        .aggregate(Count(alias_name="n"))
        .sort(["n", "p_brand"], descending=[True, False])
        .limit(5)
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return out


TOP5_SQL = """
    SELECT p_brand, count(*) AS n FROM part
    GROUP BY p_brand ORDER BY n DESC, p_brand LIMIT 5
"""


# ----------------------------------------------------------------------
# M2: attribute-name keyword expansion (reference expand_attribute_name,
# lib_profiler/datamart_profiler/core.py:76-97) — splits camelCase /
# digit / punctuation boundaries. RE2-compatible (no lookaheads) so the
# DuckDB twin applies the exact same replacements.
# ----------------------------------------------------------------------

_BOUNDARY_SUBS = [
    ("([a-z])([A-Z])", "\\1 \\2"),  # camelCase
    ("([A-Za-z])([0-9])", "\\1 \\2"),  # letter→digit
    ("([0-9])([A-Za-z])", "\\1 \\2"),  # digit→letter
    ("[_\\-#./]+", " "),  # punctuation
]


def expand_attribute_name(name: str) -> list[str]:
    import re

    s = name
    for pat, rep in _BOUNDARY_SUBS:
        s = re.sub(pat, rep, s)
    return [w.lower() for w in s.split() if w]


def expand_customer_names(sf_dir: str) -> pd.DataFrame:
    """Applies M2 to the customer name column (e.g. 'Customer#000000042'
    → [customer, 000000042]) and counts token occurrences."""
    ensure_fast_shuffle()
    ds = rd.read_parquet(_p(sf_dir, "customer"), columns=["c_name"])

    def expand(t: pa.Table) -> pa.Table:
        s = t["c_name"]
        for pat, rep in _BOUNDARY_SUBS:
            s = pc.replace_substring_regex(s, pat, rep)
        s = pc.utf8_lower(s)
        toks = pc.split_pattern_regex(s, "\\s+")
        flat = pc.list_flatten(toks)
        flat = pc.filter(flat, pc.not_equal(flat, ""))
        return pa.table({"token": flat})

    out = (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Count(alias_name="n"))
        .sort(["n", "token"], descending=[True, False])
        .limit(20)
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return out


def expand_sql() -> str:
    expr = "c_name"
    for pat, rep in _BOUNDARY_SUBS:
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    return f"""
        WITH toks AS (
            SELECT unnest(
                list_filter(
                    regexp_split_to_array(lower({expr}), '\\s+'),
                    t -> t != ''
                )
            ) AS token
            FROM customer
        )
        SELECT token, count(*) AS n FROM toks
        GROUP BY token ORDER BY n DESC, token LIMIT 20
    """


# ----------------------------------------------------------------------
# A7 parity: temporal histogram (reference core.py:365-398 builds
# temporal plots the same equal-width way it does numeric ones) and the
# top-5 words plot (core.py:427-461).
# ----------------------------------------------------------------------

def histogram_temporal(sf_dir: str) -> pd.DataFrame:
    """10 equal-width bins over events.ts on the epoch-microsecond axis:
    pass 1 min/max (tiny aggregate), pass 2 per-batch bincounts summed —
    the same partial+final shape as the numeric histogram."""
    ensure_fast_shuffle()
    ds = rd.read_parquet(_p(sf_dir, "events"), columns=["ts"])

    def epochs(t: pa.Table) -> pa.Table:
        e = pc.cast(
            pc.cast(t["ts"], pa.timestamp("us")), pa.int64()
        )
        return pa.table({"e": e})

    es = ds.map_batches(epochs, batch_format="pyarrow")
    mm = es.aggregate(Min("e", alias_name="mn"), Max("e", alias_name="mx"))
    mn, mx = int(mm["mn"]), int(mm["mx"])
    span = float(mx - mn)

    def bin_batch(t: pa.Table) -> pa.Table:
        e = t["e"].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.floor((e - mn) * HIST_BINS / span)
        b = np.minimum(b, HIST_BINS - 1).astype(np.int64)
        counts = np.bincount(b, minlength=HIST_BINS)
        return pa.table(
            {
                "bin": pa.array(np.arange(HIST_BINS, dtype=np.int64)),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    g = (
        es.map_batches(bin_batch, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    g["n"] = g["n"].astype("int64")
    return (
        g[g["n"] > 0].sort_values("bin").reset_index(drop=True)
    )


HIST_TEMPORAL_SQL = f"""
    WITH e AS (SELECT epoch_us(ts) AS e FROM events),
    s AS (SELECT min(e) AS mn, max(e) AS mx FROM e)
    SELECT CAST(least(floor((e - mn) * {HIST_BINS}
                            / (mx - mn)::DOUBLE), {HIST_BINS - 1})
                AS BIGINT) AS bin,
           count(*) AS n
    FROM e, s
    GROUP BY 1
    HAVING count(*) > 0
    ORDER BY bin
"""


def top5_words(sf_dir: str) -> pd.DataFrame:
    """Top-5 words over documents.text (the reference's word plot:
    tokenize → count → most_common(5)); Arrow token kernels + one
    groupby, pinned (count desc, word asc) tie-break."""
    from datamart_ray.analyzer import Analyzer

    ensure_fast_shuffle()
    an = Analyzer()
    ds = rd.read_parquet(_p(sf_dir, "documents"), columns=["text"])

    def words(t: pa.Table) -> pa.Table:
        lists = an.token_lists(t["text"])
        flat = pc.list_flatten(lists)
        part = pa.table({"word": flat})
        return (
            part.group_by("word")
            .aggregate([("word", "count")])
            .rename_columns(["word", "n"])
        )

    out = (
        ds.map_batches(words, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "word"], descending=[True, False])
        .limit(5)
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return out


def top5_words_sql() -> str:
    from datamart_ray.analyzer import Analyzer

    toks = Analyzer().sql_tokens_expr("text")
    return f"""
        WITH t AS (SELECT unnest({toks}) AS word FROM documents)
        SELECT word, count(*) AS n FROM t
        GROUP BY word ORDER BY n DESC, word LIMIT 5
    """
