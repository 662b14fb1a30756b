"""Deterministic (seedless-reproducible) sampling stages.

Training-data pipelines mix sources at per-stratum rates ("50% of en,
25% of de, 10% of the rest"). Doing that with `random_sample` is not
reproducible across runs/cluster sizes and cannot be oracle-checked, so
these stages sample by ARITHMETIC on the row's own id: a row is kept iff
three iterated MINSTD steps ``x -> (x * 48271) % 2147483647`` of its
doc_id land below ``floor(rate * 2147483647)``.

The Lehmer/Park-Miller generator (48271 mod the Mersenne prime 2^31-1 —
public-domain MINSTD constants) is deliberately weak-but-portable: every
intermediate stays below 2^31 so the multiply never overflows int64, and
the identical expression runs in ANSI SQL — the DuckDB twin computes the
*identical* sample at any id scale (ids fold by % 2^31-1 first).
Selection is per-row arithmetic: no shuffle, no state,
embarrassingly parallel, and STABLE under repartitioning — the same row
is kept at any cluster size, which also makes downstream runs resumable.

Rates are a tiny driver-side dict shipped in the task closure (not a
broadcast join): strata cardinality is vocabulary-sized (languages,
sources), never corpus-sized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

LEHMER_MULT = 48271
LEHMER_MOD = 2147483647  # 2^31 - 1


LEHMER_ROUNDS = 3  # one round leaves small ids in small buckets
# (id*48271 < any threshold for id ≤ ~44k — a vacuous sample); three
# full-period MINSTD steps wrap the modulus many times for any id ≥ 1,
# spreading dense id ranges across [0, 2^31-1) while staying exact in
# int64 (each intermediate is < 2^31, so ·48271 < 1.04e14 ≪ 2^63)


def lehmer_bucket(ids: np.ndarray) -> np.ndarray:
    """Three MINSTD steps: x -> (x*48271) mod (2^31-1), iterated —
    the portable per-row sampling hash (identical in SQL)."""
    x = ids.astype(np.int64) % LEHMER_MOD
    for _ in range(LEHMER_ROUNDS):
        x = (x * LEHMER_MULT) % LEHMER_MOD
    return x


def stratified_sample_ds(
    ds: rd.Dataset,
    rates: dict[str, float],
    default_rate: float,
    id_col: str = "doc_id",
    strata_col: str = "lang",
) -> rd.Dataset:
    """Keep each row with its stratum's rate, deterministically by id."""
    thresholds = {k: int(v * LEHMER_MOD) for k, v in rates.items()}
    default_thr = int(default_rate * LEHMER_MOD)

    def keep(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        strata = t[strata_col].to_numpy(zero_copy_only=False)
        thr = np.full(t.num_rows, default_thr, dtype=np.int64)
        for k, v in thresholds.items():
            thr[strata == k] = v
        return t.filter(pa.array(lehmer_bucket(ids) < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(
    sf_dir: str,
    rates: dict[str, float] | None = None,
    default_rate: float = 0.1,
):
    """Driver entry: deterministic per-language sample of `documents`.

    Output (doc_id, lang), sorted by doc_id — the exact rows any run at
    any parallelism keeps."""
    if rates is None:
        rates = {"en": 0.5, "de": 0.25}
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    out = (
        stratified_sample_ds(ds, rates, default_rate)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    out["doc_id"] = out["doc_id"].astype("int64")
    return out[["doc_id", "lang"]]


def stratified_sample_sql(
    rates: dict[str, float] | None = None, default_rate: float = 0.1
) -> str:
    """DuckDB twin — the identical Lehmer arithmetic per row."""
    if rates is None:
        rates = {"en": 0.5, "de": 0.25}
    whens = " ".join(
        f"WHEN '{k}' THEN {int(v * LEHMER_MOD)}" for k, v in rates.items()
    )
    expr = f"(doc_id % {LEHMER_MOD})"
    for _ in range(LEHMER_ROUNDS):
        expr = f"(({expr} * {LEHMER_MULT}) % {LEHMER_MOD})"
    return f"""
        SELECT doc_id, lang
        FROM documents
        WHERE {expr}
              < (CASE lang {whens} ELSE {int(default_rate * LEHMER_MOD)} END)
        ORDER BY doc_id
    """


TEMP_ALPHA = 0.5  # temperature exponent (XLM-R-style alpha)
TEMP_TARGET = 0.3  # expected kept fraction of the corpus


def temperature_mix_sample(
    sf_dir: str,
    alpha: float = TEMP_ALPHA,
    target: float = TEMP_TARGET,
) -> "pd.DataFrame":
    """Temperature-weighted mixture sampling — the multilingual
    data-mixing op (XLM-R/UNIMAX family): per-language keep rate
    ∝ count^(α−1), normalized so the expected kept fraction of the
    whole corpus is `target`, capped at 1. Low-resource languages are
    up-weighted relative to proportional sampling; α=1 reduces to
    uniform, α=0 to equal-per-language mass.

    Same deterministic arithmetic contract as stratified_sample: the
    per-language RATES come from one tiny groupby (pass 1), each rate
    is rounded to 9 decimals (both sides — pins the float pow chain),
    converted to an integer MINSTD threshold, and the keep decision is
    per-row id arithmetic — no shuffle, stable at any parallelism.

    Output (doc_id, lang) sorted by doc_id."""
    import pandas as pd

    from ray.data.aggregate import Count

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    cnt_pd = (
        ds.groupby("lang")
        .aggregate(Count(alias_name="cnt"))
        .to_pandas()
        .sort_values("lang")
    )
    cnt = cnt_pd["cnt"].to_numpy(dtype=np.float64)
    total = float(cnt.sum())
    # sp accumulates SEQUENTIALLY in lang order (not np.sum's pairwise
    # tree) and the twin pins the same order with `ORDER BY lang` — a
    # 1-ulp pairwise-vs-sequential gap could flip floor(rate*MOD) at a
    # 9-decimal rounding boundary
    sp = 0.0
    for v in cnt:
        sp += float(v) ** alpha
    from datamart_ray.util import round_away

    # float-op order mirrors the SQL twin exactly; half-AWAY rounding
    # (DuckDB ROUND), not numpy's half-to-even
    rates = np.minimum(
        1.0,
        round_away(((target * total) / sp) * cnt ** (alpha - 1.0), 9),
    )
    thresholds = {
        lang: int(np.floor(r * LEHMER_MOD))
        for lang, r in zip(cnt_pd["lang"], rates)
    }

    def keep(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        strata = t["lang"].to_numpy(zero_copy_only=False)
        thr = np.zeros(t.num_rows, dtype=np.int64)
        for k, v in thresholds.items():
            thr[strata == k] = v
        return t.filter(pa.array(lehmer_bucket(ids) < thr))

    out = (
        ds.map_batches(keep, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    out["doc_id"] = out["doc_id"].astype("int64")
    return out[["doc_id", "lang"]]


def temperature_mix_sql(
    alpha: float = TEMP_ALPHA, target: float = TEMP_TARGET
) -> str:
    expr = f"(d.doc_id % {LEHMER_MOD})"
    for _ in range(LEHMER_ROUNDS):
        expr = f"(({expr} * {LEHMER_MULT}) % {LEHMER_MOD})"
    return f"""
        WITH c AS (
            SELECT lang, count(*)::BIGINT AS cnt
            FROM documents GROUP BY lang
        ),
        tot AS (
            SELECT sum(cnt)::DOUBLE AS total,
                   sum(pow(cnt::DOUBLE, {alpha}) ORDER BY lang) AS sp
            FROM c
        ),
        thr AS (
            SELECT lang,
                   CAST(floor(
                       LEAST(1.0, ROUND(
                           (({target} * total) / sp)
                           * pow(cnt::DOUBLE, {alpha} - 1.0), 9
                       )) * {LEHMER_MOD}
                   ) AS BIGINT) AS thr
            FROM c CROSS JOIN tot
        )
        SELECT d.doc_id, d.lang
        FROM documents d JOIN thr USING (lang)
        WHERE {expr} < thr.thr
        ORDER BY d.doc_id
    """


SPLIT_BOUNDS = (0.98, 0.99)  # train < 98% <= val < 99% <= test


def split_assign(
    sf_dir: str,
    bounds: tuple[float, float] = SPLIT_BOUNDS,
) -> "pd.DataFrame":
    """Deterministic train/val/test assignment — the dataset-split op
    every training pipeline runs before anything else. A row's split is
    pure id arithmetic (the MINSTD bucket against two fixed integer
    cutoffs), so the assignment is reproducible at any parallelism,
    stable under repartitioning/resume, and disjoint by construction —
    no shuffle, no RNG state, one streaming pass.

    Output: per (split, lang) row counts (split asc, lang asc) — the
    audit table a split job emits; the per-row assignment is the same
    expression any downstream reader applies as a filter."""
    import pandas as pd

    lo = int(bounds[0] * LEHMER_MOD)
    hi = int(bounds[1] * LEHMER_MOD)
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )

    def assign(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = lehmer_bucket(ids)
        split = np.where(b < lo, "train", np.where(b < hi, "val", "test"))
        part = pa.table(
            {"split": pa.array(split), "lang": t["lang"]}
        )
        g = part.group_by(["split", "lang"]).aggregate([([], "count_all")])
        return g.rename_columns(["split", "lang", "n"])

    out = (
        rd_groupby_sum(ds.map_batches(assign, batch_format="pyarrow"))
        .sort_values(["split", "lang"])
        .reset_index(drop=True)
    )
    out["n"] = out["n"].astype("int64")
    return out


def rd_groupby_sum(ds: rd.Dataset) -> "pd.DataFrame":
    from ray.data.aggregate import Sum

    return (
        ds.groupby(["split", "lang"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )


def split_assign_sql(
    bounds: tuple[float, float] = SPLIT_BOUNDS,
) -> str:
    lo = int(bounds[0] * LEHMER_MOD)
    hi = int(bounds[1] * LEHMER_MOD)
    expr = f"(doc_id % {LEHMER_MOD})"
    for _ in range(LEHMER_ROUNDS):
        expr = f"(({expr} * {LEHMER_MULT}) % {LEHMER_MOD})"
    return f"""
        SELECT CASE WHEN {expr} < {lo} THEN 'train'
                    WHEN {expr} < {hi} THEN 'val'
                    ELSE 'test' END AS split,
               lang,
               count(*)::BIGINT AS n
        FROM documents
        GROUP BY 1, 2
        ORDER BY split, lang
    """
