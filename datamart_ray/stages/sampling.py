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
