"""The composite training-data pipeline: dedup → quality → sample → pack.

This is the end-to-end shape a 100-TB corpus actually runs — each stage
is an already-oracle-gated operator, composed here WITHOUT ever
materializing the corpus on the driver:

  1. near-dup removal (MinHash-LSH candidates → distributed exact
     Jaccard verify → connected components → removal manifest),
  2. rare-token quality filter (two-pass broadcast vocabulary),
  3. deterministic stratified sampling (per-row arithmetic),
  4. sequence packing (distributed prefix scan).

The drop-id sets (removal manifest + quality rejects) are
decision-OUTPUT-sized, not corpus-sized on real data, so they broadcast
via ``ray.put`` below ``BROADCAST_IDS_CAP`` and fall back to the
vectorized anti-filter shape above it (same adaptive pattern as
``dedup.semi_filter_payload``). Sampling and packing then run over the
surviving Dataset only.

The DuckDB twin composes the SAME stage twins as nested CTE subqueries,
so the whole pipeline — not just each stage — is hash-gated.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from datamart_ray.stages.dedup import (
    BROADCAST_IDS_CAP,
    minhash_dedup_survivors,
    minhash_survivors_sql,
)
from datamart_ray.stages.packing import (
    packed_windows_from_counts,
    packed_windows_sql,
    token_counts_ds,
)
from datamart_ray.stages.sampling import (
    stratified_sample_ds,
    stratified_sample_sql,
)
from datamart_ray.stages.textstats import (
    rare_token_ratio,
    rare_token_ratio_sql,
)
from datamart_ray.util import isin_sorted

DEFAULT_RATES = {"en": 0.5, "de": 0.25}


def clean_pack_pipeline(
    sf_dir: str,
    window: int = 256,
    rare_thr: float = 0.05,
    rates: dict[str, float] | None = None,
    default_rate: float = 0.1,
    threshold: float = 0.5,
) -> pd.DataFrame:
    """Run the full clean→sample→pack pipeline over `documents`; output
    the packed-window stats (window_id, n_docs, n_tokens) of the
    CLEANED corpus."""
    if rates is None:
        rates = dict(DEFAULT_RATES)
    path = f"{sf_dir}/documents.parquet"

    removed = minhash_dedup_survivors(sf_dir, threshold=threshold)[
        "doc_id"
    ].to_numpy(np.int64)
    rr = rare_token_ratio(sf_dir)
    bad = rr.loc[rr["rare_ratio"] > rare_thr, "doc_id"].to_numpy(np.int64)
    drop = np.unique(np.concatenate([removed, bad]))
    if drop.size > BROADCAST_IDS_CAP:
        raise NotImplementedError(
            "drop set exceeds the broadcast cap — route through the "
            "anti hash join (dedup.semi_filter_payload shape)"
        )
    dref = ray.put(np.sort(drop))

    def drop_filter(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mask = ~isin_sorted(ray.get(dref), ids)
        return t.filter(pa.array(mask))

    ds = rd.read_parquet(path, columns=["doc_id", "lang", "text"])
    kept = stratified_sample_ds(
        ds.map_batches(drop_filter, batch_format="pyarrow"),
        rates,
        default_rate,
    )
    return packed_windows_from_counts(token_counts_ds(kept), window)


def clean_pack_sql(
    window: int = 256,
    rare_thr: float = 0.05,
    rates: dict[str, float] | None = None,
    default_rate: float = 0.1,
    threshold: float = 0.5,
) -> str:
    """DuckDB twin: the stage twins composed as nested CTE subqueries.

    The sampling condition is lifted from :func:`stratified_sample_sql`
    (identical Lehmer arithmetic); the packing tail is
    :func:`packed_windows_sql` retargeted at the cleaned doc set."""
    if rates is None:
        rates = dict(DEFAULT_RATES)
    sample_where = (
        stratified_sample_sql(rates, default_rate)
        .split("WHERE", 1)[1]
        .split("ORDER BY", 1)[0]
        .strip()
    )
    pack_tail = packed_windows_sql(window).split("WITH", 1)[1].replace(
        "FROM documents", "FROM kept_docs", 1
    )
    return f"""
        WITH removed AS (
            SELECT doc_id FROM ({minhash_survivors_sql(threshold)}) t
        ),
        rare AS (
            SELECT doc_id FROM ({rare_token_ratio_sql()}) t
            WHERE rare_ratio > {rare_thr}
        ),
        kept_docs AS (
            SELECT d.doc_id, d.text
            FROM documents d
            WHERE d.doc_id NOT IN (SELECT doc_id FROM removed)
              AND d.doc_id NOT IN (SELECT doc_id FROM rare)
              AND {sample_where}
        ),
        {pack_tail}
    """
