"""Sequence packing — assign documents to fixed-size training windows.

LLM training consumes fixed-length token windows; the packing step
concatenates documents in a stable order (doc_id) and chunks the token
stream into windows of W tokens. Each document is attributed to the
window containing its FIRST token (the "greedy stream chunking" rule),
so the op reduces to a global prefix sum over per-doc token counts —
the classic distributed scan:

  1. per-block token counts (vectorized Arrow, no Python rows),
  2. ONE range-partitioning sort by doc_id (Ray Data's sort yields
     globally ordered blocks),
  3. per-block totals via tiny remote tasks (one int64 per block back
     to the driver — block-COUNT-sized, never row-sized),
  4. driver exclusive-scan over the block totals (a few thousand ints),
  5. per-block cumsum + window assignment + PARTIAL (window_id → n_docs,
     n_tokens) aggregates, merged by a window_id groupby whose input is
     already near-final: each block contributes at most one boundary
     window shared with its neighbor.

Steps 3/5 drop to raw `@ray.remote` tasks because the Dataset API has no
prefix-scan primitive; the partitioning assumption they rely on is that
`Dataset.sort` emits its blocks in global key order (asserted at run
time via per-block key ranges).

Reference analog: none (the reference has no training-window op); this
is part of the LLM-data operator family alongside dedup/quality/token
counting.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from datamart_ray.analyzer import Analyzer

ANALYZER = Analyzer()


@ray.remote
def _block_range_sum(tbl: pa.Table) -> tuple[int, int, int]:
    """(min doc_id, max doc_id, total token count) of one sorted block."""
    if tbl.num_rows == 0:
        return (0, -1, 0)
    ids = tbl["doc_id"]
    return (
        pc.min(ids).as_py(),
        pc.max(ids).as_py(),
        int(pc.sum(tbl["cnt"]).as_py() or 0),
    )


@ray.remote
def _pack_block(tbl: pa.Table, offset: int, window: int) -> pa.Table:
    """Partial (window_id, n_docs, n_tokens) aggregate for one block,
    given the exclusive prefix `offset` of all earlier blocks."""
    if tbl.num_rows == 0:
        return pa.table(
            {
                "window_id": pa.array([], type=pa.int64()),
                "n_docs": pa.array([], type=pa.int64()),
                "n_tokens": pa.array([], type=pa.int64()),
            }
        )
    cnt = tbl["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    before = offset + np.cumsum(cnt) - cnt  # first-token position per doc
    wid = before // window
    df = pd.DataFrame({"window_id": wid, "n_tokens": cnt})
    g = df.groupby("window_id", as_index=False).agg(
        n_docs=("n_tokens", "size"), n_tokens=("n_tokens", "sum")
    )
    return pa.table(
        {
            "window_id": pa.array(g["window_id"].to_numpy(np.int64)),
            "n_docs": pa.array(g["n_docs"].to_numpy(np.int64)),
            "n_tokens": pa.array(g["n_tokens"].to_numpy(np.int64)),
        }
    )


def token_counts_ds(ds: rd.Dataset) -> rd.Dataset:
    """(doc_id, text) Dataset → (doc_id, cnt) analyzer token counts."""

    def counts(t: pa.Table) -> pa.Table:
        lists = ANALYZER.token_lists(t["text"])
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "cnt": pc.cast(pc.list_value_length(lists), pa.int64()),
            }
        )

    return ds.map_batches(counts, batch_format="pyarrow")


def packed_windows_from_counts(
    counts: rd.Dataset, window: int
) -> pd.DataFrame:
    """Pack a (doc_id, cnt) Dataset into `window`-token windows — the
    distributed prefix-scan core shared by the plain entry and the
    composite clean→pack pipeline."""
    c = counts.sort("doc_id").materialize()
    refs = c.to_arrow_refs()
    ranges = ray.get([_block_range_sum.remote(r) for r in refs])
    # the partitioning assumption: sort's blocks are in global key order
    nonempty = [(i, r) for i, r in enumerate(ranges) if r[1] >= r[0]]
    for (_, a), (_, b) in zip(nonempty, nonempty[1:]):
        if a[1] >= b[0]:
            raise AssertionError(
                f"sorted blocks out of order: {a[:2]} then {b[:2]}"
            )
    sums = np.array([r[2] for r in ranges], dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]])
    parts = [
        _pack_block.remote(r, int(o), window)
        for r, o in zip(refs, offsets)
    ]
    from ray.data.aggregate import Sum

    merged = (
        rd.from_arrow_refs(parts)
        .groupby("window_id")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
        )
    )
    out = merged.to_pandas().sort_values("window_id").reset_index(drop=True)
    for col in out.columns:
        out[col] = out[col].astype("int64")
    return out[["window_id", "n_docs", "n_tokens"]]


def packed_windows(sf_dir: str, window: int = 256) -> pd.DataFrame:
    """Pack `documents` (analyzer tokens, doc_id order) into windows of
    `window` tokens. Output one row per window: (window_id, n_docs,
    n_tokens) where n_docs counts documents STARTING in the window and
    n_tokens sums their full token counts."""
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return packed_windows_from_counts(token_counts_ds(ds), window)


def packed_windows_sql(window: int = 256) -> str:
    """DuckDB twin: window-function prefix sum over the same analyzer
    token counts, identical first-token window rule."""
    toks = ANALYZER.sql_tokens_expr("text")
    return f"""
        WITH c AS (
            SELECT doc_id, len({toks}) AS cnt FROM documents
        ),
        s AS (
            SELECT doc_id, cnt,
                   COALESCE(SUM(cnt) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS bef
            FROM c
        )
        SELECT CAST(bef // {window} AS BIGINT) AS window_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(cnt) AS BIGINT) AS n_tokens
        FROM s
        GROUP BY 1
        ORDER BY 1
    """
