"""Per-group ranking + exact distributed quantiles (SURVEY.md §2.5/§2.6
adjacents every large-scale pipeline needs; the reference reaches the
same shapes through Elasticsearch aggregations — top-hits per bucket and
percentile buckets — apiserver/apiserver/search/__init__.py's ranked
result assembly and lib_profiler's numeric summaries).

Both ops are MAP-SIDE COMBINED so the shuffle carries partials, never
rows:

- :func:`topk_docs_per_lang` — per-batch top-k prune per group (a batch
  can contribute at most k rows per group to the exchange), then one
  small ``groupby(lang).map_groups`` final selection. At 100 TB the
  exchange is O(k · n_groups · n_blocks), independent of corpus rows.
- :func:`quantity_quantiles_by_flag` — exact group quantiles via
  per-batch (group, value) partial COUNTS; the shuffle moves the
  histogram, not the measures. Exact for any value domain whose
  distinct count per group is bounded (here ≤50); for unbounded
  domains swap the count map for a fixed-width value histogram and the
  same plumbing yields ε-approximate quantiles.

DuckDB twins: ROW_NUMBER() OVER (PARTITION BY …) and quantile_disc
(whose discrete rule, verified empirically, picks the 1-indexed
``ceil(q·n)``-th element of the sorted group).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from datamart_ray.util import ensure_fast_shuffle

TOPK_K = 3
QUANTS = (0.5, 0.9)


def topk_docs_per_lang(sf_dir: str, k: int = TOPK_K) -> pd.DataFrame:
    """Top-k documents per language by (n_chars DESC, doc_id ASC),
    ranked 1..k — the distributed 'top hits per bucket' pattern."""
    ensure_fast_shuffle()
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "n_chars"],
    )

    def prune(t: pa.Table) -> pa.Table:
        """Keep at most k rows per lang in this batch (map-side
        combine): one lexsort, run-relative positions, no Python loop
        over rows."""
        if t.num_rows == 0:
            return t
        langs = t["lang"].to_numpy(zero_copy_only=False)
        chars = t["n_chars"].to_numpy()
        ids = t["doc_id"].to_numpy()
        order = np.lexsort((ids, -chars, langs))
        runs = langs[order]
        starts = np.r_[0, np.flatnonzero(runs[1:] != runs[:-1]) + 1]
        lens = np.diff(np.r_[starts, runs.size])
        pos = np.arange(runs.size) - np.repeat(starts, lens)
        return t.take(pa.array(np.sort(order[pos < k])))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["n_chars", "doc_id"],
            ascending=[False, True],
            kind="mergesort",
        ).head(k)
        df = df.reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df[["lang", "doc_id", "n_chars", "rank"]]

    out = (
        ds.map_batches(prune, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(final, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["lang", "rank"]).reset_index(drop=True)


def topk_per_lang_sql(k: int = TOPK_K) -> str:
    return f"""
    SELECT lang, doc_id, n_chars, rank FROM (
        SELECT lang, doc_id, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY lang ORDER BY n_chars DESC, doc_id
               ) AS rank
        FROM documents
    ) WHERE rank <= {k}
    ORDER BY lang, rank
    """


def quantity_quantiles_by_flag(
    sf_dir: str, qs: tuple[float, ...] = QUANTS
) -> pd.DataFrame:
    """Exact p50/p90 of l_quantity per l_returnflag: the shuffle moves
    per-batch (flag, value) COUNT partials; each group's final pick is
    a cumsum + one searchsorted over its tiny distinct-value table."""
    ensure_fast_shuffle()
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity"],
    )

    def counts(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "l_returnflag": t["l_returnflag"].to_numpy(
                    zero_copy_only=False
                ),
                "l_quantity": t["l_quantity"].to_numpy(),
            }
        )
        return (
            df.groupby(["l_returnflag", "l_quantity"], sort=False)
            .size()
            .reset_index(name="n")
        )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("l_quantity")["n"].sum().sort_index()
        vals = agg.index.to_numpy()
        cum = np.cumsum(agg.to_numpy())
        n = int(cum[-1])
        out = {"l_returnflag": [df["l_returnflag"].iloc[0]]}
        for q in qs:
            # DuckDB quantile_disc: 1-indexed ceil(q*n)-th sorted value
            idx = max(int(np.ceil(q * n)), 1)
            out[f"p{int(q * 100)}"] = [
                float(vals[np.searchsorted(cum, idx)])
            ]
        return pd.DataFrame(out)

    out = (
        ds.map_batches(counts, batch_format="pyarrow")
        .groupby("l_returnflag")
        .map_groups(finish, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("l_returnflag").reset_index(drop=True)


def quantiles_sql(qs: tuple[float, ...] = QUANTS) -> str:
    cols = ", ".join(
        f"CAST(quantile_disc(l_quantity, {q}) AS DOUBLE) AS p{int(q * 100)}"
        for q in qs
    )
    return f"""
    SELECT l_returnflag, {cols}
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """


HIST_BINS = 10_000
HIST_QUANTS = (0.5, 0.99)


def histogram_quantiles_by_status(
    sf_dir: str,
    nbins: int = HIST_BINS,
    qs: tuple[float, ...] = HIST_QUANTS,
) -> pd.DataFrame:
    """ε-approximate group quantiles over an UNBOUNDED value domain
    (l_extendedprice): pass 1 aggregates global min/max; pass 2 folds
    each batch into per-group fixed-bin COUNT partials; the per-group
    pick is a cumsum over ≤nbins rows. Error ≤ one bin width
    ((max-min)/nbins) regardless of corpus size — the promised scale
    path when per-group distinct counts are unbounded. The reported
    value is the chosen bin's LOWER EDGE via the identical IEEE
    sequence (min + bin·w) on both sides, so the DuckDB twin matches
    bit-exactly."""
    ensure_fast_shuffle()
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_linestatus", "l_extendedprice"],
    )
    import ray.data.aggregate as agg

    stats = ds.aggregate(
        agg.Min("l_extendedprice"), agg.Max("l_extendedprice")
    )
    mn = float(stats["min(l_extendedprice)"])
    mx = float(stats["max(l_extendedprice)"])
    w = (mx - mn) / float(nbins)

    def counts(t: pa.Table) -> pd.DataFrame:
        x = t["l_extendedprice"].to_numpy()
        bins = np.minimum(
            np.floor((x - mn) / w).astype(np.int64), nbins - 1
        )
        df = pd.DataFrame(
            {
                "l_linestatus": t["l_linestatus"].to_numpy(
                    zero_copy_only=False
                ),
                "bin": bins,
            }
        )
        return (
            df.groupby(["l_linestatus", "bin"], sort=False)
            .size()
            .reset_index(name="n")
        )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        by_bin = df.groupby("bin")["n"].sum().sort_index()
        bins = by_bin.index.to_numpy()
        cum = np.cumsum(by_bin.to_numpy())
        tot = int(cum[-1])
        out = {"l_linestatus": [df["l_linestatus"].iloc[0]]}
        for q in qs:
            target = int(np.ceil(q * tot))
            b = int(bins[np.searchsorted(cum, max(target, 1))])
            out[f"p{int(q * 100)}_lo"] = [mn + b * w]
        return pd.DataFrame(out)

    out = (
        ds.map_batches(counts, batch_format="pyarrow")
        .groupby("l_linestatus")
        .map_groups(finish, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("l_linestatus").reset_index(drop=True)


def hist_quantiles_sql(
    nbins: int = HIST_BINS, qs: tuple[float, ...] = HIST_QUANTS
) -> str:
    picks = ", ".join(
        f"mn + MIN(CASE WHEN cum >= CAST(ceil({q} * tot) AS BIGINT) "
        f"THEN bin END) * w AS p{int(q * 100)}_lo"
        for q in qs
    )
    return f"""
    WITH stats AS (
        SELECT min(l_extendedprice) AS mn,
               (max(l_extendedprice) - min(l_extendedprice))
                   / CAST({nbins} AS DOUBLE) AS w
        FROM lineitem
    ),
    binned AS (
        SELECT l_linestatus,
               LEAST(CAST(floor((l_extendedprice - mn) / w) AS BIGINT),
                     {nbins - 1}) AS bin,
               count(*) AS n
        FROM lineitem, stats GROUP BY 1, 2
    ),
    cums AS (
        SELECT l_linestatus, bin, mn, w,
               sum(n) OVER (PARTITION BY l_linestatus ORDER BY bin)
                   AS cum,
               sum(n) OVER (PARTITION BY l_linestatus) AS tot
        FROM binned, stats
    )
    SELECT l_linestatus, {picks}
    FROM cums GROUP BY l_linestatus, mn, w ORDER BY l_linestatus
    """
