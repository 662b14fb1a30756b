"""Benchmark decontamination — n-gram overlap against a held-out set.

Before training, a corpus is checked for documents that leak evaluation
data: any document sharing word n-grams with the benchmark set is
flagged (and usually dropped or scrubbed). The benchmark side is tiny
(thousands of eval documents) while the corpus side is the full 100-TB
table, so the scale shape is a BROADCAST membership probe, never a
join-shuffle of the corpus:

  1. read ONLY the benchmark rows (row-group-pruned id fetch),
  2. shingle them driver-side into one sorted uint64 array (benchmark
     shingle count is eval-sized — a few MB),
  3. `ray.put` the array once; every corpus task probes its batch's
     shingles with one `np.isin`-style sorted membership test.

Shingles are the same 64-bit hashes as the dedup modalities
(`batch_shingle_values`): per-doc DISTINCT n-grams, short docs fall back
to their token set, and the DuckDB twin counts distinct shared string
shingles — equal counts absent 64-bit collisions (the standing
assumption of every shingle-based twin in this repo).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from datamart_ray.analyzer import Analyzer
from datamart_ray.stages.dedup import batch_shingle_values, distinct_per_doc
from datamart_ray.util import fetch_rows_by_ids, isin_sorted

ANALYZER = Analyzer()


def _doc_shingles(texts: pa.Array, shingle_n: int) -> tuple[np.ndarray, np.ndarray]:
    """(values, doc_index) with per-doc DISTINCT shingles, doc-sorted."""
    lists = ANALYZER.token_lists(texts)
    return distinct_per_doc(*batch_shingle_values(lists, shingle_n))


def contamination_counts(
    sf_dir: str,
    benchmark_ids: tuple[int, ...] = (0, 1, 2, 3, 4),
    shingle_n: int = 3,
) -> pd.DataFrame:
    """Per-document count of distinct shingles shared with the benchmark
    docs. Output (doc_id, n_shared) for docs with any overlap, sorted —
    the flag list a decontamination pass drops or scrubs."""
    path = f"{sf_dir}/documents.parquet"
    bench = fetch_rows_by_ids(
        path, "doc_id", np.asarray(benchmark_ids), ["doc_id", "text"]
    )
    bvals, _ = _doc_shingles(bench["text"].combine_chunks(), shingle_n)
    bset = np.unique(bvals)
    bref = ray.put(bset)

    def probe(t: pa.Table) -> pa.Table:
        b = ray.get(bref)
        v, p = _doc_shingles(t["text"].combine_chunks(), shingle_n)
        hit = isin_sorted(b, v)
        shared = np.bincount(p[hit], minlength=t.num_rows)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = shared > 0
        return pa.table(
            {
                "doc_id": pa.array(ids[keep]),
                "n_shared": pa.array(shared[keep].astype(np.int64)),
            }
        )

    ds = rd.read_parquet(path, columns=["doc_id", "text"])
    out = (
        ds.map_batches(probe, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out


def contamination_sql(
    benchmark_ids: tuple[int, ...] = (0, 1, 2, 3, 4), shingle_n: int = 3
) -> str:
    """DuckDB twin: distinct string-shingle sets per doc, benchmark set
    from the same ids, count of distinct shared shingles per doc."""
    toks = ANALYZER.sql_tokens_expr("text")
    concat = " || ' ' || ".join(
        f"ts[i+{j}]" if j else "ts[i]" for j in range(shingle_n)
    )
    ids = ", ".join(str(i) for i in benchmark_ids)
    return f"""
        WITH toks AS (SELECT doc_id, {toks} AS ts FROM documents),
        sh AS (
            SELECT doc_id,
                   CASE WHEN len(ts) >= {shingle_n}
                        THEN list_distinct(
                            [{concat} FOR i IN range(1, len(ts) - {shingle_n - 2})]
                        )
                        ELSE list_distinct(ts) END AS shingles
            FROM toks
        ),
        ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        bench AS (SELECT DISTINCT s FROM ex WHERE doc_id IN ({ids}))
        SELECT e.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM ex e JOIN bench b ON e.s = b.s
        GROUP BY 1
        ORDER BY 1
    """
