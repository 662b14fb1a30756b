"""Deduplication operators for training-data pipelines.

- exact: hash-partition + per-group first (U2; the Ray analog of the
  reference's seen-set dedups, e.g. socrata_discovery.py:77-78) — see also
  ``pipelines.fulltext.ft_exact_dedup``.
- MinHash + LSH near-dup: shingle → minhash signature → band → bucket
  groupby → candidate pairs → exact n-gram-Jaccard verification. The analog
  of the reference's Lazo MinHash sketches (ST1/J6,
  lib_profiler/datamart_profiler/core.py:502-557) re-expressed as pure
  Ray Data: signatures are computed vectorized per batch, the only shuffle
  is the (band, bucket) groupby, and verification joins text back via a
  broadcast of candidate doc texts (candidate sets are tiny vs the corpus).
- SimHash: 64-bit signatures + banded grouping for Hamming-distance ≤ k
  candidates.

All hash functions are fixed-seed and deterministic across runs and
parallelism levels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from datamart_ray.analyzer import Analyzer
from datamart_ray.util import ensure_fast_shuffle, round_away

def _perm_seeds(n_perm: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(
        1, np.iinfo(np.int64).max, size=n_perm, dtype=np.int64
    ).astype(np.uint64)


def _hash_tokens(tokens: list[str]) -> np.ndarray:
    """Stable 64-bit hashes of strings — pandas' fixed-key siphash
    (C-speed, independent of PYTHONHASHSEED, identical across processes)."""
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(np.asarray(tokens, dtype=object))


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — vectorized uint64 avalanche (wrapping mul)."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def shingle_hashes(tokens: list[str], n: int = 3) -> np.ndarray:
    """Hashes of word n-gram shingles (rolling combine of token hashes)."""
    th = _hash_tokens(tokens)
    if th.size < n:
        return np.unique(th)  # degenerate: doc shorter than shingle
    # combine n consecutive token hashes with distinct odd multipliers
    acc = np.zeros(th.size - n + 1, dtype=np.uint64)
    for j in range(n):
        mult = np.uint64(0x9E3779B97F4A7C15 + 2 * j + 1)
        acc = acc * np.uint64(31) + th[j : th.size - n + 1 + j] * mult
    return np.unique(acc)


def minhash_signature(shingles: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """n_perm MinHash values: min over shingles of mix64(shingle ^ seed_i).

    Fully vectorized uint64 (wrapping) arithmetic — no Python/object math.
    Equivalent quality to universal mod-prime hashing for LSH purposes."""
    if shingles.size == 0:
        return np.full(seeds.size, np.iinfo(np.uint64).max, dtype=np.uint64)
    vals = _mix64(shingles[None, :] ^ seeds[:, None])
    return vals.min(axis=1)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 1.0


class _MinHashStage:
    """Per-batch: tokenize, shingle, minhash, emit one row per band."""

    def __init__(self, id_col, text_col, n_perm, bands, shingle_n, analyzer_kw):
        self.analyzer = Analyzer(**analyzer_kw)
        self.id_col = id_col
        self.text_col = text_col
        self.n_perm = n_perm
        self.bands = bands
        self.rows = n_perm // bands
        self.shingle_n = shingle_n
        self.seeds = _perm_seeds(n_perm)

    def __call__(self, t: pa.Table) -> pa.Table:
        lists = self.analyzer.token_lists(t[self.text_col])
        ids = t[self.id_col].to_numpy(zero_copy_only=False)
        out_id, out_band, out_bucket = [], [], []
        for i in range(t.num_rows):
            toks = lists[i].as_py()
            sig = minhash_signature(
                shingle_hashes(toks, self.shingle_n), self.seeds
            )
            for bnd in range(self.bands):
                chunk = sig[bnd * self.rows : (bnd + 1) * self.rows]
                bucket = int(
                    np.bitwise_xor.reduce(
                        chunk * np.uint64(0x9E3779B97F4A7C15)
                    )
                    & np.uint64(0x7FFFFFFFFFFFFFFF)
                )
                out_id.append(int(ids[i]))
                out_band.append(bnd)
                out_bucket.append(bucket)
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "band": pa.array(out_band, type=pa.int32()),
                "bucket": pa.array(out_bucket, type=pa.int64()),
            }
        )


def minhash_candidate_pairs(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    analyzer: Analyzer | None = None,
) -> pd.DataFrame:
    """LSH candidate pairs: docs sharing any (band, bucket). Returns the
    deduplicated (doc_a < doc_b) pair list (driver-side; candidate sets are
    tiny relative to the corpus by construction)."""
    ensure_fast_shuffle()
    kw = analyzer.to_kwargs() if analyzer else {}
    sig = ds.map_batches(
        _MinHashStage,
        fn_constructor_args=(id_col, text_col, n_perm, bands, shingle_n, kw),
        batch_format="pyarrow",
        concurrency=(1, 8),
        num_cpus=1,
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        ids = np.sort(g["doc_id"].to_numpy())
        ia, ib = np.triu_indices(ids.size, k=1)
        return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})

    pairs = (
        sig.groupby(["band", "bucket"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if pairs.empty:
        return pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64")}
        )
    pairs = pairs.drop_duplicates().reset_index(drop=True)
    pairs["doc_a"] = pairs["doc_a"].astype("int64")
    pairs["doc_b"] = pairs["doc_b"].astype("int64")
    return pairs.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def minhash_near_dups(
    sf_dir: str,
    threshold: float = 0.5,
    n_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> pd.DataFrame:
    """MinHash-LSH near-duplicate pairs over `documents`, verified with the
    exact shingle-Jaccard. Output: (doc_a, doc_b, jaccard≥threshold)."""
    path = f"{sf_dir}/documents.parquet"
    ds = rd.read_parquet(path, columns=["doc_id", "text"])
    cand = minhash_candidate_pairs(
        ds, n_perm=n_perm, bands=bands, shingle_n=shingle_n
    )
    if cand.empty:
        return pd.DataFrame(
            {
                "doc_a": pd.Series([], dtype="int64"),
                "doc_b": pd.Series([], dtype="int64"),
                "jaccard": pd.Series([], dtype="float64"),
            }
        )
    # verification: fetch texts of candidate docs only (broadcast-sized)
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    need = np.unique(np.concatenate([cand["doc_a"], cand["doc_b"]]))
    t = pq.read_table(path, columns=["doc_id", "text"]).filter(
        pc.is_in(pc.field("doc_id"), value_set=pa.array(need))
    )
    analyzer = Analyzer()
    sh = {
        int(d): shingle_hashes(analyzer.tokenize(x or ""), shingle_n)
        for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
    }
    j = np.array(
        [
            jaccard(sh[int(a)], sh[int(b)])
            for a, b in zip(cand["doc_a"], cand["doc_b"])
        ]
    )
    out = cand[j >= threshold].copy()
    out["jaccard"] = round_away(j[j >= threshold], 4)
    return out.reset_index(drop=True)


# ----------------------------------------------------------------------
# SimHash
# ----------------------------------------------------------------------

def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over token hashes (unweighted)."""
    if not tokens:
        return 0
    th = _hash_tokens(tokens)
    bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
        np.int64
    )
    v = bits.sum(axis=0) * 2 - th.size  # +1/-1 vote per bit
    return int(
        np.bitwise_or.reduce(
            (v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
        )
    )


class _SimHashStage:
    def __init__(self, id_col, text_col, analyzer_kw):
        self.analyzer = Analyzer(**analyzer_kw)
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        lists = self.analyzer.token_lists(t[self.text_col])
        hashes = [simhash64(lists[i].as_py()) for i in range(t.num_rows)]
        return pa.table(
            {
                "doc_id": t[self.id_col],
                "simhash": pa.array(
                    np.array(hashes, dtype=np.uint64).view(np.int64)
                ),
            }
        )


def simhash_table(
    ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> rd.Dataset:
    return ds.map_batches(
        _SimHashStage,
        fn_constructor_args=(id_col, text_col, {}),
        batch_format="pyarrow",
        concurrency=(1, 8),
        num_cpus=1,
    )


def simhash_dup_pairs(
    sf_dir: str, max_hamming: int = 3
) -> pd.DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ k via the pigeonhole
    banding trick: split 64 bits into (k+1) bands; any pair within distance
    k shares at least one exact band → band-bucket groupby → verify."""
    ensure_fast_shuffle()
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    sig = simhash_table(ds)
    n_bands = max_hamming + 1
    width = 64 // n_bands

    def band_rows(t: pa.Table) -> pa.Table:
        h = t["simhash"].to_numpy().view(np.uint64)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        out_id, out_band, out_key, out_h = [], [], [], []
        for bnd in range(n_bands):
            shift = np.uint64(bnd * width)
            mask = np.uint64((1 << width) - 1)
            keys = ((h >> shift) & mask).astype(np.int64)
            out_id.append(ids)
            out_band.append(np.full(ids.size, bnd, dtype=np.int32))
            out_key.append(keys)
            out_h.append(h.view(np.int64))
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_id)),
                "band": pa.array(np.concatenate(out_band)),
                "key": pa.array(np.concatenate(out_key)),
                "simhash": pa.array(np.concatenate(out_h)),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(
                {"doc_a": [], "doc_b": [], "hamming": []}
            )
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy().view(np.uint64)
        ia, ib = np.triu_indices(ids.size, k=1)
        ham = np.array(
            [bin(int(hs[x] ^ hs[y])).count("1") for x, y in zip(ia, ib)]
        )
        keep = ham <= max_hamming
        return pd.DataFrame(
            {
                "doc_a": ids[ia[keep]],
                "doc_b": ids[ib[keep]],
                "hamming": ham[keep],
            }
        )

    pairs = (
        sig.map_batches(band_rows, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if pairs.empty:
        return pd.DataFrame(
            {
                "doc_a": pd.Series([], dtype="int64"),
                "doc_b": pd.Series([], dtype="int64"),
                "hamming": pd.Series([], dtype="int64"),
            }
        )
    pairs = (
        pairs.drop_duplicates(subset=["doc_a", "doc_b"])
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    for c in ("doc_a", "doc_b", "hamming"):
        pairs[c] = pairs[c].astype("int64")
    return pairs
