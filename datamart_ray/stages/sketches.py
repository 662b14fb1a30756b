"""Cardinality sketches (SURVEY.md §2.3 ST-family adjacent): a
HyperLogLog approximate-distinct operator — the 100-TB path for A3's
exact distinct count. The reference reaches the same shape through
Elasticsearch's `cardinality` aggregation (HLL++ under the hood); the
repo's exact distinct (`q05`, `profiler`) stays the small-scale oracle.

Scale shape: each batch folds into a FIXED 2^p-register array (one
``np.maximum.at`` pass, no per-row Python); block partials are
constant-size (m bytes) regardless of input rows, so the reduce moves
kilobytes where the exact path shuffles every distinct key. Partials
merge by elementwise max — associative and layout-independent, so the
estimate is BIT-DETERMINISTIC across block splits and parallelism
(gated in pytest, like the distributed k-means trainer).

Estimator: the standard HLL-with-linear-counting-correction rule
(Flajolet et al. 2007): E = alpha_m * m^2 / sum(2^-M); if E <= 2.5m and
empty registers remain, fall back to linear counting m*ln(m/V).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from datamart_ray.stages.dedup import _mix64

HLL_P = 12  # 4096 registers → ~1.6% standard error, 4 KiB per partial


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """floor(log2(w)) + 1 for uint64 (0 → 0), exact: frexp on each
    32-bit half (float64 is exact below 2^53)."""
    hi = (w >> np.uint64(32)).astype(np.float64)
    lo = (w & np.uint64(0xFFFFFFFF)).astype(np.float64)
    bl_hi = np.frexp(hi)[1]  # frexp(0) → exponent 0
    bl_lo = np.frexp(lo)[1]
    return np.where(hi > 0, bl_hi + 32, bl_lo)


def hll_fold(values: np.ndarray, p: int = HLL_P) -> np.ndarray:
    """Fold hashed values into a fresh 2^p uint8 register array."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if values.size == 0:
        return regs
    h = _mix64(values.astype(np.uint64, copy=False))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = (h << np.uint64(p)) >> np.uint64(p)  # low 64-p bits
    rank = ((64 - p) - _bit_length_u64(w) + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    m = regs.size
    est = _alpha(m) * m * m / np.sum(np.ldexp(1.0, -regs.astype(np.int64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            est = m * np.log(m / zeros)
    return float(est)


def hll_distinct(
    ds: rd.Dataset, column: str, p: int = HLL_P
) -> tuple[float, np.ndarray]:
    """(estimate, merged registers) for the distinct count of an int64
    column. Block partials are fixed 2^p-byte arrays merged by max."""

    def fold(t: pa.Table) -> pd.DataFrame:
        vals = t[column].to_numpy(zero_copy_only=False)
        vals = vals[~pd.isna(vals)].astype(np.int64)
        regs = hll_fold(vals.view(np.uint64), p)
        return pd.DataFrame({"regs": [regs.tobytes()]})

    parts = ds.map_batches(fold, batch_format="pyarrow").take_all()
    merged = np.zeros(1 << p, dtype=np.uint8)
    for row in parts:  # fixed-size partials: O(blocks · 2^p) bytes
        merged = np.maximum(merged, np.frombuffer(row["regs"], np.uint8))
    return hll_estimate(merged), merged


def hll_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Driver entry (rows-only — an HLL estimate is not SQL-matchable):
    approximate distinct user_id over events, plus the register-array
    checksum so the driver's rows/schema check pins determinism."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    est, regs = hll_distinct(ds, "user_id")
    return pd.DataFrame(
        {
            "column": ["user_id"],
            "hll_p": [np.int64(HLL_P)],
            "estimate": [np.int64(round(est))],
            "regs_sum": [np.int64(int(regs.astype(np.int64).sum()))],
        }
    )
