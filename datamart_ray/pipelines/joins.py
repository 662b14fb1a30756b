"""Join / lookup primitives (SURVEY.md §2.4).

- :func:`broadcast_join` — the small-side lookup join: the companion table is
  ``ray.put`` once and joined per batch inside ``map_batches`` (the Ray
  analog of the reference's KDTree/ST5 broadcast pattern and of dimension
  lookups). No shuffle; use only for genuinely small sides (dimension
  tables, vocab maps).
- :func:`anti_semi_filter` — semi/anti join by broadcasting the key set and
  filtering inside ``map_batches`` (reference: ``ignore_datasets`` must_not,
  apiserver/apiserver/search/join.py:145-149).
- Big-big equi joins use the native hash-shuffle ``Dataset.join`` (the Ray
  analog of the reference's chunked pandas equi join,
  lib_augmentation/datamart_augmentation/augmentation.py:376-623).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


def join_partitions(n_joins: int = 1, cap: int = 64) -> int:
    """Partition count for a hash-shuffle Dataset.join, sized so that the
    aggregator actor pools of `n_joins` chained joins fit the cluster CPUs
    simultaneously (each partition pins an aggregator actor; two stacked
    joins × 16 partitions deadlock a 4-CPU cluster)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(2, min(cap, cpus // max(1, 2 * n_joins)))


def broadcast_join(
    big: rd.Dataset,
    small: pd.DataFrame,
    on: str | list[str],
    how: str = "inner",
    right_on: str | list[str] | None = None,
) -> rd.Dataset:
    """Join a Dataset against a small in-memory table, broadcast once."""
    ref = ray.put(small)

    class _Join:
        def __init__(self):
            self.small = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch.merge(
                self.small,
                how=how,
                left_on=on,
                right_on=right_on or on,
            )

    return big.map_batches(
        _Join, batch_format="pandas", concurrency=(1, 8), num_cpus=1
    )


def anti_semi_filter(
    big: rd.Dataset, keys: set, on: str, anti: bool = False
) -> rd.Dataset:
    """Semi (keep matching) or anti (keep non-matching) join via a
    broadcast key set. At cluster scale the set rides the object store once
    per node; swap in a Bloom filter for very large key sets."""
    ref = ray.put(keys)

    class _Filter:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            mask = batch[on].isin(self.keys)
            return batch[~mask] if anti else batch[mask]

    return big.map_batches(
        _Filter, batch_format="pandas", concurrency=(1, 8), num_cpus=1
    )


def read_small(path: str, columns: list[str] | None = None) -> pd.DataFrame:
    """Driver-side read of a small dimension table."""
    import pyarrow.parquet as pq

    return pq.read_table(path, columns=columns).to_pandas()
