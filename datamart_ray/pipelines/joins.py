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

import numpy as np
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
    """Join a Dataset against a small in-memory table, broadcast once.

    Stateless task pool (fully elastic): ``ray.get`` of the broadcast ref
    inside the task is a zero-copy read from the node-local object store,
    so the table ships to each node once, not per batch."""
    ref = ray.put(small)

    def _join(batch: pd.DataFrame) -> pd.DataFrame:
        table = ray.get(ref)
        return batch.merge(
            table, how=how, left_on=on, right_on=right_on or on
        )

    return big.map_batches(_join, batch_format="pandas")


def broadcast_lookup_join(
    big: rd.Dataset,
    keys,
    values,
    on: str,
    value_col: str,
    keep_cols: list[str],
) -> rd.Dataset:
    """Inner join of a Dataset against a broadcast int64 key→value map,
    vectorized: the (sorted-key, value) arrays ship once via the object
    store and each batch resolves matches with one searchsorted — no
    per-batch pandas merge against the whole map (which costs
    O(batch + |map|) per batch). The tight special case of
    :func:`broadcast_join` for single-int-key, single-int-value maps."""
    import numpy as np

    k = np.asarray(keys, dtype=np.int64)
    v = np.asarray(values, dtype=np.int64)
    order = np.argsort(k, kind="stable")
    ref = ray.put((k[order], v[order]))

    def attach(t: pa.Table) -> pa.Table:
        kk, vv = ray.get(ref)
        bk = t[on].to_numpy(zero_copy_only=False).astype(np.int64)
        if kk.size == 0:
            hit = np.zeros(bk.size, dtype=bool)
            pos = np.zeros(bk.size, dtype=np.int64)
        else:
            pos = np.searchsorted(kk, bk)
            hit = (pos < kk.size) & (
                kk[np.minimum(pos, kk.size - 1)] == bk
            )
        mask = pa.array(hit)
        cols = {c: t[c].filter(mask) for c in keep_cols}
        cols[value_col] = pa.array(vv[pos[hit]])
        return pa.table(cols)

    return big.map_batches(attach, batch_format="pyarrow")


def anti_semi_filter(
    big: rd.Dataset, keys: set, on: str, anti: bool = False
) -> rd.Dataset:
    """Semi (keep matching) or anti (keep non-matching) join via a
    broadcast key set. At cluster scale the set rides the object store once
    per node; swap in a Bloom filter for very large key sets."""
    ref = ray.put(keys)

    def _filter(batch: pd.DataFrame) -> pd.DataFrame:
        mask = batch[on].isin(ray.get(ref))
        return batch[~mask] if anti else batch[mask]

    return big.map_batches(_filter, batch_format="pandas")


def read_small(path: str, columns: list[str] | None = None) -> pd.DataFrame:
    """Driver-side read of a small dimension table."""
    import pyarrow.parquet as pq

    return pq.read_table(path, columns=columns).to_pandas()


def _default_num_buckets() -> int:
    """Shared bucket-count policy for the partitioned hash join and its
    hot-key detector (4× cluster CPUs, floor 16) — one definition so the
    detector's threshold stays consistent with the join's bucket count."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(16, 4 * cpus)


def detect_hot_keys(
    ds: rd.Dataset,
    on: str,
    num_buckets: int | None = None,
    factor: float = 4.0,
    max_keys: int = 64,
) -> np.ndarray:
    """Heavy-hitter join keys of `ds[on]` — the keys whose row count
    exceeds `factor` × the mean bucket size, i.e. the ones that would
    concentrate a partitioned join into one oversized task.

    Scale shape: ONE pass — per-batch partial top-256 value counts (tiny
    rows; a globally hot key is hot in many batches, so its summed
    partial count approaches its true count — lower-bound heavy-hitter
    counting), with the batch's TOTAL row count riding on the batch's
    first candidate row, → one small groupby over the candidate set.
    Never a full per-key groupby, never a separate count pass."""
    from ray.data.aggregate import Sum

    if on in ("__hh_n", "__hh_tot"):
        raise ValueError("key column collides with a reserved name")
    if num_buckets is None:
        num_buckets = _default_num_buckets()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[on].value_counts().head(256)
        tot = np.zeros(len(vc), dtype=np.int64)
        if len(tot):
            tot[0] = len(df)
        return pd.DataFrame(
            {on: vc.index, "__hh_n": vc.to_numpy(), "__hh_tot": tot}
        )

    cand = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(on)
        .aggregate(
            Sum("__hh_n", alias_name="__hh_n"),
            Sum("__hh_tot", alias_name="__hh_tot"),
        )
        .to_pandas()
    )
    total = int(cand["__hh_tot"].sum()) if len(cand) else 0
    if not total:
        return np.empty(0, dtype=object)
    cut = factor * total / num_buckets
    hot = (
        cand[cand["__hh_n"] > cut]
        .sort_values("__hh_n", ascending=False)
        .head(max_keys)[on]
        .to_numpy()
    )
    return hot


# sub-bucket fan-out per salted hot key (hot rows spread across this
# many buckets; the dim side replicates its hot rows the same number of
# times — a bounded, hot-set-sized duplication)
SALT_FANOUT = 16


def hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_on: str | list[str],
    right_on: str | list[str] | None = None,
    how: str = "inner",
    num_buckets: int | None = None,
    hot_keys=None,
) -> rd.Dataset:
    """Explicit partitioned hash join: bucket by key hash on both sides,
    one ``groupby(bucket)`` shuffle, one vectorized pandas merge per bucket.

    This is the portable big-big equi join (the Ray analog of the
    reference's chunked pandas join, augmentation.py:376-623). It measures
    3-6x faster than ``Dataset.join`` on this Ray version because the merge
    runs once per *bucket* (vectorized) instead of routing through the join
    operator's aggregator actors. Buckets default to 4x cluster CPUs.

    Skew handling: pass `hot_keys` (an array of single-column key values,
    e.g. from :func:`detect_hot_keys`, or the string ``"auto"`` to run
    detection on the probe side first — one extra cheap pass) and rows
    carrying those keys are
    SALTED across SALT_FANOUT sub-buckets on the left while the right
    side REPLICATES its hot rows into the same sub-buckets — a dominant
    key's merge work spreads over many tasks instead of one. Inner joins
    only (replication would duplicate outer-join unmatched rows); the
    left-row salt is a position hash, which cannot change the join's
    OUTPUT set, so results stay parallelism-invariant.

    Measured (r2): an Arrow-typed-null exchange (padding absent columns
    with validity-bitmap nulls instead of pandas NaN arrays) ran SLOWER
    here — 6.7s vs 3.7-4.9s on the q02 join at sf0.1/32 CPUs — because at
    these schema widths the padding is negligible while Arrow-format
    group handling costs more; the pandas exchange stays. Revisit only
    for joins with wide value schemas.
    """
    from datamart_ray.util import ensure_fast_shuffle

    ensure_fast_shuffle()
    left_on = [left_on] if isinstance(left_on, str) else list(left_on)
    right_on = (
        left_on
        if right_on is None
        else ([right_on] if isinstance(right_on, str) else list(right_on))
    )
    if num_buckets is None:
        num_buckets = _default_num_buckets()

    l_schema = left.schema()
    r_schema = right.schema()
    l_cols = l_schema.names
    r_cols = r_schema.names
    # int columns degrade to float64 when the union pads the other side
    # with NaN; restore them after the merge (inner joins have no NaN)
    int_casts: dict[str, str] = {}
    for schema in (l_schema, r_schema):
        for name, typ in zip(schema.names, schema.types):
            # schema may be Arrow (pyarrow blocks) or numpy (pandas blocks)
            is_int = (
                pa.types.is_integer(typ)
                if isinstance(typ, pa.DataType)
                else np.issubdtype(typ, np.integer)
            )
            if is_int:
                int_casts[name] = "int64"
    overlap = (set(l_cols) & set(r_cols)) - set(
        k for k, rk in zip(left_on, right_on) if k == rk
    )
    if overlap:
        raise ValueError(f"overlapping non-key columns: {sorted(overlap)}")
    all_cols = list(dict.fromkeys(l_cols + r_cols))
    B = num_buckets

    hot_arr = None
    fanout = min(SALT_FANOUT, B)  # degrade gracefully on tiny clusters
    if isinstance(hot_keys, str):
        if hot_keys != "auto":
            raise ValueError("hot_keys must be an array or 'auto'")
        if how != "inner":
            raise ValueError("hot-key salting requires an inner join")
        if len(left_on) != 1:
            raise ValueError("hot-key salting supports single-column keys")
        hot_keys = detect_hot_keys(left, left_on[0], num_buckets=B)
    if hot_keys is not None and len(hot_keys):
        if how != "inner":
            raise ValueError("hot-key salting requires an inner join")
        if len(left_on) != 1:
            raise ValueError("hot-key salting supports single-column keys")
        hot_arr = np.asarray(hot_keys)
    # sub-bucket s of a hot key = (base_hash + s) % B: consecutive
    # buckets, guaranteed DISTINCT for s in [0, fanout) because
    # fanout <= B — a multiplicative step can alias two sub-buckets
    # onto one bucket and duplicate the replicated build row's matches.
    # base is masked below 2^63 in the salted path so base + s cannot
    # wrap uint64 (wraparound would alias two sub-buckets whenever
    # 2^64 % B < fanout and the hash sits in the top `fanout` values).

    def tag(side: int, on: list[str]):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            base = pd.util.hash_pandas_object(
                df[on], index=False
            ).to_numpy()
            if hot_arr is None:
                df["__bucket"] = (base % B).astype("int64")
                df["__side"] = side
                return df.reindex(
                    columns=all_cols + ["__bucket", "__side"]
                )
            # mask below 2^63: base + s can then never wrap uint64
            base = base.astype(np.uint64) & np.uint64((1 << 63) - 1)
            ishot = np.isin(df[on[0]].to_numpy(), hot_arr)
            if side == 0:
                # probe side: spread hot rows over `fanout`
                # sub-buckets (position salt — the join's output set is
                # independent of which bucket a probe row lands in)
                salt = np.zeros(len(df), dtype=np.uint64)
                salt[ishot] = np.arange(
                    int(ishot.sum()), dtype=np.uint64
                ) % np.uint64(fanout)
                df["__bucket"] = ((base + salt) % B).astype("int64")
                df["__side"] = side
                return df.reindex(
                    columns=all_cols + ["__bucket", "__side"]
                )
            # build side: replicate each hot row into every sub-bucket
            cold = df[~ishot].copy()
            cold["__bucket"] = (
                base[~ishot] % B
            ).astype("int64")
            parts = [cold]
            hotdf = df[ishot]
            hbase = base[ishot]
            for s in range(fanout):
                rep = hotdf.copy()
                rep["__bucket"] = (
                    (hbase + np.uint64(s)) % B
                ).astype("int64")
                parts.append(rep)
            out = pd.concat(parts, ignore_index=True)
            out["__side"] = side
            return out.reindex(
                columns=all_cols + ["__bucket", "__side"]
            )

        return fn

    tagged = left.map_batches(tag(0, left_on), batch_format="pandas").union(
        right.map_batches(tag(1, right_on), batch_format="pandas")
    )

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == 0][l_cols]
        r = g[g["__side"] == 1][r_cols]
        for col in right_on:
            # reindex turned absent int key columns into float NaN; restore
            if r[col].dtype != g[col].dtype:
                r = r.astype({col: g[col].dtype}, errors="ignore")
        if l.empty or (r.empty and how == "inner"):
            return pd.DataFrame(columns=all_cols)
        m = l.merge(
            r, how=how, left_on=left_on, right_on=right_on
        )
        m = m.reindex(columns=all_cols)
        for col, dt in int_casts.items():
            try:
                m[col] = m[col].astype(dt)
            except (ValueError, TypeError):
                pass  # NaN from outer join — leave as float
        return m

    return tagged.groupby("__bucket").map_groups(
        merge_bucket, batch_format="pandas"
    )


def interval_join_aggregate(
    big: rd.Dataset,
    intervals: pd.DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    id_col: str = "window_id",
    unit_scale: int = 100,
) -> pd.DataFrame:
    """Range (interval) join + aggregate: every row of `big` joins every
    interval whose [lo, hi) contains its value — intervals may OVERLAP
    (a row can land in several), which plain binning cannot express.

    Shape: the interval table is broadcast once (dimension-sized); each
    batch evaluates all intervals against its values in one vectorized
    (n_intervals × batch) comparison and emits per-interval partial
    (count, fixed-point sum); the driver folds the tiny partials. No
    shuffle, no row-level join output ever materializes.
    """
    import ray as _ray

    from datamart_ray.util import to_units

    lo = intervals[lo_col].to_numpy(dtype=np.float64)
    hi = intervals[hi_col].to_numpy(dtype=np.float64)
    ids = intervals[id_col].to_numpy()
    ref = _ray.put((lo, hi, ids))

    def partials(t: pa.Table) -> pa.Table:
        lo_l, hi_l, ids_l = _ray.get(ref)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        u = to_units(v, unit_scale)
        hit = (v[None, :] >= lo_l[:, None]) & (v[None, :] < hi_l[:, None])
        n = hit.sum(axis=1).astype(np.int64)
        sums = (hit * u[None, :]).sum(axis=1).astype(np.int64)
        return pa.table(
            {
                "window_id": pa.array(ids_l.astype(np.int64)),
                "n": pa.array(n),
                "sum_u": pa.array(sums),
            }
        )

    out = (
        big.map_batches(partials, batch_format="pyarrow")
        .to_pandas()
        .groupby("window_id", as_index=False)[["n", "sum_u"]]
        .sum()
    )
    out = out[out["n"] > 0]
    for c in ("window_id", "n", "sum_u"):
        out[c] = out[c].astype("int64")
    return out.sort_values("window_id").reset_index(drop=True)


def rj_acctbal_windows(sf_dir: str) -> pd.DataFrame:
    """Range-join entry: customer balances joined into 20 OVERLAPPING
    windows [k*500 - 400, k*500 + 600) — rows land in up to two windows,
    exercising the true interval-join semantics (J-family; reference's
    closest analog is the range-intersects coverage query,
    search/join.py:152-187, applied row-level)."""
    k = np.arange(20, dtype=np.float64)
    intervals = pd.DataFrame(
        {
            "window_id": k.astype(np.int64),
            "lo": k * 500.0 - 400.0,
            "hi": k * 500.0 + 600.0,
        }
    )
    big = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_acctbal"]
    )
    return interval_join_aggregate(big, intervals, "c_acctbal")


RJ_WINDOWS_SQL = """
    WITH w AS (
        SELECT k AS window_id, k * 500.0 - 400.0 AS lo,
               k * 500.0 + 600.0 AS hi
        FROM range(0, 20) t(k)
    )
    SELECT window_id, count(*) AS n,
           CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_u
    FROM customer JOIN w
      ON c_acctbal >= w.lo AND c_acctbal < w.hi
    GROUP BY window_id
    HAVING count(*) > 0
    ORDER BY window_id
"""


def interval_join_shuffle(
    big: rd.Dataset,
    intervals: rd.Dataset,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    id_col: str = "window_id",
    unit_scale: int = 100,
    band_width: float | None = None,
) -> pd.DataFrame:
    """The BIG-BIG range join scale path (when the interval table itself
    is too large to broadcast): band partitioning instead of a broadcast.

    1. Pick a band width (given, or estimated distributed from interval
       spans: ~4× the mean span, so an interval replicates to ≲2 bands
       on average).
    2. Intervals REPLICATE to every band they overlap; values map to
       their single band — one shuffle co-locates each value with every
       interval that could contain it.
    3. Per (band) group: vectorized containment over the band's interval
       set → per-interval fixed-point partials; a final tiny groupby
       folds cross-band partials (an interval spans several bands).

    Same output contract as :func:`interval_join_aggregate` (per-interval
    count + fixed-point sum, intervals with 0 matches dropped).
    """
    from ray.data.aggregate import Sum as _Sum

    from datamart_ray.util import ensure_fast_shuffle, to_units

    ensure_fast_shuffle()
    if band_width is None:
        from ray.data.aggregate import Count as _Count

        stats = intervals.map_batches(
            lambda t: pa.table(
                {
                    "span": pa.array(
                        [
                            float(
                                pa.compute.sum(
                                    pa.compute.subtract(
                                        t[hi_col], t[lo_col]
                                    )
                                ).as_py()
                                or 0.0
                            )
                        ]
                    ),
                    "n": pa.array([t.num_rows], type=pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ).to_pandas()
        total_span = float(stats["span"].sum())
        n_iv = int(stats["n"].sum())
        band_width = max(total_span / max(n_iv, 1) * 4.0, 1e-9)
    W = float(band_width)

    def tag_intervals(t: pa.Table) -> pa.Table:
        lo = t[lo_col].to_numpy(zero_copy_only=False).astype(np.float64)
        hi = t[hi_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b_lo = np.floor(lo / W).astype(np.int64)
        b_hi = np.floor(np.nextafter(hi, -np.inf) / W).astype(np.int64)
        reps = (b_hi - b_lo + 1).clip(min=1)
        idx = np.repeat(np.arange(ids.size), reps)
        band = np.concatenate(
            [np.arange(a, a + r) for a, r in zip(b_lo, reps)]
        ) if ids.size else np.empty(0, dtype=np.int64)
        return pa.table(
            {
                "band": pa.array(band),
                "side": pa.array(np.zeros(band.size, dtype=np.int8)),
                "window_id": pa.array(ids[idx]),
                "lo": pa.array(lo[idx]),
                "hi": pa.array(hi[idx]),
                "u": pa.array(np.zeros(band.size, dtype=np.int64)),
            }
        )

    def tag_values(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        u = to_units(v, unit_scale)
        band = np.floor(v / W).astype(np.int64)
        n = v.size
        return pa.table(
            {
                "band": pa.array(band),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "window_id": pa.array(np.zeros(n, dtype=np.int64)),
                "lo": pa.array(v),  # carry the value in `lo`
                "hi": pa.array(np.zeros(n, dtype=np.float64)),
                "u": pa.array(u),
            }
        )

    # group on a SHARD of the band (≈4×CPUs groups), never per band —
    # a fine band width would otherwise shuffle millions of tiny groups
    # through per-group pandas dispatch (the r1 LSH lesson)
    from datamart_ray.stages.dedup import _num_shards

    n_shards = _num_shards()

    def add_shard(t: pa.Table) -> pa.Table:
        band = t["band"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "shard",
            pa.array(
                (
                    pd.util.hash_array(band.astype(np.int64)) % n_shards
                ).astype(np.int64)
            ),
        )

    tagged = (
        intervals.map_batches(tag_intervals, batch_format="pyarrow")
        .union(big.map_batches(tag_values, batch_format="pyarrow"))
        .map_batches(add_shard, batch_format="pyarrow")
    )

    def band_match(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "window_id": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64"),
                "sum_u": pd.Series([], dtype="int64"),
            }
        )
        parts = []
        g = g.sort_values("band", kind="mergesort")
        bands = g["band"].to_numpy()
        bounds = np.r_[
            0, np.flatnonzero(bands[1:] != bands[:-1]) + 1, len(g)
        ]
        for bi in range(bounds.size - 1):
            seg = g.iloc[bounds[bi]: bounds[bi + 1]]
            iv = seg[seg["side"] == 0]
            vals = seg[seg["side"] == 1]
            if iv.empty or vals.empty:
                continue
            lo = iv["lo"].to_numpy()
            hi = iv["hi"].to_numpy()
            ids = iv["window_id"].to_numpy()
            v = vals["lo"].to_numpy()
            u = vals["u"].to_numpy()
            hit = (v[None, :] >= lo[:, None]) & (v[None, :] < hi[:, None])
            n = hit.sum(axis=1).astype(np.int64)
            sums = (hit * u[None, :]).sum(axis=1).astype(np.int64)
            keep = n > 0
            if keep.any():
                parts.append(
                    pd.DataFrame(
                        {
                            "window_id": ids[keep],
                            "n": n[keep],
                            "sum_u": sums[keep],
                        }
                    )
                )
        return pd.concat(parts, ignore_index=True) if parts else empty

    out = (
        tagged.groupby("shard")
        .map_groups(band_match, batch_format="pandas")
        .groupby("window_id")
        .aggregate(
            _Sum("n", alias_name="n"), _Sum("sum_u", alias_name="sum_u")
        )
        .to_pandas()
    )
    for c in ("window_id", "n", "sum_u"):
        out[c] = out[c].astype("int64")
    return out.sort_values("window_id").reset_index(drop=True)
