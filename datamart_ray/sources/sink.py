"""Resumable partitioned-Parquet sink for dataset pipelines.

The index build already has checkpoint-resume at segment granularity;
this is the same contract for GENERIC pipeline output (the graft
brief's "resumable output" requirement): output is hash-partitioned
into `n_shards` directories keyed on a stable id column, each shard is
committed ATOMICALLY with a `_SUCCESS.<shard>` marker, and a re-run
after a crash (a) deletes the partial files of uncommitted shards and
(b) re-processes ONLY those shards — the input scan is filtered to the
missing shard set, so finished partitions cost nothing on retry.

Scale shape: one streaming pass per (re)run — the shard column is
added per batch (vectorized hash), `write_parquet(partition_cols=...)`
fans rows into the shard directories task-locally (no shuffle: any
task may append to any shard dir; atomicity lives in the markers, not
in file layout). Never one giant file; a 100-TB output is n_shards
independent directories a failed run resumes into.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

SHARD_COL = "_shard"


def _marker(out_dir: str, shard: int) -> str:
    return os.path.join(out_dir, f"_SUCCESS.{shard}")


def committed_shards(out_dir: str) -> set[int]:
    if not os.path.isdir(out_dir):
        return set()
    out = set()
    for name in os.listdir(out_dir):
        if name.startswith("_SUCCESS."):
            out.add(int(name.split(".", 1)[1]))
    return out


def _shard_of(ids: np.ndarray, n_shards: int) -> np.ndarray:
    # pandas hash_array: stable across processes/runs (unlike hash())
    return (
        pd.util.hash_array(ids.astype(np.int64)) % np.uint64(n_shards)
    ).astype(np.int64)


def write_parquet_resumable(
    make_ds,
    out_dir: str,
    key_col: str,
    n_shards: int = 16,
) -> dict:
    """Write `make_ds()` to `out_dir` partitioned into `n_shards`
    hash(key_col) directories, skipping shards already committed by a
    previous (possibly crashed) run. Returns
    {"written": [...], "skipped": [...]} shard lists.

    `make_ds` is a zero-arg callable returning the Dataset so a resume
    can re-plan the scan with the shard filter applied from the start
    (a Dataset handle is single-use)."""
    import json

    os.makedirs(out_dir, exist_ok=True)
    # the shard layout is part of the output's identity: a resume with
    # a different n_shards/key would silently drop or duplicate rows
    meta_path = os.path.join(out_dir, "_META.json")
    meta = {"n_shards": n_shards, "key_col": key_col}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            prior = json.load(f)
        if prior != meta:
            raise ValueError(
                f"resumable output at {out_dir} was written with "
                f"{prior}; cannot resume with {meta}"
            )
    else:
        tmp = meta_path + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, meta_path)
    done = committed_shards(out_dir)
    todo = sorted(set(range(n_shards)) - done)
    if not todo:
        return {"written": [], "skipped": sorted(done)}
    # clear partials of uncommitted shards (crash leftovers)
    for shard in todo:
        part_dir = os.path.join(out_dir, f"{SHARD_COL}={shard}")
        if os.path.isdir(part_dir):
            shutil.rmtree(part_dir)

    todo_arr = np.array(todo, dtype=np.int64)
    ds = make_ds()

    def add_shard(t: pa.Table) -> pa.Table:
        ids = t[key_col].to_numpy(zero_copy_only=False)
        shard = _shard_of(ids, n_shards)
        t = t.append_column(SHARD_COL, pa.array(shard, pa.int64()))
        keep = np.isin(shard, todo_arr)
        return t.filter(pa.array(keep))

    ds.map_batches(add_shard, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=[SHARD_COL]
    )
    for shard in todo:
        # a shard with no rows still commits (empty = done, not missing)
        with open(_marker(out_dir, shard), "w") as f:
            f.write("ok")
    return {"written": todo, "skipped": sorted(done)}


def read_resumable_output(out_dir: str) -> rd.Dataset:
    """Read back a committed resumable output (only committed shards).

    Raises ValueError (not rd.read_parquet's opaque empty-path error)
    when the directory holds no committed shards — a fresh or
    fully-crashed output dir is a caller bug, not an empty dataset."""
    done = committed_shards(out_dir)
    paths = []
    for s in sorted(done):
        part_dir = os.path.join(out_dir, f"{SHARD_COL}={s}")
        if os.path.isdir(part_dir):
            paths.extend(
                os.path.join(part_dir, f)
                for f in sorted(os.listdir(part_dir))
                if f.endswith(".parquet")
            )
    if not paths:
        raise ValueError(
            f"no committed shards under {out_dir!r}: the resumable write "
            "never committed (fresh dir, or every shard crashed before "
            "its marker) — re-run write_resumable() first"
        )
    return rd.read_parquet(paths)
