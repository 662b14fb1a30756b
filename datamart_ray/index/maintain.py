"""Index maintenance: tombstone deletes and incremental (delta) ingest.

- :func:`delete_docs` / :func:`delete_where` — the analog of the
  reference's delete-by-query index subtraction
  (lib_core/datamart_core/common.py:280-317). Lucene-style tombstones:
  deleted docIDs are recorded per segment and filtered at query time;
  postings stay immutable. Like Lucene, corpus stats (N, df, avgdl) are
  not rewritten until a segment is rebuilt — scores of surviving docs are
  unchanged, deleted docs simply disappear from results.
- :func:`ingest_delta` — incremental ingest: new files become NEW
  segments appended to the index (the batch-pipeline form of the
  reference's on-demand profiling ingest, discovery.py:106-127). Global
  query stats automatically include the new segments (engine sums
  per-segment N/df), so scores stay rank-consistent with a from-scratch
  rebuild over the union of files.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from datamart_ray.index.build import IndexConfig, build_segment, plan_specs
from datamart_ray.index.manifest import (
    INDEX_MANIFEST_NAME,
    atomic_write_bytes,
    atomic_write_json,
    list_committed_segments,
    read_manifest,
)

TOMBSTONE_NAME = "tombstones.parquet"


def _segment_doc_ids(seg_dir: str) -> np.ndarray:
    t = pq.read_table(os.path.join(seg_dir, "docmeta"), columns=["doc_id"])
    return t["doc_id"].to_numpy()


def read_tombstones(seg_dir: str) -> np.ndarray:
    path = os.path.join(seg_dir, TOMBSTONE_NAME)
    if not os.path.exists(path):
        return np.empty(0, dtype=np.int64)
    return pq.read_table(path)["doc_id"].to_numpy()


def delete_docs(index_dir: str, doc_ids) -> int:
    """Tombstone the given docIDs in whichever segments hold them.
    Returns the number of newly deleted docs. Idempotent."""
    targets = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    deleted = 0
    for seg_dir in list_committed_segments(index_dir):
        seg_ids = np.sort(_segment_doc_ids(seg_dir))
        pos = np.searchsorted(seg_ids, targets)
        in_range = pos < seg_ids.size
        hit = np.zeros(targets.size, dtype=bool)
        hit[in_range] = seg_ids[pos[in_range]] == targets[in_range]
        mine = targets[hit]
        if mine.size == 0:
            continue
        existing = read_tombstones(seg_dir)
        merged = np.unique(np.concatenate([existing, mine]))
        deleted += int(merged.size - existing.size)
        import io

        buf = io.BytesIO()
        pq.write_table(
            pa.table({"doc_id": pa.array(merged, type=pa.int64())}), buf
        )
        atomic_write_bytes(
            os.path.join(seg_dir, TOMBSTONE_NAME), buf.getvalue()
        )
    return deleted


def delete_where(index_dir: str, column: str, value) -> int:
    """Delete every doc whose docmeta `column` equals `value`."""
    import pyarrow.compute as pc

    targets = []
    for seg_dir in list_committed_segments(index_dir):
        meta = pq.read_table(
            os.path.join(seg_dir, "docmeta"), columns=["doc_id", column]
        )
        hit = meta.filter(pc.equal(meta[column], value))
        targets.extend(hit["doc_id"].to_pylist())
    return delete_docs(index_dir, targets) if targets else 0


def ingest_delta(
    index_dir: str,
    new_paths: str | list[str],
    config: IndexConfig | None = None,
) -> dict:
    """Add new files as fresh segment(s) without touching committed ones."""
    from datamart_ray.index.build import _expand_paths

    config = config or IndexConfig()
    files = _expand_paths(new_paths)
    if not files:
        raise ValueError(f"no parquet files under {new_paths!r}")

    existing = list_committed_segments(index_dir)
    next_idx = 0
    base = 0
    known_files = []
    for seg_dir in existing:
        m = read_manifest(seg_dir)
        next_idx = max(next_idx, int(m["segment"].split("-")[1]) + 1)
        base += m["n_docs"]
        known_files.extend(f["path"] for f in m["files"])
    new_files = [f for f in files if f not in set(known_files)]
    if not new_files:
        return {"added": [], "skipped_known": files}

    specs, file_infos = plan_specs(new_files, config.docs_per_spec)
    if config.id_col is None:
        # shift dense docIDs past every existing segment
        for s in specs:
            s["base"] += base
        for fi in file_infos:
            fi["base"] += base

    seg_name = f"seg-{next_idx:05d}"
    manifest = build_segment(specs, file_infos, seg_name, index_dir, config)

    segments = [os.path.basename(d) for d in existing] + [seg_name]
    atomic_write_json(
        os.path.join(index_dir, INDEX_MANIFEST_NAME),
        {
            "segments": segments,
            "config": config.to_json(),
            "built": [seg_name],
            "resumed_skipped": [os.path.basename(d) for d in existing],
            "n_files": len(known_files) + len(new_files),
        },
    )
    return {"added": [seg_name], "manifest": manifest}
