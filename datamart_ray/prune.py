"""Disk-state budget: LRU-by-mtime eviction at a high-water mark.

The engine persists rebuildable state that otherwise grows without
bound — trained ANN artifacts (IVF centroids, PQ codebooks, profile
range indexes) under an artifact root, posting-heap sidecars inside
segment dirs, and point-in-time snapshot dirs. This module applies the
reference coordinator's cache policy to them
(coordinator/coordinator/cache.py:39-137): when the tracked total
exceeds ``high_bytes`` (default 100 GB, env
``DATAMART_RAY_MAX_CACHE_BYTES``), evict oldest-mtime entries until the
kept set fits under ``low_frac * high_bytes`` (default 0.33, the
reference's CACHE_LOW).

What is evictable:

- **artifacts** — entries under an artifact root. The real layout is
  two-level (``{root}/{family}/{key}/...`` — ivf_centroids,
  pq_codebooks, profile_index, idx, tridx), so the eviction UNIT is the whole
  ``{key}`` directory: removing a single file inside a cached index or
  a multi-file artifact would corrupt it, while removing the key dir is
  always safe — trainers/builders re-derive the artifact on demand
  (atomic-commit, keyed on corpus identity). Top-level regular files
  and single-level ``{family}/file`` layouts are also inventoried for
  flat roots.
- **sidecars** — ``postings.arrows`` + ``postings_heapidx.parquet``
  pairs inside an index's segment dirs. Safe: rebuilt atomically on the
  next lazy open (or ``python -m datamart_ray heap``); a process
  currently serving from the mmap keeps the unlinked file alive (POSIX).
  Removal happens under the index write lock so it never interleaves
  with a compaction's dir swap.
- **snapshots** — whole snapshot dirs (only when a snapshot root is
  EXPLICITLY passed: snapshots are backups, never collateral).

Never touched: segment postings/docmeta/manifests, index.json,
tombstones, lock files — the active index is not a cache.
"""

from __future__ import annotations

import os

DEFAULT_HIGH_BYTES = 100_000_000_000  # the reference's 100 GB default
DEFAULT_LOW_FRAC = 0.33


def _tree_stat(path: str) -> tuple[int, float]:
    """(total bytes, newest mtime) over a file or directory tree — for a
    directory entry the newest CONTAINED file mtime drives LRU recency
    (the dir's own mtime only reflects entry creation)."""
    st = os.stat(path)
    if os.path.isfile(path):
        return st.st_size, st.st_mtime
    total, newest = 0, st.st_mtime
    for dirpath, _, filenames in os.walk(path):
        for name in filenames:
            try:
                fst = os.stat(os.path.join(dirpath, name))
            except OSError:
                continue
            total += fst.st_size
            newest = max(newest, fst.st_mtime)
    return total, newest


def _entry(kind: str, path: str, index_dir: str | None = None) -> dict:
    size, mtime = _tree_stat(path)
    return {
        "kind": kind,
        "path": path,
        "bytes": size,
        "mtime": mtime,
        "index_dir": index_dir,
    }


def scan_state(
    artifact_roots: list[str] = (),
    index_dirs: list[str] = (),
    snapshot_dirs: list[str] = (),
) -> list[dict]:
    """Inventory every evictable entry with its size and mtime."""
    from datamart_ray.index.heap import HEAP_FILE, HEAP_IDX_FILE
    from datamart_ray.index.maintain import SNAPSHOT_MANIFEST_NAME
    from datamart_ray.index.manifest import active_segments

    entries: list[dict] = []
    for root in artifact_roots:
        if not os.path.isdir(root):
            continue
        for name in sorted(os.listdir(root)):
            path = os.path.join(root, name)
            if ".tmp" in name:
                continue
            if os.path.isfile(path):
                entries.append(_entry("artifact", path))
                continue
            if os.path.isfile(
                os.path.join(path, SNAPSHOT_MANIFEST_NAME)
            ):
                # a snapshot dir inside an artifact root: snapshots are
                # backups — evicted only via snapshot_dirs, never as
                # artifact collateral
                continue
            # family dir ({root}/ivf_centroids, /pq_codebooks, /idx, …):
            # each keyed child is ONE evictable unit — a key DIRECTORY
            # is removed whole (partial removal would corrupt the
            # artifact); stray files directly under the family dir are
            # individual entries
            for child in sorted(os.listdir(path)):
                cpath = os.path.join(path, child)
                if ".tmp" in child:
                    continue
                entries.append(_entry("artifact", cpath))
    for idx in index_dirs:
        for seg_dir in active_segments(idx):
            heap = os.path.join(seg_dir, HEAP_FILE)
            if os.path.isfile(heap):
                # the pair is one entry; the idx parquet rides along
                e = _entry("sidecar", heap, index_dir=idx)
                hidx = os.path.join(seg_dir, HEAP_IDX_FILE)
                if os.path.isfile(hidx):
                    e["bytes"] += os.path.getsize(hidx)
                entries.append(e)
    for root in snapshot_dirs:
        if not os.path.isdir(root):
            continue
        for name in sorted(os.listdir(root)):
            path = os.path.join(root, name)
            if os.path.isdir(path) and os.path.isfile(
                os.path.join(path, SNAPSHOT_MANIFEST_NAME)
            ):
                entries.append(_entry("snapshot", path))
    return entries


def _remove_entry(e: dict) -> None:
    import shutil

    if e["kind"] == "sidecar":
        from datamart_ray.index.heap import HEAP_IDX_FILE
        from datamart_ray.index.manifest import index_write_lock

        with index_write_lock(e["index_dir"]):
            for p in (
                e["path"],
                os.path.join(os.path.dirname(e["path"]), HEAP_IDX_FILE),
            ):
                if os.path.isfile(p):
                    os.remove(p)
    elif os.path.isdir(e["path"]):
        shutil.rmtree(e["path"])
    else:
        os.remove(e["path"])


def prune_state(
    artifact_roots: list[str] = (),
    index_dirs: list[str] = (),
    snapshot_dirs: list[str] = (),
    high_bytes: int | None = None,
    low_frac: float = DEFAULT_LOW_FRAC,
    dry_run: bool = False,
) -> dict:
    """Evict oldest-mtime entries once the tracked total crosses the
    high-water mark, keeping the newest set that fits under
    ``low_frac * high_bytes`` (the reference's clear_caches shape).
    Returns {total_bytes, high_bytes, evicted: [...], kept_bytes}."""
    if high_bytes is None:
        env = os.environ.get("DATAMART_RAY_MAX_CACHE_BYTES")
        high_bytes = int(env) if env else DEFAULT_HIGH_BYTES
    entries = scan_state(artifact_roots, index_dirs, snapshot_dirs)
    total = sum(e["bytes"] for e in entries)
    out = {
        "total_bytes": total,
        "high_bytes": high_bytes,
        "evicted": [],
        "kept_bytes": total,
        "dry_run": dry_run,
    }
    if total <= high_bytes:
        return out
    low = high_bytes * low_frac
    kept = 0
    evict: list[dict] = []
    for e in sorted(entries, key=lambda e: -e["mtime"]):  # newest first
        if kept + e["bytes"] <= low:
            kept += e["bytes"]
        else:
            evict.append(e)
    for e in evict:
        if not dry_run:
            _remove_entry(e)
        out["evicted"].append(
            {"kind": e["kind"], "path": e["path"], "bytes": e["bytes"]}
        )
    out["kept_bytes"] = kept
    return out
