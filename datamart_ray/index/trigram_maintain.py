"""Trigram-index lifecycle: tombstone deletes and segment compaction.

Mirrors the BM25 sibling (``index/maintain.py``; reference analog:
delete-by-query across ALL indexes,
lib_core/datamart_core/common.py:280-317) for the content-search index:

- **delete**: docIDs land in ONE index-level tombstone file
  (``tri_tombstones.parquet``, atomic replace). Serving filters
  tombstoned ids out of both the candidate fast path and the streaming
  full-scan verify (``TrigramIndex._verify``), so a deleted doc is
  invisible to substring/regex/LIKE/grep immediately — postings stay
  untouched until compaction, exactly like Lucene.
- **compact**: merge committed segments into one fresh segment with
  tombstoned docs physically dropped. The merge pipeline REUSES the
  build exchange: posting rows decode to (tri, doc) pairs per batch,
  strip, partial-encode, and flow through the same bucket
  groupby → splice merge (``_merge_bucket``). Fresh-name commit →
  manifest repoint → superseded-dir delete, in that order, so a crash
  anywhere leaves a servable index (the ``maintain.compact_segments``
  swap discipline). ``max_segments`` bounds delta-ingest segment
  accumulation by merging the smallest segments first (tiered flavor).
"""

from __future__ import annotations

import io
import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from datamart_ray.index.manifest import (
    atomic_write_bytes,
    atomic_write_json,
    commit_segment_dir,
    index_write_lock,
)

TRI_TOMBSTONE_NAME = "tri_tombstones.parquet"
# docIDs whose deletes a compaction made PHYSICAL (pruned from the
# tombstone file) — kept so trigram_reindex, which rebuilds from the
# source parquet, can replay them; otherwise compacted deletes would
# resurrect on reindex
TRI_DROPPED_NAME = "tri_dropped.parquet"


def read_tri_tombstones(index_dir: str) -> np.ndarray:
    """Sorted tombstoned docIDs for the whole trigram index."""
    path = os.path.join(index_dir, TRI_TOMBSTONE_NAME)
    if not os.path.exists(path):
        return np.empty(0, dtype=np.int64)
    return np.sort(pq.read_table(path)["doc_id"].to_numpy())


def _write_tombstones(index_dir: str, ids: np.ndarray) -> None:
    buf = io.BytesIO()
    pq.write_table(
        pa.table({"doc_id": pa.array(np.sort(ids), type=pa.int64())}),
        buf,
    )
    atomic_write_bytes(
        os.path.join(index_dir, TRI_TOMBSTONE_NAME), buf.getvalue()
    )


def read_tri_dropped(index_dir: str) -> np.ndarray:
    """Sorted docIDs physically dropped by past compactions."""
    path = os.path.join(index_dir, TRI_DROPPED_NAME)
    if not os.path.exists(path):
        return np.empty(0, dtype=np.int64)
    return np.sort(pq.read_table(path)["doc_id"].to_numpy())


def _append_dropped(index_dir: str, ids: np.ndarray) -> None:
    merged = np.unique(
        np.concatenate([read_tri_dropped(index_dir), ids])
    )
    buf = io.BytesIO()
    pq.write_table(
        pa.table(
            {"doc_id": pa.array(merged, type=pa.int64())}
        ),
        buf,
    )
    atomic_write_bytes(
        os.path.join(index_dir, TRI_DROPPED_NAME), buf.getvalue()
    )


def _load_tri_manifest(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "trigram_index.json")) as f:
        return json.load(f)


def _bump_tri_version(index_dir: str, man: dict | None = None) -> dict:
    """Republish trigram_index.json with version+1 — every committed
    mutation (delete/compact/delta) bumps it so version-keyed caches
    reopen instead of serving a stale view."""
    man = dict(man if man is not None else _load_tri_manifest(index_dir))
    man["version"] = int(man.get("version", 0)) + 1
    atomic_write_json(
        os.path.join(index_dir, "trigram_index.json"), man
    )
    return man


def trigram_delete_docs(index_dir: str, doc_ids) -> int:
    """Tombstone the given docIDs. Returns the number of NEWLY deleted
    docs (dense-id indexes verify range membership against the planned
    files; id_col indexes count newly-added tombstones). Idempotent."""
    targets = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    with index_write_lock(index_dir):
        man = _load_tri_manifest(index_dir)
        if not man.get("id_col"):
            in_range = np.zeros(targets.size, dtype=bool)
            for fi in man["files"]:
                lo, hi = fi["base"], fi["base"] + fi["n_rows"]
                in_range |= (targets >= lo) & (targets < hi)
            targets = targets[in_range]
        existing = read_tri_tombstones(index_dir)
        merged = np.unique(np.concatenate([existing, targets]))
        deleted = int(merged.size - existing.size)
        if deleted:
            _write_tombstones(index_dir, merged)
            _bump_tri_version(index_dir, man)
    return deleted


def trigram_delete_matching(
    index_dir: str,
    src,
    pattern: str,
    regex: bool = False,
    ignore_case: bool = False,
    filters: dict | None = None,
) -> int:
    """Delete-by-content analog of ``maintain.delete_by_query``:
    tombstone every doc whose content matches the pattern (the exact
    match set of substring/regexp search — candidates via the index,
    verify exact). Only matched docIDs ever reach the driver."""
    from datamart_ray.index.trigram import TrigramIndex

    idx = TrigramIndex(index_dir, src)
    hits = (
        idx.regexp_search(pattern, ignore_case=ignore_case, filters=filters)
        if regex
        else idx.substring_search(
            pattern, ignore_case=ignore_case, filters=filters
        )
    )
    ids = hits["doc_id"].to_numpy(zero_copy_only=False)
    return trigram_delete_docs(index_dir, ids) if ids.size else 0


def trigram_compact(
    index_dir: str, max_segments: int = 1
) -> dict:
    """Merge committed trigram segments down to ``max_segments``,
    making tombstoned deletes permanent. Merges the SMALLEST segments
    first (by n_docs), so delta-heavy ingest with a periodic
    ``trigram_compact(max_segments=K)`` keeps a bounded segment count
    without repeatedly rewriting the big base segment — unless
    tombstones exist, in which case every segment holding a tombstoned
    range joins the merge so the delete becomes physical."""
    import time

    import ray.data as rd

    from datamart_ray.index.manifest import segment_is_committed
    from datamart_ray.index.trigram import (
        TRI_POSTINGS_SCHEMA,
        _merge_bucket,
        partial_posting_rows,
    )
    from datamart_ray.util import ensure_fast_shuffle

    t0 = time.time()
    with index_write_lock(index_dir):
        man = _load_tri_manifest(index_dir)
        seg_root = os.path.join(index_dir, "segments")
        names = list(man["segments"])
        tombs = read_tri_tombstones(index_dir)
        seg_meta = {}
        for name in names:
            with open(
                os.path.join(seg_root, name, "MANIFEST.json")
            ) as f:
                seg_meta[name] = json.load(f)

        def seg_ranges(m: dict) -> list[list[int]]:
            """Exact docID ranges a segment covers. Build/delta
            segments are contiguous; merged segments carry their
            (possibly non-contiguous) constituent ranges explicitly —
            a hull would wrongly claim docs of kept segments nested
            between merged ones."""
            if "ranges" in m:
                return m["ranges"]
            return [[m["doc_base"], m["doc_base"] + m["n_docs"]]]

        from datamart_ray.index.trigram import _range_has

        def holds_tombstone(name: str) -> bool:
            if tombs.size == 0:
                return False
            if man.get("id_col"):
                return True  # ranges unknown: always strip
            return any(
                _range_has(tombs, lo, hi)
                for lo, hi in seg_ranges(seg_meta[name])
            )

        by_size = sorted(names, key=lambda n: seg_meta[n]["n_docs"])
        merge = set()
        if len(names) > max_segments:
            merge.update(by_size[: len(names) - max_segments + 1])
        merge.update(n for n in names if holds_tombstone(n))
        if len(merge) == 1 and not any(
            holds_tombstone(n) for n in merge
        ):
            merge.clear()
        if not merge:
            return {**man, "merged": [], "seconds": 0.0}

        ensure_fast_shuffle()
        merge_dirs = [os.path.join(seg_root, n) for n in sorted(merge)]
        kept = [n for n in names if n not in merge]
        # broadcast the tombstone set once (ray.put), not a Python
        # list pickled into every task closure
        import ray as _ray

        tombs_ref = _ray.put(tombs)

        def to_partials(t: pa.Table) -> pa.Table:
            """Posting rows → tombstone-stripped partial rows (decode
            once, vectorized; the batch is bounded by the read)."""
            import ray as _ray

            from datamart_ray.index import codec
            from datamart_ray.index.trigram import _blob_buffers
            from datamart_ray.util import isin_sorted

            tri = t["tri"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            df = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
            col = t["docs"].combine_chunks()
            offs, data = _blob_buffers(col)
            buf = np.ascontiguousarray(data[offs[0] : offs[-1]])
            vals = codec.decode_grouped_positions(buf, df)
            tri_v = np.repeat(tri, df)
            tl = _ray.get(tombs_ref)
            if tl.size:
                keep = ~isin_sorted(tl, vals)
                tri_v, vals = tri_v[keep], vals[keep]
            return partial_posting_rows(tri_v, vals)

        from datamart_ray.index.build import _cpus

        B = max(32, 4 * _cpus())

        def add_bucket(t: pa.Table) -> pa.Table:
            tri = t["tri"].to_numpy(zero_copy_only=False)
            h = (
                tri.astype(np.uint64) * np.uint64(2654435761)
            ) % B
            return t.append_column(
                "bucket", pa.array(h.astype(np.int64))
            )

        def encode(t: pa.Table) -> pa.Table:
            return _merge_bucket(t.drop_columns(["bucket"]))

        new_name = f"tri-merged-{uuid.uuid4().hex[:10]}"
        for stale in [
            d
            for d in os.listdir(seg_root)
            if d.startswith(".tmp-tri-merged")
        ]:
            import shutil

            shutil.rmtree(
                os.path.join(seg_root, d), ignore_errors=True
            )
        tmp_dir = os.path.join(
            seg_root,
            f".tmp-tri-merged.{os.getpid()}.{uuid.uuid4().hex[:8]}",
        )
        postings_dir = os.path.join(tmp_dir, "postings")
        os.makedirs(tmp_dir)
        posting_files = [
            os.path.join(d, "postings", f)
            for d in merge_dirs
            for f in sorted(os.listdir(os.path.join(d, "postings")))
            if f.endswith(".parquet")
        ]
        (
            rd.read_parquet(posting_files)
            .map_batches(to_partials, batch_format="pyarrow")
            .map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(encode, batch_format="pyarrow")
            .write_parquet(postings_dir, row_group_size=4096)
        )
        import glob as _glob

        if not _glob.glob(os.path.join(postings_dir, "*.parquet")):
            os.makedirs(postings_dir, exist_ok=True)
            pq.write_table(
                TRI_POSTINGS_SCHEMA.empty_table(),
                os.path.join(postings_dir, "empty.parquet"),
            )
        meta = pq.read_table(postings_dir, columns=["tri", "df"])
        merged_ranges = sorted(
            r for n in merge for r in seg_ranges(seg_meta[n])
        )
        merged_meta = {
            "segment": new_name,
            "n_docs": int(
                sum(seg_meta[n]["n_docs"] for n in merge)
            ),
            "doc_base": int(
                min(seg_meta[n]["doc_base"] for n in merge)
            ),
            "ranges": merged_ranges,
            "n_tris": meta.num_rows,
            "n_pairs": int(pc.sum(meta["df"]).as_py() or 0),
            "text_col": man["text_col"],
            "id_col": man["id_col"],
            "merged_from": sorted(merge),
            "build_seconds": round(time.time() - t0, 3),
        }
        atomic_write_json(
            os.path.join(tmp_dir, "MANIFEST.json"), merged_meta
        )
        final_dir = os.path.join(seg_root, new_name)
        commit_segment_dir(tmp_dir, final_dir)
        assert segment_is_committed(final_dir)

        new_names = kept + [new_name]
        man["segments"] = new_names
        man["n_segments"] = len(new_names)
        # SWAP ORDER: repoint the manifest FIRST, prune tombstones
        # SECOND, delete superseded dirs LAST. A crash after the
        # repoint leaves stale tombstone ids for already-dropped docs —
        # a harmless no-op filter — whereas pruning first would let a
        # crash (or a concurrent open) resurrect deleted docs still
        # present in the old segments' postings.
        man = _bump_tri_version(index_dir, man)
        if tombs.size:
            # tombstones physically dropped from the merged ranges; for
            # dense indexes, keep only ids outside every merged range
            # (a kept segment may still hold them); id_col: everything
            # merged → all physical, clear. Dropped ids are RECORDED
            # (tri_dropped.parquet) before pruning so a later reindex
            # from the unchanged source parquet can replay them.
            if man.get("id_col"):
                covered = np.ones(tombs.size, dtype=bool)
            else:
                covered = np.zeros(tombs.size, dtype=bool)
                for lo, hi in merged_ranges:
                    covered |= (tombs >= lo) & (tombs < hi)
            if covered.any():
                _append_dropped(index_dir, tombs[covered])
            _write_tombstones(index_dir, tombs[~covered])
        import shutil

        for d in merge_dirs:
            shutil.rmtree(d, ignore_errors=True)
    return {
        **man,
        "merged": sorted(merge),
        "new_segment": new_name,
        "seconds": round(time.time() - t0, 3),
    }


TRI_SNAPSHOT_NAME = "tri_snapshot.json"


def trigram_verify_invariant(index_dir: str) -> dict:
    """Audit the trigram index invariants per active segment: the
    manifest's (n_tris, n_pairs) match the postings, every posting blob
    decodes to exactly ``df`` strictly-increasing docIDs inside the
    segment's declared doc ranges, and every trigram code fits 2^24.
    Streams one postings file at a time — never the whole index.
    Returns {segment: {"counts_ok", "postings_ok", "ranges_ok"}}."""
    from datamart_ray.index import codec

    man = _load_tri_manifest(index_dir)
    seg_root = os.path.join(index_dir, "segments")
    out = {}
    for name in man["segments"]:
        seg_dir = os.path.join(seg_root, name)
        with open(os.path.join(seg_dir, "MANIFEST.json")) as f:
            m = json.load(f)
        ranges = m.get(
            "ranges",
            [[m["doc_base"], m["doc_base"] + m["n_docs"]]],
        )
        id_col = man.get("id_col")
        n_tris = n_pairs = 0
        postings_ok = ranges_ok = True
        pdir = os.path.join(seg_dir, "postings")
        for fname in sorted(os.listdir(pdir)):
            if not fname.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(pdir, fname))
            tri = t["tri"].to_numpy(zero_copy_only=False)
            df = t["df"].to_numpy(zero_copy_only=False)
            n_tris += t.num_rows
            n_pairs += int(df.sum())
            if tri.size and (
                tri.min() < 0 or tri.max() >= (1 << 24)
            ):
                postings_ok = False
            for d, blob in zip(
                df.tolist(), t["docs"].to_pylist()
            ):
                ids = codec.decode_docids(blob)
                if ids.size != d or (
                    ids.size > 1 and not bool(np.all(np.diff(ids) > 0))
                ):
                    postings_ok = False
                    continue
                if not id_col and ids.size:
                    hit = np.zeros(ids.size, dtype=bool)
                    for lo, hi in ranges:
                        hit |= (ids >= lo) & (ids < hi)
                    if not bool(hit.all()):
                        ranges_ok = False
        out[name] = {
            "counts_ok": n_tris == m["n_tris"]
            and n_pairs == m["n_pairs"],
            "postings_ok": postings_ok,
            "ranges_ok": ranges_ok if not id_col else None,
        }
    return out


def trigram_snapshot(index_dir: str, snap_dir: str) -> dict:
    """Point-in-time copy of the trigram index's ACTIVE view (the
    ``maintain.snapshot_index`` analog). Runs under the index lock in
    SHARED mode: committed segments are immutable, but compaction
    prunes the tombstone file and deletes superseded dirs — without
    the lock a racing compaction could pair the old manifest with the
    post-compact pruned tombstones (restored index resurrects deleted
    docs) or delete a dir mid-copytree. Shared mode lets snapshots run
    concurrently with each other. ``tri_snapshot.json`` is written
    LAST — a torn snapshot has no manifest and is detectable/invalid."""
    import shutil

    with index_write_lock(index_dir, shared=True):
        man = _load_tri_manifest(index_dir)
        if not man["segments"]:
            raise ValueError(
                f"no committed segments under {index_dir}"
            )
        if os.path.exists(snap_dir) and os.listdir(snap_dir):
            raise ValueError(
                f"snapshot target {snap_dir} is not empty"
            )
        os.makedirs(os.path.join(snap_dir, "segments"), exist_ok=True)
        sizes = {}
        for name in man["segments"]:
            src = os.path.join(index_dir, "segments", name)
            shutil.copytree(
                src, os.path.join(snap_dir, "segments", name)
            )
            sizes[name] = sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(src)
                for f in fs
            )
        for side in (TRI_TOMBSTONE_NAME, TRI_DROPPED_NAME):
            tpath = os.path.join(index_dir, side)
            if os.path.exists(tpath):
                shutil.copy2(tpath, os.path.join(snap_dir, side))
    atomic_write_json(
        os.path.join(snap_dir, "trigram_index.json"), man
    )
    snap = {
        "segments": man["segments"],
        "source_index": os.path.abspath(index_dir),
        "byte_sizes": sizes,
        "version": int(man.get("version", 0)),
    }
    atomic_write_json(
        os.path.join(snap_dir, TRI_SNAPSHOT_NAME), snap
    )
    return snap


def trigram_restore(snap_dir: str, dest_dir: str) -> dict:
    """Restore a trigram snapshot into a fresh index dir. Refuses torn
    snapshots and non-empty destinations; re-checks each restored
    segment's byte size against the snapshot record and re-verifies the
    postings invariants before declaring success."""
    import shutil

    from datamart_ray.index.manifest import (
        WRITE_LOCK_NAME,
        segment_is_committed,
    )

    spath = os.path.join(snap_dir, TRI_SNAPSHOT_NAME)
    if not os.path.isfile(spath):
        raise ValueError(
            f"{snap_dir} has no {TRI_SNAPSHOT_NAME} — torn or not a "
            "snapshot"
        )
    with open(spath) as f:
        snap = json.load(f)
    for name in snap["segments"]:
        if not segment_is_committed(
            os.path.join(snap_dir, "segments", name)
        ):
            raise ValueError(
                f"snapshot segment {name} missing/uncommitted"
            )
    os.makedirs(dest_dir, exist_ok=True)
    with index_write_lock(dest_dir):
        if set(os.listdir(dest_dir)) - {WRITE_LOCK_NAME}:
            raise ValueError(
                f"restore target {dest_dir} is not empty"
            )
        os.makedirs(
            os.path.join(dest_dir, "segments"), exist_ok=True
        )
        for name in snap["segments"]:
            shutil.copytree(
                os.path.join(snap_dir, "segments", name),
                os.path.join(dest_dir, "segments", name),
            )
            got = sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(
                    os.path.join(dest_dir, "segments", name)
                )
                for f in fs
            )
            if got != snap["byte_sizes"][name]:
                raise ValueError(
                    f"restored segment {name} size mismatch"
                )
        for side in (TRI_TOMBSTONE_NAME, TRI_DROPPED_NAME):
            tpath = os.path.join(snap_dir, side)
            if os.path.exists(tpath):
                shutil.copy2(tpath, os.path.join(dest_dir, side))
        shutil.copy2(
            os.path.join(snap_dir, "trigram_index.json"),
            os.path.join(dest_dir, "trigram_index.json"),
        )
    bad = {
        k: v
        for k, v in trigram_verify_invariant(dest_dir).items()
        if not (
            v["counts_ok"]
            and v["postings_ok"]
            and v["ranges_ok"] is not False
        )
    }
    if bad:
        raise ValueError(f"restored index fails invariants: {bad}")
    return snap


# grep_on_demand's per-index handle cache, LRU-bounded and version-
# keyed — the trigram analog of maintain._ON_DEMAND_ENGINES. The lock
# is created at import time: lazy check-then-set initialization would
# itself race (two first callers each minting their own lock).
import threading as _threading
from collections import OrderedDict as _OrderedDict

ON_DEMAND_TRI_CAP = 8
_ON_DEMAND_TRIS: "_OrderedDict[str, tuple]" = _OrderedDict()
_ON_DEMAND_TRI_GUARD = _threading.Lock()


def grep_on_demand(
    index_dir: str,
    sources: str | list[str],
    pattern: str,
    regex: bool = False,
    ignore_case: bool = False,
    filters: dict | None = None,
):
    """Query-triggered ingest for content search — the trigram analog
    of ``maintain.search_on_demand`` (reference: the on-demand
    discovery loop, lib_core/datamart_core/discovery.py:106-127): any
    parquet under the source roots the index has never seen becomes a
    delta segment BEFORE the grep is served; a sweep with nothing new
    is metadata-only. Returns ``(hits_table, ingest_report)``. The
    opened TrigramIndex is cached per index dir and reopened only when
    the manifest's version counter says a mutation committed."""
    from datamart_ray.index.build import _expand_paths
    from datamart_ray.index.trigram import (
        TrigramIndex,
        trigram_ingest_delta,
    )

    known = {
        os.path.realpath(fi["path"])
        for fi in _load_tri_manifest(index_dir)["files"]
    }
    swept = [f for f in _expand_paths(sources) if os.path.isfile(f)]
    fresh = [
        f for f in swept if os.path.realpath(f) not in known
    ]
    if fresh:
        trigram_ingest_delta(index_dir, fresh)
    # a consistent, ingest-specific report shape either way (the raw
    # ingest_delta return is the WHOLE manifest — useless for "did the
    # sweep add anything?")
    report = {
        "ingested": sorted(fresh),
        "skipped_known": sorted(set(swept) - set(fresh)),
    }

    key = os.path.realpath(index_dir)
    version = int(_load_tri_manifest(index_dir).get("version", 0))
    with _ON_DEMAND_TRI_GUARD:
        cached = _ON_DEMAND_TRIS.get(key)
        idx = (
            cached[1]
            if cached is not None and cached[0] == version
            else None
        )
        if idx is not None:
            _ON_DEMAND_TRIS.move_to_end(key)
    if idx is None:
        man = _load_tri_manifest(index_dir)
        srcs = [fi["path"] for fi in man["files"]]
        idx = TrigramIndex(index_dir, srcs)
        with _ON_DEMAND_TRI_GUARD:
            _ON_DEMAND_TRIS[key] = (version, idx)
            _ON_DEMAND_TRIS.move_to_end(key)
            while len(_ON_DEMAND_TRIS) > ON_DEMAND_TRI_CAP:
                _ON_DEMAND_TRIS.popitem(last=False)
    hits = (
        idx.regexp_search(
            pattern, ignore_case=ignore_case, filters=filters
        )
        if regex
        else idx.substring_search(
            pattern, ignore_case=ignore_case, filters=filters
        )
    )
    return hits, report


def trigram_reindex(
    source_path=None,
    src_index: str = None,
    dest_index: str = None,
    config=None,
) -> dict:
    """ES ``_reindex`` analog for the content index: rebuild
    ``dest_index`` under a (possibly different) TrigramConfig from the
    SRC INDEX'S RECORDED FILE PLAN — the files in their recorded base
    order, so dense docIDs in the destination line up exactly with the
    ids the source's tombstones were recorded against. Replays both
    the live tombstones AND the ids prior compactions made physical
    (``tri_dropped.parquet``), so the destination serves exactly the
    source's live document set. ``source_path`` is optional and only
    VALIDATED (its expansion must equal the recorded plan's file set);
    passing a different set raises instead of silently deleting the
    wrong docs. The destination must be fresh — checkpoint-resume
    skips committed segments by (base, n_docs) name, which does not
    encode the extraction config, so reusing a dest dir under a new
    config would silently serve stale postings."""
    from datamart_ray.index.trigram import (
        TrigramConfig,
        build_trigram_index,
    )

    src_man = _load_tri_manifest(src_index)
    recorded = [
        fi["path"]
        for fi in sorted(src_man["files"], key=lambda f: f["base"])
    ]
    if source_path is not None:
        from datamart_ray.index.build import _expand_paths

        got = sorted(
            os.path.realpath(p) for p in _expand_paths(source_path)
        )
        want = sorted(os.path.realpath(p) for p in recorded)
        if got != want:
            raise ValueError(
                "source_path does not match the src index's recorded "
                "file plan — reindex builds from the recorded plan so "
                "docIDs line up with the tombstones; omit source_path "
                "or pass the identical file set"
            )
    if os.path.isdir(dest_index) and (
        os.path.exists(
            os.path.join(dest_index, "trigram_index.json")
        )
        or os.path.isdir(os.path.join(dest_index, "segments"))
    ):
        raise ValueError(
            f"reindex target {dest_index} is not fresh — "
            "checkpoint-resume would keep old-config segments"
        )
    if config is None:
        config = TrigramConfig(
            text_col=src_man["text_col"], id_col=src_man["id_col"]
        )
    man = build_trigram_index(recorded, dest_index, config)
    tombs = read_tri_tombstones(src_index)
    dropped = read_tri_dropped(src_index)
    replay = np.unique(np.concatenate([tombs, dropped]))
    replayed = 0
    if replay.size:
        replayed = trigram_delete_docs(dest_index, replay)
    return {
        "segments": man["segments"],
        "replayed_tombstones": replayed,
    }


def trigram_lineage(index_dir: str) -> "pa.Table":
    """Per-segment lineage + metrics as a table (the trigram analog of
    ``maintain.lineage_records``): one row per active segment with its
    provenance (doc ranges, compaction ancestry), contents (docs,
    distinct trigrams, postings) and build metrics. Reads only
    manifests + the tombstone footer — O(segments), never the index."""
    man = _load_tri_manifest(index_dir)
    tombs = read_tri_tombstones(index_dir)
    seg_root = os.path.join(index_dir, "segments")
    rows = []
    for name in man["segments"]:
        with open(os.path.join(seg_root, name, "MANIFEST.json")) as f:
            m = json.load(f)
        ranges = m.get(
            "ranges", [[m["doc_base"], m["doc_base"] + m["n_docs"]]]
        )
        # id_col indexes can't map external ids to segment ranges —
        # report the unknown as null, never as a definite zero
        n_tomb = None
        if not man.get("id_col"):
            n_tomb = 0
            for lo, hi in ranges:
                n_tomb += int(
                    np.searchsorted(tombs, hi)
                    - np.searchsorted(tombs, lo)
                )
        rows.append(
            {
                "segment": name,
                "n_docs": int(m["n_docs"]),
                "n_tombstones_in_range": n_tomb,
                "n_tris": int(m["n_tris"]),
                "n_pairs": int(m["n_pairs"]),
                "doc_base": int(m["doc_base"]),
                "n_ranges": len(ranges),
                "merged_from": ",".join(m.get("merged_from", [])),
                "build_seconds": float(m.get("build_seconds", 0.0)),
            }
        )
    return pa.Table.from_pylist(rows)
