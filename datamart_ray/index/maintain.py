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

import json
import os
import threading
from collections import OrderedDict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from datamart_ray.index.build import (
    IndexConfig,
    build_segment,
    load_index_config,
    plan_specs,
)
from datamart_ray.index.manifest import (
    INDEX_MANIFEST_NAME,
    WRITE_LOCK_NAME,
    active_segments,
    atomic_write_bytes,
    atomic_write_json,
    bump_index_version,
    index_write_lock,
    list_committed_segments,
    current_index_version,
    read_manifest,
    segment_is_committed,
    write_index_manifest,
)

TOMBSTONE_NAME = "tombstones.parquet"


def _locked(shared: bool = False):
    """Serialize an index mutator (first arg = index dir) under the
    per-index advisory lock; ``shared`` for consistent readers
    (snapshot) that must only exclude compaction's dir deletion."""
    import functools

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(index_dir, *args, **kwargs):
            with index_write_lock(index_dir, shared=shared):
                return fn(index_dir, *args, **kwargs)

        return wrapper

    return deco


def _segment_doc_ids(seg_dir: str) -> np.ndarray:
    t = pq.read_table(os.path.join(seg_dir, "docmeta"), columns=["doc_id"])
    return t["doc_id"].to_numpy()


def _segment_max_doc_id(seg_dir: str) -> int:
    """Largest docID ever assigned in this segment (manifest field, with a
    docmeta scan fallback for pre-field segments). Deleted docs keep their
    IDs reserved — delta ingest must never reuse a surviving OR tombstoned
    ID, so this is the manifest value, not max(surviving)."""
    m = read_manifest(seg_dir)
    if "max_doc_id" in m:
        return int(m["max_doc_id"])
    ids = _segment_doc_ids(seg_dir)
    return int(ids.max()) if ids.size else -1


def _gc_orphan_segments(index_dir: str) -> list[str]:
    """Remove committed segment dirs that index.json does not list —
    leftovers of a crash between compaction's commit and its cleanup."""
    import shutil

    active = {os.path.basename(d) for d in active_segments(index_dir)}
    removed = []
    for d in list_committed_segments(index_dir):
        if os.path.basename(d) not in active:
            shutil.rmtree(d)
            removed.append(os.path.basename(d))
    return removed


def read_tombstones(seg_dir: str) -> np.ndarray:
    path = os.path.join(seg_dir, TOMBSTONE_NAME)
    if not os.path.exists(path):
        return np.empty(0, dtype=np.int64)
    return pq.read_table(path)["doc_id"].to_numpy()


@_locked()
def delete_docs(index_dir: str, doc_ids) -> int:
    """Tombstone the given docIDs in whichever segments hold them.
    Returns the number of newly deleted docs. Idempotent."""
    targets = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    deleted = 0
    for seg_dir in active_segments(index_dir):
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
    if deleted:
        # tombstones change the served view without touching the
        # segment list — bump index.json's mutation counter so
        # version-keyed engine caches reopen instead of serving
        # deleted docs (manifest.py's "every committed mutation
        # bumps it" invariant)
        bump_index_version(index_dir)
    return deleted


def delete_by_query(
    index_dir: str,
    query: str,
    mode: str = "and",
    filters: dict | None = None,
) -> int:
    """ES ``_delete_by_query`` analog: tombstone EVERY doc matching the
    analyzed `query` (AND/OR semantics + optional keyword filters, the
    exact match set of SearchEngine.search). Idempotent like
    delete_docs; a later compact physically drops the rows.

    Scale note: the match set streams out of per-segment scoring (the
    same path facet_counts uses); only matched docIDs are materialized,
    never postings or text."""
    from datamart_ray.search.engine import SearchEngine

    eng = SearchEngine(index_dir)
    t = eng.search(query, k=eng.n_docs, mode=mode, filters=filters)
    ids = t["doc_id"].to_numpy()
    return delete_docs(index_dir, ids) if ids.size else 0


def reindex(
    source_path: str,
    src_index: str,
    dest_index: str,
    config,
) -> dict:
    """ES ``_reindex`` analog: rebuild `dest_index` from the SOURCE
    table under a (possibly different) IndexConfig, then replay
    `src_index`'s tombstones so the destination serves exactly the
    live document set of the source index — deletes survive the
    reindex, as they do when ES copies live docs only.

    The heavy lift is the ordinary distributed build (resume-safe,
    atomic segment commits); the tombstone replay is a metadata-only
    pass."""
    from datamart_ray.index.build import build_index

    manifest = build_index(source_path, dest_index, config)
    carried = []
    for seg_dir in active_segments(src_index):
        t = read_tombstones(seg_dir)
        if t.size:
            carried.append(t)
    replayed = 0
    if carried:
        replayed = delete_docs(
            dest_index, np.unique(np.concatenate(carried))
        )
    return {
        "segments": manifest["segments"],
        "replayed_tombstones": replayed,
    }


def delete_where(index_dir: str, column: str, value) -> int:
    """Delete every doc whose docmeta `column` equals `value`."""
    import pyarrow.compute as pc

    targets = []
    for seg_dir in active_segments(index_dir):
        meta = pq.read_table(
            os.path.join(seg_dir, "docmeta"), columns=["doc_id", column]
        )
        hit = meta.filter(pc.equal(meta[column], value))
        targets.extend(hit["doc_id"].to_pylist())
    return delete_docs(index_dir, targets) if targets else 0


@_locked()
def compact_segments(
    index_dir: str,
    config: IndexConfig | None = None,
    rechunk: bool = False,
    seg_names: list[str] | None = None,
) -> dict:
    """Merge committed segments into one, making tombstoned deletes
    permanent (the Lucene merge analog; completes U5's delete semantics).
    Default merges EVERY active segment; `seg_names` restricts the merge
    to a subset (the tiered-merge building block — untouched segments
    stay active in index.json and keep their own tombstones).

    Pipeline: read the selected segments' posting chunks → filter
    tombstoned docs out of each chunk (vectorized decode/re-encode only
    where a chunk intersects the tombstone set) → groupby(term) merge →
    fresh chunk rows; docmeta concatenated minus tombstones; N/avgdl/df
    recomputed, so post-compaction scores reflect the smaller corpus
    (document: deletes become *visible in stats* only at compaction,
    exactly like Lucene).
    """
    import time

    import numpy as np
    import pyarrow.compute as pc

    import ray.data as rd

    from datamart_ray.index import codec
    from datamart_ray.index.build import (
        POSTINGS_SCHEMA,
        POSTINGS_SCHEMA_POS,
        _BuildChunks,
    )
    from datamart_ray.index.manifest import commit_segment_dir
    from datamart_ray.util import ensure_fast_shuffle

    ensure_fast_shuffle()
    t0 = time.time()
    _gc_orphan_segments(index_dir)
    all_seg_dirs = active_segments(index_dir)
    if not all_seg_dirs:
        raise ValueError(f"no committed segments under {index_dir}")
    if seg_names is not None:
        wanted = set(seg_names)
        seg_dirs = [
            d for d in all_seg_dirs if os.path.basename(d) in wanted
        ]
        found = {os.path.basename(d) for d in seg_dirs}
        if found != wanted:
            raise ValueError(
                f"segments not active: {sorted(wanted - found)}"
            )
        if len(seg_dirs) < 2:
            raise ValueError("need >= 2 segments to merge a subset")
    else:
        seg_dirs = all_seg_dirs
    kept_dirs = [d for d in all_seg_dirs if d not in seg_dirs]
    manifests = [read_manifest(d) for d in seg_dirs]
    # config=None means "keep the committed config" — defaulting to
    # IndexConfig() would silently swap the analyzer the postings were
    # built with (query-time tokenization would then disagree).
    config = config or load_index_config(index_dir)
    tombs = np.sort(
        np.concatenate([read_tombstones(d) for d in seg_dirs])
    )
    tombs_list = tombs.tolist()

    seg_root = os.path.join(index_dir, "segments")
    # Unique-per-attempt temp dir (same rationale as build_segment): a dead
    # compactor's zombie workers must not flush stragglers into a live
    # attempt's temp dir. Stale attempts are swept best-effort here.
    import glob as _glob
    import shutil
    import uuid as _uuid

    for stale in _glob.glob(os.path.join(seg_root, ".tmp-compact*")):
        shutil.rmtree(stale, ignore_errors=True)
    tmp_dir = os.path.join(
        seg_root, f".tmp-compact.{os.getpid()}.{_uuid.uuid4().hex[:8]}"
    )
    os.makedirs(os.path.join(tmp_dir, "docmeta"))

    # The compacted segment gets a FRESH name (never reuses an active one):
    # commit it, repoint index.json at it, THEN delete the superseded dirs,
    # so a crash anywhere in the swap leaves a consistent view (see
    # manifest.active_segments).
    next_idx = 1 + max(
        int(os.path.basename(d).split("-")[1]) for d in all_seg_dirs
    )
    seg_name = f"seg-{next_idx:05d}"
    max_doc_id = max(_segment_max_doc_id(d) for d in seg_dirs)

    # --- postings -------------------------------------------------------
    # Default: streaming chunk-strip — a chunk whose [first, last] docID
    # range contains NO tombstone passes through VERBATIM (readers merge
    # per-term chunks across files and re-sort defensively, so chunk
    # provenance doesn't matter); only dirty chunks are decoded, stripped
    # and re-encoded. No shuffle, no whole-corpus re-chunk. After many
    # delete/compact cycles chunk sizes fragment below chunk_docs —
    # ``rechunk=True`` runs the full explode → groupby(term) → rebuild
    # instead (the Lucene-style merge).
    chunker = _BuildChunks(config.chunk_docs, positions=config.positions)
    has_pos = config.positions
    schema = POSTINGS_SCHEMA_POS if has_pos else POSTINGS_SCHEMA

    def strip_chunks(t: pa.Table) -> pa.Table:
        tl = np.asarray(tombs_list, dtype=np.int64)
        if tl.size == 0:
            return t
        first = t["first_docid"].to_numpy()
        last = t["last_docid"].to_numpy()
        lo = np.searchsorted(tl, first)
        dirty = (lo < tl.size) & (
            tl[np.minimum(lo, tl.size - 1)] <= last
        )
        clean = t.filter(pa.array(~dirty))
        if not dirty.any():
            return clean
        d = t.filter(pa.array(dirty))
        rows = {c: [] for c in schema.names}
        terms = d["term"].to_pylist()
        docs_col = d["docs"].to_pylist()
        tfs_col = d["tfs"].to_pylist()
        pos_col = d["pos"].to_pylist() if has_pos else None
        for i in range(d.num_rows):  # dirty chunks only
            docs = codec.decode_docids(docs_col[i])
            tfs = codec.unpack_ints(tfs_col[i]).astype(np.int64)
            pos = np.searchsorted(tl, docs)
            ok = np.ones(docs.size, dtype=bool)
            inr = pos < tl.size
            ok[inr] = tl[pos[inr]] != docs[inr]
            new_blob = b""
            if has_pos and ok.any():
                # split the chunk position blob by tf, drop deleted
                # docs' streams, re-encode with per-doc delta resets
                flat = codec.decode_grouped_positions(pos_col[i], tfs)
                flat = flat[np.repeat(ok, tfs)]
                new_tfs = tfs[ok]
                deltas = flat.copy()
                deltas[1:] -= flat[:-1]
                gs = np.concatenate(([0], np.cumsum(new_tfs)))[:-1]
                deltas[gs] = flat[gs]
                new_blob = codec.varbyte_encode(deltas)
            docs, tfs = docs[ok], tfs[ok]
            if docs.size == 0:
                continue
            if has_pos:
                rows["pos"].append(new_blob)
            rows["term"].append(terms[i])
            rows["first_docid"].append(int(docs[0]))
            rows["last_docid"].append(int(docs[-1]))
            rows["df"].append(int(docs.size))
            rows["max_tf"].append(int(tfs.max()))
            rows["docs"].append(codec.encode_docids(docs))
            rows["tfs"].append(codec.pack_ints(tfs))
        stripped = pa.table(
            {
                name: pa.array(rows[name], type=schema.field(name).type)
                for name in schema.names
            }
        )
        return pa.concat_tables([clean, stripped])

    def strip_and_explode(t: pa.Table) -> pa.Table:
        """rechunk path: decode, drop deleted docs, re-emit triples
        (per-(term,doc) position cells ride along when positional)."""
        tl = np.asarray(tombs_list, dtype=np.int64)
        terms_out, docs_out, tfs_out, pos_out = [], [], [], []
        for row in t.to_pylist():
            docs = codec.decode_docids(row["docs"])
            tfs = codec.unpack_ints(row["tfs"]).astype(np.int64)
            ok = np.ones(docs.size, dtype=bool)
            if tl.size:
                pos = np.searchsorted(tl, docs)
                inr = pos < tl.size
                ok[inr] = tl[pos[inr]] != docs[inr]
            if has_pos:
                flat = codec.decode_grouped_positions(row["pos"], tfs)
                flat = flat[np.repeat(ok, tfs)]
                new_tfs = tfs[ok]
                if flat.size:
                    deltas = flat.copy()
                    deltas[1:] -= flat[:-1]
                    offs = np.concatenate(([0], np.cumsum(new_tfs)))
                    deltas[offs[:-1]] = flat[offs[:-1]]
                    pos_out.append(
                        codec.varbyte_encode_grouped(deltas, offs)
                    )
            docs, tfs = docs[ok], tfs[ok]
            if docs.size == 0:
                continue
            terms_out.append(
                np.full(docs.size, row["term"], dtype=object)
            )
            docs_out.append(docs)
            tfs_out.append(tfs)
        if not terms_out:
            cols = {
                "term": pa.array([], type=pa.string()),
                "doc_id": pa.array([], type=pa.int64()),
                "tf": pa.array([], type=pa.int32()),
            }
            if has_pos:
                cols["pos"] = pa.array([], type=pa.binary())
            return pa.table(cols)
        cols = {
            "term": pa.array(
                np.concatenate(terms_out), type=pa.string()
            ),
            "doc_id": pa.array(np.concatenate(docs_out)),
            "tf": pa.array(
                np.concatenate(tfs_out).astype(np.int32)
            ),
        }
        if has_pos:
            cols["pos"] = (
                pa.concat_arrays(pos_out)
                if len(pos_out) > 1
                else pos_out[0]
            )
        return pa.table(cols)

    def rebuild(t: pa.Table) -> pa.Table:
        t = t.sort_by([("term", "ascending"), ("doc_id", "ascending")])
        return chunker(t)

    posting_paths = [
        os.path.join(d, "postings", f)
        for d in seg_dirs
        for f in sorted(os.listdir(os.path.join(d, "postings")))
        if f.endswith(".parquet")
    ]
    if rechunk:
        triples = rd.read_parquet(posting_paths).map_batches(
            strip_and_explode, batch_format="pyarrow"
        )
        chunks = triples.groupby("term").map_groups(
            rebuild, batch_format="pyarrow"
        )
    else:
        chunks = rd.read_parquet(posting_paths).map_batches(
            strip_chunks, batch_format="pyarrow"
        )
    chunks.write_parquet(
        os.path.join(tmp_dir, "postings"), row_group_size=4096
    )

    # --- docmeta minus tombstones ---------------------------------------
    n_docs = 0
    total_dl = 0
    import hashlib

    rollup = hashlib.sha256()
    part = 0
    for d in seg_dirs:
        meta_dir = os.path.join(d, "docmeta")
        for name in sorted(os.listdir(meta_dir)):
            t = pq.read_table(os.path.join(meta_dir, name))
            if tombs.size:
                keep = pc.invert(
                    pc.is_in(t["doc_id"], value_set=pa.array(tombs))
                )
                t = t.filter(keep)
            if t.num_rows == 0:
                continue
            pq.write_table(
                t,
                os.path.join(
                    tmp_dir, "docmeta", f"docmeta-{part:06d}.parquet"
                ),
            )
            part += 1
            n_docs += t.num_rows
            total_dl += pc.sum(t["doclen"]).as_py() or 0
            rollup.update(
                bytes.fromhex("".join(t["sha256"].to_pylist()))
            )

    # --- terms + manifest -----------------------------------------------
    chunk_meta = pq.read_table(
        os.path.join(tmp_dir, "postings"), columns=["term", "df"]
    )
    if chunk_meta.num_rows:
        terms_table = (
            chunk_meta.group_by("term")
            .aggregate([("df", "sum")])
            .rename_columns(["term", "df"])
            .sort_by("term")
        )
        terms_table = pa.table(
            {
                "term": pc.cast(terms_table["term"], pa.string()),
                "df": pc.cast(terms_table["df"], pa.int64()),
            }
        )
    else:
        terms_table = pa.table(
            {
                "term": pa.array([], type=pa.string()),
                "df": pa.array([], type=pa.int64()),
            }
        )
    pq.write_table(terms_table, os.path.join(tmp_dir, "terms.parquet"))

    all_files = [f for m in manifests for f in m["files"]]
    manifest = {
        "segment": seg_name,
        "n_docs": n_docs,
        "max_doc_id": int(max_doc_id),
        "total_doclen": int(total_dl),
        "n_terms": terms_table.num_rows,
        "n_postings": int(
            pa.compute.sum(terms_table["df"]).as_py() or 0
        ),
        "files": all_files,
        "n_specs": part,
        "sha256_rollup": rollup.hexdigest(),
        "config": config.to_json(),
        "compacted_from": [m["segment"] for m in manifests],
        "n_deleted": int(tombs.size),
        "timings": {"total_sec": round(time.time() - t0, 3)},
        "built_unix": int(time.time()),
    }
    atomic_write_json(os.path.join(tmp_dir, "MANIFEST.json"), manifest)

    # swap (crash-safe order): commit new → repoint index.json → delete old
    commit_segment_dir(tmp_dir, os.path.join(seg_root, seg_name))
    kept_names = [os.path.basename(d) for d in kept_dirs]
    kept_files = sum(
        len(read_manifest(d)["files"]) for d in kept_dirs
    )
    write_index_manifest(
        index_dir,
        {
            "segments": kept_names + [seg_name],
            "config": config.to_json(),
            "built": [seg_name],
            "resumed_skipped": [],
            "preserved": kept_names,
            "n_files": len(all_files) + kept_files,
        },
    )
    for d in seg_dirs:
        shutil.rmtree(d)
    return manifest


@_locked()
def ingest_delta(
    index_dir: str,
    new_paths: str | list[str],
    config: IndexConfig | None = None,
) -> dict:
    """Add new files as fresh segment(s) without touching committed ones."""
    from datamart_ray.index.build import _expand_paths

    files = _expand_paths(new_paths)
    if not files:
        raise ValueError(f"no parquet files under {new_paths!r}")

    existing = active_segments(index_dir)
    if config is None:
        config = (
            load_index_config(index_dir) if existing else IndexConfig()
        )
    next_idx = 0
    base = 0
    known_files = []
    for seg_dir in existing:
        m = read_manifest(seg_dir)
        next_idx = max(next_idx, int(m["segment"].split("-")[1]) + 1)
        # dense docIDs continue past the HIGHEST id ever assigned — not
        # past sum(n_docs), which shrinks after delete+compact and would
        # reuse surviving doc IDs across segments (corrupting merges).
        base = max(base, _segment_max_doc_id(seg_dir) + 1)
        known_files.extend(f["path"] for f in m["files"])
    # compare canonical paths, not raw spellings: the same file swept
    # as ./incoming/x.parquet and /data/incoming/x.parquet (or via a
    # symlink) must NOT re-ingest as a duplicate segment — duplicate
    # docs silently double every match and skew df/idf
    known_real = {os.path.realpath(p) for p in known_files}
    new_files = [
        f for f in files if os.path.realpath(f) not in known_real
    ]
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
    write_index_manifest(
        index_dir,
        {
            "segments": segments,
            "config": config.to_json(),
            "built": [seg_name],
            "resumed_skipped": [os.path.basename(d) for d in existing],
            "n_files": len(known_files) + len(new_files),
        },
    )
    return {"added": [seg_name], "manifest": manifest}


def search_on_demand(
    index_dir: str,
    sources: str | list[str],
    query: str,
    k: int = 50,
    mode: str = "and",
    filters: dict | None = None,
    config: IndexConfig | None = None,
):
    """Query-triggered ingest: the batch analog of the reference's
    on-demand discovery loop (lib_core/datamart_core/discovery.py:
    106-127 — a query fans out to discoverers whose new datasets join
    the same profiling pipeline). Here the "discoverer" is a sweep of
    the registered source roots: any parquet file the index has never
    seen becomes a delta segment BEFORE the query is served, so the
    answer always reflects the current lake. A sweep with nothing new
    is metadata-only (ingest_delta's known-file skip) — the steady-state
    query pays one manifest read, no build.

    Returns ``(results_table, ingest_report)``.

    The opened SearchEngine is cached per index dir and reopened only
    when index.json's version counter says a mutation committed —
    engine open re-reads every below-cap segment's postings (seconds on
    a large index), which must not be paid per steady-state query."""
    from datamart_ray.index.build import _expand_paths

    # an empty (or not-yet-created) watch root is the NORMAL steady
    # state of an on-demand loop, not an error: serve the query from
    # the existing index rather than letting ingest_delta raise
    swept = [f for f in _expand_paths(sources) if os.path.isfile(f)]
    if swept:
        report = ingest_delta(index_dir, swept, config)
    else:
        report = {"added": [], "skipped_known": []}
    from datamart_ray.search.engine import SearchEngine

    key = os.path.realpath(index_dir)
    version = current_index_version(index_dir)
    with _ON_DEMAND_GUARD:
        cached = _ON_DEMAND_ENGINES.get(key)
        if cached is not None and cached[0] == version:
            _ON_DEMAND_ENGINES.move_to_end(key)
            eng = cached[1]
        else:
            eng = None
    if eng is None:
        # open OUTSIDE the guard (postings load takes seconds on a big
        # index — don't serialize unrelated indices behind it; a racing
        # duplicate open is wasted work, not corruption)
        eng = SearchEngine(index_dir)
        with _ON_DEMAND_GUARD:
            _ON_DEMAND_ENGINES[key] = (version, eng)
            _ON_DEMAND_ENGINES.move_to_end(key)
            while len(_ON_DEMAND_ENGINES) > ON_DEMAND_ENGINE_CAP:
                _ON_DEMAND_ENGINES.popitem(last=False)
    return (
        eng.search(query, k=k, mode=mode, filters=filters),
        report,
    )


# search_on_demand's per-index engine cache, LRU-bounded:
# {realpath: (version, engine)}. Engines pin every below-cap segment's
# postings in memory, so the cache must not grow with the number of
# distinct indices a long-lived process sweeps.
ON_DEMAND_ENGINE_CAP = 8
_ON_DEMAND_ENGINES: "OrderedDict[str, tuple]" = OrderedDict()
_ON_DEMAND_GUARD = threading.Lock()


def verify_index_invariant(index_dir: str) -> dict:
    """Audit the per-row content-sha256 invariant: recompute each active
    segment's sha rollup from its docmeta partitions AND re-hash the
    SOURCE parquet content for the files the manifest claims, comparing
    both against the committed ``sha256_rollup``. Streams the source in
    manifest file order (never materializes the corpus); returns
    {segment: {"docmeta_ok": bool, "source_ok": bool}}. The index-side
    check always runs; the source check is skipped (None) for segments
    whose source files no longer exist (e.g. post-compaction unions of
    rotated inputs)."""
    import hashlib

    out = {}
    for seg_dir in active_segments(index_dir):
        m = read_manifest(seg_dir)
        want = m["sha256_rollup"]
        # index side: docmeta partitions in spec order
        meta_dir = os.path.join(seg_dir, "docmeta")
        rollup = hashlib.sha256()
        for name in sorted(os.listdir(meta_dir)):
            t = pq.read_table(
                os.path.join(meta_dir, name), columns=["sha256"]
            )
            rollup.update(bytes.fromhex("".join(t["sha256"].to_pylist())))
        docmeta_ok = rollup.hexdigest() == want
        # source side: re-hash content row-by-row in (file, row) order
        source_ok = None
        files = [f["path"] for f in m["files"]]
        if files and all(os.path.exists(p) for p in files):
            # rollup = sha256 over the BYTES of each row's hex digest,
            # streamed row-group by row-group in (file, row) order
            src = hashlib.sha256()
            for path in files:
                pf = pq.ParquetFile(path)
                for rg in range(pf.metadata.num_row_groups):
                    content = pf.read_row_group(rg, columns=["content"])[
                        "content"
                    ]
                    for s in content.to_pylist():
                        src.update(
                            bytes.fromhex(
                                hashlib.sha256(
                                    (s or "").encode("utf-8")
                                ).hexdigest()
                            )
                        )
            source_ok = (
                src.hexdigest() == want
                if m.get("n_deleted", 0) == 0
                else None  # compacted rollup covers survivors only
            )
        out[os.path.basename(seg_dir)] = {
            "docmeta_ok": docmeta_ok,
            "source_ok": source_ok,
        }
    return out


SNAPSHOT_MANIFEST_NAME = "snapshot.json"


@_locked(shared=True)
def snapshot_index(index_dir: str, snap_dir: str) -> dict:
    """ES snapshot-API analog: a point-in-time copy of the index's
    ACTIVE view. Committed segments are immutable (compaction commits
    under a fresh name and repoints index.json), so copying needs no
    writer lock; only tombstones mutate, and each segment's tombstone
    file is copied with its segment body, making the snapshot a
    consistent view no newer than the copy start. ``snapshot.json`` is
    written LAST (atomically) — a torn snapshot has no manifest and is
    detectable/invalid. Returns the snapshot manifest."""
    import shutil

    segs = active_segments(index_dir)
    if not segs:
        raise ValueError(f"no committed segments under {index_dir}")
    if os.path.exists(snap_dir) and os.listdir(snap_dir):
        raise ValueError(f"snapshot target {snap_dir} is not empty")
    os.makedirs(os.path.join(snap_dir, "segments"), exist_ok=True)
    names = []
    for seg in segs:
        name = os.path.basename(seg)
        shutil.copytree(seg, os.path.join(snap_dir, "segments", name))
        names.append(name)
    # index.json carries the committed config (compaction/delta read it)
    # but its "segments" list is pinned to EXACTLY the copied set — a
    # stale listing must not leak extra names into the snapshot view
    idx_path = os.path.join(index_dir, INDEX_MANIFEST_NAME)
    if os.path.isfile(idx_path):
        with open(idx_path) as f:
            idx_obj = json.load(f)
    else:  # dir-scan index (pre-index.json build): synthesize
        idx_obj = {}
    idx_obj["segments"] = names
    atomic_write_json(
        os.path.join(snap_dir, INDEX_MANIFEST_NAME), idx_obj
    )
    manifest = {
        "segments": names,
        "source_index": os.path.abspath(index_dir),
        "sha256_rollups": {
            os.path.basename(s): read_manifest(s)["sha256_rollup"]
            for s in segs
        },
    }
    atomic_write_json(
        os.path.join(snap_dir, SNAPSHOT_MANIFEST_NAME), manifest
    )
    return manifest


def restore_index(snap_dir: str, dest_dir: str) -> dict:
    """Restore a snapshot into a fresh index dir. Refuses torn
    snapshots (missing snapshot.json) and non-empty destinations;
    verifies every listed segment is present and committed before the
    copy, and re-checks each restored segment's manifest rollup against
    the snapshot's recorded sha256 rollups after it."""
    import shutil

    snap_manifest_path = os.path.join(snap_dir, SNAPSHOT_MANIFEST_NAME)
    if not os.path.isfile(snap_manifest_path):
        raise ValueError(
            f"{snap_dir} has no {SNAPSHOT_MANIFEST_NAME} — torn or not "
            "a snapshot"
        )
    with open(snap_manifest_path) as f:
        manifest = json.load(f)
    for name in manifest["segments"]:
        seg = os.path.join(snap_dir, "segments", name)
        if not segment_is_committed(seg):
            raise ValueError(f"snapshot segment {name} missing/uncommitted")
    with index_write_lock(dest_dir):
        # emptiness must be checked UNDER the lock: a concurrent
        # build/delta into dest_dir could commit between an early check
        # and the copy, and the copytree below would silently bury it
        # (the advisory lock file itself does not make a destination
        # "non-empty")
        if set(os.listdir(dest_dir)) - {WRITE_LOCK_NAME}:
            raise ValueError(f"restore target {dest_dir} is not empty")
        os.makedirs(os.path.join(dest_dir, "segments"), exist_ok=True)
        for name in manifest["segments"]:
            shutil.copytree(
                os.path.join(snap_dir, "segments", name),
                os.path.join(dest_dir, "segments", name),
            )
            got = read_manifest(os.path.join(dest_dir, "segments", name))
            want = manifest["sha256_rollups"][name]
            if got["sha256_rollup"] != want:
                raise ValueError(f"restored segment {name} rollup mismatch")
        shutil.copy2(
            os.path.join(snap_dir, INDEX_MANIFEST_NAME),
            os.path.join(dest_dir, INDEX_MANIFEST_NAME),
        )
    return manifest


@_locked()
def tiered_merge(
    index_dir: str,
    max_segments: int = 8,
    config: IndexConfig | None = None,
) -> dict:
    """Lucene-style tiered merge POLICY: keep the segment count at or
    under `max_segments` by merging only the SMALLEST segments (by live
    doc count) into one, leaving the big ones untouched.

    This is the 10^12-file shape: a full compaction rewrites the whole
    index every time (O(corpus) per maintenance cycle), while the tiered
    policy rewrites only the small tail that delta ingests accumulate —
    the total rewrite work over the index's lifetime stays
    O(corpus · log(corpus)) like Lucene's TieredMergePolicy, and large
    settled segments are never touched again until enough small ones
    pile up around them.

    No-op (returns {"merged": []}) when the index is already within
    budget. Crash-safety is compact_segments': commit new → repoint
    index.json (keeping the untouched segments active) → delete merged.
    """
    segs = active_segments(index_dir)
    if len(segs) <= max_segments:
        return {"merged": [], "segments": [os.path.basename(d) for d in segs]}
    sizes = []
    for d in segs:
        m = read_manifest(d)
        live = m["n_docs"] - int(read_tombstones(d).size)
        sizes.append((live, os.path.basename(d)))
    sizes.sort()
    n_merge = len(segs) - max_segments + 1
    victims = [name for _, name in sizes[:n_merge]]
    manifest = compact_segments(index_dir, config=config, seg_names=victims)
    manifest["merged"] = victims
    return manifest


def lineage_records(index_dir: str) -> "pa.Table":
    """Per-partition lineage + metrics as a TABLE — the audit surface
    the north-star asks every partition to emit: one row per active
    segment with its provenance (source files, compaction ancestry),
    contents (docs, live docs, postings, terms), integrity
    (sha256 rollup) and build metrics (seconds, epoch). Reads only
    manifests and tombstone footers — O(segments), never the corpus."""
    rows = []
    for seg_dir in active_segments(index_dir):
        m = read_manifest(seg_dir)
        tombs = int(read_tombstones(seg_dir).size)
        timings = m.get("timings", {}) or {}
        rows.append(
            {
                "segment": m["segment"],
                "n_docs": int(m["n_docs"]),
                "n_live_docs": int(m["n_docs"]) - tombs,
                "n_tombstones": tombs,
                "n_terms": int(m.get("n_terms", 0)),
                "n_postings": int(m.get("n_postings", 0)),
                "total_doclen": int(m.get("total_doclen", 0)),
                "n_source_files": len(m.get("files", [])),
                "source_files": json.dumps(
                    [f.get("path") for f in m.get("files", [])]
                ),
                "compacted_from": json.dumps(
                    m.get("compacted_from", [])
                ),
                "sha256_rollup": m.get("sha256_rollup", ""),
                "build_sec": float(timings.get("total_sec", 0.0)),
                "built_unix": int(m.get("built_unix", 0)),
            }
        )
    rows.sort(key=lambda r: r["segment"])
    if not rows:
        return pa.table({"segment": pa.array([], type=pa.string())})
    return pa.Table.from_pylist(rows)
