"""Posting-heap sidecar: mmap-served per-term posting chunks for the
giant-segment lazy mode.

The lazy SegmentReader pays a filtered parquet read per cold term
(row-group pruning + decompression — ~60-90 ms). For segments too big to
hold eagerly, this sidecar rewrites the segment's posting-chunk rows,
term-sorted, as an Arrow IPC FILE (record batches cut at term
boundaries) plus a tiny index parquet mapping every term to its
(batch, row-offset, row-count). Serving a term is then

    pa.ipc.open_file(pa.memory_map(...)).get_batch(b).slice(s, n)

— zero-copy from the OS page cache, resident memory O(touched pages),
~1 ms cold. The engine's decode/memo layers are unchanged.

Segment dirs are immutable after commit (deletes are docmeta tombstones;
delta/compact create NEW segment dirs), so a sidecar never goes stale.
Built on demand at first lazy open (atomic tmp+rename — a crashed build
leaves no partial artifact) or explicitly via :func:`build_posting_heap`.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HEAP_FILE = "postings.arrows"
HEAP_IDX_FILE = "postings_heapidx.parquet"
TARGET_BATCH_ROWS = 2048


def build_posting_heap(
    seg_dir: str,
    target_rows: int = TARGET_BATCH_ROWS,
    _postings: pa.Table | None = None,
) -> str:
    """Write (atomically) the heap + index sidecar for one segment.
    Idempotent: returns immediately if the sidecar exists.
    ``_postings`` is a test seam: a TERM-SORTED, possibly multi-chunk
    posting table standing in for the segment's parquet — at real giant-
    segment sizes ``take`` itself returns a chunked table (>2 GiB binary
    columns), which small-scale tests cannot reproduce."""
    heap_path = os.path.join(seg_dir, HEAP_FILE)
    idx_path = os.path.join(seg_dir, HEAP_IDX_FILE)
    if os.path.exists(heap_path) and os.path.exists(idx_path):
        return heap_path
    if _postings is not None:
        t = _postings
        sorted_terms = t["term"].to_numpy(zero_copy_only=False)
    else:
        t = pq.read_table(os.path.join(seg_dir, "postings"))
        terms = t["term"].to_numpy(zero_copy_only=False)
        order = np.argsort(terms, kind="stable")
        # NOTE: no combine_chunks — a giant segment's binary docs/tfs
        # column can exceed Arrow's 2 GiB single-buffer cap; slices
        # below work on the chunked result (per-group combine + batch
        # counts keep the batch index aligned even when take() returns
        # a chunked table). The build still holds the table (+ its
        # sorted copy) in memory once; for segments too big even for
        # that, run the build at index-build time / via `python -m
        # datamart_ray heap` on a large-memory worker — serving
        # afterwards is mmap-only.
        t = t.take(pa.array(order))
        sorted_terms = terms[order]
    n = len(sorted_terms)
    if n == 0:
        tmp_heap = heap_path + f".tmp.{os.getpid()}"
        with pa.OSFile(tmp_heap, "wb") as sink:
            with pa.ipc.new_file(sink, t.schema):
                pass
        tmp_idx = idx_path + f".tmp.{os.getpid()}"
        pq.write_table(
            pa.table(
                {
                    "term": pa.array([], type=pa.string()),
                    "batch": pa.array([], type=pa.int32()),
                    "nb": pa.array([], type=pa.int32()),
                    "start": pa.array([], type=pa.int32()),
                    "n": pa.array([], type=pa.int32()),
                }
            ),
            tmp_idx,
        )
        os.replace(tmp_idx, idx_path)
        os.replace(tmp_heap, heap_path)
        return heap_path
    bounds = np.flatnonzero(sorted_terms[1:] != sorted_terms[:-1]) + 1
    starts = np.concatenate(([0], bounds)).astype(np.int64)
    ends = np.concatenate((bounds, [n])).astype(np.int64)

    # cut record batches at term boundaries, packing ≥ target_rows each
    batch_cut = [0]  # indices into the per-term starts/ends arrays
    acc = 0
    for ti in range(starts.size):
        acc += int(ends[ti] - starts[ti])
        if acc >= target_rows:
            batch_cut.append(ti + 1)
            acc = 0
    if batch_cut[-1] != starts.size:
        batch_cut.append(starts.size)

    term_batch = np.empty(starts.size, dtype=np.int32)
    term_nb = np.empty(starts.size, dtype=np.int32)
    term_start = np.empty(starts.size, dtype=np.int32)
    term_n = (ends - starts).astype(np.int32)
    tmp_heap = heap_path + f".tmp.{os.getpid()}"
    with pa.OSFile(tmp_heap, "wb") as sink:
        with pa.ipc.new_file(sink, t.schema) as writer:
            written = 0  # record batches emitted so far
            for bi in range(len(batch_cut) - 1):
                lo_t, hi_t = batch_cut[bi], batch_cut[bi + 1]
                row_lo = int(starts[lo_t])
                row_hi = int(ends[hi_t - 1])
                sl = t.slice(row_lo, row_hi - row_lo)
                # One IPC record batch is written PER CHUNK of the slice,
                # so a slice spanning a chunk boundary of the (giant,
                # un-combined) table would silently shift every later
                # batch id. Combine the group's chunks (groups are
                # ~target_rows, so this is cheap); if a pathological
                # single-term run overflows Arrow's 2 GiB buffer cap,
                # keep it chunked and record the batch COUNT so readers
                # reassemble the group.
                try:
                    sl = sl.combine_chunks()
                except (pa.ArrowCapacityError, pa.ArrowInvalid):
                    pass
                batches = sl.to_batches() or [
                    pa.RecordBatch.from_pylist([], schema=t.schema)
                ]
                term_batch[lo_t:hi_t] = written
                term_nb[lo_t:hi_t] = len(batches)
                term_start[lo_t:hi_t] = (
                    starts[lo_t:hi_t] - row_lo
                ).astype(np.int32)
                for rb in batches:
                    writer.write_batch(rb)
                written += len(batches)

    # index rows aligned with the SORTED distinct term order (the same
    # order as terms.parquet, which is written term-sorted)
    tmp_idx = idx_path + f".tmp.{os.getpid()}"
    pq.write_table(
        pa.table(
            {
                "term": pa.array(sorted_terms[starts]),
                "batch": pa.array(term_batch),
                "nb": pa.array(term_nb),
                "start": pa.array(term_start),
                "n": pa.array(term_n),
            }
        ),
        tmp_idx,
    )
    os.replace(tmp_idx, idx_path)
    os.replace(tmp_heap, heap_path)  # heap last: idx alone is ignored
    return heap_path


class PostingHeap:
    """mmap-backed per-term posting-chunk access over the sidecar."""

    def __init__(self, seg_dir: str, build: bool = True):
        heap_path = os.path.join(seg_dir, HEAP_FILE)
        idx_path = os.path.join(seg_dir, HEAP_IDX_FILE)
        if not (os.path.exists(heap_path) and os.path.exists(idx_path)):
            if not build:
                raise FileNotFoundError(heap_path)
            build_posting_heap(seg_dir)
        self._reader = pa.ipc.open_file(pa.memory_map(heap_path))
        idx = pq.read_table(idx_path)
        self._terms = idx["term"].to_numpy(zero_copy_only=False)
        self._batch = idx["batch"].to_numpy()
        # sidecars written before the multi-chunk fix lack "nb" (their
        # groups were single-batch whenever they were correct at all)
        if "nb" in idx.column_names:
            self._nb = idx["nb"].to_numpy()
        else:
            self._nb = np.ones(len(self._batch), dtype=np.int32)
        self._start = idx["start"].to_numpy()
        self._n = idx["n"].to_numpy()
        self.schema = self._reader.schema

    def chunks(self, term: str) -> pa.Table:
        """Posting-chunk rows of `term` (zero-copy slice; empty table if
        the term is absent)."""
        i = int(np.searchsorted(self._terms, term))
        if i >= self._terms.size or self._terms[i] != term:
            return self.schema.empty_table()
        b0 = int(self._batch[i])
        tbl = pa.Table.from_batches(
            [
                self._reader.get_batch(b0 + j)
                for j in range(int(self._nb[i]))
            ]
        )
        return tbl.slice(int(self._start[i]), int(self._n[i]))
