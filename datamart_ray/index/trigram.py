"""Byte-trigram content index — substring / regex search over code.

The reference's search core is term-level (ES ``match``/``wildcard``/
``regexp`` over analyzed tokens — apiserver/apiserver/search/__init__.py);
it has no content-level substring or regular-expression search. This module
adds that capability for the code-search north star (BASELINE.json
``north_rule``: source-code corpus at 10^12-file scale), following the
public trigram-filter design of Google Code Search / Zoekt
(R. Cox, "Regular Expression Matching with a Trigram Index", 2012):

    a document can contain the byte string ``needle`` only if it contains
    every 3-byte window of ``needle`` — so an inverted index from the
    (≤ 2^24-entry) trigram space to docID lists turns substring search
    into a posting-list intersection plus an exact verify over the
    (usually tiny) candidate set, and regex search into the same after
    extracting the pattern's REQUIRED literal runs.

Build (Ray-Data-native, one shuffle per segment):

    plan (driver, parquet footers only — reuses ``build.plan_specs``)
      → read specs with deterministic file-offset docID bases
    extract (stateless ``map_batches`` over zero-copy Arrow buffers)
      rolling 3-byte windows over the UTF-8 value buffer of the content
      column — pure numpy over the Arrow data buffer, no per-row Python —
      deduplicated per doc, then PARTIAL-ENCODED per spec: one row per
      distinct trigram of the block, (tri, lo, df, delta-varbyte docID
      blob). The exchange ships these partial posting rows, NOT raw
      (tri, doc) pairs — ~df-fold fewer rows cross the one all-to-all
      (round-4 measured 182M raw pairs / 2.2 GB at sf0.1; the partial
      rows are what fixed the 0.663 single-node build scaling).
    shuffle (the one all-to-all exchange; push-based sort shuffle)
      groupby on hash(tri) % B buckets; the merge is ONE grouped varbyte
      decode + segmented-cumsum restore + ONE grouped re-encode per
      bucket (codec.varbyte_encode_grouped / decode_grouped_positions —
      no per-trigram Python loop anywhere in the build) → one row per
      distinct trigram: (tri, df, delta-varbyte docID blob)
    commit
      postings parquet + manifest per segment, atomic rename
      (index/manifest.py), resume skips committed segments.

Scale notes: the shuffle KEY SPACE is bounded by 2^24 regardless of corpus
size, and a head trigram's posting list is bounded by ``segment_docs``
(docID ranges partition by segment), so no single group ever approaches
corpus-proportional size. The verify stage never materializes candidate
text on the driver above ``VERIFY_FETCH_CAP`` — it streams the corpus with
a broadcast candidate-id filter and returns matching docIDs only.
"""

from __future__ import annotations

import os
import time
import uuid
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from datamart_ray.index import codec
from datamart_ray.index.build import _cpus, _expand_paths, plan_specs
from datamart_ray.index.manifest import (
    atomic_write_json,
    commit_segment_dir,
    segment_is_committed,
)


def _committed_tri_segments(index_dir: str) -> list[str]:
    """Committed ``tri*`` segment dirs (manifest.list_committed_segments
    only recognises the main index's ``seg-`` prefix)."""
    seg_root = os.path.join(index_dir, "segments")
    if not os.path.isdir(seg_root):
        return []
    return [
        os.path.join(seg_root, name)
        for name in sorted(os.listdir(seg_root))
        if name.startswith("tri")
        and segment_is_committed(os.path.join(seg_root, name))
    ]

TRI_POSTINGS_SCHEMA = pa.schema(
    [
        ("tri", pa.int32()),
        ("df", pa.int32()),
        ("docs", pa.binary()),
    ]
)

# Above this many candidates the exact-verify stage stops fetching
# candidate rows and instead streams the corpus with a broadcast id
# filter (docIDs only ever return to the driver).
VERIFY_FETCH_CAP = 200_000

# The driver-side fetch reads row groups SERIALLY, so its cost scales
# with row groups touched, not candidates: scattered mid-selectivity
# sets (df≈N/3) touch every row group and take seconds while the
# distributed verify takes a fraction (measured 1.9s vs 0.6s at 40k
# candidates / 120k docs / 32 CPUs). Dense-id indexes therefore fetch
# on the driver only when the candidates span few read specs; anything
# wider goes to the distributed verify, which prunes non-candidate
# specs and row groups.
FETCH_SPECS_CAP = 8

# DNF blow-up guard for regex literal extraction: more alternatives than
# this → fall back to the honest full-scan verify.
_DNF_CAP = 64


@dataclass(frozen=True)
class TrigramConfig:
    text_col: str = "content"
    id_col: str | None = None  # None → dense file-offset docIDs
    docs_per_spec: int = 2048
    segment_docs: int = 4_000_000
    num_buckets: int | None = None  # default 4x cluster CPUs


# ----------------------------------------------------------------------
# Extraction: Arrow string column → distinct (tri, doc) pairs, vectorized
# ----------------------------------------------------------------------

def trigram_pairs(
    texts: pa.ChunkedArray | pa.Array, ids_np: np.ndarray
) -> pa.Table:
    """Distinct (tri, doc_id) pairs for one batch — numpy over the
    column's UTF-8 data buffer, no per-row Python. Null/short (<3 bytes)
    docs contribute nothing."""
    arr = texts.combine_chunks() if isinstance(
        texts, pa.ChunkedArray
    ) else texts
    # large_string → int64 offsets unconditionally (zero-copy for
    # large_string input, one buffer copy for string input)
    arr = pc.cast(arr, pa.large_string())
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lens = np.diff(offsets)
    wc = np.maximum(lens - 2, 0)  # 3-byte windows per doc
    total = int(wc.sum())
    empty = pa.table(
        {
            "tri": pa.array([], type=pa.int32()),
            "doc_id": pa.array([], type=pa.int64()),
        }
    )
    if total == 0:
        return empty
    # window start byte positions: per-doc ranges [start, start+wc)
    cum = np.cumsum(wc)
    pos = np.repeat(offsets[:-1], wc) + (
        np.arange(total, dtype=np.int64) - np.repeat(cum - wc, wc)
    )
    tri = (
        (data[pos].astype(np.int64) << 16)
        | (data[pos + 1].astype(np.int64) << 8)
        | data[pos + 2].astype(np.int64)
    )
    # distinct per doc via ONE int64 sort: pack (batch-LOCAL row index,
    # tri) into one key — the local index is < batch size, so the pack
    # never overflows regardless of how large global docIDs get
    local = np.repeat(
        np.arange(len(ids_np), dtype=np.int64), wc
    )
    u = np.unique((local << 24) | tri)
    return pa.table(
        {
            "tri": pa.array((u & 0xFFFFFF).astype(np.int32)),
            "doc_id": pa.array(
                ids_np.astype(np.int64)[u >> 24], type=pa.int64()
            ),
        }
    )


def string_trigrams(s: str) -> list[int]:
    """The query-side twin of :func:`trigram_pairs` for one needle."""
    b = s.encode("utf-8")
    return sorted(
        {
            (b[i] << 16) | (b[i + 1] << 8) | b[i + 2]
            for i in range(len(b) - 2)
        }
    )


# ----------------------------------------------------------------------
# Build
# ----------------------------------------------------------------------

# One row per distinct trigram of one extract block: lo/hi = the
# partial's first/last docID (merge ordering + splice keys), docs =
# delta-varbyte blob of the partial's docIDs (first value absolute).
TRI_PARTIAL_SCHEMA = pa.schema(
    [
        ("tri", pa.int32()),
        ("lo", pa.int64()),
        ("hi", pa.int64()),
        ("df", pa.int32()),
        ("docs", pa.binary()),
    ]
)


def _partials_from_sorted(
    tri: np.ndarray, doc: np.ndarray
) -> pa.Table:
    """Partial rows from pairs ALREADY sorted by (tri, doc): run split
    + one grouped varbyte emit (the blob column slices a single shared
    byte buffer zero-copy)."""
    starts = np.flatnonzero(np.r_[True, tri[1:] != tri[:-1]])
    ends = np.r_[starts[1:], tri.size]
    # uint32 deltas when every value fits (in-segment offsets always
    # do): the varbyte emit then streams half the bytes
    small = bool(doc.max() < (1 << 32)) and bool(doc.min() >= 0)
    dt = np.uint32 if small else np.uint64
    deltas = np.empty(doc.size, dtype=dt)
    if doc.size > 1:
        deltas[1:] = (doc[1:] - doc[:-1]).astype(dt)
    deltas[starts] = doc[starts].astype(dt)
    blobs = codec.varbyte_encode_grouped(
        deltas, np.r_[starts, doc.size]
    )
    return pa.table(
        {
            "tri": pa.array(tri[starts].astype(np.int32)),
            "lo": pa.array(doc[starts], type=pa.int64()),
            "hi": pa.array(doc[ends - 1], type=pa.int64()),
            "df": pa.array((ends - starts).astype(np.int32)),
            "docs": blobs,
        }
    )


def partial_posting_rows(
    tri: np.ndarray, doc: np.ndarray
) -> pa.Table:
    """Partial-encode one block's distinct (tri, doc) pairs into per-
    trigram posting rows BEFORE the exchange — ~df(block)-fold fewer
    rows cross the one all-to-all shuffle than raw pairs. Fully
    vectorized: one lexsort + one grouped varbyte emit per block."""
    if tri.size == 0:
        return TRI_PARTIAL_SCHEMA.empty_table()
    order = np.lexsort((doc, tri))
    tri = np.ascontiguousarray(tri, dtype=np.int64)[order]
    doc = np.ascontiguousarray(doc, dtype=np.int64)[order]
    return _partials_from_sorted(tri, doc)


# ≤256 docs per dedup chunk so (tri<<8 | local) packs into uint32: the
# per-doc-distinct sort runs on a ~4x-smaller, mostly-cache-resident
# key array instead of a DRAM-streaming int64 one — critical because
# 32 concurrent extract tasks on one node share memory bandwidth.
# clamped to [1, 256]: the uint32 key has exactly 8 bits for the
# chunk-local doc index — a larger override would silently corrupt
# the packed keys (wrong trigrams, wrong offsets)
_DEDUP_CHUNK = min(
    256, max(1, int(os.environ.get("GRAFT_TRI_DEDUP_CHUNK", "256")))
)

# a dedup chunk also closes early once it holds this many windows, and
# a SINGLE doc larger than the cap takes a sliced per-doc path — a
# 100 MB minified bundle must not materialize a 400 MB key array in
# one extract task
_CHUNK_WINDOW_CAP = 4_000_000


def _single_doc_tris(
    data: np.ndarray, lo: int, hi: int, cap: int = _CHUNK_WINDOW_CAP
) -> np.ndarray:
    """Sorted distinct trigram codes of ONE huge doc, computed in
    ≤cap-window slices (2-byte overlap keeps boundary windows).
    Constant memory regardless of doc size: slices scatter into a
    2^24-entry seen-bitmap (16 MB) instead of accumulating per-slice
    unique arrays (a high-entropy 100 MB doc would otherwise rebuild
    the hundreds-of-MB array the cap exists to avoid)."""
    seen = np.zeros(1 << 24, dtype=bool)
    s = int(lo)
    any_win = False
    while s < hi - 2:
        e = min(s + cap + 2, int(hi))
        d = data[s:e]
        tri = (
            (d[:-2].astype(np.uint32) << 8)
            | d[1:-1].astype(np.uint32)
        ) << 8 | d[2:]
        seen[tri] = True
        any_win = True
        s += cap
    if not any_win:
        return np.empty(0, dtype=np.uint32)
    return np.flatnonzero(seen).astype(np.uint32)


def dense_partials(texts: pa.ChunkedArray | pa.Array, doc_base: int) -> pa.Table:
    """Partial posting rows for one batch of DENSE-id docs (ids =
    doc_base + row offset) — the whole extract kernel in uint32.

    Per ≤256-doc chunk: rolling 3-byte windows over the column's UTF-8
    buffer (numpy gathers, no per-row Python), then ONE np.unique over
    packed uint32 (tri<<8 | local) keys gives per-doc dedup AND
    (tri, doc) sort order in a single cache-friendly pass — no int64
    lexsort anywhere. Chunks emit independent partial rows; the bucket
    merge concatenates their disjoint ascending doc ranges."""
    arr = texts.combine_chunks() if isinstance(
        texts, pa.ChunkedArray
    ) else texts
    arr = pc.cast(arr, pa.large_string())
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    n = len(arr)
    parts: list[pa.Table] = []
    # int32 window positions when the batch's byte extent fits (a
    # parquet row group always does) — half the index-array traffic
    pos_dt = np.int32 if int(offsets[-1]) < (1 << 31) else np.int64
    all_wc = np.maximum(np.diff(offsets), 2) - 2

    def chunk_bounds():
        """(c0, c1) runs of ≤_DEDUP_CHUNK docs closing early at the
        window cap; a single over-cap doc comes out as its own
        (c0, c0+1) chunk and is routed to the sliced path below.
        Vectorized: the common under-cap case costs one slice-sum per
        chunk, never a per-doc Python walk."""
        c0 = 0
        while c0 < n:
            c1 = min(c0 + _DEDUP_CHUNK, n)
            if int(all_wc[c0:c1].sum()) > _CHUNK_WINDOW_CAP:
                cs = np.cumsum(all_wc[c0:c1])
                k = int(
                    np.searchsorted(
                        cs, _CHUNK_WINDOW_CAP, side="right"
                    )
                )
                c1 = c0 + max(1, k)
            yield c0, c1
            c0 = c1

    for c0, c1 in chunk_bounds():
        if (
            c1 - c0 == 1
            and int(all_wc[c0]) > _CHUNK_WINDOW_CAP
        ):
            # huge single doc: sliced distinct-trigram scan, df=1 rows
            # (cap passed explicitly so the module global is read at
            # CALL time — tests monkeypatch it)
            tri_u = _single_doc_tris(
                data,
                int(offsets[c0]),
                int(offsets[c0 + 1]),
                cap=_CHUNK_WINDOW_CAP,
            ).astype(np.int64)
            if tri_u.size:
                parts.append(
                    _partials_from_sorted(
                        tri_u,
                        np.full(
                            tri_u.size, doc_base + c0, dtype=np.int64
                        ),
                    )
                )
            continue
        offs = offsets[c0 : c1 + 1].astype(pos_dt)
        lens = np.diff(offs)
        wc = np.maximum(lens - 2, 0)
        total = int(wc.sum())
        if total == 0:
            continue
        cum = np.cumsum(wc, dtype=pos_dt)
        pos = np.repeat(offs[:-1], wc) + (
            np.arange(total, dtype=pos_dt) - np.repeat(cum - wc, wc)
        )
        tri = (
            (data[pos].astype(np.uint32) << 8)
            | data[pos + 1].astype(np.uint32)
        ) << 8 | data[pos + 2]
        local = np.repeat(
            np.arange(c1 - c0, dtype=np.uint32), wc
        )
        u = np.unique((tri << np.uint32(8)) | local)
        tri_u = (u >> np.uint32(8)).astype(np.int64)
        doc_u = (u & np.uint32(0xFF)).astype(np.int64) + (
            doc_base + c0
        )
        parts.append(_partials_from_sorted(tri_u, doc_u))
    if not parts:
        return TRI_PARTIAL_SCHEMA.empty_table()
    return pa.concat_tables(parts)


def _blob_buffers(col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(value offsets, byte buffer) views of one binary array."""
    bufs = col.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int32)[
        col.offset : col.offset + len(col) + 1
    ].astype(np.int64)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, dtype=np.uint8)
    )
    return offs, data


def _ramp_indices(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Flat gather indices covering [starts[i], starts[i]+lens[i]) for
    every i — the repeat+arange multi-range trick (int64)."""
    total = int(lens.sum())
    cum = np.cumsum(lens)
    return np.repeat(starts, lens) + (
        np.arange(total, dtype=np.int64) - np.repeat(cum - lens, lens)
    )


def _merge_bucket(t: pa.Table, base: int = 0) -> pa.Table:
    """Merge one bucket of partial posting rows into final per-trigram
    rows by VARBYTE SPLICE: partials of one trigram hold disjoint
    ascending docID ranges (dense builds), so the merged delta stream
    differs from the concatenated partial blobs ONLY in each partial's
    first varbyte (absolute lo → delta from the previous partial's hi,
    + ``base`` on the first). The merge therefore re-encodes just one
    value per partial ROW and bulk-copies every other byte with two
    vectorized multi-range gathers — no decode of the posting values at
    all. Interleaved ranges (arbitrary id_col ids) fall back to the
    exact decode → sort → re-encode path."""
    if t.num_rows == 0:
        return TRI_POSTINGS_SCHEMA.empty_table()
    t = t.sort_by([("tri", "ascending"), ("lo", "ascending")])
    tri_r = t["tri"].to_numpy(zero_copy_only=False).astype(np.int64)
    df_r = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
    lo = t["lo"].to_numpy(zero_copy_only=False)
    hi = t["hi"].to_numpy(zero_copy_only=False)
    col = t["docs"].combine_chunks()
    offs, data = _blob_buffers(col)
    n = t.num_rows
    is_first = np.r_[True, tri_r[1:] != tri_r[:-1]]
    prev_hi = np.empty(n, dtype=np.int64)
    prev_hi[0] = 0
    prev_hi[1:] = hi[:-1]
    cont = ~is_first
    if not bool(np.all(lo[cont] > prev_hi[cont])):
        return _merge_bucket_decode(
            tri_r, df_r, offs, data, base
        )
    first_delta = np.where(
        is_first, lo + base, lo - prev_hi
    ).astype(np.uint64)
    nf_buf, nf_ends = codec._varbyte_emit(first_delta)
    nf_len = np.diff(np.r_[0, nf_ends])
    # old first-varbyte length per row: bytes until continuation clear
    starts_b = offs[:-1]
    fl = np.ones(n, dtype=np.int64)
    alive = np.flatnonzero((data[starts_b] & 0x80) != 0)
    step = 1
    while alive.size:
        fl[alive] += 1
        step += 1
        alive = alive[
            (data[starts_b[alive] + (step - 1)] & 0x80) != 0
        ]
    tail_len = (offs[1:] - starts_b) - fl
    out_len = nf_len + tail_len
    dest_end = np.cumsum(out_len)
    dest_start = dest_end - out_len
    out = np.empty(int(dest_end[-1]) if n else 0, dtype=np.uint8)
    out[_ramp_indices(dest_start, nf_len)] = nf_buf[
        _ramp_indices(nf_ends - nf_len, nf_len)
    ]
    out[_ramp_indices(dest_start + nf_len, tail_len)] = data[
        _ramp_indices(starts_b + fl, tail_len)
    ]
    rs = np.flatnonzero(is_first)
    byte_offsets = np.r_[dest_start[rs], dest_end[-1]].astype(np.int32)
    if int(dest_end[-1]) >= (1 << 31):
        raise ValueError("bucket posting stream exceeds 2 GiB")
    blobs = pa.Array.from_buffers(
        pa.binary(),
        rs.size,
        [
            None,
            pa.py_buffer(byte_offsets.tobytes()),
            pa.py_buffer(out.tobytes()),
        ],
    )
    df_final = np.add.reduceat(df_r, rs)
    return pa.table(
        {
            "tri": pa.array(tri_r[rs].astype(np.int32)),
            "df": pa.array(df_final.astype(np.int32)),
            "docs": blobs,
        }
    )


def _merge_bucket_decode(
    tri_r: np.ndarray,
    df_r: np.ndarray,
    offs: np.ndarray,
    data: np.ndarray,
    base: int,
) -> pa.Table:
    """Exact fallback merge: decode every partial, restore absolutes,
    sort, re-encode. Used when partial ranges interleave (arbitrary
    id_col ids)."""
    buf = np.ascontiguousarray(data[offs[0] : offs[-1]])
    vals = codec.decode_grouped_positions(buf, df_r)
    tri_v = np.repeat(tri_r, df_r)
    if vals.size > 1:
        order = np.lexsort((vals, tri_v))
        vals = vals[order]
        tri_v = tri_v[order]
        starts = np.flatnonzero(
            np.r_[True, tri_v[1:] != tri_v[:-1]]
        )
    else:
        starts = np.zeros(min(1, vals.size), dtype=np.int64)
    if base:
        vals = vals + base
    ends = np.r_[starts[1:], vals.size]
    deltas = np.empty(vals.size, dtype=np.uint64)
    if vals.size > 1:
        deltas[1:] = (vals[1:] - vals[:-1]).astype(np.uint64)
    deltas[starts] = vals[starts].astype(np.uint64)
    blobs = codec.varbyte_encode_grouped(
        deltas, np.r_[starts, vals.size]
    )
    return pa.table(
        {
            "tri": pa.array(tri_v[starts].astype(np.int32)),
            "df": pa.array((ends - starts).astype(np.int32)),
            "docs": blobs,
        }
    )


def build_trigram_index(
    src: str | list[str], index_dir: str, config: TrigramConfig | None = None
) -> dict:
    """Build (or resume) the segmented trigram index for ``src``.

    One segment per ``segment_docs``-doc range of the planned input;
    committed segments are skipped on re-run (checkpoint-resume, same
    contract as ``build.build_index``, including the per-index write
    lock serializing concurrent builders). Segment names carry their
    (doc_base, n_docs) range, so a re-run with a different
    ``segment_docs`` produces fresh names instead of silently skipping
    ranges under a stale name; ``trigram_index.json`` records the
    active segment list and the reader serves only those."""
    from datamart_ray.index.manifest import index_write_lock
    from datamart_ray.util import ensure_fast_shuffle

    config = config or TrigramConfig()
    files = _expand_paths(src)
    if not files:
        raise ValueError(f"no parquet files under {src!r}")
    specs, file_infos = plan_specs(files, config.docs_per_spec)

    # segment = contiguous run of specs covering ≤ segment_docs docs
    seg_groups: list[list[dict]] = []
    cur: list[dict] = []
    cur_rows = 0
    for s in specs:
        if cur and cur_rows + s["n_rows"] > config.segment_docs:
            seg_groups.append(cur)
            cur, cur_rows = [], 0
        cur.append(s)
        cur_rows += s["n_rows"]
    if cur:
        seg_groups.append(cur)

    os.makedirs(index_dir, exist_ok=True)
    text_col, id_col = config.text_col, config.id_col
    with index_write_lock(index_dir):
        return _build_segments(
            index_dir, seg_groups, file_infos, config
        )


def _build_segments(
    index_dir: str,
    seg_groups: list,
    file_infos: list,
    config: TrigramConfig,
    prior_manifest: dict | None = None,
) -> dict:
    from datamart_ray.util import ensure_fast_shuffle

    text_col, id_col = config.text_col, config.id_col
    seg_names = list(
        (prior_manifest or {}).get("segments") or []
    )
    file_infos = list(
        (prior_manifest or {}).get("files") or []
    ) + list(file_infos)
    for group in seg_groups:
        base = int(group[0]["base"])
        n_docs = int(sum(s["n_rows"] for s in group))
        seg_name = f"tri-{base:012d}-{n_docs:09d}"
        seg_names.append(seg_name)
        seg_root = os.path.join(index_dir, "segments")
        os.makedirs(seg_root, exist_ok=True)
        final_dir = os.path.join(seg_root, seg_name)
        if segment_is_committed(final_dir):
            continue
        ensure_fast_shuffle()
        t0 = time.time()
        import glob
        import shutil

        for stale in glob.glob(
            os.path.join(seg_root, f".tmp-{seg_name}*")
        ):
            shutil.rmtree(stale, ignore_errors=True)
        tmp_dir = os.path.join(
            seg_root,
            f".tmp-{seg_name}.{os.getpid()}.{uuid.uuid4().hex[:8]}",
        )
        postings_dir = os.path.join(tmp_dir, "postings")
        os.makedirs(tmp_dir)

        off_base = None if id_col else int(group[0]["base"])

        def extract(batch: pa.Table):
            # one PARTIAL posting table per spec (typed-empty when every
            # doc is null/short, so downstream blocks never lose schema)
            for spec in batch.to_pylist():
                pf = pq.ParquetFile(spec["path"])
                want = [text_col] + ([id_col] if id_col else [])
                rg_base = spec["base"]
                tables: list[pa.Table] = []
                tri_parts: list[np.ndarray] = []
                doc_parts: list[np.ndarray] = []
                for rg in range(spec["rg_start"], spec["rg_end"] + 1):
                    t = pf.read_row_group(rg, columns=want)
                    if id_col:
                        # arbitrary ids: distinct pairs + per-spec
                        # lexsort (ids may be non-monotonic in row
                        # order, so the uint32 fast path can't apply)
                        ids_np = (
                            pc.cast(t[id_col], pa.int64())
                            .combine_chunks()
                            .to_numpy(zero_copy_only=False)
                        )
                        pairs = trigram_pairs(t[text_col], ids_np)
                        if pairs.num_rows:
                            tri_parts.append(
                                pairs["tri"].to_numpy(
                                    zero_copy_only=False
                                )
                            )
                            doc_parts.append(
                                pairs["doc_id"].to_numpy(
                                    zero_copy_only=False
                                )
                            )
                    else:
                        # dense ids: the uint32 chunk kernel, with
                        # blobs carrying in-segment offsets (restored
                        # in _merge_bucket) — smaller deltas, fewer
                        # exchange bytes, cache-resident dedup sort
                        p = dense_partials(
                            t[text_col], rg_base - off_base
                        )
                        if p.num_rows:
                            tables.append(p)
                    rg_base += t.num_rows
                if tri_parts:
                    tables.append(
                        partial_posting_rows(
                            np.concatenate(tri_parts),
                            np.concatenate(doc_parts),
                        )
                    )
                if tables:
                    yield pa.concat_tables(tables)
                else:
                    yield TRI_PARTIAL_SCHEMA.empty_table()

        partials = rd.from_items(group).map_batches(
            extract, batch_size=1, batch_format="pyarrow", num_cpus=1
        )
        B = config.num_buckets or max(32, 4 * _cpus())

        def add_bucket(t: pa.Table) -> pa.Table:
            tri = t["tri"].to_numpy(zero_copy_only=False)
            # multiplicative hash spreads the (clustered) ASCII trigram
            # space over buckets
            h = (tri.astype(np.uint64) * np.uint64(2654435761)) % B
            return t.append_column(
                "bucket", pa.array(h.astype(np.int64))
            )

        seg_base = int(off_base or 0)

        def encode(t: pa.Table) -> pa.Table:
            return _merge_bucket(
                t.drop_columns(["bucket"]), base=seg_base
            )

        (
            partials.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(encode, batch_format="pyarrow")
            .write_parquet(postings_dir, row_group_size=4096)
        )
        import glob as _glob

        if not _glob.glob(os.path.join(postings_dir, "*.parquet")):
            # every doc in the range was null/shorter than 3 bytes —
            # commit an honestly-empty segment instead of crashing on
            # the empty dir read (Ray skips even the dir creation when
            # the dataset produced zero blocks)
            os.makedirs(postings_dir, exist_ok=True)
            pq.write_table(
                TRI_POSTINGS_SCHEMA.empty_table(),
                os.path.join(postings_dir, "empty.parquet"),
            )
        meta = pq.read_table(postings_dir, columns=["tri", "df"])
        manifest = {
            "segment": seg_name,
            "n_docs": int(n_docs),
            "doc_base": int(group[0]["base"]),
            "n_tris": meta.num_rows,
            "n_pairs": int(pc.sum(meta["df"]).as_py() or 0),
            "text_col": text_col,
            "id_col": id_col,
            "build_seconds": round(time.time() - t0, 3),
        }
        atomic_write_json(
            os.path.join(tmp_dir, "MANIFEST.json"), manifest
        )
        commit_segment_dir(tmp_dir, final_dir)

    idx_manifest = {
        "kind": "trigram",
        "text_col": text_col,
        "id_col": id_col,
        "n_segments": len(seg_names),
        "segments": seg_names,
        "files": file_infos,
        # every committed mutation bumps the version so version-keyed
        # caches reopen (same invariant as index/manifest.py)
        "version": int((prior_manifest or {}).get("version", 0)) + 1,
    }
    atomic_write_json(
        os.path.join(index_dir, "trigram_index.json"), idx_manifest
    )
    return idx_manifest


def trigram_ingest_delta(
    index_dir: str, new_files: str | list[str]
) -> dict:
    """Append never-seen parquet files as fresh delta segment(s) — the
    trigram analog of ``maintain.ingest_delta``. New docs get dense ids
    continuing after the current plan's last base (dense-id indexes);
    already-ingested paths (canonical-path compare) are skipped, the
    merged file list + segment list commit atomically under the
    per-index write lock, and open readers keep serving the old
    committed view until they reopen."""
    import json

    from datamart_ray.index.manifest import index_write_lock

    with index_write_lock(index_dir):
        man_path = os.path.join(index_dir, "trigram_index.json")
        with open(man_path) as f:
            man = json.load(f)
        known = {
            os.path.realpath(fi["path"]) for fi in man["files"]
        }
        files = [
            f
            for f in _expand_paths(new_files)
            if os.path.realpath(f) not in known
        ]
        if not files:
            return man
        if man["id_col"]:
            raise ValueError(
                "delta ingest requires dense file-offset docIDs; an "
                "id_col index derives ids from the data — rebuild "
                "instead"
            )
        next_base = max(
            (fi["base"] + fi["n_rows"] for fi in man["files"]),
            default=0,
        )
        config = TrigramConfig(
            text_col=man["text_col"], id_col=man["id_col"]
        )
        specs, file_infos = plan_specs(files, config.docs_per_spec)
        for sp in specs:
            sp["base"] += next_base
        for fi in file_infos:
            fi["base"] += next_base
        seg_groups: list[list[dict]] = []
        cur: list[dict] = []
        cur_rows = 0
        for sp in specs:
            if cur and cur_rows + sp["n_rows"] > config.segment_docs:
                seg_groups.append(cur)
                cur, cur_rows = [], 0
            cur.append(sp)
            cur_rows += sp["n_rows"]
        if cur:
            seg_groups.append(cur)
        return _build_segments(
            index_dir, seg_groups, file_infos, config,
            prior_manifest=man,
        )


# ----------------------------------------------------------------------
# Regex literal extraction (Cox §"computing trigram queries", simplified
# to required-literal DNF: a match must contain, for at least one
# alternative, every literal in that alternative's set)
# ----------------------------------------------------------------------

def required_literals(
    pattern: str, fold: bool = False
) -> list[set[str]] | None:
    """DNF of required literal runs (≥3 bytes) for ``pattern``.

    Returns None when the pattern can't be parsed or any alternative has
    no usable literal — the caller must then verify by full scan. Sound
    over-approximation only: every true match satisfies at least one
    alternative's full literal set.

    ``fold=True`` extracts literals for a CASE-INSENSITIVE query (the
    caller expands them through case-variant trigrams): inline ``(?i)``
    flags no longer force a bail-out, and ``(?i:...)`` group literals
    are collected like any other."""
    import re as _re

    try:
        try:
            import re._parser as sre_parse  # py3.11+
        except ImportError:  # pragma: no cover - older pythons
            import sre_parse
        tree = sre_parse.parse(pattern)
    except Exception:
        return None
    # a global inline flag like (?i) makes every literal case-insensitive
    # while this extractor works on raw bytes — requiring the literals
    # as written would silently drop matches. Full scan instead (the
    # fold=True caller handles case variance itself).
    if not fold and getattr(tree.state, "flags", 0) & _re.IGNORECASE:
        return None

    def walk(seq) -> list[set[str]] | None:
        dnf: list[set[str]] = [set()]
        run: list[str] = []

        def flush():
            if len(run) >= 3:
                lit = "".join(run)
                for s in dnf:
                    s.add(lit)
            run.clear()

        for op, av in seq:
            name = str(op)
            if name == "LITERAL" and int(av) < 128:
                run.append(chr(int(av)))
                continue
            flush()
            if name == "BRANCH":
                subs: list[set[str]] = []
                for b in av[1]:
                    sd = walk(b)
                    if sd is None:
                        return None
                    subs.extend(sd)
                dnf = [a | s for a in dnf for s in subs]
            elif name == "SUBPATTERN":
                add_flags = int(av[1] or 0)
                if add_flags & _re.IGNORECASE and not fold:
                    # (?i:...) group: its literals aren't case-stable;
                    # require nothing from it (sound over-approximation)
                    continue
                sd = walk(av[3])
                if sd is None:
                    return None
                dnf = [a | s for a in dnf for s in sd]
            elif name in ("MAX_REPEAT", "MIN_REPEAT"):
                mn, _mx, sub = av
                if mn >= 1:
                    sd = walk(sub)
                    # a multi-alternative repeat adds no single
                    # requirement (different iterations may take
                    # different branches) — skip it, stay sound
                    if sd is not None and len(sd) == 1:
                        dnf = [a | sd[0] for a in dnf]
            elif name == "AT":
                pass  # anchors: no literal, doesn't invalidate
            # ANY / IN / CATEGORY / GROUPREF …: break the run, require
            # nothing
            if len(dnf) > _DNF_CAP:
                return None
        flush()
        return dnf

    dnf = walk(tree)
    if dnf is None:
        return None
    # an alternative with no ≥3-byte literal means the trigram filter
    # can't bound that alternative → full scan
    if any(not alt for alt in dnf):
        return None
    return dnf


# ----------------------------------------------------------------------
# Query
# ----------------------------------------------------------------------

class _TriSegment:
    """Eager per-segment reader: tri-sorted dictionary arrays plus the
    blob column (posting slices decode lazily per query)."""

    def __init__(self, seg_dir: str):
        t = pq.read_table(
            os.path.join(seg_dir, "postings")
        ).combine_chunks()
        tri = t["tri"].to_numpy(zero_copy_only=False)
        order = np.argsort(tri, kind="stable")
        self.tri = tri[order]
        self.df = t["df"].to_numpy(zero_copy_only=False)[order]
        self.docs = t["docs"].take(pa.array(order))

    def posting(self, tri: int) -> np.ndarray | None:
        i = int(np.searchsorted(self.tri, tri))
        if i >= self.tri.size or self.tri[i] != tri:
            return None
        return codec.decode_docids(self.docs[i].as_py())

    def df_of(self, tri: int) -> int:
        i = int(np.searchsorted(self.tri, tri))
        if i >= self.tri.size or self.tri[i] != tri:
            return 0
        return int(self.df[i])

    def intersect(self, tris: list[int]) -> np.ndarray:
        """AND across the trigram set, rarest list first (early exit on
        the first empty intersection)."""
        if not tris:
            return np.empty(0, dtype=np.int64)
        by_df = sorted(tris, key=self.df_of)
        if self.df_of(by_df[0]) == 0:
            return np.empty(0, dtype=np.int64)
        cand = self.posting(by_df[0])
        for tr in by_df[1:]:
            if cand.size == 0:
                break
            cand = np.intersect1d(
                cand, self.posting(tr), assume_unique=True
            )
        return cand

    def union_posting(self, tris: list[int]) -> np.ndarray:
        parts = [self.posting(t) for t in tris]
        parts = [p for p in parts if p is not None and p.size]
        if not parts:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(parts))

    def intersect_variants(
        self, pos_variants: list[list[int]]
    ) -> np.ndarray:
        """Case-insensitive AND: for each trigram POSITION of the folded
        needle, a doc must contain SOME case variant (union), and every
        position must hold (intersection). Positions ordered by total
        variant df, rarest first."""
        if not pos_variants:
            return np.empty(0, dtype=np.int64)
        ordered = sorted(
            pos_variants,
            key=lambda vs: sum(self.df_of(t) for t in vs),
        )
        cand = self.union_posting(ordered[0])
        for vs in ordered[1:]:
            if cand.size == 0:
                break
            cand = np.intersect1d(
                cand, self.union_posting(vs), assume_unique=True
            )
        return cand


def case_variant_tris(needle: str) -> list[list[int]] | None:
    """Per-position case-variant trigram codes for a case-folded needle.

    Only ASCII letters fold byte-stably (UTF-8 case pairs can change
    byte length); a needle with non-ASCII letters returns None and the
    caller full-scans — the verify stage is still exact either way."""
    if any(ord(ch) >= 128 and ch.isalpha() for ch in needle):
        return None
    b = needle.lower().encode("utf-8")
    if len(b) < 3:
        return None
    out: list[list[int]] = []
    for i in range(len(b) - 2):
        win = b[i : i + 3]
        variants = set()
        for mask in range(8):
            v = [
                (
                    win[j] ^ 0x20
                    if (mask >> j) & 1 and 97 <= win[j] <= 122
                    else win[j]
                )
                for j in range(3)
            ]
            variants.add((v[0] << 16) | (v[1] << 8) | v[2])
        out.append(sorted(variants))
    return out


def nocase_literal_positions(lit: str) -> list[list[int]] | None:
    """Case-variant trigram positions for one REQUIRED literal of a
    ``(?i)`` regex, dropping positions RE2's Unicode folding can evade.

    RE2 implements Unicode simple case folding, under which exactly two
    non-ASCII characters fold to ASCII: U+212A KELVIN SIGN → ``k`` and
    U+017F LATIN SMALL LETTER LONG S → ``s`` (verified against this
    pyarrow: ``(?i)string`` matches ``ſtring``). A document may
    therefore match the literal while containing NO single-byte case
    variant of a window holding ``k``/``s`` — those positions are
    excluded from the requirement (weaker filter, still sound). Returns
    None for non-ASCII-foldable literals; may return [] when every
    position holds a k/s."""
    pv = case_variant_tris(lit)
    if pv is None:
        return None
    b = lit.lower().encode("utf-8")
    return [
        vs
        for i, vs in enumerate(pv)
        if 0x6B not in b[i : i + 3] and 0x73 not in b[i : i + 3]
    ]


_HITS_EMPTY = pa.table(
    {
        "doc_id": pa.array([], type=pa.int64()),
        "n_matches": pa.array([], type=pa.int64()),
    }
)

_GREP_EMPTY = pa.table(
    {
        "doc_id": pa.array([], type=pa.int64()),
        "line_no": pa.array([], type=pa.int64()),
        "line": pa.array([], type=pa.string()),
        "n_matches": pa.array([], type=pa.int64()),
    }
)


def _range_has(sorted_ids: np.ndarray, lo: int, hi: int) -> bool:
    """Does the sorted id array contain any value in [lo, hi)?"""
    i = int(np.searchsorted(sorted_ids, lo))
    return i < sorted_ids.size and sorted_ids[i] < hi


def _text_col_of(t: pa.Table, id_col: str | None) -> str:
    for c in t.column_names:
        if c not in (id_col, "__rowid"):
            return c
    raise ValueError(f"no text column in {t.column_names}")


def _filter_rows(t: pa.Table, filters: dict | None) -> pa.Table:
    """Equality metadata filters (repo/lang/… — the Zoekt-style scoped
    grep), AND-combined, applied before the match kernel."""
    if not filters:
        return t
    mask = None
    for col, val in sorted(filters.items()):
        m = pc.equal(t[col], val)
        m = pc.fill_null(m, False)
        mask = m if mask is None else pc.and_(mask, m)
    return t.filter(mask)


def _grep_kernel(
    t: pa.Table,
    pattern: str,
    regex: bool,
    id_col: str | None,
    ignore_case: bool = False,
    filters: dict | None = None,
) -> pa.Table:
    """Split candidate docs into lines and keep matching lines with
    1-based line numbers — all Arrow kernels (split_pattern, flatten,
    parent indices), vectorized across every line of every doc."""
    t = _filter_rows(t, filters)
    if t.num_rows == 0:
        return _GREP_EMPTY
    text = pc.fill_null(
        pc.cast(t[_text_col_of(t, id_col)], pa.string()), ""
    )
    idc = id_col or "__rowid"
    ids_np = pc.cast(t[idc], pa.int64()).to_numpy(zero_copy_only=False)
    lines = pc.split_pattern(text, "\n")
    if isinstance(lines, pa.ChunkedArray):
        # one contiguous Array so flat indices line up with parent/
        # length arrays below (combine_chunks on a ChunkedArray yields
        # a plain Array on this pyarrow)
        combined = lines.combine_chunks()
        lines = (
            combined
            if isinstance(combined, pa.Array)
            else (
                combined.chunk(0)
                if combined.num_chunks
                else pa.array([], type=lines.type)
            )
        )
    flat = pc.list_flatten(lines)
    parent = pc.list_parent_indices(lines).to_numpy(
        zero_copy_only=False
    )
    n_lines = pc.list_value_length(lines).to_numpy(
        zero_copy_only=False
    )
    # 1-based line number = global flat index - doc's first flat index
    first = np.concatenate(
        ([0], np.cumsum(n_lines[:-1]))
    ) if n_lines.size else np.empty(0, dtype=np.int64)
    line_no = (
        np.arange(len(flat), dtype=np.int64) - first[parent] + 1
    )
    if regex:
        pat = f"(?i){pattern}" if ignore_case else pattern
        counts = pc.count_substring_regex(flat, pat)
    elif ignore_case:
        # ASCII lower-both-sides — byte-stable, matching the
        # case-variant candidate filter (see substring_search)
        counts = pc.count_substring(
            pc.ascii_lower(flat), pattern.lower()
        )
    else:
        counts = pc.count_substring(flat, pattern)
    counts_np = pc.fill_null(
        pc.cast(counts, pa.int64()), 0
    ).to_numpy(zero_copy_only=False)
    m = counts_np > 0
    sel = np.flatnonzero(m)
    out_ids = ids_np[parent[sel]]
    order = np.lexsort((line_no[sel], out_ids))
    sel = sel[order]
    return pa.table(
        {
            "doc_id": pa.array(ids_np[parent[sel]], type=pa.int64()),
            "line_no": pa.array(line_no[sel], type=pa.int64()),
            "line": flat.take(pa.array(sel)),
            "n_matches": pa.array(counts_np[sel], type=pa.int64()),
        }
    )


def _apply_kernel(
    t: pa.Table,
    kernel,
    id_col: str | None,
    filters: dict | None = None,
    group_col: str | None = None,
) -> pa.Table:
    """Run the exact-match kernel over one table of candidate rows and
    keep (doc_id, n_matches>0) (+ the group column when requested),
    sorted by doc_id. Module-level so verify stages serialize only the
    kernel closure, never an index handle."""
    t = _filter_rows(t, filters)
    non_text = {id_col, "__rowid", group_col} | set(
        (filters or {}).keys()
    )
    text_col = None
    for c in t.column_names:
        if c not in non_text:
            text_col = c
    counts = kernel(t[text_col])
    counts = pc.fill_null(pc.cast(counts, pa.int64()), 0)
    counts_np = counts.to_numpy(zero_copy_only=False)
    idc = id_col or "__rowid"
    ids_np = pc.cast(t[idc], pa.int64()).to_numpy(zero_copy_only=False)
    m = counts_np > 0
    order = np.argsort(ids_np[m], kind="stable")
    cols = {
        "doc_id": pa.array(ids_np[m][order], type=pa.int64()),
        "n_matches": pa.array(counts_np[m][order], type=pa.int64()),
    }
    if group_col is not None:
        sel = np.flatnonzero(m)[order]
        cols[group_col] = t[group_col].take(pa.array(sel))
    return pa.table(cols)


class TrigramIndex:
    """Query-side handle: candidate generation over the segments plus
    exact verification against the source parquet.

    Loads every segment's posting table eagerly on the driver — right
    for single-node corpora, wrong past a handful of segments. At
    cluster scale use :class:`DistributedTrigramIndex`, which holds
    segments in a pool of actors (same results, pytest-pinned)."""

    def __init__(self, index_dir: str, src: str | list[str]):
        # opening races a compaction's swap (manifest repointed before
        # superseded dirs delete): a vanished/uncommitted listed dir
        # means a newer committed view exists — re-read and reopen
        # (each retry observes a strictly newer manifest)
        for attempt in range(5):
            try:
                self._load_manifest(index_dir, src)
                self.segments = [
                    _TriSegment(d)
                    for d in self._active_segment_dirs(index_dir)
                ]
                break
            except (FileNotFoundError, ValueError):
                if attempt == 4:
                    raise

    def _active_segment_dirs(self, index_dir: str) -> list[str]:
        """Committed segment dirs listed in trigram_index.json — the
        manifest is the authority, so a committed dir left by an older
        plan (different segment_docs → different range-names) is never
        served; falls back to the directory scan for pre-manifest
        indexes."""
        listed = self.manifest.get("segments")
        if not listed:
            return _committed_tri_segments(index_dir)
        seg_root = os.path.join(index_dir, "segments")
        out = []
        for name in listed:
            d = os.path.join(seg_root, name)
            if not segment_is_committed(d):
                raise ValueError(
                    f"trigram segment {name} listed in "
                    f"trigram_index.json is not committed under "
                    f"{seg_root} — incomplete build?"
                )
            out.append(d)
        return out

    def _load_manifest(self, index_dir: str, src) -> None:
        import json

        from datamart_ray.index.trigram_maintain import (
            read_tri_tombstones,
        )

        # tombstoned docIDs are filtered out of every search path (the
        # postings keep them until trigram_compact makes the delete
        # physical — the Lucene discipline, same as index/maintain.py).
        # Read tombstones FIRST, manifest SECOND: compaction repoints
        # the manifest and THEN prunes tombstones, so every unlocked
        # open interleaving is safe — stale tombstones + new manifest
        # is a harmless no-op filter, while the reverse order could
        # pair the OLD manifest (postings still holding a deleted doc)
        # with the pruned tombstone set and resurrect it.
        self.tombstones = read_tri_tombstones(index_dir)
        with open(os.path.join(index_dir, "trigram_index.json")) as f:
            self.manifest = json.load(f)
        self.src = src
        self.text_col = self.manifest["text_col"]
        self.id_col = self.manifest["id_col"]
        self._specs_cache: list | None = None

    def _plan(self) -> list:
        """Cached read-spec plan (dense-id indexes) — footer metadata
        is read once per handle, not once per streaming query."""
        if self._specs_cache is None:
            self._specs_cache, _ = plan_specs(
                [f["path"] for f in self.manifest["files"]], 2048
            )
        return self._specs_cache

    def _specs_touched(self, cand: np.ndarray) -> int:
        """How many read specs contain at least one candidate — the
        driver-fetch cost model (serial row-group reads)."""
        return sum(
            1
            for sp in self._plan()
            if _range_has(cand, sp["base"], sp["base"] + sp["n_rows"])
        )

    # -- candidates ----------------------------------------------------

    def _candidates_all(self, tris: list[int]) -> np.ndarray:
        parts = [s.intersect(tris) for s in self.segments]
        parts = [p for p in parts if p.size]
        if not parts:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(parts))

    def _candidates_variants(
        self, pos_variants: list[list[int]]
    ) -> np.ndarray:
        parts = [s.intersect_variants(pos_variants) for s in self.segments]
        parts = [p for p in parts if p.size]
        if not parts:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(parts))

    def substring_candidates(
        self, needle: str, ignore_case: bool = False
    ) -> np.ndarray | None:
        """Candidate docIDs for a substring query; None = needle too
        short for the trigram filter (<3 bytes), or non-ASCII-foldable
        under ignore_case → caller full-scans."""
        if ignore_case:
            pv = case_variant_tris(needle)
            if pv is None:
                return None
            return self._candidates_variants(pv)
        tris = string_trigrams(needle)
        if not tris:
            return None
        return self._candidates_all(tris)

    def regex_candidates(
        self, pattern: str, ignore_case: bool = False
    ) -> np.ndarray | None:
        """Candidate docIDs from the pattern's required-literal DNF;
        None = no usable literals → caller full-scans.

        ignore_case bounds the common ASCII-literal case through the
        SAME per-position case-variant machinery as nocase substring
        search (``case_variant_tris``), minus the positions RE2's
        Unicode simple folding can evade (KELVIN SIGN → k, LONG S → s;
        see ``nocase_literal_positions``). Non-ASCII literals or
        all-evadable alternatives still return None — the honest
        distributed full scan."""
        if ignore_case:
            dnf = required_literals(pattern, fold=True)
            if dnf is None:
                return None
            parts = []
            for alt in dnf:
                pos: list[list[int]] = []
                for lit in alt:
                    pv = nocase_literal_positions(lit)
                    if pv is None:
                        return None  # non-ASCII literal: full scan
                    pos.extend(pv)
                if not pos:
                    # an alternative with no byte-stable positions is
                    # unbounded → the whole query full-scans
                    return None
                p = self._candidates_variants(pos)
                if p.size:
                    parts.append(p)
            if not parts:
                return np.empty(0, dtype=np.int64)
            return np.unique(np.concatenate(parts))
        dnf = required_literals(pattern)
        if dnf is None:
            return None
        parts = []
        for alt in dnf:
            tris = sorted(
                {t for lit in alt for t in string_trigrams(lit)}
            )
            p = self._candidates_all(tris)
            if p.size:
                parts.append(p)
        if not parts:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(parts))

    # -- exact verify ----------------------------------------------------

    def _verify(
        self,
        cand: np.ndarray | None,
        table_kernel,
        empty: pa.Table,
        sort_keys: list[str] | None = None,
        extra_cols: tuple = (),
    ) -> pa.Table:
        """Exact verify: runs ``table_kernel(candidate_rows, id_col)``
        and returns its concatenated output, sorted by ``sort_keys``.
        ``extra_cols`` (metadata filters / group columns) ride the same
        pruned reads — never a second corpus pass.

        cand=None or above VERIFY_FETCH_CAP → stream the corpus with a
        broadcast id filter inside map_batches (only the kernel's output
        rows return to the driver); small candidate sets use the
        row-group-pruned fetch fast path."""
        from datamart_ray.util import isin_sorted

        sort_keys = sort_keys or ["doc_id"]
        tombs = self.tombstones
        if cand is not None and tombs.size:
            cand = cand[~isin_sorted(tombs, cand)]
        if cand is not None and cand.size == 0:
            return empty
        if cand is not None and cand.size <= VERIFY_FETCH_CAP:
            if self.id_col or self._specs_touched(cand) <= FETCH_SPECS_CAP:
                t = self._fetch(cand, extra_cols)
                return table_kernel(t, self.id_col)

        # the stage closure must capture only scalars + the broadcast
        # ref — NOT self (shipping the posting arrays to every verify
        # task would defeat the point of the index)
        ref = ray.put((cand, tombs))  # cand may be None → no pre-filter
        text_col, id_col = self.text_col, self.id_col
        extra = tuple(extra_cols)

        def stage(t: pa.Table) -> pa.Table:
            from datamart_ray.util import isin_sorted

            ids, tombs = ray.get(ref)
            idc = id_col or "__rowid"
            if ids is not None or tombs.size:
                vals = pc.cast(t[idc], pa.int64()).to_numpy(
                    zero_copy_only=False
                )
                keep = (
                    isin_sorted(ids, vals)
                    if ids is not None
                    else np.ones(vals.size, dtype=bool)
                )
                if tombs.size:
                    keep &= ~isin_sorted(tombs, vals)
                t = t.filter(pa.array(keep))
            if t.num_rows == 0:
                return empty
            return table_kernel(t, id_col)

        if self.id_col:
            ds = rd.read_parquet(
                self.src,
                columns=[self.id_col, self.text_col, *extra_cols],
            )
            out = ds.map_batches(stage, batch_format="pyarrow")
        else:
            # dense file-offset ids: replay the planned spec order so
            # docIDs match the build, pruning specs (and, inside the
            # task, row groups) that contain no candidate
            specs = self._plan()
            if cand is not None:
                specs = [
                    sp
                    for sp in specs
                    if _range_has(
                        cand, sp["base"], sp["base"] + sp["n_rows"]
                    )
                ]
            if not specs:
                return empty

            def read_stage(batch: pa.Table):
                from datamart_ray.index.trigram import _range_has

                ids_t = ray.get(ref)[0]
                for spec in batch.to_pylist():
                    pf = pq.ParquetFile(spec["path"])
                    rg_base = spec["base"]
                    for rg in range(
                        spec["rg_start"], spec["rg_end"] + 1
                    ):
                        n = pf.metadata.row_group(rg).num_rows
                        if ids_t is not None and not _range_has(
                            ids_t, rg_base, rg_base + n
                        ):
                            rg_base += n
                            continue
                        t = pf.read_row_group(
                            rg, columns=[text_col, *extra]
                        )
                        t = t.append_column(
                            "__rowid",
                            pa.array(
                                rg_base
                                + np.arange(t.num_rows, dtype=np.int64)
                            ),
                        )
                        rg_base += t.num_rows
                        r = stage(t)
                        if r.num_rows:
                            yield r

            out = rd.from_items(specs).map_batches(
                read_stage,
                batch_size=1,
                batch_format="pyarrow",
                num_cpus=1,
            )
        parts = [
            p for p in ray.get(out.to_arrow_refs()) if p.num_rows
        ]
        if not parts:
            return empty
        return (
            pa.concat_tables(parts)
            .combine_chunks()
            .sort_by([(k, "ascending") for k in sort_keys])
        )

    def _fetch(
        self, ids: np.ndarray, extra_cols: tuple = ()
    ) -> pa.Table:
        from datamart_ray.util import fetch_rows_by_ids

        if self.id_col:
            return fetch_rows_by_ids(
                self.src,
                self.id_col,
                ids,
                [self.id_col, self.text_col, *extra_cols],
            )
        # dense ids: row-group-pruned read per file via the spec plan
        out = []
        for f in self.manifest["files"]:
            lo, hi = f["base"], f["base"] + f["n_rows"]
            want = ids[(ids >= lo) & (ids < hi)]
            if want.size == 0:
                continue
            pf = pq.ParquetFile(f["path"])
            rg_base = lo
            for rg in range(pf.metadata.num_row_groups):
                n = pf.metadata.row_group(rg).num_rows
                sel = want[(want >= rg_base) & (want < rg_base + n)]
                if sel.size:
                    t = pf.read_row_group(
                        rg, columns=[self.text_col, *extra_cols]
                    )
                    t = t.append_column(
                        "__rowid",
                        pa.array(
                            rg_base + np.arange(n, dtype=np.int64)
                        ),
                    )
                    t = t.take(pa.array(sel - rg_base))
                    out.append(t)
                rg_base += n
        if not out:
            sch = pq.ParquetFile(
                self.manifest["files"][0]["path"]
            ).schema_arrow
            cols = {
                self.text_col: pa.array([], type=pa.string()),
                "__rowid": pa.array([], type=pa.int64()),
            }
            for c in extra_cols:
                cols[c] = pa.array([], type=sch.field(c).type)
            return pa.table(cols)
        return pa.concat_tables(out).combine_chunks()

    # -- public search API ----------------------------------------------

    def substring_search(
        self,
        needle: str,
        ignore_case: bool = False,
        filters: dict | None = None,
    ) -> pa.Table:
        """Exact substring search (byte semantics — DuckDB
        ``contains()`` twin; ignore_case = the lower-both-sides idiom,
        ``contains(lower(text), lower(needle))``): (doc_id, n_matches)
        sorted by id. Occurrence counts are non-overlapping leftmost,
        identical to the length-difference SQL idiom. Case-insensitive
        candidates come from per-position case-variant unions over the
        SAME index — no second case-folded index to build or store."""
        cand = self.substring_candidates(needle, ignore_case=ignore_case)

        def table_kernel(
            t, idc, needle=needle, nocase=ignore_case, flt=filters
        ):
            if nocase:
                # ASCII folding (ascii_lower), matching the candidate
                # generator's byte-stable variants — a unicode fold
                # (utf8_lower) would accept docs the trigram filter
                # can't see (e.g. KELVIN SIGN → k) and silently split
                # results between the two paths
                kern = lambda col: pc.count_substring(  # noqa: E731
                    pc.ascii_lower(col), needle.lower()
                )
            else:
                kern = lambda col: pc.count_substring(  # noqa: E731
                    col, needle
                )
            return _apply_kernel(t, kern, idc, filters=flt)

        return self._verify(
            cand,
            table_kernel,
            _HITS_EMPTY,
            extra_cols=tuple(sorted(filters)) if filters else (),
        )

    def regexp_search(
        self,
        pattern: str,
        ignore_case: bool = False,
        filters: dict | None = None,
    ) -> pa.Table:
        """Regex content search (RE2 partial-match semantics — DuckDB
        ``regexp_matches()`` twin; ignore_case prefixes ``(?i)``, the
        identical RE2 flag both sides): (doc_id, n_matches) where
        n_matches counts non-overlapping matches."""
        cand = self.regex_candidates(pattern, ignore_case=ignore_case)
        pat = f"(?i){pattern}" if ignore_case else pattern

        def table_kernel(t, idc, pat=pat, flt=filters):
            return _apply_kernel(
                t,
                lambda col: pc.count_substring_regex(col, pat),
                idc,
                filters=flt,
            )

        return self._verify(
            cand,
            table_kernel,
            _HITS_EMPTY,
            extra_cols=tuple(sorted(filters)) if filters else (),
        )

    def grep(
        self,
        pattern: str,
        regex: bool = False,
        ignore_case: bool = False,
        filters: dict | None = None,
    ) -> pa.Table:
        """grep-style line output: (doc_id, line_no, line, n_matches)
        for every line containing the pattern, sorted by (doc_id,
        line_no). Line numbers are 1-based; candidates come from the
        trigram filter exactly like the search methods, and line
        splitting / matching is vectorized Arrow (split_pattern +
        list_parent_indices), never a Python loop over lines."""
        cand = (
            self.regex_candidates(pattern, ignore_case=ignore_case)
            if regex
            else self.substring_candidates(
                pattern, ignore_case=ignore_case
            )
        )

        def table_kernel(
            t,
            idc,
            pattern=pattern,
            regex=regex,
            nocase=ignore_case,
            flt=filters,
        ):
            return _grep_kernel(
                t, pattern, regex, idc, ignore_case=nocase, filters=flt
            )

        return self._verify(
            cand,
            table_kernel,
            _GREP_EMPTY,
            sort_keys=["doc_id", "line_no"],
            extra_cols=tuple(sorted(filters)) if filters else (),
        )

    def like_search(
        self, pattern: str, ignore_case: bool = False
    ) -> pa.Table:
        """SQL LIKE content search (``%``/``_`` wildcards, no ESCAPE
        clause — DuckDB ``LIKE`` twin): (doc_id, n_matches=1) for
        matching docs. Candidates: every literal run (between
        wildcards) of ≥3 bytes must be present, so the trigram AND
        covers all runs at once; a pattern with no such run full-scans.
        Verify is Arrow ``match_like`` — the same SQL semantics
        (anchored: a pattern without leading/trailing ``%`` must match
        the whole string).

        ``ignore_case=True`` is the ILIKE variant: candidates come
        from per-position case-variant unions per literal run (k/s
        windows excluded — Arrow's ignore_case folds Unicode like RE2,
        see ``nocase_literal_positions``). PINNED DEVIATION vs DuckDB
        ILIKE on non-ASCII only: Arrow folds LONG S/KELVIN SIGN to
        s/k, DuckDB's ILIKE does not — identical on ASCII corpora."""
        import re as _re

        # a backslash escapes the following wildcard for match_like,
        # so a run containing one does not appear verbatim in matching
        # text — exclude such runs from the trigram requirement (sound;
        # the verify is exact either way). NB the DuckDB twin is only
        # equivalent for backslash-free patterns (LIKE without ESCAPE
        # treats backslash literally).
        lits = [
            run
            for run in _re.split(r"[%_]", pattern)
            if len(run) >= 3 and "\\" not in run
        ]
        if ignore_case:
            pos: list[list[int]] = []
            bounded = True
            for lit in lits:
                pv = nocase_literal_positions(lit)
                if pv is None:
                    bounded = False
                    break
                pos.extend(pv)
            cand = (
                self._candidates_variants(pos)
                if bounded and pos
                else None
            )
        else:
            tris = sorted(
                {t for lit in lits for t in string_trigrams(lit)}
            )
            cand = self._candidates_all(tris) if tris else None

        def table_kernel(t, idc, pattern=pattern, ic=ignore_case):
            return _apply_kernel(
                t,
                lambda col: pc.cast(
                    pc.match_like(col, pattern, ignore_case=ic),
                    pa.int64(),
                ),
                idc,
            )

        return self._verify(cand, table_kernel, _HITS_EMPTY)

    def match_stats_by(
        self,
        pattern: str,
        group_col: str,
        regex: bool = False,
        ignore_case: bool = False,
        filters: dict | None = None,
    ) -> pa.Table:
        """Per-group match rollup (grep -c per repo/lang/…): for every
        value of ``group_col``, the number of matching docs and total
        occurrences — (group, n_docs, n_matches) sorted by group. The
        group column rides the same pruned verify reads; the rollup is
        over hit rows only (hits-bounded, never corpus-bounded)."""
        if regex:
            cand = self.regex_candidates(pattern, ignore_case=ignore_case)
            pat = f"(?i){pattern}" if ignore_case else pattern
            kern = lambda col: pc.count_substring_regex(  # noqa: E731
                col, pat
            )
        else:
            cand = self.substring_candidates(
                pattern, ignore_case=ignore_case
            )
            if ignore_case:
                kern = lambda col: pc.count_substring(  # noqa: E731
                    pc.ascii_lower(col), pattern.lower()
                )
            else:
                kern = lambda col: pc.count_substring(  # noqa: E731
                    col, pattern
                )
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "n_matches": pa.array([], type=pa.int64()),
                group_col: pa.array([], type=pa.string()),
            }
        )

        def table_kernel(t, idc, kern=kern, gc=group_col, flt=filters):
            return _apply_kernel(
                t, kern, idc, filters=flt, group_col=gc
            )

        extra = tuple(
            sorted(set(filters or ()) | {group_col})
        )
        hits = self._verify(cand, table_kernel, empty, extra_cols=extra)
        if hits.num_rows == 0:
            return pa.table(
                {
                    group_col: pa.array([], type=pa.string()),
                    "n_docs": pa.array([], type=pa.int64()),
                    "n_matches": pa.array([], type=pa.int64()),
                }
            )
        agg = (
            hits.group_by(group_col)
            .aggregate([("doc_id", "count"), ("n_matches", "sum")])
            .rename_columns([group_col, "n_docs", "n_matches"])
            .sort_by(group_col)
        )
        return pa.table(
            {
                group_col: agg[group_col],
                "n_docs": pc.cast(agg["n_docs"], pa.int64()),
                "n_matches": pc.cast(agg["n_matches"], pa.int64()),
            }
        )


# ----------------------------------------------------------------------
# Distributed serving: segments resident in a pool of actors
# ----------------------------------------------------------------------

@ray.remote
class _TriSegmentActor:
    """Holds a round-robin slice of segments resident in actor memory
    (the trigram analog of the BM25 scorer actors): the driver never
    loads posting tables, only ships trigram lists and gets docID
    arrays back — O(query) traffic, not O(index)."""

    def __init__(self, seg_dirs: list[str]):
        self.segments = [_TriSegment(d) for d in seg_dirs]

    def intersect_all(self, tris: list[int]) -> np.ndarray:
        parts = [s.intersect(tris) for s in self.segments]
        parts = [p for p in parts if p.size]
        if not parts:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(parts))

    def intersect_variants_all(
        self, pos_variants: list[list[int]]
    ) -> np.ndarray:
        parts = [
            s.intersect_variants(pos_variants) for s in self.segments
        ]
        parts = [p for p in parts if p.size]
        if not parts:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(parts))

    def ping(self) -> bool:
        return True


class DistributedTrigramIndex(TrigramIndex):
    """Cluster-scale serving handle: candidate generation fans out to a
    segment-actor pool (posting tables never touch the driver); the
    verify stage is the same distributed kernel as :class:`TrigramIndex`
    — results are bit-identical (pytest-pinned)."""

    def __init__(
        self,
        index_dir: str,
        src: str | list[str],
        n_actors: int | None = None,
    ):
        for attempt in range(5):  # same open-vs-compaction retry as
            try:  # TrigramIndex (actor load below has its own retry)
                self._load_manifest(index_dir, src)
                self.segments = []  # never resident driver-side
                seg_dirs = self._active_segment_dirs(index_dir)
                break
            except (FileNotFoundError, ValueError):
                if attempt == 4:
                    raise
        if not seg_dirs:
            self.actors = []
            return
        n = max(1, min(n_actors or 8, len(seg_dirs)))
        groups: list[list[str]] = [[] for _ in range(n)]
        for i, d in enumerate(seg_dirs):
            groups[i % n].append(d)
        self.actors = [
            _TriSegmentActor.remote(g) for g in groups if g
        ]
        ray.get([a.ping.remote() for a in self.actors])

    def _candidates_all(self, tris: list[int]) -> np.ndarray:
        if not tris or not self.actors:
            return np.empty(0, dtype=np.int64)
        parts = ray.get(
            [a.intersect_all.remote(list(tris)) for a in self.actors]
        )
        parts = [p for p in parts if p.size]
        if not parts:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(parts))

    def _candidates_variants(
        self, pos_variants: list[list[int]]
    ) -> np.ndarray:
        if not pos_variants or not self.actors:
            return np.empty(0, dtype=np.int64)
        parts = ray.get(
            [
                a.intersect_variants_all.remote(pos_variants)
                for a in self.actors
            ]
        )
        parts = [p for p in parts if p.size]
        if not parts:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(parts))

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []
