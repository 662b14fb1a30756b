"""BM25 top-k query engine over the segmented posting-chunk index.

The native replacement for the reference's ES query execution
(apiserver/apiserver/search/__init__.py:553-563 — ``es.search(size=50)``
with AND-semantics multi_match; keyword filters per
search/__init__.py:79-105). Semantics:

- the *same* Analyzer as the index build (``default_search = default``
  parity, coordinator/elasticsearch.yml:15-16);
- BM25 with global corpus stats (N, avgdl, df summed over segments) so
  scores are independent of segmentation/parallelism;
- ``mode="and"`` (default, like the reference's ``operator: 'and'``) via
  rarest-first sorted-array intersection with chunk skipping, or
  ``mode="or"`` via score union;
- keyword equality filters on docmeta columns (lang/repo — the analog of
  the reference's source/type terms filters);
- pinned top-k tie-break (score desc, docID asc), k=50 default.

Two serving shapes:
- :class:`SearchEngine` — in-process, one reader per segment (query p50 path);
- :class:`DistributedSearchEngine` — one Ray actor per segment holding its
  postings/doclens (the scorer-actor-pool design, SURVEY.md §2.3 ST8);
  per-segment local top-k, driver merges heaps. df/N are exchanged first so
  scoring still uses global stats.
"""

from __future__ import annotations

import json
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray

from datamart_ray.analyzer import Analyzer
from datamart_ray.index.build import IndexConfig
from datamart_ray.index import codec
from datamart_ray.index.manifest import (
    INDEX_MANIFEST_NAME,
    active_segments,
    read_manifest,
)
from datamart_ray.search.bm25 import BM25Params, bm25_idf, bm25_tf_norm, topk_select

TOP_K_SIZE = 50  # reference: apiserver/apiserver/search/base.py:1

# Above this many postings a segment is served lazily (mmap posting
# heap) under lazy="auto": eager mode holds the whole chunk table in
# process heap (~6-10 B/posting), so a giant segment would OOM its
# reader/scorer. 256M postings ≈ 2 GB resident — a safe per-reader
# bound; below it the eager sorted-slice table is the faster warm path.
AUTO_LAZY_POSTINGS = 256_000_000


def _resolve_lazy(seg_dir: str, lazy: bool | str) -> bool:
    if lazy != "auto":
        return bool(lazy)
    return read_manifest(seg_dir).get("n_postings", 0) > AUTO_LAZY_POSTINGS


class SegmentReader:
    """Reads one committed segment: term dict, postings, docmeta arrays.

    Two posting-access modes:
    - eager (default): the posting-chunk table is loaded once and indexed
      by term — the low-latency path while a segment fits its scorer
      (one SegmentScorer actor per segment);
    - ``lazy=True``: per-term access through the mmap posting-heap
      sidecar (``index/heap.py`` — term-sorted Arrow IPC file served as
      zero-copy batch slices from the OS page cache; built atomically on
      first lazy open) + an LRU of decoded terms — the giant-segment
      path: resident memory stays O(touched pages), cold terms cost ~1 ms
      instead of a filtered parquet read. Falls back to row-group-pruned
      filtered reads if the sidecar cannot be built (read-only dir).
    """

    def __init__(
        self,
        seg_dir: str,
        filter_cols: tuple = ("lang", "repo"),
        lazy: bool = False,
        lazy_cache_terms: int = 512,
    ):
        self.seg_dir = seg_dir
        self.manifest = read_manifest(seg_dir)
        self.n_docs = self.manifest["n_docs"]
        self.total_doclen = self.manifest["total_doclen"]
        # term dictionary as sorted parallel arrays + binary search —
        # several times more compact than a Python dict (terms.parquet is
        # written term-sorted), which matters at giant-segment vocab sizes
        t = pq.read_table(os.path.join(seg_dir, "terms.parquet"))
        self._dict_terms = t["term"].to_numpy(zero_copy_only=False)
        self._dict_dfs = t["df"].to_numpy()
        self._postings_dir = os.path.join(seg_dir, "postings")
        self._post_table: pa.Table | None = None
        self._term_rows: dict[str, np.ndarray] | None = None
        self.lazy = lazy
        self._lazy_cache_terms = lazy_cache_terms
        self._lazy_cache: "dict[str, pa.Table]" = {}
        self._heap = None
        if lazy:
            try:
                from datamart_ray.index.heap import PostingHeap

                self._heap = PostingHeap(seg_dir)
            except (
                OSError,
                MemoryError,
                pa.ArrowInvalid,
                pa.ArrowCapacityError,
            ):
                # read-only dir, or the one-time sidecar build does not
                # fit this process (prebuild via `python -m datamart_ray
                # heap` on a large-memory worker) → filtered-read path
                self._heap = None
        self._tc_cache: dict = {}  # term → TermChunks (decode memo inside)
        meta_dir = os.path.join(seg_dir, "docmeta")
        avail = set(
            pq.ParquetFile(
                os.path.join(meta_dir, sorted(os.listdir(meta_dir))[0])
            ).schema_arrow.names
        )
        cols = ["doc_id", "doclen"] + [c for c in filter_cols if c in avail]
        meta = pq.read_table(meta_dir, columns=cols)
        order = pc.sort_indices(meta["doc_id"])
        meta = meta.take(order)
        self._doc_ids = meta["doc_id"].to_numpy()
        self._doclens = meta["doclen"].to_numpy()
        self._meta = meta
        from datamart_ray.index.maintain import read_tombstones

        self._tombstones = np.sort(read_tombstones(seg_dir))
        if not lazy:
            # Load postings NOW, not at first search: the open defines a
            # point-in-time view, so a concurrent compaction deleting
            # this dir after the open cannot tear a later query (lazy
            # mode is equally safe via the mmap'd heap sidecar — POSIX
            # keeps the unlinked file alive for the open mapping; only
            # the no-sidecar filtered-read fallback re-touches the dir).
            self._ensure_postings()

    def df(self, term: str) -> int:
        i = int(np.searchsorted(self._dict_terms, term))
        if (
            i < self._dict_terms.size
            and self._dict_terms[i] == term
        ):
            return int(self._dict_dfs[i])
        return 0

    def _ensure_postings(self) -> None:
        """Load the segment's posting-chunk table once, SORTED by term and
        chunk-combined, and index each term's rows as a (start, end)
        SLICE. Per-term access is then a zero-copy ``Table.slice`` —
        measured 0.02-0.5 ms vs 60-90 ms for a scattered ``take`` across
        the ~100-chunk as-read table, which dominated the cold-term p95
        tail (VERDICT r2 "Next round" #6). A segment's postings are sized
        to fit its scorer (one SegmentScorer actor per segment at
        scale)."""
        if self._term_rows is not None:
            return
        t = pq.read_table(self._postings_dir)
        terms = t["term"].to_numpy(zero_copy_only=False)
        order = np.argsort(terms, kind="stable")
        t = t.take(pa.array(order))
        try:
            # single-chunk columns make the per-term slice fully
            # zero-copy; best-effort — a near-cap binary column (>2 GiB)
            # cannot combine, and slices work on the chunked table too
            t = t.combine_chunks()
        except (pa.ArrowInvalid, pa.ArrowCapacityError, MemoryError):
            pass
        self._post_table = t
        sorted_terms = terms[order]
        bounds = np.flatnonzero(sorted_terms[1:] != sorted_terms[:-1]) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [terms.size]))
        self._term_rows = {
            sorted_terms[s]: (int(s), int(e))
            for s, e in zip(starts, ends)
        }

    def postings_chunks(self, term: str) -> pa.Table:
        """Raw posting-chunk rows of `term` (undecoded — block-max path).
        Lazy mode keeps a per-term LRU of the read chunk table — repeat
        terms skip the filtered read entirely (measured: p50 69ms → 5ms on
        the 120k-doc reference query set). Eager mode serves zero-copy
        slices of the term-sorted table, which need no cache."""
        if not self.lazy:
            self._ensure_postings()
            se = self._term_rows.get(term)
            if se is None:
                return self._post_table.schema.empty_table()
            return self._post_table.slice(se[0], se[1] - se[0])
        hit = self._lazy_cache.pop(term, None)
        if hit is not None:
            self._lazy_cache[term] = hit  # refresh LRU order
            return hit
        t = self._lazy_chunks(term)
        while len(self._lazy_cache) >= self._lazy_cache_terms:
            self._lazy_cache.pop(next(iter(self._lazy_cache)))
        self._lazy_cache[term] = t
        return t

    def _lazy_chunks(self, term: str) -> pa.Table:
        """Per-term access without loading the whole posting table: the
        mmap heap sidecar when available (zero-copy slice), else a
        filtered read (row-group pruning via `term` stats)."""
        if self.df(term) == 0:
            from datamart_ray.index.build import POSTINGS_SCHEMA

            return POSTINGS_SCHEMA.empty_table()
        if self._heap is not None:
            return self._heap.chunks(term)
        return pq.read_table(
            self._postings_dir,
            filters=[("term", "==", term)],
        )

    def term_chunks(self, term: str):
        """Cached TermChunks for `term` — block-max metadata plus a
        per-chunk decode memo, so hot terms never re-decode varbyte."""
        from datamart_ray.search.wand import TermChunks

        hit = self._tc_cache.pop(term, None)
        if hit is None:
            hit = TermChunks(self.postings_chunks(term))
        while len(self._tc_cache) >= self._lazy_cache_terms:
            self._tc_cache.pop(next(iter(self._tc_cache)))
        self._tc_cache[term] = hit
        return hit

    def postings(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        """All chunks of `term` merged → (sorted docIDs, aligned tfs).
        Chunks may interleave in id_col/salted modes — decode_all
        restores global docID order."""
        if self.df(term) == 0:
            e = np.empty(0, dtype=np.int64)
            return e, e
        return self.term_chunks(term).decode_all()

    def doclen_of(self, docids: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(self._doc_ids, docids)
        return self._doclens[pos]

    def filter_positions(self, filters: dict[str, object]) -> np.ndarray | None:
        """Sorted docID array passing all filters and tombstones
        (None = everything allowed). A scalar value is an equality
        filter; a 2-tuple ``(lo, hi)`` is an inclusive numeric range
        (the ES ``range`` query analog; either bound may be None for
        a half-open range); a LIST of values is the ES ``terms`` query
        analog (membership in any of the values)."""
        if not filters and self._tombstones.size == 0:
            return None
        mask = np.ones(self._doc_ids.size, dtype=bool)
        for col, val in (filters or {}).items():
            if col not in self._meta.column_names:
                raise KeyError(f"no filter column {col!r} in docmeta")
            if isinstance(val, (list, set, frozenset)):
                arr = pc.is_in(
                    self._meta[col], value_set=pa.array(sorted(val))
                )
                arr = pc.fill_null(arr, False)
            elif isinstance(val, tuple):
                lo, hi = val
                arr = pa.array(np.ones(self._meta.num_rows, dtype=bool))
                if lo is not None:
                    arr = pc.and_kleene(
                        arr, pc.greater_equal(self._meta[col], lo)
                    )
                if hi is not None:
                    arr = pc.and_kleene(
                        arr, pc.less_equal(self._meta[col], hi)
                    )
                arr = pc.fill_null(arr, False)
            else:
                arr = pc.equal(self._meta[col], val)
            mask &= arr.to_numpy(zero_copy_only=False)
        if self._tombstones.size:
            mask &= ~_isin_sorted(self._tombstones, self._doc_ids)
        return self._doc_ids[mask]


def _isin_sorted(sorted_ref: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Boolean mask: which `values` are present in `sorted_ref` (both sorted)."""
    if sorted_ref.size == 0 or values.size == 0:
        return np.zeros(values.size, dtype=bool)
    pos = np.searchsorted(sorted_ref, values)
    in_range = pos < sorted_ref.size
    out = np.zeros(values.size, dtype=bool)
    out[in_range] = sorted_ref[pos[in_range]] == values[in_range]
    return out


def _score_segment(
    reader: SegmentReader,
    terms: list[str],
    idfs: dict[str, float],
    avgdl: float,
    mode: str,
    filters: dict[str, str] | None,
    params: BM25Params,
    k: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(docids, scores) of every matching doc in one segment (unsorted)."""
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    present = [t for t in terms if reader.df(t) > 0]
    if mode == "and" and len(present) != len(terms):
        return empty
    if not present:
        return empty

    if mode == "or" and k is not None:
        # block-max pruned scoring (rank-identical to exhaustive; wand.py)
        from datamart_ray.search.wand import pruned_or_scores

        term_chunks = {t: reader.term_chunks(t) for t in present}
        memo = getattr(reader, "_theta_memo", None)
        if memo is None:
            memo = reader._theta_memo = {}
        return pruned_or_scores(
            term_chunks,
            terms,
            idfs,
            avgdl,
            k,
            params,
            reader.doclen_of,
            reader.filter_positions(filters or {}),
            theta_memo=memo,
        )

    allowed = reader.filter_positions(filters or {})

    if mode == "and":
        # rarest-first intersection with chunk skipping: only chunks whose
        # docID range contains a surviving candidate are ever decoded —
        # the frequent terms of a selective conjunction stay compressed.
        tcs = {t: reader.term_chunks(t) for t in present}
        order = sorted(present, key=lambda t: reader.df(t))
        post: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        docids, tf0 = tcs[order[0]].decode_all()
        post[order[0]] = (docids, tf0)
        if allowed is not None:
            docids = docids[_isin_sorted(allowed, docids)]
        for t in order[1:]:
            if docids.size == 0:
                return empty
            tc = tcs[t]
            lo = np.searchsorted(docids, tc.first)
            keep = (lo < docids.size) & (
                docids[np.minimum(lo, docids.size - 1)] <= tc.last
            )
            p_doc, p_tf = tc.decode(keep)
            post[t] = (p_doc, p_tf)
            docids = docids[_isin_sorted(p_doc, docids)]
        if docids.size == 0:
            return empty
        dl = reader.doclen_of(docids)
        scores = np.zeros(docids.size, dtype=np.float64)
        for t in terms:  # pinned accumulation order = query order
            p_doc, p_tf = post[t]
            pos = np.searchsorted(p_doc, docids)
            scores += idfs[t] * bm25_tf_norm(p_tf[pos], dl, avgdl, params)
        return docids, scores

    # mode == "or" (exhaustive fallback; k=None — equivalence tests)
    post = {t: reader.postings(t) for t in present}
    all_docs = np.unique(np.concatenate([post[t][0] for t in present]))
    if allowed is not None:
        all_docs = all_docs[_isin_sorted(allowed, all_docs)]
    if all_docs.size == 0:
        return empty
    dl_all = reader.doclen_of(all_docs)
    scores = np.zeros(all_docs.size, dtype=np.float64)
    for t in terms:  # pinned order
        if t not in post:
            continue
        p_doc, p_tf = post[t]
        keep = _isin_sorted(all_docs, p_doc)
        pos_k = np.searchsorted(all_docs, p_doc[keep])
        scores[pos_k] += idfs[t] * bm25_tf_norm(
            p_tf[keep], dl_all[pos_k], avgdl, params
        )
    hit = scores > 0.0
    return all_docs[hit], scores[hit]


def _prefix_successor(q: str) -> str | None:
    """Smallest string greater than EVERY string with prefix `q` (the
    exclusive upper bound for a sorted-dictionary prefix range). A plain
    ``q + '\\uffff'`` bound drops terms whose next codepoint is
    supplementary-plane (> U+FFFF) and terms exactly equal to the bound;
    instead increment the last incrementable codepoint. None = no upper
    bound (q is all U+10FFFF)."""
    for i in range(len(q) - 1, -1, -1):
        cp = ord(q[i])
        if cp < 0x10FFFF:
            return q[:i] + chr(cp + 1)
    return None


def _phrase_candidate_docs(
    reader: SegmentReader, terms: list[str]
) -> np.ndarray | None:
    """Sorted docIDs containing EVERY phrase term (the doc-level AND) —
    the candidate prefilter for positional matching. Uses the ordinary
    doc postings (term_chunks decode memo, shared with BM25 scoring), so
    the expensive positional decode below only touches docs that can
    possibly match. Intersection runs rarest-term-first so intermediate
    arrays stay near the rarest term's df. None ⇔ some term is absent."""
    by_rarity = sorted(set(terms), key=reader.df)
    cand: np.ndarray | None = None
    for t in by_rarity:
        if reader.df(t) == 0:
            return None
        docs, _ = reader.postings(t)
        cand = docs if cand is None else cand[_isin_sorted(docs, cand)]
        if cand.size == 0:
            return None
    return cand


def _term_position_keys(
    reader: SegmentReader,
    term: str,
    slot: int | None = None,
    docs_filter: np.ndarray | None = None,
) -> np.ndarray | None:
    """uint64 (docID<<32 | position) keys of every occurrence of `term`
    in one segment, sorted ascending; None when the term is absent.
    With `slot` j, keys are shifted by -j after dropping positions < j
    (the exact-phrase alignment trick). With `docs_filter` (sorted
    docIDs), chunks outside the filter's range are skipped undecoded and
    occurrences of other docs are dropped before the sort — so the key
    arrays scale with the CANDIDATE set, not the term's corpus-wide
    occurrence count."""
    if reader.df(term) == 0:
        return None
    tbl = reader.postings_chunks(term)
    if "pos" not in tbl.column_names:
        raise ValueError(
            "phrase_search needs a positional index — rebuild with "
            "IndexConfig(positions=True)"
        )
    first = tbl["first_docid"].to_numpy()
    order = np.argsort(first, kind="stable")
    if docs_filter is not None:
        last = tbl["last_docid"].to_numpy()
        # a chunk can overlap the filter only if some candidate lies in
        # [first, last]: searchsorted(left) < searchsorted(right)
        lo = np.searchsorted(docs_filter, first)
        hi = np.searchsorted(docs_filter, last, side="right")
        order = order[(hi > lo)[order]]
    docs_parts, pos_parts = [], []
    # per-row access materializes ONLY the selected chunks' blobs — a
    # narrow docs_filter (the rescore window probe) must not pay a
    # full-column to_pylist copy of every chunk of a high-df term
    docs_col, tfs_col, pos_col = tbl["docs"], tbl["tfs"], tbl["pos"]
    for i in order:
        ii = int(i)
        docs = codec.decode_docids(docs_col[ii].as_py())
        tfs = codec.unpack_ints(tfs_col[ii].as_py()).astype(np.int64)
        if docs_filter is not None:
            keep = _isin_sorted(docs_filter, docs)
            if not keep.any():
                continue
            pos = codec.decode_grouped_positions(pos_col[ii].as_py(), tfs)
            docs_parts.append(np.repeat(docs[keep], tfs[keep]))
            pos_parts.append(pos[np.repeat(keep, tfs)])
        else:
            pos = codec.decode_grouped_positions(pos_col[ii].as_py(), tfs)
            docs_parts.append(np.repeat(docs, tfs))
            pos_parts.append(pos)
    if not docs_parts:
        return None
    d = np.concatenate(docs_parts)
    p = np.concatenate(pos_parts)
    if d.size == 0:
        return None
    if d.min() < 0 or d.max() >= (1 << 31) or p.max() >= (1 << 32):
        raise ValueError(
            "positional keys need 0 <= docID < 2^31 and position < 2^32 "
            "— remap id_col into a non-negative 31-bit doc space before "
            "building a positional index (negative/oversized ids would "
            "silently wrap in the packed uint64 keys)"
        )
    if slot:
        keep = p >= slot
        d, p = d[keep], p[keep]
    keys = (d.astype(np.uint64) << np.uint64(32)) | p.astype(np.uint64)
    if slot:
        keys = keys - np.uint64(slot)
    if keys.size > 1 and not np.all(keys[1:] > keys[:-1]):
        keys = np.sort(keys)  # interleaved chunk ranges (delta mixes)
    return keys


def _phrase_match_segment(
    reader: SegmentReader,
    terms: list[str],
    cand: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(docids, phrase_tf) of every doc in one segment containing the
    token sequence `terms` consecutively (overlapping occurrences count,
    matching the positional-intersection definition: position i matches
    when term j sits at i+j for all j).

    Requires a positional index (IndexConfig.positions). Works on
    (docID, position) keys packed into uint64 — docID<<32 | pos — so the
    m-way intersection is m-1 sorted searchsorted passes over arrays no
    larger than the rarest term's occurrence count (a doc-level AND
    prefilter keeps common terms' position decodes candidate-bounded).

    ``cand`` overrides the candidate set (sorted absolute docIDs) — the
    rescore window probe, where only a handful of docs need their
    phrase tf and the doc-level AND over full postings would dominate."""
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    if cand is None:
        cand = _phrase_candidate_docs(reader, terms)
    if cand is None or cand.size == 0:
        return empty
    cur: np.ndarray | None = None
    for j, term in enumerate(terms):
        keys = _term_position_keys(reader, term, slot=j, docs_filter=cand)
        if keys is None or keys.size == 0:
            return empty
        if cur is None:
            cur = keys
        else:
            cur = cur[_isin_sorted(keys, cur)]
            if cur.size == 0:
                return empty
    docs = (cur >> np.uint64(32)).astype(np.int64)
    docids, ptf = np.unique(docs, return_counts=True)
    return docids, ptf.astype(np.int64)


def _phrase_slop_match_segment(
    reader: SegmentReader, terms: list[str], slop: int
) -> tuple[np.ndarray, np.ndarray]:
    """Sloppy ordered phrase match: (docids, tf) where tf counts the
    start positions of term[0] from which SOME in-order chain reaches
    every later term with per-step gap ≤ slop+1 (slop=0 degrades to the
    exact consecutive match). Exists-any-chain semantics via a backward
    feasibility sweep: feas(i) = keys of term i with a feasible
    successor of term i+1 in (p, p+slop+1] within the same doc.
    Checking only the SMALLEST feasible key > p is exact — every member
    of the feasible set qualifies equally, so if any lies in the window
    the smallest one does. (A forward greedy walk is NOT exact for 3+
    terms: taking the earliest next occurrence can strand the chain when
    a later occurrence of a middle term would have reached the tail.)

    Pinned deviation from ES: ES slop is a position edit-distance
    (unordered moves allowed); this is the ordered-window variant, which
    has an exact SQL twin."""
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    cand = _phrase_candidate_docs(reader, terms)
    if cand is None or cand.size == 0:
        return empty
    per_term: list[np.ndarray] = []
    for term in terms:
        keys = _term_position_keys(reader, term, docs_filter=cand)
        if keys is None or keys.size == 0:
            return empty
        per_term.append(keys)
    step = np.uint64(1 + slop)
    doc_mask = np.uint64(0xFFFFFFFF00000000)
    feas = per_term[-1]  # feasible keys of the current suffix head
    for keys in per_term[-2::-1]:
        if feas.size == 0:
            return empty
        lo = np.searchsorted(feas, keys + np.uint64(1))
        ok = lo < feas.size
        nxt = feas[np.minimum(lo, feas.size - 1)]
        ok &= (nxt & doc_mask) == (keys & doc_mask)  # same doc
        ok &= nxt <= keys + step  # gap ≤ slop+1
        feas = keys[ok]
    if feas.size == 0:
        return empty
    docs = (feas >> np.uint64(32)).astype(np.int64)
    docids, ptf = np.unique(docs, return_counts=True)
    return docids, ptf.astype(np.int64)


def _phrase_match_memo(
    r: SegmentReader, terms: list[str], slop: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Bounded per-reader memo over the segment phrase match — the
    positional analog of the term_chunks decode memo. Stores the RAW
    (pre-tombstone) match, so later delete_by_query tombstones stay
    correct: callers apply the tombstone filter on every hit. Keyed on
    (token tuple, slop); LRU-evicted at 8 entries (each entry is two
    df-sized int64 arrays). This is what collapses rescore/phrase p50
    for repeated phrases — the position decode + m-way intersection is
    the cost driver and is identical call to call."""
    key = (tuple(terms), slop)
    memo = getattr(r, "_phrase_memo", None)
    if memo is None:
        memo = r._phrase_memo = {}
    hit = memo.pop(key, None)
    if hit is None:
        hit = (
            _phrase_slop_match_segment(r, terms, slop)
            if slop > 0
            else _phrase_match_segment(r, terms)
        )
        while len(memo) >= 8:
            memo.pop(next(iter(memo)))
    memo[key] = hit
    return hit


def _bool_score_segment(
    reader: SegmentReader,
    must: list[str],
    should: list[str],
    must_not: list[str],
    idfs: dict[str, float],
    avgdl: float,
    filters: dict | None,
    params: BM25Params,
    min_should: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """(docids, scores) for one segment under ES ``bool`` semantics:
    candidates contain ALL `must` terms (or, with no must clause, at
    least one `should` term), none of the `must_not` terms, and pass the
    keyword/range filters; the score sums BM25 contributions of every
    must/should term present, accumulation pinned to lexicographic term
    order (the SQL twin's ``sum(c ORDER BY term)``). `min_should` > 0 is
    the ES ``minimum_should_match`` analog: candidates must additionally
    match at least that many DISTINCT `should` terms (counted per term,
    not per occurrence). Pinned deviation from ES: terms are
    deduplicated across clauses (set semantics)."""
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    allowed = reader.filter_positions(filters or {})
    post: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    if must:
        if any(reader.df(t) == 0 for t in must):
            return empty
        # rarest-first intersection with chunk skipping (see
        # _score_segment's AND branch — same shape, candidates only)
        tcs = {t: reader.term_chunks(t) for t in must}
        order = sorted(must, key=reader.df)
        docids, tf0 = tcs[order[0]].decode_all()
        post[order[0]] = (docids, tf0)
        if allowed is not None:
            docids = docids[_isin_sorted(allowed, docids)]
        for t in order[1:]:
            if docids.size == 0:
                return empty
            tc = tcs[t]
            lo = np.searchsorted(docids, tc.first)
            keep = (lo < docids.size) & (
                docids[np.minimum(lo, docids.size - 1)] <= tc.last
            )
            p_doc, p_tf = tc.decode(keep)
            post[t] = (p_doc, p_tf)
            docids = docids[_isin_sorted(p_doc, docids)]
    else:
        for t in should:
            if reader.df(t) > 0:
                post[t] = reader.postings(t)
        if not post:
            return empty
        docids = np.unique(np.concatenate([p[0] for p in post.values()]))
        if allowed is not None:
            docids = docids[_isin_sorted(allowed, docids)]
    for t in must_not:
        if docids.size == 0:
            return empty
        if reader.df(t) == 0:
            continue
        nd, _ = reader.postings(t)
        docids = docids[~_isin_sorted(nd, docids)]
    if docids.size == 0:
        return empty
    if min_should > 0 and should:
        # count DISTINCT matched should-terms per candidate; postings are
        # cached in `post` so the scoring loop below never re-decodes
        counts = np.zeros(docids.size, dtype=np.int64)
        for t in should:
            if reader.df(t) == 0:
                continue
            p = post.get(t)
            if p is None:
                p = reader.postings(t)
                post[t] = p
            counts += _isin_sorted(p[0], docids)
        docids = docids[counts >= min_should]
        if docids.size == 0:
            return empty
    dl = reader.doclen_of(docids)
    scores = np.zeros(docids.size, dtype=np.float64)
    for t in sorted(set(must) | set(should)):
        if reader.df(t) == 0:
            continue
        p_doc, p_tf = post.get(t) or reader.postings(t)
        keep = _isin_sorted(docids, p_doc)
        pos = np.searchsorted(docids, p_doc[keep])
        scores[pos] += idfs[t] * bm25_tf_norm(
            p_tf[keep].astype(np.float64), dl[pos], avgdl, params
        )
    return docids, scores


def _segment_prefix_terms(reader: SegmentReader, prefix: str) -> list[str]:
    """Dictionary terms of one segment starting with `prefix`, via the
    sorted-dictionary binary-search range (O(log vocab), no scan)."""
    ub = _prefix_successor(prefix)
    v = reader._dict_terms
    lo = int(np.searchsorted(v, prefix))
    hi = v.size if ub is None else int(np.searchsorted(v, ub))
    return [str(t) for t in v[lo:hi]]


def _wildcard_parts(pattern: str) -> tuple[str, str]:
    """(literal_prefix, like_pattern) for an ES ``wildcard`` pattern.
    ``*`` = any run, ``?`` = one char. Analyzer terms are ``[a-z0-9]+``
    runs, so the SQL-LIKE translation needs no escaping; any other
    character in the pattern is rejected (it can never match a term)."""
    if not re.fullmatch(r"[a-z0-9*?]+", pattern):
        raise ValueError(
            f"wildcard pattern {pattern!r} must be [a-z0-9*?]+"
        )
    lit = re.split(r"[*?]", pattern, maxsplit=1)[0]
    like = pattern.replace("*", "%").replace("?", "_")
    return lit, like


def _segment_wildcard_terms(reader: SegmentReader, pattern: str) -> list[str]:
    """Dictionary terms of one segment matching an ES ``wildcard``
    pattern. The longest literal prefix bounds a binary-search range over
    the sorted dictionary (O(log vocab) + range size); the residual
    pattern match runs as one vectorized Arrow ``match_like`` kernel over
    that slice. A leading-wildcard pattern degrades to a full-dictionary
    kernel scan — the same cost ES pays (its docs warn identically)."""
    lit, like = _wildcard_parts(pattern.lower())
    v = reader._dict_terms
    if lit == pattern:  # no wildcards → exact term membership probe
        return [pattern] if reader.df(pattern) > 0 else []
    ub = _prefix_successor(lit) if lit else None
    lo = int(np.searchsorted(v, lit)) if lit else 0
    hi = v.size if ub is None else int(np.searchsorted(v, ub))
    if lo >= hi:
        return []
    sl = pa.array(v[lo:hi], type=pa.string())
    mask = pc.match_like(sl, like).to_numpy(zero_copy_only=False)
    return [str(t) for t in v[lo:hi][mask]]


_REGEX_METACHARS = set(".*+?()[]{}|\\^$")


def _regex_literal_prefix(pattern: str) -> str:
    """Longest prefix every match of `pattern` is guaranteed to start
    with. A top-level alternation voids any guarantee (either branch may
    match), and a quantifier makes its preceding char optional — both
    conservatively shrink the prefix to keep the dictionary-range bound
    sound."""
    depth = 0
    in_cls = False
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\":
            i += 2
            continue
        if in_cls:
            if c == "]":
                in_cls = False
        elif c == "[":
            in_cls = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "|" and depth == 0:
            return ""
        i += 1
    lit: list[str] = []
    for ch in pattern:
        if ch in _REGEX_METACHARS:
            if ch in "*?{" and lit:
                lit.pop()
            break
        lit.append(ch)
    return "".join(lit)


def _segment_regexp_terms(reader: SegmentReader, pattern: str) -> list[str]:
    """Dictionary terms of one segment fully matching an ES ``regexp``
    query pattern (RE2 syntax, anchored at both ends as ES does). The
    leading literal run of the pattern bounds a binary-search range over
    the sorted dictionary; the match itself is one vectorized RE2 kernel
    over that slice. Patterns starting with a metacharacter degrade to a
    full-dictionary kernel scan (the cost ES's docs warn about)."""
    lit = _regex_literal_prefix(pattern)
    v = reader._dict_terms
    ub = _prefix_successor(lit) if lit else None
    lo = int(np.searchsorted(v, lit)) if lit else 0
    hi = v.size if ub is None else int(np.searchsorted(v, ub))
    if lo >= hi:
        return []
    sl = pa.array(v[lo:hi], type=pa.string())
    mask = pc.match_substring_regex(
        sl, f"^(?:{pattern})$"
    ).to_numpy(zero_copy_only=False)
    return [str(t) for t in v[lo:hi][mask]]


def _lev_leq_matrix(qb: np.ndarray, m: np.ndarray, k: int) -> np.ndarray:
    """Boolean mask of byte-matrix rows within `k` Levenshtein edits of
    the query bytes `qb` — the textbook DP with the CANDIDATE axis
    vectorized (one (n, Lc+1) distance row per query character). The
    insertion term's in-row left-to-right dependency
    (cur[j] = min(pre[j], cur[j-1]+1)) unrolls to a running minimum:
    cur[j] = min over j'≤j of pre[j'] + (j-j'), computed as
    (pre - j).cummin + j. Exact for any k — replaces the per-term
    Python DP that dominated suggest/fuzzy(max_edits≥2) latency."""
    n, Lc = m.shape
    if n == 0:
        return np.zeros(0, dtype=bool)
    steps = np.arange(Lc + 1, dtype=np.int32)
    prev = np.broadcast_to(steps, (n, Lc + 1)).astype(np.int32).copy()
    for i in range(1, qb.size + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        np.minimum(
            prev[:, :-1] + (m != qb[i - 1]),
            prev[:, 1:] + 1,
            out=cur[:, 1:],
        )
        cur -= steps
        np.minimum.accumulate(cur, axis=1, out=cur)
        cur += steps
        prev = cur
    return prev[:, -1] <= k


def _segment_fuzzy_terms(
    r: SegmentReader, qterm: str, max_edits: int
) -> set:
    """Dictionary terms of ONE segment within `max_edits` Levenshtein
    edits of `qterm` — the per-reader core shared by the in-process
    engine and the scorer actors (see SearchEngine._fuzzy_candidates'
    docstring for the algorithm and its scale path). ASCII queries run
    the exact vectorized DP (_lev_leq_matrix) over the per-length byte
    matrices; non-ASCII dictionary terms (excluded from those matrices)
    and non-ASCII queries take the char-space Python DP over the
    length band."""
    if max_edits == 1:
        try:
            return _segment_fuzzy1_terms(r, qterm)
        except UnicodeEncodeError:
            pass  # non-ASCII query → generic DP path
    from datamart_ray.pipelines.matching import levenshtein

    try:
        qb = np.frombuffer(qterm.encode("ascii"), np.uint8)
    except UnicodeEncodeError:
        vocab = r._dict_terms
        lens = SearchEngine._dict_lens(r)
        band = np.abs(lens - len(qterm)) <= max_edits
        return {
            str(t)
            for t in vocab[band]
            if levenshtein(qterm, t) <= max_edits
        }
    out: set = set()
    for lc in range(
        max(1, len(qterm) - max_edits), len(qterm) + max_edits + 1
    ):
        terms, m = SearchEngine._dict_bylen(r, lc)
        if terms.size:
            out.update(
                str(t) for t in terms[_lev_leq_matrix(qb, m, max_edits)]
            )
    na_terms, na_lens = SearchEngine._dict_nonascii(r)
    if na_terms.size:
        band = np.abs(na_lens - len(qterm)) <= max_edits
        out.update(
            str(t)
            for t in na_terms[band]
            if levenshtein(qterm, str(t)) <= max_edits
        )
    return out


def _segment_fuzzy1_terms(r: SegmentReader, qterm: str) -> set:
    """Vectorized edit-distance-≤1 expansion over one segment's
    dictionary: ≤1 substitution at equal byte length, or a single
    insert/delete ⇔ longest-common-prefix + longest-common-suffix
    covering the shorter string; non-ASCII dictionary terms get a DP
    pass over the ±1 char-length band."""
    from datamart_ray.pipelines.matching import levenshtein

    qb = np.frombuffer(qterm.encode("ascii"), np.uint8)
    L = qb.size
    out: set = set()
    # non-ASCII terms never enter the byte matrices below, but a
    # single CHARACTER substitution/insert/delete can still relate
    # them to an ASCII query — DP over the ±1 char-length band
    na_terms, na_lens = SearchEngine._dict_nonascii(r)
    if na_terms.size:
        band = np.abs(na_lens - L) <= 1
        out.update(
            str(t)
            for t in na_terms[band]
            if levenshtein(qterm, str(t)) <= 1
        )
    # equal length: ≤1 substitution
    terms, m = SearchEngine._dict_bylen(r, L)
    if terms.size:
        out.update(str(t) for t in terms[(m != qb).sum(axis=1) <= 1])
    # candidate one longer: one char deleted from it yields q
    terms, m = SearchEngine._dict_bylen(r, L + 1)
    if terms.size:
        mask = SearchEngine._prefix_suffix_cover(
            m[:, :L] == qb, m[:, 1:] == qb, L
        )
        out.update(str(t) for t in terms[mask])
    # candidate one shorter: one char inserted into it yields q
    if L >= 2:
        terms, m = SearchEngine._dict_bylen(r, L - 1)
        if terms.size:
            mask = SearchEngine._prefix_suffix_cover(
                m == qb[: L - 1], m == qb[1:], L - 1
            )
            out.update(str(t) for t in terms[mask])
    return out


def _phrase_prefix_match_segment(
    reader: SegmentReader, exact: list[str], prefix: str
) -> tuple[np.ndarray, np.ndarray]:
    """(docids, tf) of docs where the `exact` tokens appear consecutively
    immediately followed by ANY dictionary term starting with `prefix` —
    the ES ``match_phrase_prefix`` analog. tf counts matching start
    positions (overlapping occurrences count). Pinned deviation from ES:
    the prefix expands over the ENTIRE dictionary range (ES caps at
    ``max_expansions=50`` in index order). With no exact tokens this
    degrades to positional prefix matching (tf = total occurrences of
    all expansions). Expansion decodes are bounded by the exact-term
    candidate set via the docs_filter chunk skip."""
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    expansions = _segment_prefix_terms(reader, prefix)
    if not expansions:
        return empty
    cand: np.ndarray | None = None
    if exact:
        cand = _phrase_candidate_docs(reader, exact)
        if cand is None or cand.size == 0:
            return empty
    # candidates must also contain ≥1 expansion term
    exp_parts = []
    for t in expansions:
        docs, _ = reader.postings(t)
        exp_parts.append(
            docs if cand is None else docs[_isin_sorted(cand, docs)]
        )
    exp_docs = (
        np.unique(np.concatenate(exp_parts)) if exp_parts else
        np.empty(0, dtype=np.int64)
    )
    if exp_docs.size == 0:
        return empty
    cand = exp_docs  # ⊆ exact-candidates already
    m = len(exact) + 1
    cur: np.ndarray | None = None
    for j, term in enumerate(exact):
        keys = _term_position_keys(reader, term, slot=j, docs_filter=cand)
        if keys is None or keys.size == 0:
            return empty
        cur = keys if cur is None else cur[_isin_sorted(keys, cur)]
        if cur is not None and cur.size == 0:
            return empty
    last_parts = []
    for t in expansions:
        keys = _term_position_keys(
            reader, t, slot=m - 1, docs_filter=cand
        )
        if keys is not None and keys.size:
            last_parts.append(keys)
    if not last_parts:
        return empty
    last = (
        np.sort(np.concatenate(last_parts))
        if len(last_parts) > 1
        else last_parts[0]
    )  # disjoint across terms (one term per position) — no dedupe needed
    cur = last if cur is None else cur[_isin_sorted(last, cur)]
    if cur.size == 0:
        return empty
    docs = (cur >> np.uint64(32)).astype(np.int64)
    docids, ptf = np.unique(docs, return_counts=True)
    return docids, ptf.astype(np.int64)


def _span_near_match_segment(
    reader: SegmentReader, term_a: str, term_b: str, slop: int
) -> tuple[np.ndarray, np.ndarray]:
    """(docids, pair_tf) of every doc where `term_a` and `term_b`
    co-occur within `slop` intervening tokens, UNORDERED — the ES
    ``span_near`` (in_order=false) analog over two single-term clauses
    (reference ranks via ES; span scoring is ES-internal). Pinned
    semantics: pair_tf counts position pairs with |pa − pb| ≤ slop+1,
    a deterministic proximity count that an exhaustive SQL twin can
    reproduce exactly (ES's sloppy-freq weighting is replaced by the
    raw pair count — documented deviation).

    Vectorized: both terms' packed (docID<<32|pos) key arrays are
    bounded by the doc-level AND candidate set, then ONE searchsorted
    range-count per occurrence of the rarer term; per-doc pair sums via
    reduceat over the already-sorted doc runs."""
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    cand = _phrase_candidate_docs(reader, [term_a, term_b])
    if cand is None or cand.size == 0:
        return empty
    ka = _term_position_keys(reader, term_a, docs_filter=cand)
    kb = _term_position_keys(reader, term_b, docs_filter=cand)
    if ka is None or kb is None or ka.size == 0 or kb.size == 0:
        return empty
    if kb.size < ka.size:  # pair count is symmetric — scan the rarer side
        ka, kb = kb, ka
    w = np.uint64(slop + 1)
    pos_mask = np.uint64(0xFFFFFFFF)
    pos_a = ka & pos_mask
    # window clamped to the doc's position space so keys never bleed
    # across the packed docID boundary
    lo = ka - np.minimum(pos_a, w)
    hi = ka + np.minimum(pos_mask - pos_a, w)
    cnt = np.searchsorted(kb, hi, side="right") - np.searchsorted(
        kb, lo, side="left"
    )
    keep = cnt > 0
    if not keep.any():
        return empty
    docs = (ka[keep] >> np.uint64(32)).astype(np.int64)
    cnt = cnt[keep]
    docids, starts = np.unique(docs, return_index=True)
    ptf = np.add.reduceat(cnt, starts).astype(np.int64)
    return docids, ptf


def _combine_rescore(
    base: pa.Table, ph: pa.Table, qw: float, rw: float, k: int
) -> pa.Table:
    """Rescore combine (mode ``total``): final = qw × base + rw ×
    phrase score for docs in the base window; docs outside the window
    are never promoted. Shared by the in-process and distributed
    engines — given identical base/phrase inputs the outputs are
    identical."""
    d = base["doc_id"].to_numpy()
    s = base["score"].to_numpy(zero_copy_only=False).astype(np.float64)
    if d.size:
        pd_ids = ph["doc_id"].to_numpy()
        pd_scores = ph["score"].to_numpy(zero_copy_only=False)
        bonus = np.zeros(d.size, dtype=np.float64)
        if pd_ids.size:
            order = np.argsort(pd_ids)
            pd_ids, pd_scores = pd_ids[order], pd_scores[order]
            pos_c = np.clip(
                np.searchsorted(pd_ids, d), 0, pd_ids.size - 1
            )
            hit = pd_ids[pos_c] == d
            bonus = np.where(hit, pd_scores[pos_c], 0.0)
        s = qw * s + rw * bonus
        d, s = topk_select(d, s, k)
    return pa.table(
        {
            "doc_id": pa.array(d, type=pa.int64()),
            "score": pa.array(s, type=pa.float64()),
        }
    )


def _collect_matches_with_meta_cols(
    readers: list,
    terms: list[str],
    idfs: dict[str, float],
    avgdl: float,
    cols: tuple,
    mode: str,
    filters: dict | None,
    params: BM25Params,
) -> tuple[np.ndarray, np.ndarray, list[pa.Array]]:
    """(doc_ids, scores, [col_values...]) of EVERY doc matching the
    terms across `readers` — the shared full-match collector behind the
    top_hits / collapse / percentiles / stats / histogram aggregations,
    both in-process (all segments) and per scorer actor (its packed
    segments, with driver-supplied global idfs)."""
    d_parts: list[np.ndarray] = []
    s_parts: list[np.ndarray] = []
    v_parts: list[list[pa.Array]] = [[] for _ in cols]
    if terms:
        for r in readers:
            d, s = _score_segment(
                r, terms, idfs, avgdl, mode, filters, params
            )
            if not d.size:
                continue
            pos = pa.array(np.searchsorted(r._doc_ids, d))
            for j, col in enumerate(cols):
                if col not in r._meta.column_names:
                    raise KeyError(
                        f"no docmeta column {col!r} loaded — include it "
                        "in SearchEngine(filter_cols=...) (and in "
                        "IndexConfig.meta_cols at build time)"
                    )
                vals = r._meta[col].take(pos).combine_chunks()
                v_parts[j].append(
                    vals.chunk(0)
                    if isinstance(vals, pa.ChunkedArray)
                    else vals
                )
            d_parts.append(d)
            s_parts.append(s)
    if not d_parts:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.float64),
            [pa.array([], type=pa.string()) for _ in cols],
        )
    return (
        np.concatenate(d_parts),
        np.concatenate(s_parts),
        [pa.concat_arrays(p) for p in v_parts],
    )


def _collect_matches_with_meta(
    readers: list,
    terms: list[str],
    idfs: dict[str, float],
    avgdl: float,
    col: str,
    mode: str,
    filters: dict | None,
    params: BM25Params,
) -> tuple[np.ndarray, np.ndarray, pa.Array]:
    """Single-column convenience wrapper over
    _collect_matches_with_meta_cols."""
    d, s, vs = _collect_matches_with_meta_cols(
        readers, terms, idfs, avgdl, (col,), mode, filters, params
    )
    return d, s, vs[0]


def _empty_hits_table(col: str, val_type: pa.DataType) -> pa.Table:
    return pa.table(
        {
            col: pa.array([], type=val_type),
            "doc_id": pa.array([], type=pa.int64()),
            "score": pa.array([], type=pa.float64()),
        }
    )


def _grouped_head(tbl: pa.Table, col: str, per_group: int) -> pa.Table:
    """Top `per_group` rows per `col` value of a (col, doc_id, score)
    table: ONE Arrow multi-key sort + a vectorized rank filter. Group
    boundaries via dictionary codes so NULL keys (NaN through numpy)
    form one missing bucket. Output sorted (col asc nulls-last, score
    desc, doc_id asc)."""
    idx = pc.sort_indices(
        tbl,
        sort_keys=[
            (col, "ascending"),
            ("score", "descending"),
            ("doc_id", "ascending"),
        ],
        null_placement="at_end",
    )
    tbl = tbl.take(idx)
    enc = pc.dictionary_encode(tbl[col].combine_chunks())
    codes = pc.fill_null(
        pc.cast(enc.indices, pa.int64()), -1
    ).to_numpy(zero_copy_only=False)
    n = codes.size
    new_grp = np.ones(n, dtype=bool)
    if n > 1:
        new_grp[1:] = codes[1:] != codes[:-1]
    starts = np.flatnonzero(new_grp)
    grp_id = np.cumsum(new_grp) - 1
    rank = np.arange(n) - starts[grp_id]
    return tbl.filter(pa.array(rank < per_group))


def _alias_union(index_dir) -> tuple[dict, "Analyzer", list[str]]:
    """(primary manifest, analyzer, union of active segment dirs) for a
    single index dir or an alias LIST — shared by the in-process and
    distributed engine constructors. Enforces the alias contract:
    identical committed config, and docID-disjoint members."""
    dirs = [index_dir] if isinstance(index_dir, str) else list(index_dir)
    manifests = []
    for d in dirs:
        with open(os.path.join(d, INDEX_MANIFEST_NAME)) as f:
            manifests.append(json.load(f))
    cfg0 = manifests[0]["config"]
    for m, d in zip(manifests[1:], dirs[1:]):
        if m["config"] != cfg0:
            raise ValueError(
                f"aliased index {d} has a different analyzer/config"
            )
    seg_dirs = [s for d in dirs for s in active_segments(d)]
    if not seg_dirs:
        raise ValueError(f"no committed segments under {dirs}")
    if len(dirs) > 1:
        _check_alias_docid_ranges(dirs)
    return manifests[0], IndexConfig.analyzer_from_json(cfg0), seg_dirs


def _check_alias_docid_ranges(dirs: list[str]) -> None:
    """Aliased indices must carry disjoint docIDs — overlapping ids
    would silently inflate N/df and return duplicate hits with split
    scores (build_index refuses intra-index collisions; the alias path
    must too). Checked via footer-only min/max docID statistics per
    index (O(segments) metadata reads, no id materialization). The
    enforced contract is disjoint RANGES, which the id-assignment
    lifecycle (dense build ids, delta appends past max) guarantees."""
    ranges = []
    for d in dirs:
        lo: int | None = None
        hi: int | None = None
        for seg in active_segments(d):
            meta_dir = os.path.join(seg, "docmeta")
            for fn in sorted(os.listdir(meta_dir)):
                pf = pq.ParquetFile(os.path.join(meta_dir, fn))
                ci = pf.schema_arrow.names.index("doc_id")
                md = pf.metadata
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ci).statistics
                    if st is None or not st.has_min_max:
                        continue
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
        ranges.append((lo if lo is not None else 0, hi or 0, d))
    ranges.sort()
    for (_, ha, da), (lb, _, db) in zip(ranges, ranges[1:]):
        if lb <= ha:
            raise ValueError(
                f"aliased indices {da!r} and {db!r} have overlapping "
                "docID ranges — alias members must be docID-disjoint"
            )


class SearchEngine:
    """In-process engine over all committed segments of an index dir.

    ``index_dir`` may be a LIST of index dirs (the ES index-alias
    analog): the engine reads the union of their active segments and
    computes global stats (N, Σdl, df) across all of them, so ranking
    is identical to one combined index. All aliased indices must share
    the analyzer config and be docID-disjoint (both checked at init —
    see _alias_union)."""

    def __init__(
        self,
        index_dir: str | list[str],
        params: BM25Params = BM25Params(),
        filter_cols: tuple = ("lang", "repo"),
        lazy: bool | str = "auto",
        warm_terms: int = 0,
    ):
        # Opening races with a concurrent compaction's swap: index.json
        # is re-pointed BEFORE the superseded dirs are deleted, so a
        # listing taken just before the repoint can name a dir deleted
        # just after. A vanished dir means a newer committed view exists
        # — re-list and reopen (bounded; each retry observes a strictly
        # newer manifest).
        from datamart_ray.index.manifest import current_index_version

        ver_consistent = True
        for attempt in range(5):
            try:
                self.manifest, self.analyzer, seg_dirs = _alias_union(
                    index_dir
                )
                self.readers = [
                    SegmentReader(
                        d, filter_cols, lazy=_resolve_lazy(d, lazy)
                    )
                    for d in seg_dirs
                ]
                # _alias_union's manifest load and active_segments'
                # index.json re-read are two reads: a mutation
                # committing between them can leave self.manifest one
                # version behind the segment list the readers serve.
                # Re-check and retry; on persistent churn fall through
                # with the version marked inconsistent (the phrase-df
                # sidecar is then disabled rather than poisoned).
                if isinstance(index_dir, str):
                    ver_consistent = current_index_version(
                        index_dir
                    ) == int(self.manifest.get("version", 0))
                    if not ver_consistent and attempt < 4:
                        continue
                break
            except FileNotFoundError:
                if attempt == 4:
                    raise
        self.params = params
        self.n_docs = sum(r.n_docs for r in self.readers)
        self.total_doclen = sum(r.total_doclen for r in self.readers)
        self.avgdl = (
            self.total_doclen / self.n_docs if self.n_docs else 0.0
        )
        # per-phrase df sidecar (rescore cold tail): single-dir indexes
        # only, keyed by the index version so every committed mutation
        # (delete/delta/compact bumps it) invalidates the cache. The
        # version comes from THE SAME index.json load as the segment
        # list (self.manifest) — a separate read could race a
        # concurrent commit and key dfs computed on a newer view under
        # an older version, poisoning other handles at that version
        self._phrase_df_dir = (
            index_dir
            if isinstance(index_dir, str) and ver_consistent
            else None
        )
        self._phrase_df_version = (
            int(self.manifest.get("version", 0))
            if self._phrase_df_dir
            else -1
        )
        if warm_terms:
            self.warm(warm_terms)

    def warm(self, n_terms: int) -> int:
        """Preload (and memo-decode) the n highest-df terms per segment —
        head terms dominate query-cost tails, so warming them moves the
        first-touch IO+decode out of the serving path. Returns the number
        of (segment, term) pairs warmed."""
        warmed = 0
        for r in self.readers:
            order = np.argsort(r._dict_dfs)[::-1][:n_terms]
            for t in r._dict_terms[order]:
                r.term_chunks(str(t)).decode_all()
                warmed += 1
        return warmed

    def df(self, term: str) -> int:
        return sum(r.df(term) for r in self.readers)

    def search(
        self,
        query: str,
        k: int = TOP_K_SIZE,
        mode: str = "and",
        filters: dict[str, str] | None = None,
        search_after: tuple[float, int] | None = None,
    ) -> pa.Table:
        """BM25 top-k. `search_after` = an ES-style pagination cursor
        ``(score, doc_id)`` — returns the k results strictly AFTER that
        point in the (score desc, doc_id asc) total order, i.e. the next
        page when passed the last row of the previous one. The total
        order is strict (doc_id breaks ties), so cursor pages equal
        OFFSET pages exactly; cursor floats come from a prior engine
        result, so the equality comparison is exact. With a cursor the
        OR path scores exhaustively — block-max pruning keeps only each
        segment's top k, which may exclude deeper pages."""
        terms = list(dict.fromkeys(self.analyzer.tokenize(query)))
        out_ids = np.empty(0, dtype=np.int64)
        out_scores = np.empty(0, dtype=np.float64)
        if terms:
            idfs = {
                t: bm25_idf(self.df(t), self.n_docs, self.params)
                for t in terms
            }
            parts_d, parts_s = [], []
            for r in self.readers:
                d, s = _score_segment(
                    r, terms, idfs, self.avgdl, mode, filters, self.params,
                    k=None if search_after is not None else k,
                )
                if search_after is not None and d.size:
                    c_s, c_d = search_after
                    keep = (s < c_s) | ((s == c_s) & (d > c_d))
                    d, s = d[keep], s[keep]
                if d.size:
                    dk, sk = topk_select(d, s, k)
                    parts_d.append(dk)
                    parts_s.append(sk)
            if parts_d:
                out_ids, out_scores = topk_select(
                    np.concatenate(parts_d), np.concatenate(parts_s), k
                )
        return pa.table(
            {
                "doc_id": pa.array(out_ids, type=pa.int64()),
                "score": pa.array(out_scores, type=pa.float64()),
            }
        )

    def bool_search(
        self,
        must: str = "",
        should: str = "",
        must_not: str = "",
        k: int = TOP_K_SIZE,
        filters: dict | None = None,
        minimum_should_match: int = 0,
    ) -> pa.Table:
        """ES ``bool`` query analog: docs matching every `must` token
        (or ≥1 `should` token when no must clause), excluding docs with
        any `must_not` token; score = BM25 sum over the present
        must/should terms (see _bool_score_segment for the pinned
        semantics). `filters` passes keyword equality and numeric
        ``(lo, hi)`` range filters through to docmeta.
        `minimum_should_match` > 0 additionally requires that many
        distinct `should` tokens per candidate (the ES knob)."""
        must_t = list(dict.fromkeys(self.analyzer.tokenize(must)))
        should_t = [
            t
            for t in dict.fromkeys(self.analyzer.tokenize(should))
            if t not in must_t
        ]
        not_t = list(dict.fromkeys(self.analyzer.tokenize(must_not)))
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64()),
            }
        )
        score_terms = sorted(set(must_t) | set(should_t))
        if not score_terms:
            return empty
        idfs = {
            t: bm25_idf(self.df(t), self.n_docs, self.params)
            for t in score_terms
        }
        parts_d, parts_s = [], []
        for r in self.readers:
            d, s = _bool_score_segment(
                r, must_t, should_t, not_t, idfs, self.avgdl, filters,
                self.params, min_should=minimum_should_match,
            )
            if d.size:
                dk, sk = topk_select(d, s, k)
                parts_d.append(dk)
                parts_s.append(sk)
        if not parts_d:
            return empty
        out_ids, out_scores = topk_select(
            np.concatenate(parts_d), np.concatenate(parts_s), k
        )
        return pa.table(
            {
                "doc_id": pa.array(out_ids, type=pa.int64()),
                "score": pa.array(out_scores, type=pa.float64()),
            }
        )

    def _fuzzy_candidates(self, qterm: str, max_edits: int) -> set:
        """Dictionary terms within `max_edits` Levenshtein edits of
        `qterm`, unioned over segments. For the common max_edits=1 /
        ASCII case a fully vectorized byte-matrix path runs (edit
        distance 1 ⇔ ≤1 substitution at equal length, or a single
        insert/delete ⇔ longest-common-prefix + longest-common-suffix
        covering the shorter string); otherwise a vectorized length-band
        prefilter + Levenshtein DP. At giant vocab sizes the scale path
        is a SymSpell-style deletion index per segment (precomputed next
        to terms.parquet) — the per-query scan here is O(vocab in the
        ±max_edits length band)."""
        out: set = set()
        for r in self.readers:
            out.update(_segment_fuzzy_terms(r, qterm, max_edits))
        return out

    @staticmethod
    def _dict_lens(r: SegmentReader) -> np.ndarray:
        lens = getattr(r, "_dict_lens_arr", None)
        if lens is None:
            lens = np.fromiter(
                (len(t) for t in r._dict_terms),
                dtype=np.int64,
                count=r._dict_terms.size,
            )
            r._dict_lens_arr = lens
        return lens

    @staticmethod
    def _dict_bylen(r: SegmentReader, length: int):
        """(terms, uint8 byte matrix) of this segment's dictionary terms
        with exactly `length` ASCII bytes — built lazily per length and
        cached on the reader. Non-ASCII terms are excluded here; the
        caller covers them with a separate DP pass over
        :meth:`_dict_nonascii` (a single character substitution CAN relate
        a non-ASCII term to an ASCII query)."""
        cache = getattr(r, "_dict_bylen_cache", None)
        if cache is None:
            cache = {}
            r._dict_bylen_cache = cache
        if length not in cache:
            lens = SearchEngine._dict_lens(r)
            terms = r._dict_terms[lens == length]
            try:
                m = (
                    np.array([t.encode("ascii") for t in terms])
                    .view(np.uint8)
                    .reshape(-1, length)
                    if terms.size
                    else np.empty((0, length), dtype=np.uint8)
                )
            except UnicodeEncodeError:
                keep, rows = [], []
                for t in terms:
                    try:
                        rows.append(
                            np.frombuffer(t.encode("ascii"), np.uint8)
                        )
                        keep.append(t)
                    except UnicodeEncodeError:
                        continue
                terms = np.array(keep, dtype=object)
                m = (
                    np.stack(rows)
                    if rows
                    else np.empty((0, length), dtype=np.uint8)
                )
            cache[length] = (terms, m)
        return cache[length]

    @staticmethod
    def _prefix_suffix_cover(eq_pref: np.ndarray, eq_suf: np.ndarray, need: int):
        """Rows where longest all-True prefix of eq_pref plus longest
        all-True suffix of eq_suf spans `need` — the vectorized single
        insert/delete test."""
        if eq_pref.shape[0] == 0:
            return np.zeros(0, dtype=bool)
        p = (~eq_pref).argmax(1)
        p[eq_pref.all(1)] = eq_pref.shape[1]
        rev = eq_suf[:, ::-1]
        s = (~rev).argmax(1)
        s[rev.all(1)] = rev.shape[1]
        return p + s >= need

    @staticmethod
    def _dict_nonascii(r: SegmentReader):
        """(terms, char lengths) of this segment's NON-ASCII dictionary
        terms, cached on the reader — the fuzzy fast path's byte matrices
        exclude them, but a non-ASCII term CAN be within one character
        edit of an ASCII query (single substitution, e.g. café ~ cafe),
        so they get a separate DP check over the ±1 length band."""
        cached = getattr(r, "_dict_nonascii_cache", None)
        if cached is None:
            mask = np.fromiter(
                (not str(t).isascii() for t in r._dict_terms),
                dtype=bool,
                count=r._dict_terms.size,
            )
            terms = r._dict_terms[mask]
            lens = SearchEngine._dict_lens(r)[mask]
            cached = (terms, lens)
            r._dict_nonascii_cache = cached
        return cached

    def fuzzy_search(
        self,
        query: str,
        k: int = TOP_K_SIZE,
        max_edits: int = 1,
        filters: dict[str, str] | None = None,
    ) -> pa.Table:
        """Fuzzy term matching (the ES ``fuzziness`` analog): each query
        token expands to every dictionary term within `max_edits`
        Levenshtein edits; the union of expansions is scored as an OR
        query, each expanded term with its own df/idf, accumulation
        pinned to lexicographic term order (the SQL twin's
        ``ORDER BY term``). A term near two query tokens contributes
        once (set union) — a pinned deviation from ES's per-clause
        scoring, documented in the twin."""
        qterms = list(dict.fromkeys(self.analyzer.tokenize(query)))
        expanded = sorted(
            {c for q in qterms for c in self._fuzzy_candidates(q, max_edits)}
        )
        return self._score_expanded(expanded, k, filters)

    def prefix_search(
        self,
        query: str,
        k: int = TOP_K_SIZE,
        filters: dict[str, str] | None = None,
    ) -> pa.Table:
        """Prefix matching (the ES ``prefix``/``match_phrase_prefix`` leaf
        analog): every query token is treated as a term prefix and
        expanded via binary search over the sorted per-segment term
        dictionaries — O(log vocab) per segment, no scan. The expansion
        union is scored exactly like :meth:`fuzzy_search`."""
        qterms = list(dict.fromkeys(self.analyzer.tokenize(query)))
        expanded: set = set()
        for q in qterms:
            for r in self.readers:
                expanded.update(_segment_prefix_terms(r, q))
        return self._score_expanded(sorted(expanded), k, filters)

    def wildcard_search(
        self,
        pattern: str,
        k: int = TOP_K_SIZE,
        filters: dict[str, str] | None = None,
    ) -> pa.Table:
        """Wildcard term matching (the ES ``wildcard`` query analog):
        the pattern (``*`` = any run, ``?`` = one char, applied to the
        lowercased un-analyzed pattern, as ES does) expands over each
        segment's sorted term dictionary — literal-prefix binary-search
        bound + one vectorized LIKE kernel per segment — and the
        expansion union is scored as an OR query exactly like
        :meth:`prefix_search` / :meth:`fuzzy_search`."""
        expanded: set = set()
        for r in self.readers:
            expanded.update(_segment_wildcard_terms(r, pattern.lower()))
        return self._score_expanded(sorted(expanded), k, filters)

    def regexp_search(
        self,
        pattern: str,
        k: int = TOP_K_SIZE,
        filters: dict[str, str] | None = None,
    ) -> pa.Table:
        """Regexp term matching (the ES ``regexp`` query analog): the
        RE2 pattern — implicitly anchored at both ends, as ES anchors
        it — expands over each segment's sorted term dictionary
        (leading-literal binary-search bound + one vectorized RE2
        kernel) and the expansion union is scored as an OR query exactly
        like :meth:`wildcard_search`."""
        expanded: set = set()
        for r in self.readers:
            expanded.update(_segment_regexp_terms(r, pattern))
        return self._score_expanded(sorted(expanded), k, filters)

    def _score_expanded(
        self,
        expanded: list[str],
        k: int,
        filters: dict[str, str] | None,
    ) -> pa.Table:
        """OR-BM25 over an expansion set, accumulation pinned to the
        (lexicographically sorted) expansion order — shared by fuzzy and
        prefix search; both SQL twins sum ``ORDER BY term``."""
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64()),
            }
        )
        if not expanded:
            return empty
        idfs = {
            t: bm25_idf(self.df(t), self.n_docs, self.params)
            for t in expanded
        }
        parts_d, parts_s = [], []
        for r in self.readers:
            d, s = _score_segment(
                r, expanded, idfs, self.avgdl, "or", filters, self.params,
                k=k,
            )
            if d.size:
                dk, sk = topk_select(d, s, k)
                parts_d.append(dk)
                parts_s.append(sk)
        if not parts_d:
            return empty
        out_ids, out_scores = topk_select(
            np.concatenate(parts_d), np.concatenate(parts_s), k
        )
        return pa.table(
            {
                "doc_id": pa.array(out_ids, type=pa.int64()),
                "score": pa.array(out_scores, type=pa.float64()),
            }
        )

    def phrase_search(
        self, phrase: str, k: int = TOP_K_SIZE, slop: int = 0
    ) -> pa.Table:
        """match_phrase: BM25 top-k over docs containing the query tokens
        CONSECUTIVELY (the ES ``match_phrase`` analog). tf = number of
        phrase start positions (overlapping occurrences count); idf uses
        the phrase df (docs with ≥1 occurrence, global across segments);
        doclen/avgdl as in term scoring. Tie-break (score desc, docID asc).
        ``slop > 0`` switches to the ordered-window match (exists-any
        chain with per-step gap ≤ slop+1 — see
        _phrase_slop_match_segment).

        Phrase matching is exact per segment (no global stats needed), so
        segments match independently and only the matched (docID, tf, dl)
        triples meet for global df + scoring — the same two-phase shape
        the distributed engine uses for term df."""
        terms = self.analyzer.tokenize(phrase)
        if not terms:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "score": pa.array([], type=pa.float64()),
                }
            )
        return self._score_phrase_parts(
            self._phrase_match_parts(terms, slop), k
        )

    def _phrase_match_parts(
        self, terms: list[str], slop: int = 0
    ) -> list[tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Per-segment (docids, match_tf, doclen) triples of the phrase
        match, memoized per reader (_phrase_match_memo) with tombstones
        applied fresh on every call."""
        parts: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        for r in self.readers:
            d, ptf = _phrase_match_memo(r, terms, slop)
            if r._tombstones.size and d.size:
                keep = ~_isin_sorted(r._tombstones, d)
                d, ptf = d[keep], ptf[keep]
            if d.size:
                parts.append((d, ptf, r.doclen_of(d)))
        return parts

    def phrase_prefix_search(self, phrase: str, k: int = TOP_K_SIZE) -> pa.Table:
        """match_phrase_prefix: the leading query tokens must appear
        consecutively, immediately followed by ANY term starting with the
        final token (treated as a prefix). Scoring mirrors
        :meth:`phrase_search` — tf = matching start positions, idf from
        the match df. See _phrase_prefix_match_segment for the pinned
        expansion deviation from ES."""
        terms = self.analyzer.tokenize(phrase)
        if not terms:
            return self._score_phrase_parts([], k)
        exact, prefix = terms[:-1], terms[-1]
        parts: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        for r in self.readers:
            d, ptf = _phrase_prefix_match_segment(r, exact, prefix)
            if r._tombstones.size and d.size:
                keep = ~_isin_sorted(r._tombstones, d)
                d, ptf = d[keep], ptf[keep]
            if d.size:
                parts.append((d, ptf, r.doclen_of(d)))
        return self._score_phrase_parts(parts, k)

    def _score_phrase_parts(
        self,
        parts: list[tuple[np.ndarray, np.ndarray, np.ndarray]],
        k: int | None,
        df_override: int | None = None,
    ) -> pa.Table:
        """Global df → idf → BM25 → top-k over per-segment
        (docids, match_tf, doclen) triples — shared by the exact, slop
        and phrase-prefix match paths. ``k=None`` returns EVERY match
        unranked (the rescore phrase leg, where only window docs are
        probed and a global sort would be wasted) — one body, so
        rescore scores can never drift from phrase_search scores.
        ``df_override`` supplies the GLOBAL phrase df when the parts
        cover only a probe window (the sidecar-cached rescore leg)."""
        if not parts:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "score": pa.array([], type=pa.float64()),
                }
            )
        df = (
            df_override
            if df_override is not None
            else sum(p[0].size for p in parts)
        )
        idf = bm25_idf(df, self.n_docs, self.params)
        all_d = np.concatenate([p[0] for p in parts])
        all_tf = np.concatenate([p[1] for p in parts])
        all_dl = np.concatenate([p[2] for p in parts])
        scores = idf * bm25_tf_norm(
            all_tf.astype(np.float64), all_dl, self.avgdl, self.params
        )
        if k is None:
            out_ids, out_scores = all_d, scores
        else:
            out_ids, out_scores = topk_select(all_d, scores, k)
        return pa.table(
            {
                "doc_id": pa.array(out_ids, type=pa.int64()),
                "score": pa.array(out_scores, type=pa.float64()),
            }
        )

    def facet_counts(
        self,
        query: str,
        col: str,
        mode: str = "and",
        filters: dict[str, str] | None = None,
    ) -> pa.Table:
        """ES terms-aggregation analog: counts of docmeta column `col`
        over EVERY doc matching `query` (not just the top-k) — the
        facet panel next to a result list. Output sorted (n desc, value
        asc). Tombstones and keyword filters apply as in search()."""
        terms = list(dict.fromkeys(self.analyzer.tokenize(query)))
        agg: dict = {}
        if terms:
            idfs = {
                t: bm25_idf(self.df(t), self.n_docs, self.params)
                for t in terms
            }
            for r in self.readers:
                d, _ = _score_segment(
                    r, terms, idfs, self.avgdl, mode, filters, self.params
                )
                if not d.size:
                    continue
                if col not in r._meta.column_names:
                    raise KeyError(f"no facet column {col!r} in docmeta")
                pos = np.searchsorted(r._doc_ids, d)
                vals = r._meta[col].take(pa.array(pos))
                vc = pc.value_counts(vals)
                for item in vc.to_pylist():
                    agg[item["values"]] = (
                        agg.get(item["values"], 0) + item["counts"]
                    )
        # NULL facet values sort after equal-count strings (DuckDB's
        # NULLS-LAST default) — None can't compare against str directly
        items = sorted(
            agg.items(),
            key=lambda kv: (-kv[1], kv[0] is None, kv[0] or ""),
        )
        return pa.table(
            {
                col: pa.array([k for k, _ in items], type=pa.string()),
                "n": pa.array([v for _, v in items], type=pa.int64()),
            }
        )

    def _score_all_with_meta(
        self,
        query: str,
        col: str,
        mode: str,
        filters: dict[str, str] | None,
    ) -> tuple[np.ndarray, np.ndarray, pa.Array]:
        """(doc_ids, scores, col_values) of EVERY doc matching `query`
        — the shared full-match collector behind the top_hits /
        collapse / percentiles / stats / histogram aggregations (same
        scoring path as facet_counts, plus the docmeta column
        gather)."""
        terms = list(dict.fromkeys(self.analyzer.tokenize(query)))
        idfs = {
            t: bm25_idf(self.df(t), self.n_docs, self.params)
            for t in terms
        }
        return _collect_matches_with_meta(
            self.readers, terms, idfs, self.avgdl, col, mode, filters,
            self.params,
        )

    def grouped_top_hits(
        self,
        query: str,
        col: str,
        per_group: int = 3,
        mode: str = "and",
        filters: dict[str, str] | None = None,
    ) -> pa.Table:
        """ES ``top_hits``-aggregation analog: for every value of
        docmeta column `col`, the top `per_group` matching docs by BM25
        (score desc, docID asc within each group). Full-match scoring
        as in facet_counts, then ONE Arrow multi-key sort + a
        vectorized per-group head select — no per-group Python. Output
        sorted (col asc nulls-last, score desc, doc_id asc)."""
        d, s, v = self._score_all_with_meta(query, col, mode, filters)
        if not d.size:
            return _empty_hits_table(col, v.type)
        tbl = pa.table(
            {col: v, "doc_id": pa.array(d), "score": pa.array(s)}
        )
        return _grouped_head(tbl, col, per_group)

    def collapse_search(
        self,
        query: str,
        col: str,
        k: int = TOP_K_SIZE,
        mode: str = "and",
        filters: dict[str, str] | None = None,
    ) -> pa.Table:
        """ES field-collapsing analog (``collapse: {field: col}``): at
        most ONE hit — the best (score desc, docID asc) — per value of
        `col`, then the global top-k over the group winners. Docs with
        a NULL collapse key form one group, as in ES's missing-bucket
        behavior. Output columns (doc_id, col, score), result order
        (score desc, doc_id asc)."""
        winners = self.grouped_top_hits(
            query, col, per_group=1, mode=mode, filters=filters
        )
        d = winners["doc_id"].to_numpy()
        s = winners["score"].to_numpy(zero_copy_only=False)
        od, osc = topk_select(d, s, k)
        # winner set ≤ #distinct groups — reattaching keys is small
        pos = {int(x): i for i, x in enumerate(d)}
        sel = pa.array([pos[int(x)] for x in od], type=pa.int64())
        return pa.table(
            {
                "doc_id": pa.array(od, type=pa.int64()),
                col: winners[col].take(sel).combine_chunks(),
                "score": pa.array(osc, type=pa.float64()),
            }
        )

    def matched_percentiles(
        self,
        query: str,
        col: str,
        pcts: tuple = (0.25, 0.5, 0.75, 0.95, 0.99),
        mode: str = "and",
        filters: dict[str, str] | None = None,
    ) -> pa.Table:
        """ES ``percentiles``-aggregation analog over numeric docmeta
        column `col` of EVERY matching doc. EXACT linear-interpolation
        quantiles (numpy 'linear' == DuckDB quantile_cont), not ES's
        t-digest approximation — pinned deviation: exact is affordable
        because only (doc, value) pairs of MATCHED docs are collected;
        the 100-TB path swaps in a mergeable sketch at the same API."""
        _, _, v = self._score_all_with_meta(query, col, mode, filters)
        vals = np.asarray(
            v.to_numpy(zero_copy_only=False), dtype=np.float64
        )
        vals = vals[~np.isnan(vals)]
        qs = np.asarray(pcts, dtype=np.float64)
        out = (
            np.quantile(vals, qs, method="linear")
            if vals.size
            else np.full(qs.size, np.nan)
        )
        return pa.table(
            {
                "pct": pa.array(qs, type=pa.float64()),
                "value": pa.array(out, type=pa.float64()),
            }
        )

    def matched_extended_stats(
        self,
        query: str,
        col: str,
        mode: str = "and",
        filters: dict[str, str] | None = None,
    ) -> pa.Table:
        """ES ``extended_stats`` aggregation over integer docmeta column
        `col` of every matching doc: n/min/max/sum exact in int64; avg,
        population variance and std derived from the integer sums with
        the pinned formula var = (Σv² − (Σv)²/n)/n — the SQL twin spells
        the same arithmetic, so floats match bit-for-bit."""
        _, _, v = self._score_all_with_meta(query, col, mode, filters)
        arr = v.drop_null()
        n = len(arr)
        if n == 0:
            return pa.table(
                {
                    "n": pa.array([0], type=pa.int64()),
                    "min": pa.array([None], type=pa.int64()),
                    "max": pa.array([None], type=pa.int64()),
                    "sum": pa.array([None], type=pa.int64()),
                    "avg": pa.array([None], type=pa.float64()),
                    "variance": pa.array([None], type=pa.float64()),
                    "std": pa.array([None], type=pa.float64()),
                }
            )
        x = arr.to_numpy(zero_copy_only=False).astype(np.int64)
        s = int(x.sum())
        sq = int((x * x).sum())
        avg = s / n
        var = (sq - (s * s) / n) / n
        return pa.table(
            {
                "n": pa.array([n], type=pa.int64()),
                "min": pa.array([int(x.min())], type=pa.int64()),
                "max": pa.array([int(x.max())], type=pa.int64()),
                "sum": pa.array([s], type=pa.int64()),
                "avg": pa.array([avg], type=pa.float64()),
                "variance": pa.array([var], type=pa.float64()),
                "std": pa.array([float(np.sqrt(var))], type=pa.float64()),
            }
        )

    def matched_histogram(
        self,
        query: str,
        col: str,
        interval: int,
        mode: str = "and",
        filters: dict[str, str] | None = None,
    ) -> pa.Table:
        """ES ``histogram`` aggregation: fixed-`interval` buckets
        (bucket key = floor(v/interval)·interval) over integer docmeta
        column `col` of every matching doc; empty buckets omitted
        (min_doc_count=1). Output (bucket asc, n)."""
        _, _, v = self._score_all_with_meta(query, col, mode, filters)
        x = v.drop_null().to_numpy(zero_copy_only=False).astype(np.int64)
        if not x.size:
            return pa.table(
                {
                    "bucket": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        b = (x // interval) * interval
        keys, counts = np.unique(b, return_counts=True)
        return pa.table(
            {
                "bucket": pa.array(keys, type=pa.int64()),
                "n": pa.array(counts.astype(np.int64), type=pa.int64()),
            }
        )

    def matched_grouped_percentiles(
        self,
        query: str,
        group_col: str,
        val_col: str,
        pcts: tuple = (0.25, 0.5, 0.75, 0.95, 0.99),
        mode: str = "and",
        filters: dict[str, str] | None = None,
    ) -> pa.Table:
        """ES nested aggregation — ``terms`` over `group_col` with a
        ``percentiles`` sub-aggregation over numeric `val_col` — across
        EVERY matching doc. One Arrow sort groups the match set; each
        group's quantiles are exact linear interpolation on the
        contiguous slice (quantile_cont parity, like
        matched_percentiles). Output (group, pct, value) sorted (group
        asc nulls-last, pct asc); NULL group keys form one missing
        bucket, NULL values are dropped."""
        terms = list(dict.fromkeys(self.analyzer.tokenize(query)))
        idfs = {
            t: bm25_idf(self.df(t), self.n_docs, self.params)
            for t in terms
        }
        d, _, (gv, vv) = _collect_matches_with_meta_cols(
            self.readers, terms, idfs, self.avgdl,
            (group_col, val_col), mode, filters, self.params,
        )
        qs = np.asarray(pcts, dtype=np.float64)
        empty = pa.table(
            {
                group_col: pa.array([], type=gv.type),
                "pct": pa.array([], type=pa.float64()),
                "value": pa.array([], type=pa.float64()),
            }
        )
        if not d.size:
            return empty
        tbl = pa.table({group_col: gv, "v": vv}).filter(pc.is_valid(vv))
        if not tbl.num_rows:
            return empty
        idx = pc.sort_indices(
            tbl,
            sort_keys=[(group_col, "ascending"), ("v", "ascending")],
            null_placement="at_end",
        )
        tbl = tbl.take(idx)
        enc = pc.dictionary_encode(tbl[group_col].combine_chunks())
        codes = pc.fill_null(
            pc.cast(enc.indices, pa.int64()), -1
        ).to_numpy(zero_copy_only=False)
        vals = tbl["v"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = codes.size
        new_grp = np.ones(n, dtype=bool)
        if n > 1:
            new_grp[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(new_grp)
        ends = np.append(starts[1:], n)
        gkeys = tbl[group_col].take(pa.array(starts)).to_pylist()
        g_out, p_out, v_out = [], [], []
        for gk, lo, hi in zip(gkeys, starts, ends):
            # slice is pre-sorted — quantile interpolates in place
            q = np.quantile(vals[lo:hi], qs, method="linear")
            g_out.extend([gk] * qs.size)
            p_out.extend(qs.tolist())
            v_out.extend(q.tolist())
        return pa.table(
            {
                group_col: pa.array(g_out, type=gv.type),
                "pct": pa.array(p_out, type=pa.float64()),
                "value": pa.array(v_out, type=pa.float64()),
            }
        )

    def matched_range_agg(
        self,
        query: str,
        col: str,
        edges: tuple,
        mode: str = "and",
        filters: dict[str, str] | None = None,
    ) -> pa.Table:
        """ES ``range`` aggregation over integer docmeta column `col`
        of every matching doc: one half-open bucket [from, to) per
        `edges` entry (None = unbounded, ES's missing from/to), each
        with its doc count and an exact-integer-sum average. Every
        requested range is emitted, empty ones with n=0/avg NULL (ES
        keeps all requested ranges), in the given range order."""
        _, _, v = self._score_all_with_meta(query, col, mode, filters)
        arr = v.drop_null()
        x = (
            arr.to_numpy(zero_copy_only=False).astype(np.int64)
            if len(arr)
            else np.empty(0, dtype=np.int64)
        )
        names, ns, avgs = [], [], []
        for lo, hi in edges:
            m = np.ones(x.size, dtype=bool)
            if lo is not None:
                m &= x >= lo
            if hi is not None:
                m &= x < hi
            sel = x[m]
            names.append(
                f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"
            )
            ns.append(int(sel.size))
            avgs.append(
                int(sel.sum()) / sel.size if sel.size else None
            )
        return pa.table(
            {
                "bucket": pa.array(names, type=pa.string()),
                "n": pa.array(ns, type=pa.int64()),
                "avg": pa.array(avgs, type=pa.float64()),
            }
        )

    def matched_composite(
        self,
        query: str,
        cols: tuple,
        size: int,
        after: tuple | None = None,
        mode: str = "and",
        filters: dict[str, str] | None = None,
    ) -> pa.Table:
        """ES ``composite`` aggregation over two keyword docmeta
        columns: buckets are the distinct (cols[0], cols[1]) pairs of
        the match set ordered ascending by the key tuple; `after` is
        the exclusive after_key cursor and `size` the page size —
        ES's paginate-through-all-buckets contract. Returns
        (col0, col1, n) for one page."""
        terms = list(dict.fromkeys(self.analyzer.tokenize(query)))
        idfs = {
            t: bm25_idf(self.df(t), self.n_docs, self.params)
            for t in terms
        }
        d, _, (a, b) = _collect_matches_with_meta_cols(
            self.readers, terms, idfs, self.avgdl, tuple(cols), mode,
            filters, self.params,
        )
        c0, c1 = cols

        def _meta_type(col: str) -> pa.DataType:
            for r in self.readers:
                if col in r._meta.column_names:
                    return r._meta.schema.field(col).type
            return pa.string()

        if not d.size:
            return pa.table(
                {
                    c0: pa.array([], type=_meta_type(c0)),
                    c1: pa.array([], type=_meta_type(c1)),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        g = (
            pa.table({c0: a, c1: b})
            .group_by([c0, c1])
            .aggregate([([], "count_all")])
            .rename_columns([c0, c1, "n"])
            .sort_by([(c0, "ascending"), (c1, "ascending")])
        )
        if after is not None:
            a0, a1 = after

            # nulls-last TOTAL order (matches the sort and the twin's
            # NULLS LAST): a null key sorts after every non-null, so
            # rows with null keys stay visible past a non-null cursor
            def gt(col, val):
                if val is None:
                    return pa.array(
                        np.zeros(g.num_rows, dtype=bool)
                    )  # nothing sorts after null
                return pc.or_(
                    pc.fill_null(pc.greater(col, val), False),
                    pc.is_null(col),
                )

            def eq(col, val):
                if val is None:
                    return pc.is_null(col)
                return pc.fill_null(pc.equal(col, val), False)

            keep = pc.or_(
                gt(g[c0], a0),
                pc.and_(eq(g[c0], a0), gt(g[c1], a1)),
            )
            g = g.filter(keep)
        g = g.slice(0, size)
        return pa.table(
            {
                c0: g[c0],
                c1: g[c1],
                "n": pc.cast(g["n"], pa.int64()),
            }
        )

    def adjacency_matrix(
        self, named_queries: tuple, mode: str = "and"
    ) -> pa.Table:
        """ES ``adjacency_matrix`` aggregation: one bucket per named
        filter plus one per pairwise intersection (key "A&B", ES's
        default separator), each counting docs matching BOTH queries
        (AND term semantics per filter). Zero-count buckets are
        omitted as in ES; output sorted by bucket key ascending."""
        sets = {
            name: self.match_docs(q, mode) for name, q in named_queries
        }
        names = [n for n, _ in named_queries]
        rows: list[tuple[str, int]] = []
        for n1 in names:
            if sets[n1].size:
                rows.append((n1, int(sets[n1].size)))
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                c = np.intersect1d(
                    sets[names[i]], sets[names[j]], assume_unique=True
                ).size
                if c:
                    rows.append((f"{names[i]}&{names[j]}", int(c)))
        rows.sort()
        return pa.table(
            {
                "bucket": pa.array(
                    [r[0] for r in rows], type=pa.string()
                ),
                "n": pa.array([r[1] for r in rows], type=pa.int64()),
            }
        )

    def matched_weighted_avg(
        self,
        query: str,
        val_col: str,
        mode: str = "and",
        filters: dict[str, str] | None = None,
    ) -> pa.Table:
        """ES ``weighted_avg`` aggregation over every matching doc:
        value = integer docmeta column `val_col`, weight = the doc's
        token length (the index's doclen field). Both are integers, so
        Σ(v·w) and Σw accumulate exactly in int64 and the single final
        division is the only float op — the SQL twin spells the same
        arithmetic."""
        terms = list(dict.fromkeys(self.analyzer.tokenize(query)))
        idfs = {
            t: bm25_idf(self.df(t), self.n_docs, self.params)
            for t in terms
        }
        n = 0
        svw = 0
        sw = 0
        for r in self.readers:
            d, _ = _score_segment(
                r, terms, idfs, self.avgdl, mode, filters, self.params
            )
            if not d.size:
                continue
            pos = np.searchsorted(r._doc_ids, d)
            v = r._meta[val_col].take(pa.array(pos))
            ok = pc.is_valid(v).to_numpy(zero_copy_only=False)
            vv = (
                pc.fill_null(v, 0)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)[ok]
            )
            w = r._doclens[pos].astype(np.int64)[ok]
            n += int(d.size)
            svw += int((vv * w).sum())
            sw += int(w.sum())
        wavg = float(svw) / float(sw) if sw else None
        return pa.table(
            {
                "n": pa.array([n], type=pa.int64()),
                "weighted_avg": pa.array([wavg], type=pa.float64()),
            }
        )

    def scroll_page(
        self,
        query: str,
        page_size: int,
        page: int,
        mode: str = "and",
        filters: dict[str, str] | None = None,
    ) -> pa.Table:
        """ES scroll-API analog: deep page `page` (0-based) of the full
        (score desc, docID asc) ranked match list — the contract scroll
        provides is a stable total order walked in fixed-size chunks.
        Served as top-((page+1)·size) then slice: per-segment heaps
        stay O(page·size), no full materialization."""
        t = self.search(
            query, k=(page + 1) * page_size, mode=mode, filters=filters
        )
        return t.slice(page * page_size, page_size)

    def matrix_stats(self, col: str = "n_chars") -> pa.Table:
        """ES ``matrix_stats`` aggregation analog over the field pair
        (docmeta `col`, doclen) across every live doc: count, means,
        population variances, covariance and Pearson correlation. Each
        segment contributes exact int64 partial sums (n, Σx, Σy, Σx²,
        Σy², Σxy) — O(1) merge traffic per segment, the same shape a
        scorer actor would ship — and the driver derives the float
        moments with the pinned formula var=(Σx²−ΣxΣx/n)/n,
        cov=(Σxy−ΣxΣy/n)/n, which the SQL twin spells identically."""
        n = 0
        sx = sy = sxx = syy = sxy = 0
        for r in self.readers:
            pos_ids = r.filter_positions({})
            if pos_ids is None:
                pos = np.arange(r._doc_ids.size)
            else:
                pos = np.searchsorted(r._doc_ids, pos_ids)
            x = (
                r._meta[col]
                .take(pa.array(pos))
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            y = r._doclens[pos].astype(np.int64)
            n += int(pos.size)
            sx += int(x.sum())
            sy += int(y.sum())
            sxx += int((x * x).sum())
            syy += int((y * y).sum())
            sxy += int((x * y).sum())
        if n == 0:
            return pa.table({"field": pa.array([], type=pa.string())})
        # float-op order mirrors the SQL twin exactly (all doubles)
        mean_x = float(sx) / n
        mean_y = float(sy) / n
        var_x = (float(sxx) - float(sx) * float(sx) / n) / n
        var_y = (float(syy) - float(sy) * float(sy) / n) / n
        cov = (float(sxy) - float(sx) * float(sy) / n) / n
        corr = cov / float(np.sqrt(var_x * var_y))
        return pa.table(
            {
                "field": pa.array([col, "doclen"], type=pa.string()),
                "n": pa.array([n, n], type=pa.int64()),
                "mean": pa.array([mean_x, mean_y], type=pa.float64()),
                "variance": pa.array([var_x, var_y], type=pa.float64()),
                "covariance": pa.array([cov, cov], type=pa.float64()),
                "correlation": pa.array(
                    [corr, corr], type=pa.float64()
                ),
            }
        )

    def bucket_stats(
        self,
        query: str,
        col: str,
        mode: str = "and",
        filters: dict[str, str] | None = None,
    ) -> pa.Table:
        """ES ``stats_bucket`` pipeline aggregation: min/max/sum/avg of
        the per-bucket doc counts of a sibling terms aggregation over
        docmeta column `col` (the facet panel's counts). Buckets are
        integers, so everything but the final avg division is exact."""
        f = self.facet_counts(query, col, mode, filters)
        ns = f["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not ns.size:
            return pa.table(
                {
                    "n_buckets": pa.array([0], type=pa.int64()),
                    "min": pa.array([None], type=pa.int64()),
                    "max": pa.array([None], type=pa.int64()),
                    "sum": pa.array([None], type=pa.int64()),
                    "avg": pa.array([None], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "n_buckets": pa.array([ns.size], type=pa.int64()),
                "min": pa.array([int(ns.min())], type=pa.int64()),
                "max": pa.array([int(ns.max())], type=pa.int64()),
                "sum": pa.array([int(ns.sum())], type=pa.int64()),
                "avg": pa.array(
                    [float(ns.sum()) / ns.size], type=pa.float64()
                ),
            }
        )

    def matched_percentile_ranks(
        self,
        query: str,
        col: str,
        values: tuple,
        mode: str = "and",
        filters: dict[str, str] | None = None,
    ) -> pa.Table:
        """ES ``percentile_ranks`` aggregation: for each probe value,
        the percentage of matching docs whose `col` is ≤ the value —
        the inverse of the percentiles agg. Exact counts (no t-digest),
        one float division per probe."""
        _, _, v = self._score_all_with_meta(query, col, mode, filters)
        arr = v.drop_null()
        x = (
            np.sort(
                arr.to_numpy(zero_copy_only=False).astype(np.int64)
            )
            if len(arr)
            else np.empty(0, dtype=np.int64)
        )
        n = x.size
        probes = np.asarray(values, dtype=np.int64)
        le = np.searchsorted(x, probes, side="right")
        ranks = [
            (100.0 * int(c)) / n if n else None for c in le
        ]
        return pa.table(
            {
                "value": pa.array(probes, type=pa.int64()),
                "rank_pct": pa.array(ranks, type=pa.float64()),
            }
        )

    def span_near_search(
        self, query: str, slop: int = 2, k: int = TOP_K_SIZE
    ) -> pa.Table:
        """ES ``span_near`` (in_order=false) analog for two single-term
        clauses: BM25 top-k over docs where the two query terms
        co-occur within `slop` intervening tokens in either order.
        tf = unordered position-pair count (see
        _span_near_match_segment), idf from the span-match df — the
        same global two-phase shape as phrase_search. Requires a
        positional index."""
        terms = list(dict.fromkeys(self.analyzer.tokenize(query)))
        if len(terms) != 2:
            raise ValueError(
                "span_near_search is pinned to exactly two distinct "
                f"terms, got {terms!r}"
            )
        a, b = terms
        parts: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        for r in self.readers:
            d, ptf = _span_near_match_segment(r, a, b, slop)
            if r._tombstones.size and d.size:
                keep = ~_isin_sorted(r._tombstones, d)
                d, ptf = d[keep], ptf[keep]
            if d.size:
                parts.append((d, ptf, r.doclen_of(d)))
        return self._score_phrase_parts(parts, k)

    def explain(self, query: str, doc_ids) -> pa.Table:
        """ES ``explain=true`` analog: the per-(doc, term) BM25 score
        breakdown for the given docs — tf, global df, idf and the final
        contribution (idf × saturated-tf × length norm). Rows sorted
        (doc_id, term); the sum of `contrib` per doc equals the doc's
        :meth:`search` score exactly (same accumulation order as the
        engine's lexicographic pinning)."""
        terms = sorted(set(self.analyzer.tokenize(query)))
        filt = np.sort(np.unique(np.asarray(doc_ids, dtype=np.int64)))
        d_p, t_p, tf_p, df_p, idf_p, c_p = [], [], [], [], [], []
        for term in terms:
            df = self.df(term)
            if df == 0:
                continue
            idf = bm25_idf(df, self.n_docs, self.params)
            for r in self.readers:
                p_doc, p_tf = r.postings(term)
                keep = _isin_sorted(filt, p_doc)
                d, tf = p_doc[keep], p_tf[keep]
                if r._tombstones.size and d.size:
                    alive = ~_isin_sorted(r._tombstones, d)
                    d, tf = d[alive], tf[alive]
                if not d.size:
                    continue
                dl = r.doclen_of(d)
                contrib = idf * bm25_tf_norm(
                    tf.astype(np.float64), dl, self.avgdl, self.params
                )
                d_p.append(d)
                tf_p.append(tf.astype(np.int64))
                df_p.append(np.full(d.size, df, dtype=np.int64))
                idf_p.append(np.full(d.size, idf, dtype=np.float64))
                c_p.append(contrib)
                t_p.append(np.full(d.size, term, dtype=object))
        if not d_p:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "term": pa.array([], type=pa.string()),
                    "tf": pa.array([], type=pa.int64()),
                    "df": pa.array([], type=pa.int64()),
                    "idf": pa.array([], type=pa.float64()),
                    "contrib": pa.array([], type=pa.float64()),
                }
            )
        tbl = pa.table(
            {
                "doc_id": pa.array(np.concatenate(d_p)),
                "term": pa.array(np.concatenate(t_p), type=pa.string()),
                "tf": pa.array(np.concatenate(tf_p)),
                "df": pa.array(np.concatenate(df_p)),
                "idf": pa.array(np.concatenate(idf_p)),
                "contrib": pa.array(np.concatenate(c_p)),
            }
        )
        return tbl.sort_by(
            [("doc_id", "ascending"), ("term", "ascending")]
        )

    def facet_stats(
        self,
        query: str,
        col: str,
        mode: str = "and",
        filters: dict | None = None,
    ) -> pa.Table:
        """ES terms-aggregation with a metric sub-aggregation: per facet
        value of docmeta column `col`, the match count AND the mean BM25
        score over EVERY doc matching `query` (not just the top k).
        Output (col, n, avg_score) sorted (n desc, value asc, NULLs
        last) — the DuckDB twin groups the exhaustive scored set."""
        terms = list(dict.fromkeys(self.analyzer.tokenize(query)))
        cnt: dict = {}
        tot: dict = {}
        if terms:
            idfs = {
                t: bm25_idf(self.df(t), self.n_docs, self.params)
                for t in terms
            }
            for r in self.readers:
                d, s = _score_segment(
                    r, terms, idfs, self.avgdl, mode, filters, self.params
                )
                if not d.size:
                    continue
                if col not in r._meta.column_names:
                    raise KeyError(f"no facet column {col!r} in docmeta")
                pos = np.searchsorted(r._doc_ids, d)
                vals = r._meta[col].take(pa.array(pos)).combine_chunks()
                # vectorized grouped count+sum: dictionary codes →
                # bincount (accumulates in input order, so float sums
                # equal the sequential per-doc adds the twin pins)
                enc = pc.dictionary_encode(vals)
                codes = pc.fill_null(
                    pc.cast(enc.indices, pa.int64()), -1
                ).to_numpy(zero_copy_only=False)
                keys = [None] + enc.dictionary.to_pylist()
                seg_n = np.bincount(codes + 1, minlength=len(keys))
                seg_sum = np.bincount(
                    codes + 1, weights=s, minlength=len(keys)
                )
                for i, v in enumerate(keys):
                    if seg_n[i]:
                        cnt[v] = cnt.get(v, 0) + int(seg_n[i])
                        tot[v] = tot.get(v, 0.0) + float(seg_sum[i])
        items = sorted(
            cnt.items(),
            key=lambda kv: (-kv[1], kv[0] is None, kv[0] or ""),
        )
        return pa.table(
            {
                col: pa.array([k for k, _ in items], type=pa.string()),
                "n": pa.array([v for _, v in items], type=pa.int64()),
                "avg_score": pa.array(
                    [tot[k] / v for k, v in items], type=pa.float64()
                ),
            }
        )

    def suggest(
        self, term: str, size: int = 3, max_edits: int = 2
    ) -> pa.Table:
        """ES term-suggester analog: dictionary terms within `max_edits`
        Levenshtein edits of `term` (the exact term itself excluded, as
        ES does with suggest_mode=missing-for-misspellings), ranked the
        ES way — edit distance ascending, then document frequency
        descending, then term — truncated to `size`."""
        from datamart_ray.pipelines.matching import levenshtein

        cands: set = set()
        for r in self.readers:
            cands.update(_segment_fuzzy_terms(r, term, max_edits))
        cands.discard(term)
        rows = [
            (levenshtein(term, c), -self.df(c), c) for c in cands
        ]
        rows.sort()
        rows = rows[:size]
        return pa.table(
            {
                "suggestion": pa.array(
                    [c for _, _, c in rows], type=pa.string()
                ),
                "distance": pa.array(
                    [d for d, _, _ in rows], type=pa.int64()
                ),
                "df": pa.array([-f for _, f, _ in rows], type=pa.int64()),
            }
        )

    def more_like_this(
        self,
        text: str,
        k: int = TOP_K_SIZE,
        max_query_terms: int = 10,
        exclude: int | None = None,
        filters: dict | None = None,
    ) -> pa.Table:
        """ES ``more_like_this`` analog: select the seed text's
        `max_query_terms` highest tf×idf terms (ties broken by term,
        terms absent from the index dropped), score their union as an OR
        query, optionally excluding the seed doc itself. Like ES, the
        seed terms come from the provided text (the stored ``_source``),
        not a forward index — the inverted index only supplies df."""
        toks = self.analyzer.tokenize(text)
        tf: dict[str, int] = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        weighted = []
        for t, f in tf.items():
            df = self.df(t)
            if df > 0:
                weighted.append(
                    (-f * bm25_idf(df, self.n_docs, self.params), t)
                )
        weighted.sort()
        terms = sorted(t for _, t in weighted[:max_query_terms])
        fetch = k if exclude is None else k + 1
        res = self._score_expanded(terms, fetch, filters)
        if exclude is not None and res.num_rows:
            res = res.filter(pc.not_equal(res["doc_id"], exclude)).slice(
                0, k
            )
        return res

    def match_positions(self, query: str, doc_ids) -> pa.Table:
        """Token positions of every query-term occurrence within the
        given docs — the ES highlight-offsets analog at token
        granularity (char offsets would need stored text; the caller
        maps token index → span with the analyzer). Requires a
        positional index. Rows sorted (doc_id, term, pos); position
        decodes are bounded by the requested doc set via the chunk-skip
        filter."""
        terms = sorted(set(self.analyzer.tokenize(query)))
        filt = np.sort(np.asarray(doc_ids, dtype=np.int64))
        d_parts, t_parts, p_parts = [], [], []
        for term in terms:
            for r in self.readers:
                keys = _term_position_keys(r, term, docs_filter=filt)
                if keys is None or keys.size == 0:
                    continue
                d = (keys >> np.uint64(32)).astype(np.int64)
                p = (keys & np.uint64(0xFFFFFFFF)).astype(np.int64)
                if r._tombstones.size:
                    keep = ~_isin_sorted(r._tombstones, d)
                    d, p = d[keep], p[keep]
                d_parts.append(d)
                p_parts.append(p)
                t_parts.append(np.full(d.size, term, dtype=object))
        if not d_parts:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "term": pa.array([], type=pa.string()),
                    "pos": pa.array([], type=pa.int64()),
                }
            )
        tbl = pa.table(
            {
                "doc_id": pa.array(np.concatenate(d_parts)),
                "term": pa.array(
                    np.concatenate(t_parts), type=pa.string()
                ),
                "pos": pa.array(np.concatenate(p_parts)),
            }
        )
        return tbl.sort_by(
            [("doc_id", "ascending"), ("term", "ascending"),
             ("pos", "ascending")]
        )

    def numeric_facet(
        self,
        query: str,
        col: str,
        width: int,
        mode: str = "and",
        filters: dict | None = None,
    ) -> pa.Table:
        """ES histogram-aggregation analog: fixed-width bins of a
        numeric docmeta column over EVERY doc matching `query`. Output
        (bin_lo, n) sorted by bin_lo."""
        terms = list(dict.fromkeys(self.analyzer.tokenize(query)))
        agg: dict[int, int] = {}
        if terms:
            idfs = {
                t: bm25_idf(self.df(t), self.n_docs, self.params)
                for t in terms
            }
            for r in self.readers:
                d, _ = _score_segment(
                    r, terms, idfs, self.avgdl, mode, filters, self.params
                )
                if not d.size:
                    continue
                if col not in r._meta.column_names:
                    raise KeyError(f"no facet column {col!r} in docmeta")
                pos = np.searchsorted(r._doc_ids, d)
                vals = r._meta[col].take(pa.array(pos)).to_numpy(
                    zero_copy_only=False
                )
                bins = (
                    np.floor_divide(vals.astype(np.int64), width) * width
                )
                for b, c in zip(*np.unique(bins, return_counts=True)):
                    agg[int(b)] = agg.get(int(b), 0) + int(c)
        items = sorted(agg.items())
        return pa.table(
            {
                "bin_lo": pa.array([b for b, _ in items], type=pa.int64()),
                "n": pa.array([c for _, c in items], type=pa.int64()),
            }
        )

    def facet_cardinality(
        self,
        query: str,
        cols: tuple[str, ...],
        mode: str = "and",
        filters: dict | None = None,
    ) -> pa.Table:
        """ES cardinality-aggregation analog (exact): the number of
        DISTINCT values of each docmeta column over EVERY doc matching
        `query`. ES approximates with HLL++; our exact distinct is the
        pinned deviation (the repo's HLL sketch lives in stages/sketch —
        swap it in per-column when a field's cardinality outgrows a set).
        Output (field, cardinality) sorted by field name."""
        terms = list(dict.fromkeys(self.analyzer.tokenize(query)))
        seen: dict[str, set] = {c: set() for c in cols}
        if terms:
            idfs = {
                t: bm25_idf(self.df(t), self.n_docs, self.params)
                for t in terms
            }
            for r in self.readers:
                d, _ = _score_segment(
                    r, terms, idfs, self.avgdl, mode, filters, self.params
                )
                if not d.size:
                    continue
                pos = np.searchsorted(r._doc_ids, d)
                for c in cols:
                    if c not in r._meta.column_names:
                        raise KeyError(f"no facet column {c!r} in docmeta")
                    vals = r._meta[c].take(pa.array(pos))
                    seen[c].update(
                        v for v in vals.to_pylist() if v is not None
                    )
        fields = sorted(cols)
        return pa.table(
            {
                "field": pa.array(fields, type=pa.string()),
                "cardinality": pa.array(
                    [len(seen[c]) for c in fields], type=pa.int64()
                ),
            }
        )

    def autocomplete(self, prefix: str, size: int = 5) -> pa.Table:
        """ES completion-suggester analog over the term dictionary:
        terms starting with `prefix`, ranked by global document
        frequency descending then term ascending, truncated to `size`.
        The prefix slice is a binary-search dictionary range per segment
        (no scan); global df sums the per-segment dfs of the sliced
        terms only."""
        df_by_term: dict[str, int] = {}
        for r in self.readers:
            for t in _segment_prefix_terms(r, prefix):
                df_by_term[t] = df_by_term.get(t, 0) + r.df(t)
        rows = sorted(df_by_term.items(), key=lambda kv: (-kv[1], kv[0]))
        rows = rows[:size]
        return pa.table(
            {
                "term": pa.array([t for t, _ in rows], type=pa.string()),
                "df": pa.array([d for _, d in rows], type=pa.int64()),
            }
        )

    def sort_by_field(
        self,
        query: str,
        col: str,
        k: int = TOP_K_SIZE,
        descending: bool = True,
        mode: str = "and",
        filters: dict | None = None,
    ) -> pa.Table:
        """ES ``sort: [{field: order}]`` analog: the full match set of
        `query` ordered by a docmeta column instead of _score (doc_id
        ascending breaks ties — ES's implicit shard-doc tiebreak made
        explicit). Scores are not returned (ES skips scoring when a
        field sort replaces _score)."""
        ids, _, vals = self._score_all_with_meta(query, col, mode, filters)
        if not ids.size:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    col: pa.array([], type=vals.type),
                }
            )
        # Arrow multi-key sort: correct descending order for string
        # (and any other) key types — numpy's sign*vals trick silently
        # breaks on object arrays (str.__mul__(-1) == '' per element)
        tbl = pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()), col: vals}
        )
        order = pc.sort_indices(
            tbl,
            sort_keys=[
                (col, "descending" if descending else "ascending"),
                ("doc_id", "ascending"),
            ],
            null_placement="at_end",
        )
        return tbl.take(order[:k])

    def suggest_phrase(
        self,
        query: str,
        size: int = 3,
        max_edits: int = 2,
        per_token: int = 3,
    ) -> pa.Table:
        """ES phrase-suggester analog, pinned deviation: instead of the
        LM-scored candidate generation ES runs, each token contributes
        its top `per_token` dictionary candidates within `max_edits`
        (the token itself at distance 0 when in-vocabulary), ranked
        (distance asc, df desc, term asc); candidate phrases are the
        cross product, ranked (total edit distance asc, df product
        desc, phrase asc), truncated to `size`."""
        import itertools

        toks = self.analyzer.tokenize(query)
        options: list[list[tuple[int, int, str]]] = []
        for t in toks:
            cands: list[tuple[int, int, str]] = []
            if self.df(t) > 0:
                cands.append((0, -self.df(t), t))
            sug = self.suggest(t, size=per_token, max_edits=max_edits)
            for s, d, f in zip(
                sug["suggestion"].to_pylist(),
                sug["distance"].to_pylist(),
                sug["df"].to_pylist(),
            ):
                cands.append((int(d), -int(f), s))
            cands.sort()
            if not cands:
                # a token with NO in-budget correction kills every
                # candidate phrase — the twin's per-token CTE is empty,
                # so the cross product (and the result) must be too
                options = []
                break
            options.append(cands[:per_token])
        rows = []
        if not options:  # no tokens, or an uncorrectable token
            return pa.table(
                {
                    "phrase": pa.array([], type=pa.string()),
                    "total_distance": pa.array([], type=pa.int64()),
                    "df_product": pa.array([], type=pa.int64()),
                }
            )
        for combo in itertools.product(*options):
            dist = sum(c[0] for c in combo)
            dfp = 1
            for c in combo:
                dfp *= max(-c[1], 0)
            rows.append((dist, -dfp, " ".join(c[2] for c in combo)))
        rows.sort()
        rows = rows[:size]
        return pa.table(
            {
                "phrase": pa.array([p for _, _, p in rows], type=pa.string()),
                "total_distance": pa.array(
                    [d for d, _, _ in rows], type=pa.int64()
                ),
                "df_product": pa.array(
                    [-f for _, f, _ in rows], type=pa.int64()
                ),
            }
        )

    def profile_search(
        self,
        query: str,
        k: int = TOP_K_SIZE,
        mode: str = "and",
        filters: dict | None = None,
    ) -> tuple[pa.Table, pa.Table]:
        """ES profile-API analog: execute the query through the same
        scoring primitives `search` uses, with a per-phase wall-time
        breakdown — analyze (tokenize), stats (df→idf), score_segments
        (per-segment match+score+local top-k), merge_topk (global
        heap). Returns (result, profile) where result is
        rank-identical to :meth:`search` (asserted in tests) and
        profile is one (phase, ms) row per phase."""
        import time

        t0 = time.perf_counter()
        terms = list(dict.fromkeys(self.analyzer.tokenize(query)))
        t1 = time.perf_counter()
        idfs = {
            t: bm25_idf(self.df(t), self.n_docs, self.params)
            for t in terms
        }
        t2 = time.perf_counter()
        parts_d, parts_s = [], []
        if terms:
            for r in self.readers:
                d, s = _score_segment(
                    r, terms, idfs, self.avgdl, mode, filters,
                    self.params, k=k,
                )
                if d.size:
                    dk, sk = topk_select(d, s, k)
                    parts_d.append(dk)
                    parts_s.append(sk)
        t3 = time.perf_counter()
        if parts_d:
            d, s = topk_select(
                np.concatenate(parts_d), np.concatenate(parts_s), k
            )
        else:
            d = np.empty(0, dtype=np.int64)
            s = np.empty(0, dtype=np.float64)
        t4 = time.perf_counter()
        result = pa.table(
            {
                "doc_id": pa.array(d, type=pa.int64()),
                "score": pa.array(s, type=pa.float64()),
            }
        )
        profile = pa.table(
            {
                "phase": pa.array(
                    [
                        "analyze",
                        "stats",
                        "score_segments",
                        "merge_topk",
                    ],
                    type=pa.string(),
                ),
                "ms": pa.array(
                    [
                        (t1 - t0) * 1e3,
                        (t2 - t1) * 1e3,
                        (t3 - t2) * 1e3,
                        (t4 - t3) * 1e3,
                    ],
                    type=pa.float64(),
                ),
            }
        )
        return result, profile

    def search_with_synonyms(
        self,
        query: str,
        synonyms: dict[str, tuple],
        k: int = TOP_K_SIZE,
        mode: str = "or",
        filters: dict | None = None,
    ) -> pa.Table:
        """ES query-time synonym expansion analog (a ``synonym`` filter
        in the search analyzer): every query token is OR-expanded with
        its synonym set before scoring. Pinned deviation from ES's
        SynonymQuery: each expansion term keeps its OWN df/idf (ES
        blends df across the synonym group). Expansion order = token
        order with synonyms appended after their source token,
        duplicates dropped — the accumulation order the SQL twin pins."""
        toks = self.analyzer.tokenize(query)
        expanded: list[str] = []
        for t in toks:
            expanded.append(t)
            for s in synonyms.get(t, ()):
                expanded.extend(self.analyzer.tokenize(s))
        q = " ".join(dict.fromkeys(expanded))
        return self.search(q, k=k, mode=mode, filters=filters)

    def boosting_search(
        self,
        positive: str,
        negative: str,
        negative_boost: float = 0.5,
        k: int = TOP_K_SIZE,
        mode: str = "or",
        filters: dict | None = None,
    ) -> pa.Table:
        """ES ``boosting`` query analog: docs are scored by the
        `positive` query; any doc also matching a `negative` term keeps
        its rank slot but its score is multiplied by `negative_boost`
        (< 1 demotes, never excludes — the difference from bool
        must_not). Demotion reorders, so segments score exhaustively
        (k=None disables block-max pruning) and top-k selection happens
        only after the multiply."""
        terms = list(dict.fromkeys(self.analyzer.tokenize(positive)))
        neg_t = list(dict.fromkeys(self.analyzer.tokenize(negative)))
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64()),
            }
        )
        if not terms:
            return empty
        idfs = {
            t: bm25_idf(self.df(t), self.n_docs, self.params)
            for t in terms
        }
        parts_d, parts_s = [], []
        for r in self.readers:
            d, s = _score_segment(
                r, terms, idfs, self.avgdl, mode, filters, self.params,
                k=None,
            )
            if not d.size:
                continue
            neg_docs = [
                r.postings(t)[0] for t in neg_t if r.df(t) > 0
            ]
            if neg_docs:
                nd = (
                    neg_docs[0]
                    if len(neg_docs) == 1
                    else np.unique(np.concatenate(neg_docs))
                )
                demote = _isin_sorted(nd, d)
                s = np.where(demote, s * negative_boost, s)
            dk, sk = topk_select(d, s, k)
            parts_d.append(dk)
            parts_s.append(sk)
        if not parts_d:
            return empty
        out_ids, out_scores = topk_select(
            np.concatenate(parts_d), np.concatenate(parts_s), k
        )
        return pa.table(
            {
                "doc_id": pa.array(out_ids, type=pa.int64()),
                "score": pa.array(out_scores, type=pa.float64()),
            }
        )

    def function_score_search(
        self,
        query: str,
        col: str,
        factor: float,
        k: int = TOP_K_SIZE,
        mode: str = "or",
        filters: dict | None = None,
    ) -> pa.Table:
        """ES ``function_score`` + ``field_value_factor`` analog
        (modifier ``log1p``, boost_mode ``multiply`` — the combination
        the reference uses to fold dataset priors into keyword ranking):
        score = BM25 × ln(1 + factor × docmeta[col]). The multiplier is
        rank-changing, so segments score exhaustively and top-k happens
        after the multiply."""
        terms = list(dict.fromkeys(self.analyzer.tokenize(query)))
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64()),
            }
        )
        if not terms:
            return empty
        idfs = {
            t: bm25_idf(self.df(t), self.n_docs, self.params)
            for t in terms
        }
        parts_d, parts_s = [], []
        for r in self.readers:
            d, s = _score_segment(
                r, terms, idfs, self.avgdl, mode, filters, self.params,
                k=None,
            )
            if not d.size:
                continue
            if col not in r._meta.column_names:
                raise KeyError(f"no docmeta column {col!r}")
            pos = np.searchsorted(r._doc_ids, d)
            vals = r._meta[col].take(pa.array(pos)).to_numpy(
                zero_copy_only=False
            ).astype(np.float64)
            s = s * np.log1p(factor * vals)
            dk, sk = topk_select(d, s, k)
            parts_d.append(dk)
            parts_s.append(sk)
        if not parts_d:
            return empty
        out_ids, out_scores = topk_select(
            np.concatenate(parts_d), np.concatenate(parts_s), k
        )
        return pa.table(
            {
                "doc_id": pa.array(out_ids, type=pa.int64()),
                "score": pa.array(out_scores, type=pa.float64()),
            }
        )

    def index_stats(self) -> pa.Table:
        """ES ``_stats`` / ``_cat/indices`` analog: one row of corpus
        statistics — doc count, total token count, average doc length,
        and the distinct-term count (union of the segment dictionaries,
        which are vocabulary-sized, so the driver union is bounded).
        Dictionary terms of fully-tombstoned docs remain counted until
        compaction, matching ES's uncompacted segment stats."""
        terms = np.unique(
            np.concatenate([r._dict_terms for r in self.readers])
        )
        return pa.table(
            {
                "n_docs": pa.array([self.n_docs], type=pa.int64()),
                "total_tokens": pa.array(
                    [self.total_doclen], type=pa.int64()
                ),
                "avgdl": pa.array([self.avgdl], type=pa.float64()),
                "n_distinct_terms": pa.array(
                    [int(terms.size)], type=pa.int64()
                ),
            }
        )

    def match_docs(
        self,
        query: str,
        mode: str = "and",
        filters: dict | None = None,
    ) -> np.ndarray:
        """Sorted docIDs of EVERY match (no scoring) — the match-set
        primitive behind _count, constant_score and significant_terms.
        Driver memory is O(matches): fine for selective queries; a
        full-corpus OR at 100 TB should stay a Dataset instead."""
        terms = list(dict.fromkeys(self.analyzer.tokenize(query)))
        if not terms:
            return np.empty(0, dtype=np.int64)
        # scores are unused but must stay positive: the exhaustive OR
        # path drops zero-scored docs
        idfs = {t: 1.0 for t in terms}
        parts = [
            _score_segment(
                r, terms, idfs, self.avgdl, mode, filters, self.params,
                k=None,
            )[0]
            for r in self.readers
        ]
        parts = [d for d in parts if d.size]
        if not parts:
            return np.empty(0, dtype=np.int64)
        return np.sort(np.concatenate(parts))

    def get_source(self, doc_ids) -> pa.Table:
        """ES GET ``/_source`` analog: fetch stored document content by
        docID from the INDEX alone — requires the index to have been
        built with ``IndexConfig(store_source=True)``. Per segment the
        request is routed by the segment's docID range, then only the
        docmeta row groups whose footer stats intersect the requested
        ids are read (parquet filter pushdown); tombstoned docs are
        omitted, like a GET of a deleted doc. Returns (doc_id, _source)
        sorted by doc_id."""
        import pyarrow.dataset as pads

        wanted = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
        parts = []
        for r in self.readers:
            if not r._doc_ids.size:
                continue
            lo, hi = r._doc_ids[0], r._doc_ids[-1]
            sel = wanted[(wanted >= lo) & (wanted <= hi)]
            if r._tombstones.size and sel.size:
                sel = sel[~_isin_sorted(r._tombstones, sel)]
            if not sel.size:
                continue
            dset = pads.dataset(os.path.join(r.seg_dir, "docmeta"))
            if "_source" not in dset.schema.names:
                raise KeyError(
                    "no stored _source — build the index with "
                    "IndexConfig(store_source=True)"
                )
            parts.append(
                dset.to_table(
                    columns=["doc_id", "_source"],
                    filter=pads.field("doc_id").isin(sel.tolist()),
                )
            )
        if not parts:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "_source": pa.array([], type=pa.string()),
                }
            )
        return pa.concat_tables(parts).sort_by("doc_id")

    def match_count(
        self,
        query: str,
        mode: str = "and",
        filters: dict | None = None,
    ) -> int:
        """ES ``_count`` API analog: number of matching docs, no
        scoring or ranking. Segments match disjoint docID ranges, so
        the global count is the sum."""
        return int(self.match_docs(query, mode, filters).size)

    def constant_score_search(
        self,
        query: str,
        boost: float = 1.0,
        k: int = TOP_K_SIZE,
        mode: str = "and",
        filters: dict | None = None,
    ) -> pa.Table:
        """ES ``constant_score`` analog: every match scores exactly
        ``boost`` (the filter context skips BM25), so ranking reduces
        to the docID-ascending tiebreak."""
        ids = self.match_docs(query, mode, filters)[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "score": pa.array(
                    np.full(ids.size, boost), type=pa.float64()
                ),
            }
        )

    def rescore_search(
        self,
        query: str,
        phrase: str,
        window_size: int = TOP_K_SIZE,
        k: int = TOP_K_SIZE,
        query_weight: float = 1.0,
        rescore_weight: float = 1.0,
        mode: str = "or",
    ) -> pa.Table:
        """ES ``rescore`` API analog: take the top ``window_size`` docs
        of the base query, add a match_phrase proximity score over just
        that window (combine mode ``total``: final = query_weight ×
        bm25 + rescore_query_weight × phrase_bm25), re-rank, return
        top-k. Docs outside the window are never promoted — exactly
        ES's window semantics. Requires a positional index (the phrase
        leg). The phrase leg scores the full match set UNRANKED —
        _combine_rescore only probes window docs, so phrase_search's
        k=n_docs global top-k sort would be wasted work; df/idf/scores
        are identical to phrase_search's."""
        base = self.search(query, k=window_size, mode=mode)
        if base.num_rows == 0:
            return _combine_rescore(
                base, base, query_weight, rescore_weight, k
            )
        terms = self.analyzer.tokenize(phrase)
        memo_key = (tuple(terms), 0)
        memo_warm = terms and all(
            memo_key in getattr(r, "_phrase_memo", {})
            for r in self.readers
        )
        cached_df = (
            None if memo_warm else self._phrase_df_lookup(terms)
        )
        if cached_df is not None:
            # sidecar fast path: the global phrase df is known, so only
            # the ≤window_size window docs need their phrase tf — the
            # position probe is window-bounded instead of df-bounded
            win = np.sort(
                base["doc_id"].to_numpy(zero_copy_only=False)
            )
            ph = self._phrase_window_table(terms, win, cached_df)
        else:
            ph = self._phrase_match_table(phrase)
            self._phrase_df_store(terms, ph.num_rows)
        return _combine_rescore(base, ph, query_weight, rescore_weight, k)

    _PHRASE_DF_NAME = "phrase_df.json"
    _PHRASE_DF_CAP = 256

    def _phrase_df_lookup(self, terms: list[str]) -> int | None:
        """Per-phrase global df from the index sidecar — valid only
        when the sidecar's version matches the version this engine
        opened (every committed mutation bumps it)."""
        if not terms or self._phrase_df_dir is None:
            return None
        import json
        import os

        path = os.path.join(self._phrase_df_dir, self._PHRASE_DF_NAME)
        cache = getattr(self, "_phrase_df_mem", None)
        if cache is None:
            try:
                with open(path) as f:
                    obj = json.load(f)
                cache = (
                    obj["entries"]
                    if obj.get("version") == self._phrase_df_version
                    else {}
                )
            except (OSError, ValueError, KeyError):
                cache = {}
            self._phrase_df_mem = cache
        return cache.get("\x1f".join(terms))

    def _phrase_df_store(self, terms: list[str], df: int) -> None:
        if not terms or self._phrase_df_dir is None:
            return
        import json
        import os

        from datamart_ray.index.manifest import atomic_write_json

        # ensure the mem cache is loaded so we extend, not clobber
        self._phrase_df_lookup(terms)
        cache = self._phrase_df_mem
        cache["\x1f".join(terms)] = int(df)
        while len(cache) > self._PHRASE_DF_CAP:
            cache.pop(next(iter(cache)))
        try:
            atomic_write_json(
                os.path.join(
                    self._phrase_df_dir, self._PHRASE_DF_NAME
                ),
                {
                    "version": self._phrase_df_version,
                    "entries": cache,
                },
            )
        except OSError:  # read-only index dir: in-process cache only
            pass

    def _phrase_window_table(
        self, terms: list[str], window_docs: np.ndarray, df: int
    ) -> pa.Table:
        """Phrase scores for the window docs only, with the global df
        supplied by the sidecar — scores identical to the full leg's
        for every window doc (same position-intersection kernel, same
        idf), pytest-pinned."""
        parts: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        for r in self.readers:
            cand = window_docs[
                _isin_sorted(r._doc_ids, window_docs)
            ]
            if cand.size == 0:
                continue
            d, ptf = _phrase_match_segment(r, terms, cand=cand)
            if r._tombstones.size and d.size:
                keep = ~_isin_sorted(r._tombstones, d)
                d, ptf = d[keep], ptf[keep]
            if d.size:
                parts.append((d, ptf, r.doclen_of(d)))
        return self._score_phrase_parts(parts, k=None, df_override=df)

    def _phrase_match_table(self, phrase: str) -> pa.Table:
        """Every phrase match with its BM25 phrase score, unranked —
        the rescore phrase leg. Delegates to _score_phrase_parts
        (k=None skips only the final top-k sort), so df/idf/scores are
        the same code path phrase_search runs."""
        terms = self.analyzer.tokenize(phrase)
        parts = self._phrase_match_parts(terms) if terms else []
        return self._score_phrase_parts(parts, k=None)

    def search_many(self, queries: list[dict]) -> list[pa.Table]:
        """Batch API parity with DistributedSearchEngine.search_many —
        in-process there is nothing to pipeline, so this is sequential
        execution with the same query-dict shape."""
        return [
            self.search(
                q["query"],
                k=q.get("k", TOP_K_SIZE),
                mode=q.get("mode", "and"),
                filters=q.get("filters"),
            )
            for q in queries
        ]


@ray.remote
class SegmentScorer:
    """Long-lived scorer actor over one or MORE segments (SURVEY.md §2.3
    ST8). With many segments, DistributedSearchEngine packs several per
    actor (actor count capped at cluster size) — per-segment scoring and
    the pinned top-k merge are unchanged, so results stay rank-identical
    to one-actor-per-segment."""

    def __init__(
        self,
        seg_dirs: str | list[str],
        filter_cols: tuple = ("lang", "repo"),
        lazy: bool | str = "auto",
    ):
        if isinstance(seg_dirs, str):
            seg_dirs = [seg_dirs]
        self.readers = [
            SegmentReader(d, filter_cols, lazy=_resolve_lazy(d, lazy))
            for d in seg_dirs
        ]
        # phrase two-round protocol: round 1 matches + caches, returns
        # only the count; round 2 scores locally and ships top-k
        self._phrase_cache: dict = {}

    def stats(self) -> tuple[int, int]:
        return (
            sum(r.n_docs for r in self.readers),
            sum(r.total_doclen for r in self.readers),
        )

    def node_id(self) -> str:
        """Placement probe (multi-node tests / ops visibility)."""
        return ray.get_runtime_context().get_node_id()

    def dfs(self, terms: list[str]) -> dict[str, int]:
        return {
            t: sum(r.df(t) for r in self.readers) for t in terms
        }

    def expand_terms(
        self, kind: str, args: list[str], max_edits: int = 1
    ) -> list[str]:
        """Expansion round for wildcard/prefix/fuzzy queries: match each
        arg against THIS actor's segment dictionaries and return the
        local expansion term set — the driver unions actors' sets, runs
        one global-df round over the union, and fans out OR scoring, so
        ranks are identical to the in-process engine at any actor
        count."""
        out: set = set()
        for r in self.readers:
            for a in args:
                if kind == "wildcard":
                    out.update(_segment_wildcard_terms(r, a))
                elif kind == "prefix":
                    out.update(_segment_prefix_terms(r, a))
                elif kind == "fuzzy":
                    out.update(_segment_fuzzy_terms(r, a, max_edits))
                elif kind == "regexp":
                    out.update(_segment_regexp_terms(r, a))
                else:
                    raise ValueError(f"unknown expansion kind {kind!r}")
        return sorted(out)

    def phrase_match_count(self, terms: list[str]) -> int:
        """Round 1: match the phrase in this actor's segments, cache the
        (docids, ptf, dl) triple, return only the match count — the
        driver sums counts into the global phrase df before any score is
        computed, so ranks are identical at every cluster size."""
        key = tuple(terms)
        if key not in self._phrase_cache:
            # bound the cache: entries normally die in round 2, but a
            # driver failure between rounds would strand them forever
            while len(self._phrase_cache) >= 8:
                self._phrase_cache.pop(next(iter(self._phrase_cache)))
            self._phrase_cache[key] = self._phrase_match_all(terms)
        return int(self._phrase_cache[key][0].size)

    def _phrase_match_all(
        self, terms: list[str]
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        ds_, tf_, dl_ = [], [], []
        for r in self.readers:
            d, ptf = _phrase_match_memo(r, terms)
            if r._tombstones.size and d.size:
                keep = ~_isin_sorted(r._tombstones, d)
                d, ptf = d[keep], ptf[keep]
            if d.size:
                ds_.append(d)
                tf_.append(ptf)
                dl_.append(r.doclen_of(d))
        if ds_:
            return (
                np.concatenate(ds_),
                np.concatenate(tf_),
                np.concatenate(dl_),
            )
        e = np.empty(0, dtype=np.int64)
        return (e, e, e)

    def phrase_topk(
        self,
        terms: list[str],
        idf: float,
        avgdl: float,
        k: int,
        params: BM25Params,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Round 2: score the cached match with the GLOBAL idf/avgdl and
        return only this actor's top-k — driver traffic is O(k·actors),
        never the match volume."""
        # pop-with-recompute: concurrent identical phrases interleave the
        # two rounds on one actor, so a second round-2 call may find the
        # entry already consumed — rematch instead of KeyError
        cached = self._phrase_cache.pop(tuple(terms), None)
        d, ptf, dl = (
            cached if cached is not None else self._phrase_match_all(terms)
        )
        if d.size == 0:
            return d, np.empty(0, dtype=np.float64)
        scores = idf * bm25_tf_norm(
            ptf.astype(np.float64), dl, avgdl, params
        )
        return topk_select(d, scores, k)

    def bool_topk(
        self,
        must: list[str],
        should: list[str],
        must_not: list[str],
        idfs: dict[str, float],
        avgdl: float,
        k: int,
        filters: dict | None,
        params: BM25Params,
        min_should: int = 0,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Bool-query scoring over this actor's segments with GLOBAL
        idfs/avgdl from the driver — per-segment semantics identical to
        the in-process _bool_score_segment, so ranks are invariant to
        actor count."""
        parts_d, parts_s = [], []
        for reader in self.readers:
            d, s = _bool_score_segment(
                reader, must, should, must_not, idfs, avgdl, filters,
                params, min_should=min_should,
            )
            if d.size:
                dk, sk = topk_select(d, s, k)
                parts_d.append(dk)
                parts_s.append(sk)
        if not parts_d:
            e = np.empty(0, dtype=np.int64)
            return e, np.empty(0, dtype=np.float64)
        return topk_select(
            np.concatenate(parts_d), np.concatenate(parts_s), k
        )

    def rescored_top_k(
        self,
        terms: list[str],
        idfs: dict[str, float],
        avgdl: float,
        k: int,
        mode: str,
        filters: dict | None,
        params: BM25Params,
        neg_terms: list[str] | None = None,
        negative_boost: float = 1.0,
        fs_col: str | None = None,
        fs_factor: float = 0.0,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Boosting / function_score round: exhaustive per-segment
        scoring with the driver's GLOBAL idfs (k=None — a score rewrite
        reorders, so block-max pruning is unsound), then the rewrite
        (negative-clause demotion and/or the log1p field multiplier),
        then local top-k. The rewrite reads only segment-local state
        (negative postings, docmeta), so results are rank-identical at
        any actor count."""
        parts_d, parts_s = [], []
        for reader in self.readers:
            d, s = _score_segment(
                reader, terms, idfs, avgdl, mode, filters, params, k=None
            )
            if not d.size:
                continue
            if neg_terms:
                neg = [
                    reader.postings(t)[0]
                    for t in neg_terms
                    if reader.df(t) > 0
                ]
                if neg:
                    nd = (
                        neg[0]
                        if len(neg) == 1
                        else np.unique(np.concatenate(neg))
                    )
                    s = np.where(_isin_sorted(nd, d), s * negative_boost, s)
            if fs_col is not None:
                pos = np.searchsorted(reader._doc_ids, d)
                vals = reader._meta[fs_col].take(pa.array(pos)).to_numpy(
                    zero_copy_only=False
                ).astype(np.float64)
                s = s * np.log1p(fs_factor * vals)
            dk, sk = topk_select(d, s, k)
            parts_d.append(dk)
            parts_s.append(sk)
        if not parts_d:
            e = np.empty(0, dtype=np.int64)
            return e, np.empty(0, dtype=np.float64)
        return topk_select(
            np.concatenate(parts_d), np.concatenate(parts_s), k
        )

    def facet_partial(
        self,
        terms: list[str],
        idfs: dict[str, float],
        avgdl: float,
        col: str,
        mode: str,
        filters: dict[str, str] | None,
        params: BM25Params,
    ) -> dict:
        """Per-actor facet partial: {col value → match count} over this
        actor's segments. The driver merges partials — traffic is
        O(distinct values · actors), never per-doc."""
        agg: dict = {}
        for r in self.readers:
            d, _ = _score_segment(
                r, terms, idfs, avgdl, mode, filters, params
            )
            if not d.size:
                continue
            if col not in r._meta.column_names:
                raise KeyError(f"no facet column {col!r} in docmeta")
            pos = np.searchsorted(r._doc_ids, d)
            vals = r._meta[col].take(pa.array(pos))
            for item in pc.value_counts(vals).to_pylist():
                agg[item["values"]] = (
                    agg.get(item["values"], 0) + item["counts"]
                )
        return agg

    def top_hits_partial(
        self,
        terms: list[str],
        idfs: dict[str, float],
        avgdl: float,
        col: str,
        per_group: int,
        mode: str,
        filters: dict[str, str] | None,
        params: BM25Params,
    ) -> pa.Table:
        """Per-actor top_hits partial: per-group top `per_group` over
        this actor's segments (same vectorized head-select as the
        in-process engine). The driver re-merges per group, so traffic
        is O(groups × per_group × actors) — never the full match set."""
        d, s, v = _collect_matches_with_meta(
            self.readers, terms, idfs, avgdl, col, mode, filters, params
        )
        if not d.size:
            return _empty_hits_table(col, v.type)
        tbl = pa.table(
            {col: v, "doc_id": pa.array(d), "score": pa.array(s)}
        )
        return _grouped_head(tbl, col, per_group)

    def stats_partial(
        self,
        terms: list[str],
        idfs: dict[str, float],
        avgdl: float,
        col: str,
        mode: str,
        filters: dict[str, str] | None,
        params: BM25Params,
    ) -> tuple:
        """Per-actor extended_stats partial (n, min, max, Σv, Σv²) —
        exactly mergeable integer sums, O(1) traffic per actor."""
        _, _, v = _collect_matches_with_meta(
            self.readers, terms, idfs, avgdl, col, mode, filters, params
        )
        arr = v.drop_null()
        if not len(arr):
            return 0, None, None, 0, 0
        x = arr.to_numpy(zero_copy_only=False).astype(np.int64)
        return (
            int(x.size),
            int(x.min()),
            int(x.max()),
            int(x.sum()),
            int((x * x).sum()),
        )

    def hist_partial(
        self,
        terms: list[str],
        idfs: dict[str, float],
        avgdl: float,
        col: str,
        interval: int,
        mode: str,
        filters: dict[str, str] | None,
        params: BM25Params,
    ) -> dict:
        """Per-actor histogram partial {bucket → n} — bucket counts
        merge by addition, O(buckets) traffic per actor."""
        _, _, v = _collect_matches_with_meta(
            self.readers, terms, idfs, avgdl, col, mode, filters, params
        )
        arr = v.drop_null()
        if not len(arr):
            return {}
        x = arr.to_numpy(zero_copy_only=False).astype(np.int64)
        b = (x // interval) * interval
        keys, counts = np.unique(b, return_counts=True)
        return {int(kk): int(cc) for kk, cc in zip(keys, counts)}

    def weighted_avg_partial(
        self,
        terms: list[str],
        idfs: dict[str, float],
        avgdl: float,
        val_col: str,
        mode: str,
        filters: dict[str, str] | None,
        params: BM25Params,
    ) -> tuple:
        """Per-actor weighted_avg partial: exact int64 (n, Σv·w, Σw) —
        O(1) traffic per actor, merged by addition."""
        n = 0
        svw = 0
        sw = 0
        for r in self.readers:
            d, _ = _score_segment(
                r, terms, idfs, avgdl, mode, filters, params
            )
            if not d.size:
                continue
            pos = np.searchsorted(r._doc_ids, d)
            v = r._meta[val_col].take(pa.array(pos))
            ok = pc.is_valid(v).to_numpy(zero_copy_only=False)
            vv = (
                pc.fill_null(v, 0)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)[ok]
            )
            w = r._doclens[pos].astype(np.int64)[ok]
            n += int(d.size)
            svw += int((vv * w).sum())
            sw += int(w.sum())
        return n, svw, sw

    def pctrank_partial(
        self,
        terms: list[str],
        idfs: dict[str, float],
        avgdl: float,
        col: str,
        values: tuple,
        mode: str,
        filters: dict[str, str] | None,
        params: BM25Params,
    ) -> tuple:
        """Per-actor percentile_ranks partial: exact (n, counts≤probe)
        integers — O(probes) traffic per actor."""
        _, _, v = _collect_matches_with_meta(
            self.readers, terms, idfs, avgdl, col, mode, filters, params
        )
        arr = v.drop_null()
        x = (
            np.sort(arr.to_numpy(zero_copy_only=False).astype(np.int64))
            if len(arr)
            else np.empty(0, dtype=np.int64)
        )
        probes = np.asarray(values, dtype=np.int64)
        le = np.searchsorted(x, probes, side="right")
        return int(x.size), [int(c) for c in le]

    def range_partial(
        self,
        terms: list[str],
        idfs: dict[str, float],
        avgdl: float,
        col: str,
        edges: tuple,
        mode: str,
        filters: dict[str, str] | None,
        params: BM25Params,
    ) -> list:
        """Per-actor range-aggregation partial: one exact (n, Σv) int
        pair per requested range — O(ranges) traffic per actor, merged
        by addition on the driver."""
        _, _, v = _collect_matches_with_meta(
            self.readers, terms, idfs, avgdl, col, mode, filters, params
        )
        arr = v.drop_null()
        x = (
            arr.to_numpy(zero_copy_only=False).astype(np.int64)
            if len(arr)
            else np.empty(0, dtype=np.int64)
        )
        out = []
        for lo, hi in edges:
            m = np.ones(x.size, dtype=bool)
            if lo is not None:
                m &= x >= lo
            if hi is not None:
                m &= x < hi
            sel = x[m]
            out.append((int(sel.size), int(sel.sum())))
        return out

    def top_k(
        self,
        terms: list[str],
        idfs: dict[str, float],
        avgdl: float,
        k: int,
        mode: str,
        filters: dict[str, str] | None,
        params: BM25Params,
    ) -> tuple[np.ndarray, np.ndarray]:
        parts_d, parts_s = [], []
        for reader in self.readers:
            d, s = _score_segment(
                reader, terms, idfs, avgdl, mode, filters, params, k=k
            )
            if d.size:
                dk, sk = topk_select(d, s, k)
                parts_d.append(dk)
                parts_s.append(sk)
        if not parts_d:
            e = np.empty(0, dtype=np.int64)
            return e, np.empty(0, dtype=np.float64)
        return topk_select(
            np.concatenate(parts_d), np.concatenate(parts_s), k
        )


class DistributedSearchEngine:
    """Scorer-actor-pool engine: per-segment local top-k, driver heap merge.

    Global stats protocol (rank-identity across cluster sizes): round 1
    collects per-segment (N, Σdl) and per-term dfs; idfs are computed on the
    driver from the *global* sums; round 2 fans out scoring.
    """

    def __init__(
        self,
        index_dir: str | list[str],
        params: BM25Params = BM25Params(),
        lazy: bool | str = "auto",
        max_actors: int | None = None,
        filter_cols: tuple = ("lang", "repo"),
    ):
        # list = ES index alias (see SearchEngine): union of segments,
        # global stats across aliased indices — same shared resolution
        # + contract checks as the in-process engine
        self.params = params
        if max_actors is None:
            try:
                max_actors = max(
                    1, int(ray.cluster_resources().get("CPU", 4))
                )
            except Exception:
                max_actors = 4
        # Same compaction race as SearchEngine.__init__: a listed
        # segment dir can vanish between _alias_union and the scorer
        # actors' eager postings load, surfacing as RayActorError from
        # the constructor. A vanished dir means a newer committed view
        # exists — kill the half-built pool, re-list, reopen (bounded).
        from ray.exceptions import RayActorError

        for attempt in range(5):
            actors: list = []
            try:
                self.manifest, self.analyzer, seg_dirs = _alias_union(
                    index_dir
                )
                n_actors = min(len(seg_dirs), max_actors)
                groups: list[list[str]] = [[] for _ in range(n_actors)]
                for i, d in enumerate(seg_dirs):  # round-robin packing
                    groups[i % n_actors].append(d)
                # SPREAD: scorer actors hold segment postings in heap
                # memory, so on a multi-node cluster they must land on
                # distinct nodes (memory balance + per-node read IO)
                # rather than pack onto one
                actors = [
                    SegmentScorer.options(
                        scheduling_strategy="SPREAD"
                    ).remote(g, filter_cols=filter_cols, lazy=lazy)
                    for g in groups
                ]
                stats = ray.get([a.stats.remote() for a in actors])
            except (RayActorError, FileNotFoundError):
                for a in actors:
                    try:
                        ray.kill(a)
                    except Exception:
                        pass
                if attempt == 4:
                    raise
                continue
            self.actors = actors
            break
        self.n_docs = sum(n for n, _ in stats)
        total_dl = sum(dl for _, dl in stats)
        self.avgdl = total_dl / self.n_docs if self.n_docs else 0.0

    def search(
        self,
        query: str,
        k: int = TOP_K_SIZE,
        mode: str = "and",
        filters: dict[str, str] | None = None,
    ) -> pa.Table:
        terms = list(dict.fromkeys(self.analyzer.tokenize(query)))
        out_ids = np.empty(0, dtype=np.int64)
        out_scores = np.empty(0, dtype=np.float64)
        if terms:
            df_maps = ray.get([a.dfs.remote(terms) for a in self.actors])
            idfs = {
                t: bm25_idf(
                    sum(m[t] for m in df_maps), self.n_docs, self.params
                )
                for t in terms
            }
            results = ray.get(
                [
                    a.top_k.remote(
                        terms, idfs, self.avgdl, k, mode, filters, self.params
                    )
                    for a in self.actors
                ]
            )
            parts_d = [d for d, _ in results if d.size]
            parts_s = [s for _, s in results if s.size]
            if parts_d:
                out_ids, out_scores = topk_select(
                    np.concatenate(parts_d), np.concatenate(parts_s), k
                )
        return pa.table(
            {
                "doc_id": pa.array(out_ids, type=pa.int64()),
                "score": pa.array(out_scores, type=pa.float64()),
            }
        )

    def facet_counts(
        self,
        query: str,
        col: str,
        mode: str = "and",
        filters: dict[str, str] | None = None,
    ) -> pa.Table:
        """Distributed ES terms-aggregation: one global df round (match
        semantics need global stats only for OR pruning parity —
        exhaustive here), then per-actor facet partials merged on the
        driver. Identical output to SearchEngine.facet_counts at any
        actor count; driver traffic O(distinct values · actors)."""
        terms, idfs = self._agg_round(query)
        agg: dict = {}
        if terms:
            partials = ray.get(
                [
                    a.facet_partial.remote(
                        terms, idfs, self.avgdl, col, mode, filters,
                        self.params,
                    )
                    for a in self.actors
                ]
            )
            for p in partials:
                for v, n in p.items():
                    agg[v] = agg.get(v, 0) + n
        items = sorted(
            agg.items(),
            key=lambda kv: (-kv[1], kv[0] is None, kv[0] or ""),
        )
        return pa.table(
            {
                col: pa.array([k for k, _ in items], type=pa.string()),
                "n": pa.array([v for _, v in items], type=pa.int64()),
            }
        )

    def facet_counts_approx(
        self,
        query: str,
        col: str,
        size: int = 5,
        shard_size: int | None = None,
        mode: str = "and",
        filters: dict[str, str] | None = None,
    ) -> pa.Table:
        """ES terms-aggregation SHARD-APPROXIMATION semantics: each
        actor ships only its top `shard_size` buckets (count desc,
        value asc — the bounded-traffic mode real ES always runs in),
        the driver merges and keeps the global top `size`, and every
        returned bucket carries ES's per-bucket
        ``doc_count_error_upper_bound``: the sum, over actors that did
        NOT report the bucket, of that actor's smallest shipped count —
        the worst case it could have hidden. With
        shard_size ≥ per-actor distinct count the result is exact and
        every bound is 0 (asserted in tests against facet_counts).

        This is the 100-TB facet shape: traffic is
        O(shard_size · actors) regardless of the column's cardinality.
        """
        if shard_size is None:
            shard_size = max(size * 4, 10)  # ES default-ish heuristic
        terms, idfs = self._agg_round(query)
        if not terms:
            return pa.table(
                {
                    col: pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                    "doc_count_error_upper_bound": pa.array(
                        [], type=pa.int64()
                    ),
                }
            )
        partials = ray.get(
            [
                a.facet_partial.remote(
                    terms, idfs, self.avgdl, col, mode, filters,
                    self.params,
                )
                for a in self.actors
            ]
        )
        shipped: list[dict] = []
        worst: list[int] = []  # per actor: smallest shipped count
        for p in partials:
            items = sorted(
                p.items(),
                key=lambda kv: (-kv[1], kv[0] is None, kv[0] or ""),
            )[:shard_size]
            shipped.append(dict(items))
            worst.append(items[-1][1] if len(items) == shard_size else 0)
        agg: dict = {}
        for p in shipped:
            for v, n in p.items():
                agg[v] = agg.get(v, 0) + n
        merged = sorted(
            agg.items(),
            key=lambda kv: (-kv[1], kv[0] is None, kv[0] or ""),
        )[:size]
        errs = [
            sum(w for p, w in zip(shipped, worst) if v not in p)
            for v, _ in merged
        ]
        return pa.table(
            {
                col: pa.array([k for k, _ in merged], type=pa.string()),
                "n": pa.array([v for _, v in merged], type=pa.int64()),
                "doc_count_error_upper_bound": pa.array(
                    errs, type=pa.int64()
                ),
            }
        )

    def _agg_round(self, query: str) -> tuple[list[str], dict]:
        """Shared df round for the aggregation family: (terms, global
        idfs)."""
        terms = list(dict.fromkeys(self.analyzer.tokenize(query)))
        if not terms:
            return [], {}
        df_maps = ray.get([a.dfs.remote(terms) for a in self.actors])
        idfs = {
            t: bm25_idf(
                sum(m[t] for m in df_maps), self.n_docs, self.params
            )
            for t in terms
        }
        return terms, idfs

    def grouped_top_hits(
        self,
        query: str,
        col: str,
        per_group: int = 3,
        mode: str = "and",
        filters: dict[str, str] | None = None,
    ) -> pa.Table:
        """Distributed top_hits aggregation: each actor returns its
        per-group top `per_group` (a pre-truncated table), the driver
        concats and re-heads per group. Traffic O(groups × per_group ×
        actors); identical output to the in-process engine at any
        actor count (the per-group global head of per-actor heads is
        the global head)."""
        terms, idfs = self._agg_round(query)
        if not terms:
            return _empty_hits_table(col, pa.string())
        parts = ray.get(
            [
                a.top_hits_partial.remote(
                    terms, idfs, self.avgdl, col, per_group, mode,
                    filters, self.params,
                )
                for a in self.actors
            ]
        )
        parts = [p for p in parts if p.num_rows]
        if not parts:
            return _empty_hits_table(col, pa.string())
        return _grouped_head(
            pa.concat_tables(parts, promote_options="default"),
            col,
            per_group,
        )

    def matched_extended_stats(
        self,
        query: str,
        col: str,
        mode: str = "and",
        filters: dict[str, str] | None = None,
    ) -> pa.Table:
        """Distributed extended_stats: per-actor integer (n, min, max,
        Σv, Σv²) partials merge exactly on the driver; the float
        avg/var/std derivation is the same pinned formula as the
        in-process engine, so outputs are bit-identical."""
        terms, idfs = self._agg_round(query)
        n = 0
        mn = mx = None
        s = sq = 0
        if terms:
            parts = ray.get(
                [
                    a.stats_partial.remote(
                        terms, idfs, self.avgdl, col, mode, filters,
                        self.params,
                    )
                    for a in self.actors
                ]
            )
            for pn, pmn, pmx, ps, psq in parts:
                if not pn:
                    continue
                n += pn
                s += ps
                sq += psq
                mn = pmn if mn is None else min(mn, pmn)
                mx = pmx if mx is None else max(mx, pmx)
        if n == 0:
            return pa.table(
                {
                    "n": pa.array([0], type=pa.int64()),
                    "min": pa.array([None], type=pa.int64()),
                    "max": pa.array([None], type=pa.int64()),
                    "sum": pa.array([None], type=pa.int64()),
                    "avg": pa.array([None], type=pa.float64()),
                    "variance": pa.array([None], type=pa.float64()),
                    "std": pa.array([None], type=pa.float64()),
                }
            )
        avg = s / n
        var = (sq - (s * s) / n) / n
        return pa.table(
            {
                "n": pa.array([n], type=pa.int64()),
                "min": pa.array([mn], type=pa.int64()),
                "max": pa.array([mx], type=pa.int64()),
                "sum": pa.array([s], type=pa.int64()),
                "avg": pa.array([avg], type=pa.float64()),
                "variance": pa.array([var], type=pa.float64()),
                "std": pa.array([float(np.sqrt(var))], type=pa.float64()),
            }
        )

    def matched_histogram(
        self,
        query: str,
        col: str,
        interval: int,
        mode: str = "and",
        filters: dict[str, str] | None = None,
    ) -> pa.Table:
        """Distributed histogram aggregation: per-actor {bucket → n}
        partials merged by addition on the driver."""
        terms, idfs = self._agg_round(query)
        agg: dict = {}
        if terms:
            parts = ray.get(
                [
                    a.hist_partial.remote(
                        terms, idfs, self.avgdl, col, interval, mode,
                        filters, self.params,
                    )
                    for a in self.actors
                ]
            )
            for p in parts:
                for b, c in p.items():
                    agg[b] = agg.get(b, 0) + c
        keys = sorted(agg)
        return pa.table(
            {
                "bucket": pa.array(keys, type=pa.int64()),
                "n": pa.array([agg[b] for b in keys], type=pa.int64()),
            }
        )

    def matched_range_agg(
        self,
        query: str,
        col: str,
        edges: tuple,
        mode: str = "and",
        filters: dict[str, str] | None = None,
    ) -> pa.Table:
        """Distributed ES ``range`` aggregation: per-actor exact
        (n, Σv) integer partials per range, merged by addition on the
        driver; avg derived once from the global sums (identical
        arithmetic to the in-process method)."""
        terms, idfs = self._agg_round(query)
        ns = [0] * len(edges)
        sums = [0] * len(edges)
        if terms:
            parts = ray.get(
                [
                    a.range_partial.remote(
                        terms, idfs, self.avgdl, col, edges, mode,
                        filters, self.params,
                    )
                    for a in self.actors
                ]
            )
            for p in parts:
                for i, (cnt, sm) in enumerate(p):
                    ns[i] += cnt
                    sums[i] += sm
        names = [
            f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"
            for lo, hi in edges
        ]
        avgs = [
            (sums[i] / ns[i]) if ns[i] else None
            for i in range(len(edges))
        ]
        return pa.table(
            {
                "bucket": pa.array(names, type=pa.string()),
                "n": pa.array(ns, type=pa.int64()),
                "avg": pa.array(avgs, type=pa.float64()),
            }
        )

    def matched_percentile_ranks(
        self,
        query: str,
        col: str,
        values: tuple,
        mode: str = "and",
        filters: dict[str, str] | None = None,
    ) -> pa.Table:
        """Distributed ES percentile_ranks: per-actor exact integer
        (n, counts≤probe) partials merged by addition; one float
        division per probe on the merged sums — identical output to
        the in-process method at any actor count."""
        terms, idfs = self._agg_round(query)
        probes = np.asarray(values, dtype=np.int64)
        n = 0
        counts = np.zeros(probes.size, dtype=np.int64)
        if terms:
            parts = ray.get(
                [
                    a.pctrank_partial.remote(
                        terms, idfs, self.avgdl, col, values, mode,
                        filters, self.params,
                    )
                    for a in self.actors
                ]
            )
            for pn, pc_ in parts:
                n += pn
                counts += np.asarray(pc_, dtype=np.int64)
        ranks = [
            (100.0 * int(c)) / n if n else None for c in counts
        ]
        return pa.table(
            {
                "value": pa.array(probes, type=pa.int64()),
                "rank_pct": pa.array(ranks, type=pa.float64()),
            }
        )

    def matched_weighted_avg(
        self,
        query: str,
        val_col: str,
        mode: str = "and",
        filters: dict[str, str] | None = None,
    ) -> pa.Table:
        """Distributed ES weighted_avg: per-actor exact int64
        (n, Σv·w, Σw) partials merged by addition; the single float
        division happens once on the merged sums (identical arithmetic
        to the in-process method at any actor count)."""
        terms, idfs = self._agg_round(query)
        n = svw = sw = 0
        if terms:
            parts = ray.get(
                [
                    a.weighted_avg_partial.remote(
                        terms, idfs, self.avgdl, val_col, mode,
                        filters, self.params,
                    )
                    for a in self.actors
                ]
            )
            for pn, psvw, psw in parts:
                n += pn
                svw += psvw
                sw += psw
        wavg = float(svw) / float(sw) if sw else None
        return pa.table(
            {
                "n": pa.array([n], type=pa.int64()),
                "weighted_avg": pa.array([wavg], type=pa.float64()),
            }
        )

    def bool_search(
        self,
        must: str = "",
        should: str = "",
        must_not: str = "",
        k: int = TOP_K_SIZE,
        filters: dict | None = None,
        minimum_should_match: int = 0,
    ) -> pa.Table:
        """Distributed bool query: one df round over the scoring terms
        (must ∪ should — must_not needs only per-segment postings), then
        per-actor bool scoring with global idfs and a driver top-k
        merge. Rank-identical to SearchEngine.bool_search at any actor
        count; driver traffic O(k·actors)."""
        must_t = list(dict.fromkeys(self.analyzer.tokenize(must)))
        should_t = [
            t
            for t in dict.fromkeys(self.analyzer.tokenize(should))
            if t not in must_t
        ]
        not_t = list(dict.fromkeys(self.analyzer.tokenize(must_not)))
        score_terms = sorted(set(must_t) | set(should_t))
        out_ids = np.empty(0, dtype=np.int64)
        out_scores = np.empty(0, dtype=np.float64)
        if score_terms:
            df_maps = ray.get(
                [a.dfs.remote(score_terms) for a in self.actors]
            )
            idfs = {
                t: bm25_idf(
                    sum(m[t] for m in df_maps), self.n_docs, self.params
                )
                for t in score_terms
            }
            results = ray.get(
                [
                    a.bool_topk.remote(
                        must_t, should_t, not_t, idfs, self.avgdl, k,
                        filters, self.params,
                        min_should=minimum_should_match,
                    )
                    for a in self.actors
                ]
            )
            parts_d = [d for d, _ in results if d.size]
            parts_s = [s for _, s in results if s.size]
            if parts_d:
                out_ids, out_scores = topk_select(
                    np.concatenate(parts_d), np.concatenate(parts_s), k
                )
        return pa.table(
            {
                "doc_id": pa.array(out_ids, type=pa.int64()),
                "score": pa.array(out_scores, type=pa.float64()),
            }
        )

    def boosting_search(
        self,
        positive: str,
        negative: str,
        negative_boost: float = 0.5,
        k: int = TOP_K_SIZE,
        mode: str = "or",
        filters: dict | None = None,
    ) -> pa.Table:
        """Distributed ES ``boosting`` query: global-df round, then each
        actor scores exhaustively and demotes its own negative matches
        (negative postings are segment-local, so demotion commutes with
        actor packing) — rank-identical to the in-process engine at any
        actor count."""
        return self._rescored_search(
            positive, k, mode, filters,
            neg_terms=list(dict.fromkeys(self.analyzer.tokenize(negative))),
            negative_boost=negative_boost,
        )

    def function_score_search(
        self,
        query: str,
        col: str,
        factor: float,
        k: int = TOP_K_SIZE,
        mode: str = "or",
        filters: dict | None = None,
    ) -> pa.Table:
        """Distributed function_score/field_value_factor: the log1p
        multiplier reads each actor's own docmeta — rank-identical to
        the in-process engine at any actor count."""
        return self._rescored_search(
            query, k, mode, filters, fs_col=col, fs_factor=factor
        )

    def _rescored_search(
        self,
        query: str,
        k: int,
        mode: str,
        filters: dict | None,
        neg_terms: list[str] | None = None,
        negative_boost: float = 1.0,
        fs_col: str | None = None,
        fs_factor: float = 0.0,
    ) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64()),
            }
        )
        terms = list(dict.fromkeys(self.analyzer.tokenize(query)))
        if not terms:
            return empty
        df_maps = ray.get([a.dfs.remote(terms) for a in self.actors])
        idfs = {
            t: bm25_idf(
                sum(m[t] for m in df_maps), self.n_docs, self.params
            )
            for t in terms
        }
        results = ray.get(
            [
                a.rescored_top_k.remote(
                    terms, idfs, self.avgdl, k, mode, filters, self.params,
                    neg_terms=neg_terms, negative_boost=negative_boost,
                    fs_col=fs_col, fs_factor=fs_factor,
                )
                for a in self.actors
            ]
        )
        parts_d = [d for d, _ in results if d.size]
        parts_s = [s for _, s in results if s.size]
        if not parts_d:
            return empty
        out_ids, out_scores = topk_select(
            np.concatenate(parts_d), np.concatenate(parts_s), k
        )
        return pa.table(
            {
                "doc_id": pa.array(out_ids, type=pa.int64()),
                "score": pa.array(out_scores, type=pa.float64()),
            }
        )

    def _expanded_search(
        self,
        kind: str,
        args: list[str],
        k: int,
        filters: dict | None = None,
        max_edits: int = 1,
    ) -> pa.Table:
        """Shared distributed path for wildcard/prefix/fuzzy: round 1a
        unions per-actor dictionary expansions, round 1b computes global
        dfs over the union, round 2 fans out OR scoring — the same
        global-stats protocol as :meth:`search`, so ranks are identical
        to the in-process engine at any actor count. Driver traffic is
        O(|expansion| + k·actors)."""
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64()),
            }
        )
        if not args:
            return empty
        exp_sets = ray.get(
            [
                a.expand_terms.remote(kind, args, max_edits)
                for a in self.actors
            ]
        )
        expanded = sorted({t for s in exp_sets for t in s})
        if not expanded:
            return empty
        df_maps = ray.get([a.dfs.remote(expanded) for a in self.actors])
        idfs = {
            t: bm25_idf(
                sum(m[t] for m in df_maps), self.n_docs, self.params
            )
            for t in expanded
        }
        results = ray.get(
            [
                a.top_k.remote(
                    expanded, idfs, self.avgdl, k, "or", filters,
                    self.params,
                )
                for a in self.actors
            ]
        )
        parts_d = [d for d, _ in results if d.size]
        parts_s = [s for _, s in results if s.size]
        if not parts_d:
            return empty
        out_ids, out_scores = topk_select(
            np.concatenate(parts_d), np.concatenate(parts_s), k
        )
        return pa.table(
            {
                "doc_id": pa.array(out_ids, type=pa.int64()),
                "score": pa.array(out_scores, type=pa.float64()),
            }
        )

    def wildcard_search(
        self,
        pattern: str,
        k: int = TOP_K_SIZE,
        filters: dict | None = None,
    ) -> pa.Table:
        """Distributed ES ``wildcard`` query — see :meth:`_expanded_search`."""
        return self._expanded_search("wildcard", [pattern.lower()], k, filters)

    def prefix_search(
        self,
        query: str,
        k: int = TOP_K_SIZE,
        filters: dict | None = None,
    ) -> pa.Table:
        """Distributed ES ``prefix`` query — see :meth:`_expanded_search`."""
        qterms = list(dict.fromkeys(self.analyzer.tokenize(query)))
        return self._expanded_search("prefix", qterms, k, filters)

    def regexp_search(
        self,
        pattern: str,
        k: int = TOP_K_SIZE,
        filters: dict | None = None,
    ) -> pa.Table:
        """Distributed ES ``regexp`` query — see :meth:`_expanded_search`."""
        return self._expanded_search("regexp", [pattern], k, filters)

    def fuzzy_search(
        self,
        query: str,
        k: int = TOP_K_SIZE,
        max_edits: int = 1,
        filters: dict | None = None,
    ) -> pa.Table:
        """Distributed ES ``fuzziness`` query — see :meth:`_expanded_search`."""
        qterms = list(dict.fromkeys(self.analyzer.tokenize(query)))
        return self._expanded_search(
            "fuzzy", qterms, k, filters, max_edits=max_edits
        )

    def phrase_search(self, phrase: str, k: int = TOP_K_SIZE) -> pa.Table:
        """Distributed match_phrase over a positional index: round 1 fans
        out matching (actors cache their match, ship only counts → global
        phrase df), round 2 ships the global idf back and merges per-actor
        top-k heaps — rank-identical to SearchEngine.phrase_search at any
        actor count, driver traffic O(k·actors)."""
        terms = self.analyzer.tokenize(phrase)
        out_ids = np.empty(0, dtype=np.int64)
        out_scores = np.empty(0, dtype=np.float64)
        if terms:
            counts = ray.get(
                [a.phrase_match_count.remote(terms) for a in self.actors]
            )
            df = sum(counts)
            idf = bm25_idf(df, self.n_docs, self.params) if df else 0.0
            # round 2 always runs so every actor pops its cache entry;
            # with df == 0 each per-actor result is empty anyway
            results = ray.get(
                [
                    a.phrase_topk.remote(
                        terms, idf, self.avgdl, k, self.params
                    )
                    for a in self.actors
                ]
            )
            parts_d = [d for d, _ in results if d.size]
            parts_s = [s for _, s in results if s.size]
            if parts_d:
                out_ids, out_scores = topk_select(
                    np.concatenate(parts_d), np.concatenate(parts_s), k
                )
        return pa.table(
            {
                "doc_id": pa.array(out_ids, type=pa.int64()),
                "score": pa.array(out_scores, type=pa.float64()),
            }
        )

    def rescore_search(
        self,
        query: str,
        phrase: str,
        window_size: int = TOP_K_SIZE,
        k: int = TOP_K_SIZE,
        query_weight: float = 1.0,
        rescore_weight: float = 1.0,
        mode: str = "or",
    ) -> pa.Table:
        """Distributed ES ``rescore``: the base window and the phrase
        scores each come from their (already rank-identical)
        distributed rounds, and the combine is the shared
        ``_combine_rescore`` — so results equal the in-process engine
        at any actor count."""
        base = self.search(query, k=window_size, mode=mode)
        ph = (
            self.phrase_search(phrase, k=self.n_docs)
            if base.num_rows
            else base
        )
        return _combine_rescore(base, ph, query_weight, rescore_weight, k)

    def search_many(
        self,
        queries: list[dict],
    ) -> list[pa.Table]:
        """Pipelined batch execution: ONE df round for the union of all
        queries' terms, then every (query × actor) scoring call submitted
        at once — actors interleave work instead of idling between
        queries. Each query dict: {"query": str, "k"?, "mode"?,
        "filters"?}. Results are per-query tables, identical to calling
        :meth:`search` serially (same global stats, same tie-breaks)."""
        plans = []
        all_terms: list[str] = []
        seen = set()
        for q in queries:
            terms = list(dict.fromkeys(self.analyzer.tokenize(q["query"])))
            plans.append(
                {
                    "terms": terms,
                    "k": q.get("k", TOP_K_SIZE),
                    "mode": q.get("mode", "and"),
                    "filters": q.get("filters"),
                }
            )
            for t in terms:
                if t not in seen:
                    seen.add(t)
                    all_terms.append(t)
        if all_terms:
            df_maps = ray.get(
                [a.dfs.remote(all_terms) for a in self.actors]
            )
            df_of = {
                t: sum(m[t] for m in df_maps) for t in all_terms
            }
        else:
            df_of = {}
        futures = []
        for p in plans:
            if not p["terms"]:
                futures.append(None)
                continue
            idfs = {
                t: bm25_idf(df_of[t], self.n_docs, self.params)
                for t in p["terms"]
            }
            futures.append(
                [
                    a.top_k.remote(
                        p["terms"], idfs, self.avgdl, p["k"],
                        p["mode"], p["filters"], self.params,
                    )
                    for a in self.actors
                ]
            )
        out = []
        for p, fut in zip(plans, futures):
            ids = np.empty(0, dtype=np.int64)
            scores = np.empty(0, dtype=np.float64)
            if fut is not None:
                results = ray.get(fut)
                parts_d = [d for d, _ in results if d.size]
                parts_s = [s for _, s in results if s.size]
                if parts_d:
                    ids, scores = topk_select(
                        np.concatenate(parts_d),
                        np.concatenate(parts_s),
                        p["k"],
                    )
            out.append(
                pa.table(
                    {
                        "doc_id": pa.array(ids, type=pa.int64()),
                        "score": pa.array(scores, type=pa.float64()),
                    }
                )
            )
        return out

    def shutdown(self):
        for a in self.actors:
            ray.kill(a)
        self.actors = []
