"""Segmented inverted-index build — the core Ray Data pipeline.

Replaces the reference's profile→ES-index ingest path
(profiler/profiler.py:216-303 + lib_core/datamart_core/common.py:158-236)
with a Ray-Data-native build:

    plan (driver, metadata only)
      parquet footers → row-group read specs with deterministic docID bases
    tokenize (stateless-task ``map_batches`` over zero-copy Arrow)
      read spec's row groups → (term, doc_id, tf) triples; side-writes the
      per-spec docmeta partition (doc_id, meta cols, sha256(content), doclen)
    shuffle (the one all-to-all exchange per segment; push-based sort
    shuffle, see util.ensure_fast_shuffle)
      default "bucket": groupby on hash(term) % B (optionally salted with
      doc_id windows — IndexConfig.salt_window — so head terms spread over
      many buckets), then a local Arrow sort per bucket; the chunked
      posting format makes per-bucket partial postings first-class.
      "sort": global Dataset.sort(["term","doc_id"]) — range partitioning
      by sampled boundaries splits head terms across partitions natively.
    encode (vectorized per bucket/block, no further shuffle)
      posting-chunk rows (term, first/last docID, df, max_tf,
      delta+varbyte docs, packed tfs) — the block-max metadata for WAND

DocIDs are dense, deterministic, and independent of parallelism: docID =
global row offset in (file order, row order) over the planned input list —
the corpus generator sorts rows by (repo, path, commit) so this equals the
canonical sort rank. Scores therefore never depend on the number of workers
or segments (global N/avgdl/df live in manifests, summed at query time).

Checkpoint/resume: one segment = one atomic unit (temp-dir build → manifest
→ rename, see index/manifest.py). Re-running ``build_index`` skips committed
segments — the "pending index + freshen" semantics of the reference
(scripts/freshen_old_index.py) as pure filesystem state.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from datamart_ray.analyzer import Analyzer
from datamart_ray.index import codec
from datamart_ray.index.manifest import (
    INDEX_MANIFEST_NAME,
    atomic_write_json,
    commit_segment_dir,
    list_committed_segments,
    segment_is_committed,
)

POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("first_docid", pa.int64()),
        ("last_docid", pa.int64()),
        ("df", pa.int32()),
        ("max_tf", pa.int32()),
        ("docs", pa.binary()),
        ("tfs", pa.binary()),
    ]
)

# positional layout (IndexConfig.positions): one extra binary column per
# chunk — the concatenation, in docID order, of each doc's varbyte
# delta-encoded in-document token positions (per-doc boundaries = the tf
# values, so no extra length column is needed)
POSTINGS_SCHEMA_POS = POSTINGS_SCHEMA.append(pa.field("pos", pa.binary()))


@dataclass(frozen=True)
class IndexConfig:
    analyzer: Analyzer = field(default_factory=Analyzer)
    content_col: str = "content"
    id_col: str | None = None  # None → dense file-offset docIDs
    meta_cols: tuple = ("repo", "path", "commit", "lang")
    chunk_docs: int = 4096  # postings per chunk (block-max granularity)
    docs_per_spec: int = 1024  # target docs per read/tokenize task
    segment_docs: int = 4_000_000  # docs per segment (checkpoint unit)
    # posting-partitioning strategy for the wide step:
    #   "bucket": hash(term) % B groupby + local Arrow sort per bucket —
    #             ~2x faster than the global sort on this Ray version; a
    #             head term lands in one bucket, which is fine while a
    #             bucket (≈ segment_triples/B + head df) fits one task —
    #             at larger segments switch to "sort", whose range
    #             partitioning splits head terms across partitions.
    #   "sort":   global Dataset.sort(["term","doc_id"]) (skew-proof).
    shuffle: str = "bucket"
    num_buckets: int | None = None  # default 4x cluster CPUs
    # Explicit head-term salting for the bucket strategy: when > 0, the
    # shuffle key becomes hash(term, doc_id // salt_window) % B, so a
    # head term's postings spread across ceil(segment_docs/salt_window)
    # buckets instead of landing in one. Chunks from different windows
    # cover disjoint, ordered docID ranges, so per-term chunk merge at
    # query time stays a concat (readers also re-sort defensively).
    # 0 disables salting (a term maps to exactly one bucket).
    salt_window: int = 0
    # Positional postings (phrase queries): each chunk row carries a
    # ``pos`` blob — varbyte delta-encoded in-doc token positions, one
    # stream per doc, boundaries given by the tfs. ~1 extra byte per
    # token occurrence; OFF by default so the headline build pays
    # nothing. Incompatible with salt_window (a phrase match needs each
    # term's postings in one docID-ordered run per segment bucket).
    positions: bool = False
    # ES `_source` analog: store the raw content column inside each
    # docmeta partition so `SearchEngine.get_source` serves documents
    # from the index alone. OFF by default — it duplicates the corpus
    # (the 100-TB deployment usually keeps source in the lake and uses
    # the fetch-by-id path); docmeta loads stay cheap either way because
    # readers project only doc_id/doclen/filter_cols.
    store_source: bool = False

    def __post_init__(self):
        if self.positions and self.salt_window:
            raise ValueError(
                "positions=True is incompatible with salt_window>0 — use "
                "shuffle='sort' for skewed positional builds"
            )

    def to_json(self) -> dict:
        return {
            "analyzer": {
                "lowercase": self.analyzer.lowercase,
                "token_chars": self.analyzer.token_chars,
                "html_strip": self.analyzer.html_strip,
                "min_token_len": self.analyzer.min_token_len,
                "max_token_len": self.analyzer.max_token_len,
                "stem": self.analyzer.stem,
                "stopwords": list(self.analyzer.stopwords),
            },
            "content_col": self.content_col,
            "id_col": self.id_col,
            "meta_cols": list(self.meta_cols),
            "chunk_docs": self.chunk_docs,
            "positions": self.positions,
            "store_source": self.store_source,
        }

    @staticmethod
    def analyzer_from_json(obj: dict) -> Analyzer:
        return Analyzer(**obj["analyzer"])

    @staticmethod
    def from_json(obj: dict) -> "IndexConfig":
        """Rebuild the committed config from a manifest's ``config`` blob
        (analyzer + layout fields; build-perf knobs keep their defaults)."""
        return IndexConfig(
            analyzer=IndexConfig.analyzer_from_json(obj),
            content_col=obj.get("content_col", "content"),
            id_col=obj.get("id_col"),
            meta_cols=tuple(obj.get("meta_cols", ())),
            chunk_docs=int(obj.get("chunk_docs", 4096)),
            positions=bool(obj.get("positions", False)),
            store_source=bool(obj.get("store_source", False)),
        )


def load_index_config(index_dir: str) -> IndexConfig:
    """The index's committed IndexConfig (from index.json, falling back to
    the first committed segment manifest). Maintenance ops that default
    ``config=None`` MUST use this instead of ``IndexConfig()`` so a
    compaction/delta never silently swaps the analyzer the postings were
    built with (e.g. stem='porter')."""
    from datamart_ray.index.manifest import active_segments, read_manifest

    idx_path = os.path.join(index_dir, INDEX_MANIFEST_NAME)
    if os.path.isfile(idx_path):
        with open(idx_path) as f:
            obj = json.load(f)
        if "config" in obj:
            return IndexConfig.from_json(obj["config"])
    segs = active_segments(index_dir)
    if segs:
        return IndexConfig.from_json(read_manifest(segs[0])["config"])
    raise ValueError(f"no committed config under {index_dir}")


# ----------------------------------------------------------------------
# Planning (driver side, parquet footers only — no data read)
# ----------------------------------------------------------------------

def _expand_paths(paths: str | list[str]) -> list[str]:
    if isinstance(paths, str):
        paths = [paths]
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(
                os.path.join(p, f)
                for f in sorted(os.listdir(p))
                if f.endswith(".parquet")
            )
        else:
            files.append(p)
    return files


def plan_specs(
    files: list[str], docs_per_spec: int
) -> tuple[list[dict], list[dict]]:
    """Footers → (read specs, per-file info). Deterministic docID bases."""
    specs: list[dict] = []
    file_infos: list[dict] = []
    base = 0
    spec_id = 0
    for path in files:
        md = pq.ParquetFile(path).metadata
        if md.num_rows == 0:
            continue  # empty files contribute nothing (and no docIDs)
        rg_rows = [md.row_group(i).num_rows for i in range(md.num_row_groups)]
        file_infos.append(
            {"path": path, "base": base, "n_rows": int(md.num_rows)}
        )
        rg_base = base
        i = 0
        while i < len(rg_rows):
            j = i
            rows = 0
            while j < len(rg_rows) and (rows == 0 or rows + rg_rows[j] <= docs_per_spec):
                rows += rg_rows[j]
                j += 1
            specs.append(
                {
                    "spec_id": spec_id,
                    "path": path,
                    "rg_start": i,
                    "rg_end": j - 1,
                    "base": rg_base,
                    "n_rows": rows,
                }
            )
            spec_id += 1
            rg_base += rows
            i = j
        base += int(md.num_rows)
    return specs, file_infos


# ----------------------------------------------------------------------
# Tokenize stage (stateless tasks; analyzer state is cheap to rebuild)
# ----------------------------------------------------------------------

class _TokenizeSpec:
    """Reads one spec's row groups, emits (term, doc_id, tf) triples and
    side-writes the spec's docmeta partition (atomic, idempotent on retry).

    Used as a stateless task function (instantiated per task): the analyzer
    is a compiled-regex object that costs microseconds to build, so a
    long-lived actor pool would only add startup latency. A stage with
    genuinely heavy state (a model, a big dictionary) should be an actor
    pool instead (``map_batches(Cls, concurrency=...)``)."""

    def __init__(self, config_json: dict, docmeta_dir: str):
        self.analyzer = IndexConfig.analyzer_from_json(config_json)
        self.content_col = config_json["content_col"]
        self.id_col = config_json["id_col"]
        self.meta_cols = config_json["meta_cols"]
        self.positions = bool(config_json.get("positions", False))
        self.store_source = bool(config_json.get("store_source", False))
        self.docmeta_dir = docmeta_dir

    def __call__(self, batch: pa.Table):
        for spec in batch.to_pylist():
            pf = pq.ParquetFile(spec["path"])
            want = [self.content_col]
            present = set(pf.schema_arrow.names)
            meta_cols = [c for c in self.meta_cols if c in present]
            want += meta_cols
            if self.id_col:
                want.append(self.id_col)
            meta_batches = []
            triple_parts: list[pa.Table] = []
            rg_base = spec["base"]
            for rg in range(spec["rg_start"], spec["rg_end"] + 1):
                t = pf.read_row_group(rg, columns=want)
                content = t[self.content_col]
                if self.positions:
                    tf_table, doclens = self.analyzer.term_positions(content)
                else:
                    tf_table, doclens = self.analyzer.term_frequencies(
                        content
                    )
                if self.id_col:
                    ids = pc.cast(t[self.id_col], pa.int64()).combine_chunks()
                    ids_np = ids.to_numpy(zero_copy_only=False)
                else:
                    ids_np = rg_base + np.arange(t.num_rows, dtype=np.int64)
                    ids = pa.array(ids_np, type=pa.int64())
                row_idx = tf_table["row_idx"].to_numpy(zero_copy_only=False)
                cols = {
                    "term": tf_table["term"],
                    "doc_id": pa.array(ids_np[row_idx], type=pa.int64()),
                    "tf": pc.cast(tf_table["tf"], pa.int32()),
                }
                if self.positions:
                    cols["pos"] = tf_table["pos"]
                triples = pa.table(cols)
                # docmeta partition rows
                shas = [
                    hashlib.sha256(
                        s.encode("utf-8") if s is not None else b""
                    ).hexdigest()
                    for s in content.to_pylist()
                ]
                meta = {
                    "doc_id": ids,
                    "doclen": pa.array(doclens, type=pa.int64()),
                    "sha256": pa.array(shas, type=pa.string()),
                }
                if self.store_source:
                    meta["_source"] = content
                for c in meta_cols:
                    meta[c] = t[c]
                meta_batches.append(pa.table(meta))
                rg_base += t.num_rows
                if triples.num_rows:
                    triple_parts.append(triples)
            if triple_parts:
                # ONE table per spec: multiple small per-row-group
                # yields made the streaming executor emit empty
                # follow-on bundles with no schema (the RefBundle
                # schema warning); a single concat per spec keeps the
                # stage's bundles uniformly typed
                yield pa.concat_tables(triple_parts).combine_chunks()
            else:
                # typed empty so downstream sort blocks never see a
                # schemaless RefBundle
                cols = {
                    "term": pa.array([], type=pa.string()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "tf": pa.array([], type=pa.int32()),
                }
                if self.positions:
                    cols["pos"] = pa.array([], type=pa.binary())
                yield pa.table(cols)
            meta_table = pa.concat_tables(meta_batches)
            dest = os.path.join(
                self.docmeta_dir, f"docmeta-{spec['spec_id']:06d}.parquet"
            )
            tmp = dest + f".tmp.{os.getpid()}"
            pq.write_table(meta_table, tmp)
            os.rename(tmp, dest)


# ----------------------------------------------------------------------
# Posting-chunk encoder (runs per sorted block — no shuffle)
# ----------------------------------------------------------------------

class _BuildChunks:
    def __init__(self, chunk_docs: int, positions: bool = False):
        self.chunk_docs = chunk_docs
        self.positions = positions

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return (
                POSTINGS_SCHEMA_POS if self.positions else POSTINGS_SCHEMA
            ).empty_table()
        terms = batch["term"].combine_chunks()
        doc = batch["doc_id"].to_numpy()
        tf = batch["tf"].to_numpy()
        pos_np = (
            batch["pos"].to_numpy(zero_copy_only=False)
            if self.positions
            else None
        )
        if n > 1:
            neq = pc.not_equal(terms.slice(1), terms.slice(0, n - 1))
            bounds = np.flatnonzero(
                neq.to_numpy(zero_copy_only=False)
            ) + 1
        else:
            bounds = np.empty(0, dtype=np.int64)
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [n]))
        out_term, out_first, out_last = [], [], []
        out_df, out_maxtf, out_docs, out_tfs = [], [], [], []
        out_pos: list[bytes] = []
        C = self.chunk_docs
        for s, e in zip(starts, ends):
            t_val = terms[int(s)].as_py()
            for off in range(int(s), int(e), C):
                hi = min(off + C, int(e))
                d = doc[off:hi]
                f = tf[off:hi]
                out_term.append(t_val)
                out_first.append(int(d[0]))
                out_last.append(int(d[-1]))
                out_df.append(hi - off)
                out_maxtf.append(int(f.max()))
                out_docs.append(codec.encode_docids(d))
                out_tfs.append(codec.pack_ints(f))
                if pos_np is not None:
                    out_pos.append(b"".join(pos_np[off:hi]))
        cols = {
            "term": pa.array(out_term, type=pa.string()),
            "first_docid": pa.array(out_first, type=pa.int64()),
            "last_docid": pa.array(out_last, type=pa.int64()),
            "df": pa.array(out_df, type=pa.int32()),
            "max_tf": pa.array(out_maxtf, type=pa.int32()),
            "docs": pa.array(out_docs, type=pa.binary()),
            "tfs": pa.array(out_tfs, type=pa.binary()),
        }
        if pos_np is not None:
            cols["pos"] = pa.array(out_pos, type=pa.binary())
        return pa.table(cols)


# ----------------------------------------------------------------------
# Segment + index build
# ----------------------------------------------------------------------

def _cpus() -> int:
    try:
        return max(1, int(ray.cluster_resources().get("CPU", 4)))
    except Exception:
        return 4


def build_segment(
    specs: list[dict],
    file_infos: list[dict],
    seg_name: str,
    index_dir: str,
    config: IndexConfig,
) -> dict:
    """Build one segment into segments/<seg_name>/ atomically."""
    from datamart_ray.util import ensure_fast_shuffle

    ensure_fast_shuffle()
    t0 = time.time()
    seg_root = os.path.join(index_dir, "segments")
    os.makedirs(seg_root, exist_ok=True)
    final_dir = os.path.join(seg_root, seg_name)
    # Unique-per-attempt temp dir: a SIGKILLed prior builder's Ray WORKERS
    # can outlive their driver by seconds and flush straggler posting files
    # after it died. With a deterministic ".tmp-<seg>" path those stragglers
    # land inside a concurrently resuming build's temp dir and duplicate
    # postings (docmeta is overwritten idempotently, so n_docs/doclen stay
    # equal and only n_postings inflates — observed as a resume-vs-fresh
    # mismatch). A per-attempt suffix means zombie writes go to the dead
    # attempt's dir, which is swept below / by the next build.
    # the exact ".tmp-<seg>" path also sweeps the legacy deterministic
    # dir a pre-suffix crashed build may have left behind (a bare "*"
    # suffix would cross segment names once ids outgrow their zero-pad)
    shutil.rmtree(
        os.path.join(seg_root, f".tmp-{seg_name}"), ignore_errors=True
    )
    for stale in glob.glob(os.path.join(seg_root, f".tmp-{seg_name}.*")):
        shutil.rmtree(stale, ignore_errors=True)
    tmp_dir = os.path.join(
        seg_root, f".tmp-{seg_name}.{os.getpid()}.{uuid.uuid4().hex[:8]}"
    )
    docmeta_dir = os.path.join(tmp_dir, "docmeta")
    postings_dir = os.path.join(tmp_dir, "postings")
    os.makedirs(docmeta_dir)

    cfg_json = config.to_json()
    n_specs = len(specs)
    if n_specs == 0:
        raise ValueError(
            f"segment {seg_name}: no rows in input files "
            f"{[f['path'] for f in file_infos]}"
        )

    def tokenize_spec(batch: pa.Table):
        yield from _TokenizeSpec(cfg_json, docmeta_dir)(batch)

    triples = rd.from_items(specs).map_batches(
        tokenize_spec,
        batch_size=1,
        batch_format="pyarrow",
        num_cpus=1,
    )
    t_tok = time.time()
    if config.shuffle == "sort":
        sorted_triples = triples.sort(["term", "doc_id"])
        chunks = sorted_triples.map_batches(
            _BuildChunks(config.chunk_docs, positions=config.positions),
            batch_size=None,
            batch_format="pyarrow",
            num_cpus=1,
        )
    else:
        B = config.num_buckets or max(32, 4 * _cpus())
        chunker = _BuildChunks(config.chunk_docs, positions=config.positions)
        salt_w = config.salt_window

        def add_bucket(t: pa.Table) -> pa.Table:
            import pandas as pd

            h = pd.util.hash_array(
                t["term"].combine_chunks().to_numpy(zero_copy_only=False)
            )
            if salt_w > 0:
                win = (
                    t["doc_id"].to_numpy(zero_copy_only=False) // salt_w
                ).astype(np.uint64)
                h = h ^ (win * np.uint64(0x9E3779B97F4A7C15))
            return t.append_column(
                "bucket", pa.array((h % B).astype(np.int64))
            )

        def build_bucket(t: pa.Table) -> pa.Table:
            t = t.sort_by(
                [("term", "ascending"), ("doc_id", "ascending")]
            )
            return chunker(t.drop_columns(["bucket"]))

        chunks = (
            triples.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(build_bucket, batch_format="pyarrow")
        )
    chunks.write_parquet(postings_dir, row_group_size=4096)
    t_post = time.time()
    try:  # per-stage execution metrics → lineage record in the manifest
        ray_stats_tail = chunks.stats().splitlines()[-18:]
    except Exception:
        ray_stats_tail = []

    # Per-segment term dictionary: df summed over chunks of the same term.
    # Driver-side Arrow group_by: the chunk table is metadata-sized (one
    # row per term-chunk), so a Ray round-trip would be pure overhead; at
    # very large term counts this becomes a per-partition side output.
    terms_path = os.path.join(tmp_dir, "terms.parquet")
    chunk_meta = pq.read_table(postings_dir, columns=["term", "df"])
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
    pq.write_table(terms_table, terms_path)

    # Segment stats + sha256 lineage rollup from the docmeta partitions
    # (spec order = sorted file names → deterministic rollup).
    n_docs = 0
    total_dl = 0
    max_doc_id = -1
    rollup = hashlib.sha256()
    for name in sorted(os.listdir(docmeta_dir)):
        t = pq.read_table(
            os.path.join(docmeta_dir, name),
            columns=["doc_id", "doclen", "sha256"],
        )
        n_docs += t.num_rows
        total_dl += pc.sum(t["doclen"]).as_py() or 0
        if t.num_rows:
            max_doc_id = max(max_doc_id, pc.max(t["doc_id"]).as_py())
        rollup.update(bytes.fromhex("".join(t["sha256"].to_pylist())))
    t1 = time.time()

    manifest = {
        "segment": seg_name,
        "n_docs": n_docs,
        "max_doc_id": int(max_doc_id),
        "total_doclen": int(total_dl),
        "n_terms": terms_table.num_rows,
        "n_postings": int(pc.sum(terms_table["df"]).as_py() or 0),
        "files": file_infos,
        "n_specs": n_specs,
        "sha256_rollup": rollup.hexdigest(),
        "config": cfg_json,
        "timings": {
            "total_sec": round(t1 - t0, 3),
            "postings_sec": round(t_post - t_tok, 3),
            "docs_per_sec": round(n_docs / max(t1 - t0, 1e-9), 1),
        },
        "ray_stats_tail": ray_stats_tail,
        "built_unix": int(t1),
    }
    atomic_write_json(os.path.join(tmp_dir, "MANIFEST.json"), manifest)
    commit_segment_dir(tmp_dir, final_dir)
    return manifest


def build_index(
    paths: str | list[str],
    index_dir: str,
    config: IndexConfig | None = None,
) -> dict:
    """Build (or resume) the full index; returns the global manifest.

    Holds the index write lock for the whole build: concurrent
    build/delta/compact on one index dir serialize instead of racing on
    segment names, docID bases and index.json."""
    from datamart_ray.index.manifest import index_write_lock

    with index_write_lock(index_dir):
        return _build_index_locked(paths, index_dir, config)


def _build_index_locked(
    paths: str | list[str],
    index_dir: str,
    config: IndexConfig | None = None,
) -> dict:
    config = config or IndexConfig()
    files = _expand_paths(paths)
    if not files:
        raise ValueError(f"no parquet files under {paths!r}")
    specs, file_infos = plan_specs(files, config.docs_per_spec)

    # Pre-existing index: keep active segments this build does NOT
    # supersede (ADVICE r2: build → delta → build(resume) → compact was a
    # silent data-loss path — the rebuild's index.json listed only its own
    # planned segments, deactivating delta segments, which the next
    # compact deleted as orphans). A pre-existing active segment is
    #   - SUPERSEDED (dropped from index.json, gc'd at the next compact)
    #     when every file it covers is in this build's input: the new
    #     segments re-index those rows (rebuild after compact);
    #   - PRESERVED (carried into the new index.json) when its files are
    #     disjoint from this build's input (a delta segment);
    #   - a partial overlap is ambiguous (dropping loses the non-overlap
    #     docs, keeping duplicates the rest) → refuse with guidance.
    planned_paths = {fi["path"] for fi in file_infos}
    preserved: list[str] = []
    preserved_files = 0
    if os.path.isfile(os.path.join(index_dir, INDEX_MANIFEST_NAME)):
        from datamart_ray.index.manifest import active_segments, read_manifest

        n_new_ids = sum(fi["n_rows"] for fi in file_infos)
        for seg_dir in active_segments(index_dir):
            m = read_manifest(seg_dir)
            seg_paths = {f["path"] for f in m["files"]}
            if not (seg_paths & planned_paths):
                if config.id_col is None and m["files"]:
                    # dense docIDs restart at 0 every full build; a
                    # preserved segment keeps its old range — refuse if
                    # the grown input would reach into it
                    min_base = min(f["base"] for f in m["files"])
                    if n_new_ids > min_base:
                        raise ValueError(
                            f"dense docIDs of this build (0..{n_new_ids - 1})"
                            " would collide with preserved segment "
                            f"{os.path.basename(seg_dir)} (docIDs from "
                            f"{min_base}); compact the index first, or "
                            "include its files in this build's input"
                        )
                preserved.append(os.path.basename(seg_dir))
                preserved_files += len(seg_paths)
            elif not (seg_paths <= planned_paths):
                raise ValueError(
                    f"active segment {os.path.basename(seg_dir)} covers "
                    "files both inside and outside this build's input; "
                    "rebuilding would silently drop or duplicate docs — "
                    "include its files "
                    f"{sorted(seg_paths - planned_paths)[:3]} in the build "
                    "input, or compact the index first"
                )

    # Assign files to segments by cumulative doc count (file granularity).
    # Planned names skip indices held by preserved segments (a delta
    # segment's name must never be reused by a rebuild's segment).
    taken = set(preserved)

    def _seg_name(i: int) -> tuple[str, int]:
        while f"seg-{i:05d}" in taken:
            i += 1
        return f"seg-{i:05d}", i + 1

    segments: list[tuple[str, list[dict], list[dict]]] = []
    cur_files: list[dict] = []
    cur_docs = 0
    seg_idx = 0
    by_path = {fi["path"]: fi for fi in file_infos}
    for fi in file_infos:
        if cur_docs and cur_docs + fi["n_rows"] > config.segment_docs:
            seg_paths = {f["path"] for f in cur_files}
            name, seg_idx = _seg_name(seg_idx)
            segments.append(
                (
                    name,
                    [s for s in specs if s["path"] in seg_paths],
                    cur_files,
                )
            )
            cur_files, cur_docs = [], 0
        cur_files.append(fi)
        cur_docs += fi["n_rows"]
    if cur_files:
        seg_paths = {f["path"] for f in cur_files}
        name, seg_idx = _seg_name(seg_idx)
        segments.append(
            (
                name,
                [s for s in specs if s["path"] in seg_paths],
                cur_files,
            )
        )

    os.makedirs(index_dir, exist_ok=True)
    built, skipped = [], []
    for seg_name, seg_specs, seg_files in segments:
        seg_dir = os.path.join(index_dir, "segments", seg_name)
        if segment_is_committed(seg_dir):
            # resume safety: only skip if the committed segment was built
            # from exactly this file list (a grown input repacks segments)
            from datamart_ray.index.manifest import read_manifest

            prior = read_manifest(seg_dir)["files"]
            want = [
                {"path": f["path"], "base": f["base"], "n_rows": f["n_rows"]}
                for f in seg_files
            ]
            if prior == want:
                skipped.append(seg_name)
                continue
            shutil.rmtree(seg_dir)
        build_segment(seg_specs, seg_files, seg_name, index_dir, config)
        built.append(seg_name)

    from datamart_ray.index.manifest import write_index_manifest

    global_manifest = write_index_manifest(
        index_dir,
        {
            "segments": [s[0] for s in segments] + preserved,
            "config": config.to_json(),
            "built": built,
            "resumed_skipped": skipped,
            "preserved": preserved,
            "n_files": len(files) + preserved_files,
        },
    )
    return global_manifest
