"""Operational CLI — the batch analog of the reference's service surface
(apiserver REST endpoints + coordinator scripts):

    python -m datamart_ray build   --input DIR --index DIR [--stem porter]
    python -m datamart_ray search  --index DIR --query "..." [--mode or]
                                   [--k 50] [--filter lang=python] [--json]
    python -m datamart_ray delta   --index DIR --input DIR
    python -m datamart_ray delete  --index DIR --ids 1,2,3 | --where lang=python
    python -m datamart_ray compact --index DIR
    python -m datamart_ray profile --sf DIR            (profile-index build)
    python -m datamart_ray augment --sf DIR --task join|union
    python -m datamart_ray dedup   --sf DIR [--method minhash|simhash|embedding|exact]
    python -m datamart_ray knn     --sf DIR [--method brute|lsh|ivf] [--query-ids 0,1,2]
    python -m datamart_ray kwsearch --sf DIR --query "..."

Owns its Ray session (guarded init, shutdown on exit) — library code
never calls ray.init().
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _parse_filters(pairs: list[str]) -> dict[str, str]:
    out = {}
    for p in pairs or []:
        k, _, v = p.partition("=")
        if not k or not v:
            raise SystemExit(f"bad --filter {p!r} (want col=value)")
        out[k] = v
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="datamart_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build (or resume) an index")
    b.add_argument("--input", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--stem", default=None, choices=[None, "porter"])
    b.add_argument("--segment-docs", type=int, default=4_000_000)

    s = sub.add_parser("search", help="BM25 top-k query")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--mode", default="and", choices=["and", "or"])
    s.add_argument("--k", type=int, default=50)
    s.add_argument("--filter", action="append", default=[])
    s.add_argument("--distributed", action="store_true")
    s.add_argument("--lazy", action="store_true")
    s.add_argument("--json", action="store_true")
    s.add_argument(
        "--ingest-from", action="append", default=[],
        help="source root(s) to sweep for never-seen parquet files and "
        "delta-ingest BEFORE serving (on-demand discovery analog)",
    )

    tb = sub.add_parser(
        "trigram-build",
        help="build (or resume) a trigram content index",
    )
    tb.add_argument("--input", required=True)
    tb.add_argument("--index", required=True)
    tb.add_argument("--text-col", default="content")
    tb.add_argument("--id-col", default=None)
    tb.add_argument("--segment-docs", type=int, default=4_000_000)

    tx = sub.add_parser(
        "trigram-delete",
        help="tombstone documents in a trigram index",
    )
    tx.add_argument("--index", required=True)
    tx.add_argument("--ids", default=None)
    tx.add_argument(
        "--pattern",
        default=None,
        help="delete every doc whose content matches (substring; "
        "--regex for RE2)",
    )
    tx.add_argument("--corpus", default=None, help="source parquet "
                    "(required with --pattern)")
    tx.add_argument("--regex", action="store_true")

    tc = sub.add_parser(
        "trigram-compact",
        help="merge trigram segments, drop tombstones",
    )
    tc.add_argument("--index", required=True)
    tc.add_argument(
        "--max-segments",
        type=int,
        default=1,
        help="keep at most N segments, merging the smallest first "
        "(default 1: full compaction)",
    )

    ts_ = sub.add_parser(
        "trigram-snapshot",
        help="point-in-time copy of the trigram index's active view",
    )
    ts_.add_argument("--index", required=True)
    ts_.add_argument("--dest", required=True)

    tr_ = sub.add_parser(
        "trigram-restore",
        help="restore a trigram snapshot to a fresh dir",
    )
    tr_.add_argument("--snapshot", required=True)
    tr_.add_argument("--dest", required=True)

    tv_ = sub.add_parser(
        "trigram-verify",
        help="audit trigram postings invariants per segment",
    )
    tv_.add_argument("--index", required=True)

    tri_ = sub.add_parser(
        "trigram-reindex",
        help="rebuild under a new config, replay tombstones",
    )
    tri_.add_argument("--input", required=True)
    tri_.add_argument("--src-index", required=True)
    tri_.add_argument("--dest-index", required=True)
    tri_.add_argument("--text-col", default=None)

    tl_ = sub.add_parser(
        "trigram-lineage",
        help="per-segment lineage/metrics table",
    )
    tl_.add_argument("--index", required=True)

    td = sub.add_parser(
        "trigram-delta",
        help="append never-seen parquet files to a trigram index",
    )
    td.add_argument("--index", required=True)
    td.add_argument("--input", action="append", required=True)

    gp = sub.add_parser(
        "grep",
        help="substring/regex content search via the trigram index",
    )
    gp.add_argument("--index", required=True)
    gp.add_argument("--corpus", required=True)
    gp.add_argument("--pattern", required=True)
    gp.add_argument("--regex", action="store_true")
    gp.add_argument("-i", "--ignore-case", action="store_true")
    gp.add_argument(
        "--filter",
        action="append",
        default=[],
        dest="tri_filter",
        help="metadata equality filter col=value (repeatable)",
    )
    gp.add_argument(
        "--stats-by",
        default=None,
        help="emit per-group (n_docs, n_matches) rollup for this "
        "metadata column instead of hits",
    )
    gp.add_argument(
        "--lines",
        action="store_true",
        help="emit (doc_id, line_no, line) grep output instead of "
        "per-doc hit counts",
    )
    gp.add_argument(
        "--ingest-from", action="append", default=[],
        help="sweep these roots for never-seen parquet and delta-"
        "ingest them before serving the query (repeatable)",
    )
    gp.add_argument("--json", action="store_true")

    sv = sub.add_parser(
        "serve",
        help="HTTP service layer (search/grep/profile/augment/upload/"
        "sessions — the reference apiserver's route surface)",
    )
    sv.add_argument("--index", default=None)
    sv.add_argument("--corpus", default=None)
    sv.add_argument("--tri-index", default=None)
    sv.add_argument("--sf", default=None)
    sv.add_argument("--port", type=int, default=8002)

    d = sub.add_parser("delta", help="ingest new files as a delta segment")
    d.add_argument("--index", required=True)
    d.add_argument("--input", required=True)

    x = sub.add_parser("delete", help="tombstone documents")
    x.add_argument("--index", required=True)
    x.add_argument("--ids", default=None)
    x.add_argument("--where", default=None)
    x.add_argument(
        "--query", default=None, help="ES _delete_by_query analog"
    )
    x.add_argument("--mode", default="and", choices=("and", "or"))

    ri = sub.add_parser(
        "reindex",
        help="ES _reindex: rebuild under a new config, replay deletes",
    )
    ri.add_argument("--input", required=True, help="source parquet")
    ri.add_argument("--src-index", required=True)
    ri.add_argument("--dest-index", required=True)
    # the committed config of --src-index is inherited (analyzer,
    # id_col, meta_cols, positions ...); flags override selectively
    ri.add_argument("--content-col", default=None)
    ri.add_argument("--id-col", default=None)
    ri.add_argument("--positions", action="store_true")

    c = sub.add_parser("compact", help="merge segments, drop tombstones")
    c.add_argument("--index", required=True)
    c.add_argument(
        "--max-segments",
        type=int,
        default=None,
        help="tiered merge: keep at most N segments, merging only the "
        "smallest (default: full compaction into one segment)",
    )

    ln = sub.add_parser(
        "lineage",
        help="per-segment lineage + metrics records (provenance, "
        "integrity rollups, build timings)",
    )
    ln.add_argument("--index", required=True)

    sn = sub.add_parser(
        "snapshot", help="point-in-time copy of the index's active view"
    )
    sn.add_argument("--index", required=True)
    sn.add_argument("--dest", required=True)

    rs = sub.add_parser("restore", help="restore a snapshot to a fresh dir")
    rs.add_argument("--snapshot", required=True)
    rs.add_argument("--dest", required=True)

    an = sub.add_parser(
        "analyze", help="ES _analyze: show an index's tokenization of text"
    )
    an.add_argument("--index", default=None, help="use this index's analyzer")
    an.add_argument("--text", required=True)

    p = sub.add_parser("profile", help="build the profile (range) index")
    p.add_argument("--sf", required=True)

    a = sub.add_parser("augment", help="run an augmentation task")
    a.add_argument("--sf", required=True)
    a.add_argument("--task", required=True, choices=["join", "union"])

    dd = sub.add_parser(
        "dedup", help="near-duplicate discovery over documents"
    )
    dd.add_argument("--sf", required=True)
    dd.add_argument(
        "--method",
        default="minhash",
        choices=["minhash", "simhash", "ngram", "embedding", "exact"],
    )
    dd.add_argument("--threshold", type=float, default=None)
    dd.add_argument(
        "--survivors",
        action="store_true",
        help="emit the removal manifest (doc_id → kept_id) instead of "
        "the verified pair list",
    )

    sa = sub.add_parser(
        "sample", help="deterministic stratified sample of documents"
    )
    sa.add_argument("--sf", required=True)
    sa.add_argument(
        "--rates",
        default="en=0.5,de=0.25",
        help="per-stratum rates, e.g. en=0.5,de=0.25",
    )
    sa.add_argument("--default-rate", type=float, default=0.1)
    sa.add_argument(
        "--mode",
        choices=("stratified", "temperature", "split"),
        default="stratified",
        help="stratified=fixed per-stratum rates; temperature="
        "count^(alpha-1) mixture rates; split=train/val/test counts",
    )
    sa.add_argument("--alpha", type=float, default=0.5)
    sa.add_argument("--target", type=float, default=0.3)

    pk = sub.add_parser(
        "pack", help="pack documents into fixed-size token windows"
    )
    pk.add_argument("--sf", required=True)
    pk.add_argument("--window", type=int, default=256)

    se = sub.add_parser(
        "sessionize", help="gap-based sessionization of events"
    )
    se.add_argument("--sf", required=True)
    se.add_argument("--gap-sec", type=int, default=14400)

    dc = sub.add_parser(
        "decontaminate",
        help="flag documents sharing n-grams with benchmark docs",
    )
    dc.add_argument("--sf", required=True)
    dc.add_argument("--benchmark-ids", default="0,1,2,3,4")

    cp = sub.add_parser(
        "cleanpack",
        help="composite pipeline: dedup → quality → sample → pack",
    )
    cp.add_argument("--sf", required=True)
    cp.add_argument("--window", type=int, default=256)
    cp.add_argument("--rare-thr", type=float, default=0.05)
    cp.add_argument(
        "--out",
        default=None,
        help="write results as resumable hash-partitioned parquet "
        "(committed shards are skipped on re-run) instead of stdout. "
        "NOTE: this pipeline's RESULT frame is stats-sized, so only "
        "the write is skipped on retry — the scan-pruning resume "
        "benefit applies when the sink wraps a lazy Dataset (see "
        "sources/sink.py and its crash-resume test)",
    )
    cp.add_argument("--shards", type=int, default=16)

    pi = sub.add_parser(
        "scrub", help="redact emails/URLs/IPs; per-doc counts"
    )
    pi.add_argument("--sf", required=True)

    kn = sub.add_parser("knn", help="cosine top-k over embeddings")
    kn.add_argument("--sf", required=True)
    kn.add_argument("--query-ids", default="0,1,2")
    kn.add_argument("--k", type=int, default=5)
    kn.add_argument(
        "--method", default="brute", choices=["brute", "lsh", "ivf"]
    )

    kw = sub.add_parser(
        "kwsearch", help="BM25-scored keyword dataset search"
    )
    kw.add_argument("--sf", required=True)
    kw.add_argument("--query", required=True)

    hp = sub.add_parser(
        "heap",
        help="prebuild the mmap posting-heap sidecars (giant-segment "
        "lazy serving) for every active segment",
    )
    hp.add_argument("--index", required=True)

    pr = sub.add_parser(
        "prune",
        help="evict oldest rebuildable disk state (ANN artifacts, heap "
        "sidecars, optionally snapshots) once over the byte budget",
    )
    pr.add_argument(
        "--artifacts", action="append", default=[],
        help="artifact root dir (repeatable)",
    )
    pr.add_argument(
        "--index", action="append", default=[],
        help="index dir whose heap sidecars are evictable (repeatable)",
    )
    pr.add_argument(
        "--snapshots", action="append", default=[],
        help="dir of snapshot dirs — EXPLICIT opt-in (repeatable)",
    )
    pr.add_argument(
        "--max-bytes", type=int, default=None,
        help="high-water mark (default $DATAMART_RAY_MAX_CACHE_BYTES "
        "or 100 GB)",
    )
    pr.add_argument("--dry-run", action="store_true")

    args = ap.parse_args(argv)

    import ray

    owned = not ray.is_initialized()
    if owned:
        # no explicit address: respects RAY_ADDRESS, so the same CLI
        # connects to the cluster under `ray job submit` and starts a
        # local instance when run standalone (RAY_ADDRESS unset/local)
        ray.init(
            include_dashboard=False,
            logging_level="ERROR",
        )
    try:
        return _run(args)
    finally:
        if owned:
            ray.shutdown()


def _run(args) -> int:
    if args.cmd == "build":
        from datamart_ray.analyzer import Analyzer
        from datamart_ray.index.build import IndexConfig, build_index

        cfg = IndexConfig(
            analyzer=Analyzer(stem=args.stem),
            segment_docs=args.segment_docs,
        )
        manifest = build_index(args.input, args.index, cfg)
        print(json.dumps(manifest))
        return 0
    if args.cmd == "trigram-build":
        from datamart_ray.index.trigram import (
            TrigramConfig,
            build_trigram_index,
        )

        manifest = build_trigram_index(
            args.input,
            args.index,
            TrigramConfig(
                text_col=args.text_col,
                id_col=args.id_col,
                segment_docs=args.segment_docs,
            ),
        )
        print(json.dumps(manifest))
        return 0
    if args.cmd == "trigram-delete":
        from datamart_ray.index.trigram_maintain import (
            trigram_delete_docs,
            trigram_delete_matching,
        )

        if args.ids:
            n = trigram_delete_docs(
                args.index, [int(x) for x in args.ids.split(",")]
            )
        elif args.pattern:
            if not args.corpus:
                raise SystemExit(
                    "trigram-delete --pattern needs --corpus"
                )
            n = trigram_delete_matching(
                args.index,
                args.corpus,
                args.pattern,
                regex=args.regex,
            )
        else:
            raise SystemExit(
                "trigram-delete needs --ids or --pattern"
            )
        print(json.dumps({"deleted": n}))
        return 0
    if args.cmd == "trigram-compact":
        from datamart_ray.index.trigram_maintain import trigram_compact

        out = trigram_compact(
            args.index, max_segments=args.max_segments
        )
        print(json.dumps(out, default=str))
        return 0
    if args.cmd == "serve":
        from datamart_ray.service import serve

        serve(args.index, args.corpus, args.tri_index, args.sf, args.port)
        return 0
    if args.cmd == "trigram-snapshot":
        from datamart_ray.index.trigram_maintain import trigram_snapshot

        print(json.dumps(trigram_snapshot(args.index, args.dest)))
        return 0
    if args.cmd == "trigram-restore":
        from datamart_ray.index.trigram_maintain import trigram_restore

        print(json.dumps(trigram_restore(args.snapshot, args.dest)))
        return 0
    if args.cmd == "trigram-verify":
        from datamart_ray.index.trigram_maintain import (
            trigram_verify_invariant,
        )

        out = trigram_verify_invariant(args.index)
        print(json.dumps(out))
        return 0 if all(
            v["counts_ok"] and v["postings_ok"]
            and v["ranges_ok"] is not False
            for v in out.values()
        ) else 1
    if args.cmd == "trigram-reindex":
        from datamart_ray.index.trigram import TrigramConfig
        from datamart_ray.index.trigram_maintain import (
            _load_tri_manifest,
            trigram_reindex,
        )

        cfg = None
        if args.text_col is not None:
            src_man = _load_tri_manifest(args.src_index)
            cfg = TrigramConfig(
                text_col=args.text_col, id_col=src_man["id_col"]
            )
        print(
            json.dumps(
                trigram_reindex(
                    args.input, args.src_index, args.dest_index, cfg
                )
            )
        )
        return 0
    if args.cmd == "trigram-lineage":
        from datamart_ray.index.trigram_maintain import trigram_lineage

        t = trigram_lineage(args.index)
        print(t.to_pandas().to_json(orient="records"))
        return 0
    if args.cmd == "trigram-delta":
        from datamart_ray.index.trigram import trigram_ingest_delta

        print(json.dumps(trigram_ingest_delta(args.index, args.input)))
        return 0
    if args.cmd == "grep":
        from datamart_ray.index.trigram import TrigramIndex

        if args.ingest_from:
            # the full on-demand path: isfile-filters the watch roots
            # (an empty or not-yet-created root is the normal steady
            # state, not an error) and skips already-known files
            from datamart_ray.index.build import _expand_paths
            from datamart_ray.index.trigram import (
                trigram_ingest_delta,
            )

            swept = [
                f
                for f in _expand_paths(args.ingest_from)
                if os.path.isfile(f)
            ]
            if swept:
                trigram_ingest_delta(args.index, swept)
        ti = TrigramIndex(args.index, args.corpus)
        flt = (
            {
                k: v
                for k, v in (
                    f.split("=", 1) for f in args.tri_filter
                )
            }
            or None
        )
        if args.stats_by:
            t = ti.match_stats_by(
                args.pattern,
                args.stats_by,
                regex=args.regex,
                ignore_case=args.ignore_case,
                filters=flt,
            )
        elif args.lines:
            t = ti.grep(
                args.pattern,
                regex=args.regex,
                ignore_case=args.ignore_case,
                filters=flt,
            )
        elif args.regex:
            t = ti.regexp_search(
                args.pattern,
                ignore_case=args.ignore_case,
                filters=flt,
            )
        else:
            t = ti.substring_search(
                args.pattern,
                ignore_case=args.ignore_case,
                filters=flt,
            )
        if args.json:
            print(json.dumps(t.to_pylist()))
        elif args.stats_by:
            for row in t.to_pylist():
                print(
                    f"{row[args.stats_by]}\t{row['n_docs']}"
                    f"\t{row['n_matches']}"
                )
        else:
            for row in t.to_pylist():
                if args.lines:
                    print(
                        f"{row['doc_id']}:{row['line_no']}:{row['line']}"
                    )
                else:
                    print(f"{row['doc_id']}\t{row['n_matches']}")
        return 0
    if args.cmd == "search":
        from datamart_ray.search.engine import (
            DistributedSearchEngine,
            SearchEngine,
        )

        if args.ingest_from:
            from datamart_ray.index.build import _expand_paths
            from datamart_ray.index.maintain import ingest_delta

            # empty/not-yet-created watch roots are steady state for a
            # query-triggered sweep — serve from the existing index
            swept = [
                f
                for f in _expand_paths(args.ingest_from)
                if os.path.isfile(f)
            ]
            if swept:
                ingest_delta(args.index, swept)
        if args.distributed:
            eng = DistributedSearchEngine(args.index, lazy=args.lazy)
        else:
            eng = SearchEngine(args.index, lazy=args.lazy)
        t = eng.search(
            args.query,
            k=args.k,
            mode=args.mode,
            filters=_parse_filters(args.filter) or None,
        )
        rows = list(
            zip(t["doc_id"].to_pylist(), t["score"].to_pylist())
        )
        if args.json:
            print(
                json.dumps(
                    [{"doc_id": d, "score": s} for d, s in rows]
                )
            )
        else:
            for d, s in rows:
                print(f"{d}\t{s:.6f}")
        if args.distributed:
            eng.shutdown()
        return 0
    if args.cmd == "delta":
        from datamart_ray.index.maintain import ingest_delta

        print(json.dumps(ingest_delta(args.index, args.input), default=str))
        return 0
    if args.cmd == "delete":
        from datamart_ray.index.maintain import (
            delete_by_query,
            delete_docs,
            delete_where,
        )

        if args.ids:
            n = delete_docs(
                args.index, [int(x) for x in args.ids.split(",")]
            )
        elif args.where:
            col, _, val = args.where.partition("=")
            n = delete_where(args.index, col, val)
        elif args.query:
            n = delete_by_query(args.index, args.query, mode=args.mode)
        else:
            raise SystemExit("delete needs --ids, --where or --query")
        print(json.dumps({"deleted": n}))
        return 0
    if args.cmd == "reindex":
        import dataclasses

        from datamart_ray.index.build import load_index_config
        from datamart_ray.index.maintain import reindex

        # inherit the SOURCE index's committed config — a default-built
        # IndexConfig would silently swap the analyzer and (worse)
        # replay src tombstone ids against differently-assigned docIDs
        cfg = load_index_config(args.src_index)
        overrides = {}
        if args.content_col is not None:
            overrides["content_col"] = args.content_col
        if args.id_col is not None:
            overrides["id_col"] = args.id_col
        if args.positions:
            overrides["positions"] = True
        if overrides:
            cfg = dataclasses.replace(cfg, **overrides)
        print(
            json.dumps(
                reindex(
                    args.input, args.src_index, args.dest_index, cfg
                ),
                default=str,
            )
        )
        return 0
    if args.cmd == "lineage":
        from datamart_ray.index.maintain import lineage_records

        t = lineage_records(args.index)
        print(t.to_pandas().to_json(orient="records"))
        return 0
    if args.cmd == "compact":
        from datamart_ray.index.maintain import compact_segments, tiered_merge

        if args.max_segments is not None:
            out = tiered_merge(args.index, max_segments=args.max_segments)
        else:
            out = compact_segments(args.index)
        print(json.dumps(out, default=str))
        return 0
    if args.cmd == "snapshot":
        from datamart_ray.index.maintain import snapshot_index

        print(json.dumps(snapshot_index(args.index, args.dest)))
        return 0
    if args.cmd == "restore":
        from datamart_ray.index.maintain import restore_index

        print(json.dumps(restore_index(args.snapshot, args.dest)))
        return 0
    if args.cmd == "analyze":
        if args.index:
            from datamart_ray.index.build import load_index_config

            analyzer = load_index_config(args.index).analyzer
        else:
            from datamart_ray.analyzer import Analyzer

            analyzer = Analyzer()
        print(json.dumps({"tokens": analyzer.tokenize(args.text)}))
        return 0
    if args.cmd == "profile":
        from datamart_ray.pipelines.profindex import build_profile_index

        idx = build_profile_index(args.sf)
        print(idx.to_json(orient="records"))
        return 0
    if args.cmd == "augment":
        from datamart_ray.pipelines.augment import (
            ag_join_orders_lineitem,
            ag_union_customer_supplier,
        )

        fn = (
            ag_join_orders_lineitem
            if args.task == "join"
            else ag_union_customer_supplier
        )
        out = fn(args.sf)
        print(out.head(20).to_json(orient="records"))
        return 0
    if args.cmd == "dedup":
        from datamart_ray.stages import dedup as dd
        from datamart_ray.stages.similarity import embedding_near_dups

        def thr(default: float) -> float:
            # explicit --threshold 0 is a valid value ("report all
            # verified pairs") — never `or`-default a float arg
            return (
                default if args.threshold is None else args.threshold
            )

        from datamart_ray.stages.similarity import (
            embedding_dedup_survivors,
        )

        if args.survivors and args.method == "exact":
            raise SystemExit(
                "exact dedup already outputs its keep-first manifest"
            )
        if args.method == "minhash":
            out = (
                dd.minhash_dedup_survivors(args.sf, threshold=thr(0.5))
                if args.survivors
                else dd.minhash_near_dups(args.sf, threshold=thr(0.5))
            )
        elif args.method == "simhash":
            out = (
                dd.simhash_dedup_survivors(args.sf, threshold=thr(0.5))
                if args.survivors
                else dd.simhash_dup_pairs(args.sf, threshold=thr(0.5))
            )
        elif args.method == "ngram":
            out = (
                dd.ngram_dedup_survivors(args.sf, threshold=thr(0.5))
                if args.survivors
                else dd.ngram_jaccard_near_dups(args.sf, threshold=thr(0.5))
            )
        elif args.method == "embedding":
            out = (
                embedding_dedup_survivors(args.sf, threshold=thr(0.45))
                if args.survivors
                else embedding_near_dups(args.sf, threshold=thr(0.45))
            )
        else:
            out = dd.exact_dedup_first(args.sf)
        print(out.to_json(orient="records"))
        return 0
    if args.cmd == "sample":
        from datamart_ray.stages.sampling import (
            split_assign,
            stratified_sample,
            temperature_mix_sample,
        )

        if args.mode == "temperature":
            out = temperature_mix_sample(
                args.sf, alpha=args.alpha, target=args.target
            )
        elif args.mode == "split":
            out = split_assign(args.sf)
        else:
            rates = {}
            for part in args.rates.split(","):
                k, _, v = part.partition("=")
                if k:
                    rates[k] = float(v)
            out = stratified_sample(
                args.sf, rates=rates, default_rate=args.default_rate
            )
        print(out.to_json(orient="records"))
        return 0
    if args.cmd == "pack":
        from datamart_ray.stages.packing import packed_windows

        print(
            packed_windows(args.sf, window=args.window).to_json(
                orient="records"
            )
        )
        return 0
    if args.cmd == "sessionize":
        from datamart_ray.pipelines.window import sessionize

        out = sessionize(args.sf, gap_sec=args.gap_sec)
        print(out.head(50).to_json(orient="records", date_format="iso"))
        return 0
    if args.cmd == "decontaminate":
        from datamart_ray.stages.decontaminate import contamination_counts

        ids = tuple(int(x) for x in args.benchmark_ids.split(","))
        out = contamination_counts(args.sf, benchmark_ids=ids)
        print(out.to_json(orient="records"))
        return 0
    if args.cmd == "cleanpack":
        from datamart_ray.pipelines.cleanpack import clean_pack_pipeline

        out = clean_pack_pipeline(
            args.sf, window=args.window, rare_thr=args.rare_thr
        )
        if args.out:
            import ray.data as rd

            from datamart_ray.sources.sink import write_parquet_resumable

            res = write_parquet_resumable(
                lambda: rd.from_pandas(out),
                args.out,
                key_col=out.columns[0],
                n_shards=args.shards,
            )
            print(json.dumps(res))
        else:
            print(out.to_json(orient="records"))
        return 0
    if args.cmd == "scrub":
        from datamart_ray.stages.pii import scrub_pii

        out = scrub_pii(args.sf)
        print(out.head(50).to_json(orient="records"))
        return 0
    if args.cmd == "knn":
        from datamart_ray.stages.similarity import (
            knn_cosine,
            knn_ivf,
            knn_lsh,
        )

        fn = {"brute": knn_cosine, "lsh": knn_lsh, "ivf": knn_ivf}[
            args.method
        ]
        ids = tuple(int(x) for x in args.query_ids.split(","))
        print(
            fn(args.sf, query_ids=ids, k=args.k).to_json(orient="records")
        )
        return 0
    if args.cmd == "kwsearch":
        from datamart_ray.pipelines.profindex import keyword_search_bm25

        out = keyword_search_bm25(args.sf, queries=(args.query,))
        print(out.to_json(orient="records"))
        return 0
    if args.cmd == "heap":
        from datamart_ray.index.heap import build_posting_heap
        from datamart_ray.index.manifest import active_segments

        built = [
            build_posting_heap(d) for d in active_segments(args.index)
        ]
        print(json.dumps({"heaps": built}))
        return 0
    if args.cmd == "prune":
        from datamart_ray.prune import prune_state

        report = prune_state(
            artifact_roots=args.artifacts,
            index_dirs=args.index,
            snapshot_dirs=args.snapshots,
            high_bytes=args.max_bytes,
            dry_run=args.dry_run,
        )
        print(json.dumps(report))
        return 0
    raise SystemExit(f"unknown command {args.cmd}")


if __name__ == "__main__":
    sys.exit(main())
