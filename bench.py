"""Benchmark harness — prints ONE JSON line with headline timings.

Headline metric: inverted-index build throughput (docs/sec) on the
synthetic source-code corpus (BASELINE.json metric) + BM25 query p50 +
representative relational/vector pipelines over $GRAFT_SF_DIR.

Modes:
  python bench.py            one run at RAY_GRAFT_CPUS (default 32)
  python bench.py --scaling  two fresh-process runs (8 vs 32 CPUs) on the
                             same input → throughput at both + scaling
                             efficiency = (T8/T32)/4 (sandbox evidence for
                             the N→4N cluster criterion).
  python bench.py --skew     skewed-join micro-bench: unsalted vs
                             hot_keys='auto' salted hash_join.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
CORPUS_DIR = os.environ.get("GRAFT_CORPUS_DIR", "/tmp/graft_corpus_bench")
CORPUS_FILES = 120000
CORPUS_TOKENS = 500


def ensure_corpus() -> str:
    """Deterministic code corpus, cached across runs (seed 42)."""
    marker = os.path.join(CORPUS_DIR, ".complete")
    if not os.path.exists(marker):
        from datamart_ray.corpus import generate_corpus

        shutil.rmtree(CORPUS_DIR, ignore_errors=True)
        generate_corpus(
            CORPUS_DIR,
            n_files=CORPUS_FILES,
            vocab_size=30000,
            n_repos=400,
            avg_tokens=CORPUS_TOKENS,
            n_output_files=32,
            seed=42,
            big_outliers=16,
        )
        open(marker, "w").write("ok")
    return CORPUS_DIR


def run_bench() -> dict:
    import ray

    try:  # before ray.init so the sample is ambient, not our own workers
        load_start = round(os.getloadavg()[0], 2)
    except OSError:
        load_start = None

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from datamart_ray.corpus import reference_queries
    from datamart_ray.index.build import IndexConfig, build_index
    from datamart_ray.search.engine import SearchEngine

    timings: dict[str, float] = {}
    extra: dict = {}

    corpus = ensure_corpus()
    # warm OS page cache so we measure compute+shuffle, not first disk read
    for f in sorted(os.listdir(corpus)):
        if f.endswith(".parquet"):
            with open(os.path.join(corpus, f), "rb") as fh:
                fh.read()

    # warm the Ray worker pool (process startup + imports) so both
    # parallelism levels measure compute, not cold-start
    import ray.data as _rd

    _rd.range(
        NUM_CPUS * 4, override_num_blocks=NUM_CPUS * 4
    ).map_batches(lambda b: b, num_cpus=1).count()

    # best-of-3 fresh builds: the shared host shows >2x run-to-run
    # variance from neighbor/steal bursts (measured 6.1s..22.9s for
    # IDENTICAL code within one hour), so a single sample mixes engine
    # speed with host noise; min-of-N is the same convention as
    # BASELINE.md's best-of-warm
    index_dir = f"/tmp/graft_bench_index_{NUM_CPUS}"
    build_secs = []
    for _ in range(3):
        shutil.rmtree(index_dir, ignore_errors=True)
        t0 = time.time()
        build_index(corpus, index_dir, IndexConfig())
        build_secs.append(time.time() - t0)
    timings["code_index_build"] = round(min(build_secs), 3)
    extra["index_build_runs"] = [round(s, 3) for s in build_secs]
    extra["index_docs"] = CORPUS_FILES
    extra["docs_per_sec"] = round(CORPUS_FILES / timings["code_index_build"], 1)

    # head-term warm-up (64 terms/segment): first-touch decode of head
    # postings otherwise dominates the p95 tail
    eng = SearchEngine(index_dir, warm_terms=64)
    lat = []
    qset = reference_queries()
    for _ in range(3):
        for q in qset:
            t0 = time.time()
            eng.search(
                q["query"],
                k=50,
                mode=q["mode"],
                filters={"lang": q["lang"]} if "lang" in q else None,
            )
            lat.append(time.time() - t0)
    timings["bm25_p50"] = round(statistics.median(lat), 4)
    extra["bm25_p95"] = round(sorted(lat)[int(len(lat) * 0.95)], 4)

    # giant-segment serving path: lazy=True reads every term through the
    # mmap posting-heap sidecar (built here on first open) — the numbers
    # a 100-TB segment would see, measured on the same query set
    t0 = time.time()
    leng = SearchEngine(index_dir, lazy=True)
    extra["heap_build_sec"] = round(time.time() - t0, 3)
    llat = []
    for _ in range(3):
        for q in qset:
            t0 = time.time()
            leng.search(
                q["query"],
                k=50,
                mode=q["mode"],
                filters={"lang": q["lang"]} if "lang" in q else None,
            )
            llat.append(time.time() - t0)
    extra["bm25_lazy_p50"] = round(statistics.median(llat), 4)
    extra["bm25_lazy_p95"] = round(sorted(llat)[int(len(llat) * 0.95)], 4)

    # distributed serving path (per-segment scorer actors, driver merge)
    from datamart_ray.search.engine import DistributedSearchEngine

    deng = DistributedSearchEngine(index_dir)
    dlat = []
    for _ in range(2):
        for q in qset:
            t0 = time.time()
            deng.search(
                q["query"],
                k=50,
                mode=q["mode"],
                filters={"lang": q["lang"]} if "lang" in q else None,
            )
            dlat.append(time.time() - t0)
    extra["bm25_dist_p50"] = round(statistics.median(dlat), 4)
    deng.shutdown()

    # positional index + phrase/fuzzy/prefix serving (round 3): one
    # fresh positional build (the delta vs code_index_build is the cost
    # of carrying positions through the same shuffle), then latency on
    # marker-based queries — hit counts don't matter for latency, the
    # decode volume of the touched postings does, so the head/common
    # markers are the stress case
    from datamart_ray.corpus import (
        MARKER_COMMON,
        MARKER_HEAD,
        MARKER_PAIR_A,
        MARKER_PAIR_B,
    )

    pos_dir = f"/tmp/graft_bench_index_pos_{NUM_CPUS}"
    shutil.rmtree(pos_dir, ignore_errors=True)
    t0 = time.time()
    build_index(corpus, pos_dir, IndexConfig(positions=True))
    extra["pos_index_build_sec"] = round(time.time() - t0, 3)
    peng = SearchEngine(pos_dir, lazy=False)
    phrases = [
        f"{MARKER_HEAD} {MARKER_COMMON}",
        f"{MARKER_COMMON} {MARKER_COMMON}",
        f"{MARKER_PAIR_A} {MARKER_PAIR_B}",
    ]
    # the per-reader phrase memo absorbs repeated identical phrases —
    # real, but a DISTINCT-phrase workload never hits it. The headline
    # p50 is measured cold (memo cleared before every call); the warm
    # number (repeat-phrase steady state) is reported separately.
    def _clear_phrase_memo(e):
        for r in e.readers:
            getattr(r, "_phrase_memo", {}).clear()

    plat, plat_warm = [], []
    for _ in range(3):
        for p in phrases:
            _clear_phrase_memo(peng)
            t0 = time.time()
            peng.phrase_search(p, k=50)
            plat.append(time.time() - t0)
            t0 = time.time()
            peng.phrase_search(p, k=50)
            plat_warm.append(time.time() - t0)
    extra["phrase_p50"] = round(statistics.median(plat), 4)
    extra["phrase_warm_p50"] = round(statistics.median(plat_warm), 4)
    flat_ = []
    fuzzies = [MARKER_COMMON[:-1], MARKER_PAIR_A[:-1]]
    for _ in range(3):
        for q in fuzzies:
            t0 = time.time()
            eng.fuzzy_search(q, k=50, max_edits=1)
            flat_.append(time.time() - t0)
    extra["fuzzy_p50"] = round(statistics.median(flat_), 4)
    prlat = []
    for _ in range(3):
        for q in ["qzcommon", "qzpair"]:
            t0 = time.time()
            eng.prefix_search(q, k=50)
            prlat.append(time.time() - t0)
    extra["prefix_p50"] = round(statistics.median(prlat), 4)
    # rescore API: OR window (block-max pruned) + phrase leg over the
    # window docs only — the phrase decode volume is the cost driver
    rslat, rslat_warm = [], []
    for _ in range(6):
        _clear_phrase_memo(peng)
        t0 = time.time()
        peng.rescore_search(
            f"{MARKER_HEAD} {MARKER_COMMON}",
            f"{MARKER_HEAD} {MARKER_COMMON}",
            window_size=50,
            k=50,
            rescore_weight=2.0,
        )
        rslat.append(time.time() - t0)
        t0 = time.time()
        peng.rescore_search(
            f"{MARKER_HEAD} {MARKER_COMMON}",
            f"{MARKER_HEAD} {MARKER_COMMON}",
            window_size=50,
            k=50,
            rescore_weight=2.0,
        )
        rslat_warm.append(time.time() - t0)
    extra["rescore_p50"] = round(statistics.median(rslat), 4)
    extra["rescore_warm_p50"] = round(statistics.median(rslat_warm), 4)
    del peng

    # bool / more_like_this serving (round 3 late): bool rides the same
    # postings as AND+OR; MLT pays a tokenize + df lookup + OR scoring
    blat = []
    for _ in range(3):
        for must, should, mnot in [
            (MARKER_COMMON, MARKER_HEAD, MARKER_PAIR_A),
            (MARKER_HEAD, "", MARKER_COMMON),
        ]:
            t0 = time.time()
            eng.bool_search(must=must, should=should, must_not=mnot, k=50)
            blat.append(time.time() - t0)
    extra["bool_p50"] = round(statistics.median(blat), 4)
    mlat = []
    seed_text = f"{MARKER_COMMON} {MARKER_HEAD} {MARKER_PAIR_A} alpha beta"
    for _ in range(6):
        t0 = time.time()
        eng.more_like_this(seed_text, k=50, max_query_terms=10)
        mlat.append(time.time() - t0)
    extra["mlt_p50"] = round(statistics.median(mlat), 4)

    # wildcard / regexp / suggest serving (round 3 final): dictionary
    # expansion cost (binary-search bound + one vectorized kernel) plus
    # the shared OR scoring of the expansion union
    wlat = []
    for _ in range(3):
        for pat in ["qzcommon*", "qz*needle"]:
            t0 = time.time()
            eng.wildcard_search(pat, k=50)
            wlat.append(time.time() - t0)
    extra["wildcard_p50"] = round(statistics.median(wlat), 4)
    rlat = []
    for _ in range(3):
        for pat in ["qzcommon.*", "qz(common|pair).*"]:
            t0 = time.time()
            eng.regexp_search(pat, k=50)
            rlat.append(time.time() - t0)
    extra["regexp_p50"] = round(statistics.median(rlat), 4)
    slat = []
    for _ in range(3):
        for term in [MARKER_COMMON[:-1] + "x", MARKER_PAIR_A[:-1] + "q"]:
            t0 = time.time()
            eng.suggest(term, size=3, max_edits=2)
            slat.append(time.time() - t0)
    extra["suggest_p50"] = round(statistics.median(slat), 4)
    clat = []
    for _ in range(6):
        t0 = time.time()
        eng.match_count(f"{MARKER_COMMON} {MARKER_HEAD}", mode="or")
        clat.append(time.time() - t0)
    extra["count_p50"] = round(statistics.median(clat), 4)
    # full-match aggregation serving (late r3): range buckets over the
    # match set's doclen — scores every match, not just top-k
    alat = []
    for _ in range(6):
        t0 = time.time()
        eng.matched_range_agg(
            f"{MARKER_COMMON} {MARKER_HEAD}",
            "doclen",
            ((None, 300), (300, 600), (600, None)),
            mode="or",
        )
        alat.append(time.time() - t0)
    extra["range_agg_p50"] = round(statistics.median(alat), 4)

    from datamart_ray.pipelines.relational import (
        q01_pricing_summary,
        q02_revenue_by_nation,
    )
    from datamart_ray.pipelines.fulltext import ft_df_top_terms
    from datamart_ray.stages.similarity import (
        knn_cosine,
        knn_ivfpq,
        knn_pq,
        knn_sq8,
    )

    for name, fn in [
        ("q01_pricing_summary", q01_pricing_summary),
        ("q02_revenue_by_nation", q02_revenue_by_nation),
        ("ft_df_top_terms", ft_df_top_terms),
        ("sim_knn_cosine", knn_cosine),
        ("sim_knn_sq8", knn_sq8),
        ("sim_knn_pq", knn_pq),
        ("sim_knn_ivfpq", knn_ivfpq),
    ]:
        t0 = time.time()
        fn(SF_DIR)
        timings[name] = round(time.time() - t0, 3)

    # dedup stage throughput over the 120k-doc code corpus: vectorized
    # MinHash signatures + banded-LSH candidate groupby (the near-dup
    # discovery kernel; VERDICT r1 asked for this number in BENCH)
    import pandas as _pd
    import pyarrow as _pa

    import ray.data as rd

    from datamart_ray.stages.dedup import minhash_candidate_pairs

    def add_ids(t: _pa.Table) -> _pa.Table:
        h = _pd.util.hash_array(
            t["path"].to_numpy(zero_copy_only=False)
        ).view("int64")
        return _pa.table({"doc_id": _pa.array(h), "text": t["content"]})

    dedup_ds = rd.read_parquet(
        corpus, columns=["path", "content"]
    ).map_batches(add_ids, batch_format="pyarrow")
    t0 = time.time()
    minhash_candidate_pairs(dedup_ds)
    timings["dedup_minhash_lsh"] = round(time.time() - t0, 3)
    extra["dedup_docs_per_sec"] = round(
        CORPUS_FILES / timings["dedup_minhash_lsh"], 1
    )

    # end-to-end VERIFIED near-dup pipeline over $GRAFT_SF_DIR documents
    # (r3: candidates + exact shingle-Jaccard verification, all
    # distributed — the full dd_minhash_near_dups path)
    from datamart_ray.stages.dedup import minhash_near_dups

    t0 = time.time()
    minhash_near_dups(SF_DIR)
    timings["dedup_minhash_verified"] = round(time.time() - t0, 3)

    # survivor selection (distributed connected components) — reported as
    # an extra so the headline `value` stays comparable across rounds
    from datamart_ray.stages.dedup import minhash_dedup_survivors

    t0 = time.time()
    surv = minhash_dedup_survivors(SF_DIR)
    extra["dedup_survivors_sec"] = round(time.time() - t0, 3)
    extra["dedup_survivors_removed"] = int(len(surv))

    # trigram content index over the same 120k-doc code corpus (NEW r4):
    # build = one bounded-keyspace shuffle (≤ 2^24 groups); queries =
    # posting intersection + exact verify on candidates only. The rare
    # needle shows the index path (ms); the common needle's cost is the
    # candidate fetch+verify (~N/3 docs), the honest selectivity floor.
    from datamart_ray.index.trigram import (
        TrigramConfig,
        TrigramIndex,
        build_trigram_index,
    )

    tri_dir = f"/tmp/graft_bench_tri_{NUM_CPUS}"
    shutil.rmtree(tri_dir, ignore_errors=True)
    t0 = time.time()
    build_trigram_index(
        corpus, tri_dir, TrigramConfig(text_col="content")
    )
    timings["code_trigram_build"] = round(time.time() - t0, 3)
    extra["trigram_docs_per_sec"] = round(
        CORPUS_FILES / timings["code_trigram_build"], 1
    )
    tri = TrigramIndex(tri_dir, corpus)
    t0 = time.time()
    tri.substring_search("qzuniqueneedle")
    extra["tri_substring_rare_sec"] = round(time.time() - t0, 4)
    t0 = time.time()
    tri.substring_search("qzcommonneedle")
    extra["tri_substring_common_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    tri.regexp_search("(qzpairneedlea|qzpairneedleb) qz")
    extra["tri_regex_sec"] = round(time.time() - t0, 3)

    ray.shutdown()
    value = round(sum(timings.values()), 3)
    # ambient host load at start, OUTSIDE this process (this sandbox shows
    # neighbor bursts of 8-12 load with zero local processes) — lets a
    # reader tell an engine slowdown from a noisy-host sample
    if load_start is not None:
        extra["loadavg_1m_at_start"] = load_start
    return {
        "metric": "headline pipeline seconds (index build + BM25 p50 + relational/vector queries)",
        "value": value,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        **extra,
    }


def run_scaling() -> dict:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    # two runs per level with a cooldown (a fresh Ray session immediately
    # after a previous one measures slower: residual raylet teardown +
    # page-cache churn); report the best run per level
    all_runs: dict[int, list] = {lo: [], hi: []}
    for ncpu in (lo, hi, lo, hi):
        time.sleep(8)
        all_runs[ncpu].append(one(ncpu))
    runs = {
        n: min(rs, key=lambda r: r["queries"]["code_index_build"])
        for n, rs in all_runs.items()
    }
    r_lo, r_hi = runs[lo], runs[hi]
    t_lo = r_lo["queries"]["code_index_build"]
    t_hi = r_hi["queries"]["code_index_build"]
    eff = (t_lo / t_hi) / (hi / lo)
    # the trigram build runs LAST in the headline (warm worker pool —
    # the cold-start floor is not part of the two-level protocol);
    # report its efficiency alongside the BM25 north-rule number
    tri_lo = min(
        r["queries"]["code_trigram_build"] for r in all_runs[lo]
    )
    tri_hi = min(
        r["queries"]["code_trigram_build"] for r in all_runs[hi]
    )
    tri_eff = (tri_lo / tri_hi) / (hi / lo)
    return {
        "metric": "index-build scaling efficiency (8 vs 32 CPUs, same input)",
        "cpus_low": lo,
        "cpus_high": hi,
        "sec_low": t_lo,
        "sec_high": t_hi,
        "docs_per_sec_low": round(CORPUS_FILES / t_lo, 1),
        "docs_per_sec_high": round(CORPUS_FILES / t_hi, 1),
        "scaling_efficiency": round(eff, 3),
        "trigram_sec_low": tri_lo,
        "trigram_sec_high": tri_hi,
        "trigram_scaling_efficiency": round(tri_eff, 3),
        "full_low": r_lo,
        "full_high": r_hi,
    }


SOAK_DIR = os.environ.get("GRAFT_SOAK_DIR", "/tmp/graft_soak")
SOAK_SHARDS = int(os.environ.get("GRAFT_SOAK_SHARDS", "10"))


def run_soak() -> dict:
    """sf1 soak (VERDICT r3 "Next round" #9): the same headline stages at
    10x the bench corpus — 1.2M docs in 10 deterministic 120k-doc shards
    (seeds 42..51; the planted markers recur per shard, so BM25 serving
    and the cross-shard TIE_CONTENT dup group stay meaningful) — with a
    memory high-water sampler and an object-spill check. One segment at
    this size crosses AUTO_LAZY_POSTINGS, so serving exercises the
    giant-segment mmap heap path end-to-end."""
    import threading

    hw = {"used_bytes": 0, "spill_bytes": 0}
    stop = threading.Event()

    def _spill_bytes() -> int:
        # Ray unlinks spill files as objects are restored/freed, so an
        # end-of-run walk sees nothing — sample DURING the run and keep
        # the high-water. Default spill home: ray_spilled_objects under
        # the session dir.
        import glob as _glob

        total = 0
        for d in _glob.glob("/tmp/ray/session_latest/ray_spilled_objects*"):
            for dirpath, _, filenames in os.walk(os.path.realpath(d)):
                for f in filenames:
                    try:
                        total += os.path.getsize(os.path.join(dirpath, f))
                    except OSError:
                        pass
        return total

    def _sample():
        while not stop.is_set():
            m = {}
            with open("/proc/meminfo") as f:
                for ln in f:
                    k, v = ln.split(":", 1)
                    m[k] = int(v.split()[0])
            used = (m["MemTotal"] - m["MemAvailable"]) * 1024
            hw["used_bytes"] = max(hw["used_bytes"], used)
            try:
                hw["spill_bytes"] = max(hw["spill_bytes"], _spill_bytes())
            except OSError:
                pass
            stop.wait(0.5)

    sampler = threading.Thread(target=_sample, daemon=True)
    sampler.start()

    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from datamart_ray.corpus import generate_corpus, reference_queries
    from datamart_ray.index.build import IndexConfig, build_index
    from datamart_ray.search.engine import SearchEngine

    timings: dict[str, float] = {}
    extra: dict = {}
    n_docs = CORPUS_FILES * SOAK_SHARDS

    # --- corpus: 10 cached deterministic shards ---------------------------
    t0 = time.time()
    shard_dirs = []
    for j in range(SOAK_SHARDS):
        d = os.path.join(SOAK_DIR, f"shard-{j:02d}")
        marker = os.path.join(d, ".complete")
        if not os.path.exists(marker):
            shutil.rmtree(d, ignore_errors=True)
            generate_corpus(
                d,
                n_files=CORPUS_FILES,
                vocab_size=30000,
                n_repos=400,
                avg_tokens=CORPUS_TOKENS,
                n_output_files=32,
                seed=42 + j,
                big_outliers=16,
            )
            open(marker, "w").write("ok")
        shard_dirs.append(d)
    extra["corpus_gen_sec"] = round(time.time() - t0, 3)
    extra["soak_docs"] = n_docs

    # --- index build (single run; one segment > AUTO_LAZY_POSTINGS) ------
    index_dir = os.path.join(SOAK_DIR, "index")
    shutil.rmtree(index_dir, ignore_errors=True)
    t0 = time.time()
    manifest = build_index(shard_dirs, index_dir, IndexConfig())
    timings["index_build"] = round(time.time() - t0, 3)
    extra["docs_per_sec"] = round(n_docs / timings["index_build"], 1)
    extra["segments"] = len(manifest["segments"])

    # --- serving (lazy/mmap path; first open builds the heap sidecar) ----
    t0 = time.time()
    eng = SearchEngine(index_dir, warm_terms=64)
    extra["engine_open_sec"] = round(time.time() - t0, 3)
    lat = []
    qset = reference_queries()
    for _ in range(3):
        for q in qset:
            t0 = time.time()
            eng.search(
                q["query"],
                k=50,
                mode=q["mode"],
                filters={"lang": q["lang"]} if "lang" in q else None,
            )
            lat.append(time.time() - t0)
    timings["bm25_p50"] = round(statistics.median(lat), 4)
    extra["bm25_p95"] = round(sorted(lat)[int(len(lat) * 0.95)], 4)

    # --- sharded serving: the 100-TB shape at sf1 ------------------------
    # The single-segment p95 above is posting-length-bound (head terms
    # carry ~400k postings at 10x df). At cluster scale the same corpus
    # is built into many segments served by scorer actors; prove that
    # shape here: segment_docs = one shard -> 10 segments, served by
    # DistributedSearchEngine, rank-identical to the single-segment
    # engine (global-stats protocol) with per-actor posting lengths back
    # at sf0.1 scale.
    from datamart_ray.search.engine import DistributedSearchEngine

    sharded_dir = os.path.join(SOAK_DIR, "index_sharded")
    shutil.rmtree(sharded_dir, ignore_errors=True)
    t0 = time.time()
    sharded_manifest = build_index(
        shard_dirs, sharded_dir, IndexConfig(segment_docs=CORPUS_FILES)
    )
    timings["index_build_sharded"] = round(time.time() - t0, 3)
    extra["segments_sharded"] = len(sharded_manifest["segments"])
    t0 = time.time()
    deng = DistributedSearchEngine(sharded_dir)
    extra["dist_engine_open_sec"] = round(time.time() - t0, 3)
    dlat = []
    rank_identical = True
    for rep in range(3):
        for q in qset:
            t0 = time.time()
            dres = deng.search(
                q["query"],
                k=50,
                mode=q["mode"],
                filters={"lang": q["lang"]} if "lang" in q else None,
            )
            dlat.append(time.time() - t0)
            if rep == 0:
                sres = eng.search(
                    q["query"],
                    k=50,
                    mode=q["mode"],
                    filters={"lang": q["lang"]} if "lang" in q else None,
                )
                if dres.column("doc_id").to_pylist() != sres.column(
                    "doc_id"
                ).to_pylist():
                    rank_identical = False
    extra["bm25_sharded_p50"] = round(statistics.median(dlat), 4)
    extra["bm25_sharded_p95"] = round(sorted(dlat)[int(len(dlat) * 0.95)], 4)
    extra["sharded_rank_identical"] = rank_identical
    del deng

    # --- dedup end-to-end: LSH candidates + exact-Jaccard verification ---
    import pandas as _pd
    import pyarrow as _pa

    import ray.data as rd

    from datamart_ray.stages.dedup import (
        minhash_candidate_pairs_ds,
        verify_pairs_jaccard_ds,
    )

    norm = os.path.join(SOAK_DIR, "docs")
    if not os.path.exists(os.path.join(norm, ".complete")):
        shutil.rmtree(norm, ignore_errors=True)
        for j, d in enumerate(shard_dirs):
            prefix = f"{j:02d}:"

            def add_ids(t: _pa.Table, _p=prefix) -> _pa.Table:
                keys = _p + _pd.Series(
                    t["path"].to_numpy(zero_copy_only=False)
                ).astype(str)
                h = _pd.util.hash_array(keys.to_numpy()).view("int64")
                return _pa.table(
                    {"doc_id": _pa.array(h), "text": t["content"]}
                )

            rd.read_parquet(d, columns=["path", "content"]).map_batches(
                add_ids, batch_format="pyarrow"
            ).write_parquet(norm)
        open(os.path.join(norm, ".complete"), "w").write("ok")

    t0 = time.time()
    cand = minhash_candidate_pairs_ds(
        rd.read_parquet(norm, columns=["doc_id", "text"])
    )
    verified = verify_pairs_jaccard_ds(norm, cand, 3, 0.5)
    timings["dedup_verified_e2e"] = round(time.time() - t0, 3)
    extra["dedup_docs_per_sec"] = round(
        n_docs / timings["dedup_verified_e2e"], 1
    )
    extra["verified_pairs"] = int(len(verified))
    # the cross-shard TIE_CONTENT copies (docs 20/21 x SOAK_SHARDS) must
    # all be found: C(2*shards, 2) exact-dup pairs is the floor
    ties = 2 * SOAK_SHARDS
    extra["verified_pairs_floor"] = ties * (ties - 1) // 2
    extra["verified_pairs_floor_ok"] = bool(
        len(verified) >= extra["verified_pairs_floor"]
    )

    # --- trigram content index at sf1 (r4) --------------------------------
    # 300k-doc segments: the pair exchange is bounded per segment
    # (~5.5 GB each) instead of one 22 GB all-at-once — the designed
    # mitigation for the single-node object store, same lesson as the
    # sharded BM25 build above. Serving goes through the actor-pool
    # handle (posting tables never on the driver at this size).
    from datamart_ray.index.trigram import (
        DistributedTrigramIndex,
        TrigramConfig,
        build_trigram_index,
    )

    tri_dir = os.path.join(SOAK_DIR, "tri_index")
    shutil.rmtree(tri_dir, ignore_errors=True)
    t0 = time.time()
    build_trigram_index(
        shard_dirs,
        tri_dir,
        TrigramConfig(text_col="content", segment_docs=300_000),
    )
    timings["trigram_build"] = round(time.time() - t0, 3)
    extra["trigram_docs_per_sec"] = round(
        n_docs / timings["trigram_build"], 1
    )
    t0 = time.time()
    tri = DistributedTrigramIndex(tri_dir, shard_dirs, n_actors=4)
    extra["tri_dist_open_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    hits = tri.substring_search("qzuniqueneedle")
    extra["tri_substring_rare_sec"] = round(time.time() - t0, 4)
    # one planted unique doc per shard
    extra["tri_rare_hits_ok"] = bool(hits.num_rows == SOAK_SHARDS)
    t0 = time.time()
    tri.substring_search("qzpairneedlea qz")
    extra["tri_substring_mid_sec"] = round(time.time() - t0, 3)
    tri.shutdown()

    # --- memory + spill ----------------------------------------------------
    stop.set()
    sampler.join()
    # high-water sampled during the run (files are unlinked as objects
    # free) plus a final sweep for anything still on disk
    spilled = max(hw["spill_bytes"], _spill_bytes())
    with open("/proc/self/status") as f:
        vmhwm_kb = next(
            int(ln.split()[1]) for ln in f if ln.startswith("VmHWM")
        )
    ray.shutdown()
    value = round(sum(timings.values()), 3)
    return {
        "metric": "sf1 soak seconds (1.2M docs: build + BM25 + verified dedup)",
        "value": value,
        "unit": "sec",
        "queries": timings,
        "sf": "sf1-synthetic(10x bench corpus)",
        "num_cpus": NUM_CPUS,
        "mem_high_water_gb": round(hw["used_bytes"] / 2**30, 2),
        "driver_peak_rss_gb": round(vmhwm_kb * 1024 / 2**30, 2),
        "object_spilled_gb": round(spilled / 2**30, 2),
        **extra,
    }


def run_skew() -> dict:
    """Skew-join micro-bench: a probe table where ONE key holds half the
    rows, inner-joined against a small build table, unsalted vs salted
    (`hot_keys="auto"` = heavy-hitter detection + probe salt + build
    replication). Evidence for the north rule's skew-aware shuffle claim:
    the unsalted join concentrates half the merge work in one bucket
    task; salting spreads it over SALT_FANOUT tasks."""
    import numpy as np
    import pandas as pd
    import ray
    import ray.data as rd

    from datamart_ray.pipelines.joins import hash_join

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    n = 4_000_000
    rng = np.random.default_rng(42)
    keys = np.where(
        rng.random(n) < 0.5, 7, rng.integers(0, 20_000, n)
    ).astype(np.int64)
    probe = pd.DataFrame(
        {"k": keys, "v": rng.integers(0, 1_000_000, n)}
    )
    build = pd.DataFrame(
        {"k": np.arange(20_000, dtype=np.int64), "w": np.arange(20_000)}
    )
    probe_ds = rd.from_pandas(probe).repartition(64).materialize()
    build_ds = rd.from_pandas(build).repartition(8).materialize()

    out = {}
    for label, hot in (("unsalted", None), ("salted_auto", "auto")):
        t0 = time.time()
        cnt = hash_join(
            probe_ds, build_ds, left_on="k", hot_keys=hot
        ).count()
        out[label + "_sec"] = round(time.time() - t0, 3)
        out[label + "_rows"] = cnt
    ray.shutdown()
    out["speedup"] = round(out["unsalted_sec"] / out["salted_auto_sec"], 2)
    return {
        "metric": "skewed inner join (50% of 4M probe rows on one key), "
        "unsalted vs hot_keys='auto'",
        "num_cpus": NUM_CPUS,
        **out,
    }


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--soak" in sys.argv:
        print(json.dumps(run_soak()))
    elif "--skew" in sys.argv:
        print(json.dumps(run_skew()))
    else:
        print(json.dumps(run_bench()))
