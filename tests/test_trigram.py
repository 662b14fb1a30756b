"""Trigram content index: extraction, literal analysis, build/query,
resume, and both verify paths (fetch fast path vs streaming full scan).
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from datamart_ray.index import trigram as tg


def _brute_trigrams(s: str) -> set:
    b = s.encode("utf-8")
    return {
        (b[i] << 16) | (b[i + 1] << 8) | b[i + 2]
        for i in range(len(b) - 2)
    }


def _brute_postings(tri: np.ndarray, doc: np.ndarray, base: int = 0):
    """Reference result: {tri: sorted docID list} from raw pairs."""
    out = {}
    for t_, d_ in zip(tri.tolist(), doc.tolist()):
        out.setdefault(int(t_), []).append(int(d_) + base)
    return {k: sorted(v) for k, v in out.items()}


@pytest.mark.parametrize("dense", [True, False])
def test_partial_posting_exchange_matches_bruteforce(dense):
    """The build exchange ships partial-encoded posting rows; splitting
    the pairs into arbitrary blocks, partial-encoding each, shuffling
    the row order, and merging per bucket must reproduce the exact
    brute-force postings — for dense (disjoint ascending ranges) AND
    arbitrary interleaved docIDs (the id_col lexsort-repair path)."""
    from datamart_ray.index import codec

    rng = np.random.default_rng(7)
    n = 5000
    tri = rng.integers(0, 300, n).astype(np.int64)
    if dense:
        doc = np.arange(n, dtype=np.int64) // 4  # ascending, dup tris ok
    else:
        doc = rng.integers(0, 10_000_000, n).astype(np.int64)
    # distinct (tri, doc) pairs, like trigram_pairs guarantees
    u = np.unique(tri * (1 << 32) + doc)
    tri, doc = u >> 32, u & 0xFFFFFFFF
    want = _brute_postings(tri, doc, base=17)

    # split into blocks: dense → contiguous doc ranges (the spec
    # layout); arbitrary → random interleaved blocks
    if dense:
        order = np.argsort(doc, kind="stable")
        blocks = np.array_split(order, 7)
    else:
        perm = rng.permutation(tri.size)
        blocks = np.array_split(perm, 7)
    parts = [
        tg.partial_posting_rows(tri[b], doc[b]) for b in blocks
    ]
    exchanged = pa.concat_tables([p for p in parts if p.num_rows])
    # shuffle exchange row order (the all-to-all gives no ordering)
    idx = rng.permutation(exchanged.num_rows)
    exchanged = exchanged.take(pa.array(idx))
    merged = tg._merge_bucket(exchanged, base=17)
    got = {
        int(t_): codec.decode_docids(b_).tolist()
        for t_, b_ in zip(
            merged["tri"].to_pylist(), merged["docs"].to_pylist()
        )
    }
    assert got == want
    assert merged["df"].to_pylist() == [
        len(want[t_]) for t_ in merged["tri"].to_pylist()
    ]


def test_dense_partials_matches_bruteforce():
    """The uint32 chunk kernel (dense ids) must agree with the raw
    trigram_pairs + lexsort path across chunk boundaries, nulls, short
    docs, and multi-byte UTF-8."""
    from datamart_ray.index import codec

    rng = np.random.default_rng(11)
    texts = []
    toks = ["foo", "barbaz", "qux()", "naïve", "x", "", "zz"]
    for i in range(700):  # > 2 chunks of 256
        k = int(rng.integers(0, 9))
        texts.append(
            " ".join(
                toks[int(j)] for j in rng.integers(0, len(toks), k)
            )
            or None
        )
    arr = pa.array(texts, type=pa.string())
    base = 5000
    got_t = tg.dense_partials(arr, base)
    merged = tg._merge_bucket(got_t)
    got = {
        int(t_): codec.decode_docids(b_).tolist()
        for t_, b_ in zip(
            merged["tri"].to_pylist(), merged["docs"].to_pylist()
        )
    }
    ids = base + np.arange(len(texts), dtype=np.int64)
    pairs = tg.trigram_pairs(arr, ids)
    want = _brute_postings(
        pairs["tri"].to_numpy(zero_copy_only=False),
        pairs["doc_id"].to_numpy(zero_copy_only=False),
    )
    assert got == want


def test_partial_posting_rows_empty_is_typed():
    t = tg.partial_posting_rows(
        np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    )
    assert t.schema.equals(tg.TRI_PARTIAL_SCHEMA)
    assert tg._merge_bucket(t).schema.equals(tg.TRI_POSTINGS_SCHEMA)


def test_trigram_pairs_matches_bruteforce():
    texts = [
        "hello world",
        "",
        None,
        "ab",  # < 3 bytes → nothing
        "aaa",  # repeated trigram → one pair
        "naïve café ünïcode",  # multi-byte UTF-8 → byte trigrams
        "x" * 1000,
    ]
    ids = np.arange(100, 100 + len(texts), dtype=np.int64)
    t = tg.trigram_pairs(pa.array(texts, type=pa.string()), ids)
    got = set(
        zip(
            t["tri"].to_numpy(zero_copy_only=False).tolist(),
            t["doc_id"].to_numpy(zero_copy_only=False).tolist(),
        )
    )
    want = set()
    for i, s in enumerate(texts):
        for tri in _brute_trigrams(s or ""):
            want.add((tri, 100 + i))
    assert got == want
    # distinct per doc: no duplicate (tri, doc) rows
    assert len(got) == t.num_rows


def test_required_literals():
    rl = tg.required_literals
    assert rl("hello") == [{"hello"}]
    assert rl("foo.*bar") == [{"foo", "bar"}]
    # alternation → DNF union
    assert sorted(map(sorted, rl("(abc|def)ghi"))) == [
        ["abc", "ghi"],
        ["def", "ghi"],
    ]
    # optional group contributes nothing; mandatory literal remains
    assert rl("(xyz)?abcd") == [{"abcd"}]
    # no literal ≥ 3 bytes anywhere → None (full scan)
    assert rl("a[bc]d") is None
    assert rl("[0-9]+") is None
    # repeat with min ≥ 1 is required
    assert rl("(abc)+tail") == [{"abc", "tail"}]
    # unparseable → None, never raises
    assert rl("(unclosed") is None


@pytest.fixture(scope="module")
def code_corpus(ray_session, tmp_path_factory):
    """Small code-shaped corpus (repo/path/commit/lang/content, dense
    file-offset docIDs — the BASELINE.json input_hint shape)."""
    from datamart_ray.corpus import generate_corpus

    d = str(tmp_path_factory.mktemp("tri_corpus"))
    generate_corpus(d, n_files=300, vocab_size=500, n_repos=6, seed=7)
    return d


@pytest.fixture(scope="module")
def tri_index(ray_session, code_corpus, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("tri_idx"))
    tg.build_trigram_index(
        code_corpus, idx, tg.TrigramConfig(text_col="content")
    )
    return tg.TrigramIndex(idx, code_corpus)


def _expected(code_corpus, kernel):
    files = sorted(
        os.path.join(code_corpus, f)
        for f in os.listdir(code_corpus)
        if f.endswith(".parquet")
    )
    tables, base = [], 0
    for f in files:
        t = pq.read_table(f, columns=["content"])
        tables.append((t, base))
        base += t.num_rows
    ids, counts = [], []
    for t, b in tables:
        c = pc.fill_null(kernel(t["content"]), 0).to_numpy(
            zero_copy_only=False
        )
        m = c > 0
        ids.append(b + np.flatnonzero(m))
        counts.append(c[m])
    ids = np.concatenate(ids)
    counts = np.concatenate(counts)
    order = np.argsort(ids, kind="stable")
    return ids[order], counts[order].astype(np.int64)


def test_substring_search_exact(code_corpus, tri_index):
    for needle in ["alba", "qzcommonneedle", "totally-absent-needle"]:
        got = tri_index.substring_search(needle)
        eids, ecnt = _expected(
            code_corpus, lambda col, n=needle: pc.count_substring(col, n)
        )
        assert got["doc_id"].to_numpy().tolist() == eids.tolist()
        assert got["n_matches"].to_numpy().tolist() == ecnt.tolist()


def test_regex_search_exact(code_corpus, tri_index):
    pat = "(qzcommonneedle|qzpairneedlea)"
    got = tri_index.regexp_search(pat)
    eids, ecnt = _expected(
        code_corpus,
        lambda col: pc.count_substring_regex(col, pat),
    )
    assert got["doc_id"].to_numpy().tolist() == eids.tolist()
    assert got["n_matches"].to_numpy().tolist() == ecnt.tolist()


def test_fullscan_equals_filtered(code_corpus, tri_index):
    """A pattern the literal extractor can't bound must return the same
    rows through the streaming full-scan path as the trigram-filtered
    equivalent substring query does."""
    full = tri_index.regexp_search("qzcommonneedl[e]")  # no ≥3 literal?
    # '[e]' may parse as LITERAL on some versions — force the honest
    # comparison against the substring path either way
    filt = tri_index.substring_search("qzcommonneedle")
    assert full["doc_id"].to_numpy().tolist() == filt[
        "doc_id"
    ].to_numpy().tolist()


def test_streaming_verify_above_cap(code_corpus, tri_index, monkeypatch):
    """Forcing the fetch cap to 0 routes candidate verification through
    the distributed broadcast-filter stream — results identical."""
    fast = tri_index.substring_search("qzcommonneedle")
    monkeypatch.setattr(tg, "VERIFY_FETCH_CAP", -1)
    slow = tri_index.substring_search("qzcommonneedle")
    assert fast.equals(slow)


def _brute_grep(code_corpus, pattern, regex):
    import re as _re

    files = sorted(
        os.path.join(code_corpus, f)
        for f in os.listdir(code_corpus)
        if f.endswith(".parquet")
    )
    rows, base = [], 0
    for f in files:
        t = pq.read_table(f, columns=["content"])
        for i, s in enumerate(t["content"].to_pylist()):
            for ln, line in enumerate((s or "").split("\n"), 1):
                n = (
                    len(_re.findall(pattern, line))
                    if regex
                    else line.count(pattern)
                )
                if n:
                    rows.append((base + i, ln, line, n))
        base += t.num_rows
    rows.sort()
    return rows


@pytest.mark.parametrize(
    "pattern,regex",
    [("qzcommonneedle", False), ("qzpairneedle[ab]", True)],
)
def test_grep_lines_exact(code_corpus, tri_index, pattern, regex):
    got = tri_index.grep(pattern, regex=regex)
    want = _brute_grep(code_corpus, pattern, regex)
    assert (
        list(
            zip(
                got["doc_id"].to_pylist(),
                got["line_no"].to_pylist(),
                got["line"].to_pylist(),
                got["n_matches"].to_pylist(),
            )
        )
        == want
    )


def test_grep_streaming_parity(code_corpus, tri_index, monkeypatch):
    fast = tri_index.grep("qzcommonneedle")
    monkeypatch.setattr(tg, "VERIFY_FETCH_CAP", -1)
    slow = tri_index.grep("qzcommonneedle")
    assert fast.equals(slow)


def test_cli_trigram_build_and_grep(
    code_corpus, tmp_path, capsys, ray_session
):
    from datamart_ray.__main__ import main

    idx = str(tmp_path / "cli_tri")
    assert (
        main(
            [
                "trigram-build",
                "--input",
                code_corpus,
                "--index",
                idx,
            ]
        )
        == 0
    )
    capsys.readouterr()
    assert (
        main(
            [
                "grep",
                "--index",
                idx,
                "--corpus",
                code_corpus,
                "--pattern",
                "qzuniqueneedle",
            ]
        )
        == 0
    )
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1 and out[0].endswith("\t1")
    assert (
        main(
            [
                "grep",
                "--index",
                idx,
                "--corpus",
                code_corpus,
                "--pattern",
                "qzpairneedle[ab]",
                "--regex",
                "--lines",
            ]
        )
        == 0
    )
    out = capsys.readouterr().out.strip().splitlines()
    want = _brute_grep(code_corpus, "qzpairneedle[ab]", True)
    assert len(out) == len(want)
    assert out[0] == f"{want[0][0]}:{want[0][1]}:{want[0][2]}"


def test_build_resume_skips_committed(code_corpus, tmp_path):
    idx = str(tmp_path / "idx")
    tg.build_trigram_index(
        code_corpus, idx, tg.TrigramConfig(text_col="content")
    )
    seg = tg._committed_tri_segments(idx)[0]
    before = os.path.getmtime(os.path.join(seg, "MANIFEST.json"))
    tg.build_trigram_index(
        code_corpus, idx, tg.TrigramConfig(text_col="content")
    )
    after = os.path.getmtime(os.path.join(seg, "MANIFEST.json"))
    assert before == after  # committed segment untouched on re-run


def test_multi_segment_union(code_corpus, tmp_path):
    """Tiny segment_docs → several segments; results must equal the
    single-segment index (docID ranges partition across segments)."""
    idx = str(tmp_path / "idx_multi")
    tg.build_trigram_index(
        code_corpus,
        idx,
        tg.TrigramConfig(text_col="content", segment_docs=64),
    )
    ti = tg.TrigramIndex(idx, code_corpus)
    assert len(ti.segments) > 1
    got = ti.substring_search("qzcommonneedle")
    eids, ecnt = _expected(
        code_corpus,
        lambda col: pc.count_substring(col, "qzcommonneedle"),
    )
    assert got["doc_id"].to_numpy().tolist() == eids.tolist()
    assert got["n_matches"].to_numpy().tolist() == ecnt.tolist()


def test_distributed_index_parity(code_corpus, tmp_path, ray_session):
    """Actor-pool serving returns bit-identical results to the local
    eager index across substring / regex / grep, including with several
    segments spread over multiple actors."""
    idx = str(tmp_path / "idx_dist")
    tg.build_trigram_index(
        code_corpus,
        idx,
        tg.TrigramConfig(text_col="content", segment_docs=64),
    )
    local = tg.TrigramIndex(idx, code_corpus)
    dist = tg.DistributedTrigramIndex(idx, code_corpus, n_actors=3)
    assert len(dist.actors) == 3
    try:
        for needle in ["qzcommonneedle", "qzuniqueneedle", "absent-x"]:
            assert dist.substring_search(needle).equals(
                local.substring_search(needle)
            )
        pat = "qzpairneedle[ab]"
        assert dist.regexp_search(pat).equals(local.regexp_search(pat))
        assert dist.grep("qzcommonneedle").equals(
            local.grep("qzcommonneedle")
        )
    finally:
        dist.shutdown()


def test_case_variant_tris():
    # 'abc' folds over {a,A}x{b,B}x{c,C} = 8 variants per position
    pv = tg.case_variant_tris("AbC")
    assert pv is not None and len(pv) == 1 and len(pv[0]) == 8
    # digits/punct are case-stable → single variant
    pv = tg.case_variant_tris("1+2")
    assert pv == [[tg.string_trigrams("1+2")[0]]]
    # non-ASCII letters don't fold byte-stably → None (full scan)
    assert tg.case_variant_tris("naïve") is None
    assert tg.case_variant_tris("ab") is None


def test_ignore_case_search(code_corpus, tri_index):
    """Wrong-case needles must match the lowercase corpus under
    ignore_case (and miss without it); counts equal the
    lower-both-sides brute force."""
    got = tri_index.substring_search("QZCOMMONNEEDLE", ignore_case=True)
    want = tri_index.substring_search("qzcommonneedle")
    assert got.equals(want)
    assert (
        tri_index.substring_search("QZCOMMONNEEDLE").num_rows == 0
    )
    got = tri_index.regexp_search("QZPAIRNEEDLE[AB]", ignore_case=True)
    want = tri_index.regexp_search("qzpairneedle[ab]")
    assert got.equals(want)
    g = tri_index.grep("QZUNIQUENEEDLE", ignore_case=True)
    assert g.num_rows == tri_index.grep("qzuniqueneedle").num_rows == 1


def test_ignore_case_distributed_parity(
    code_corpus, tmp_path, ray_session
):
    idx = str(tmp_path / "idx_nc")
    tg.build_trigram_index(
        code_corpus,
        idx,
        tg.TrigramConfig(text_col="content", segment_docs=64),
    )
    local = tg.TrigramIndex(idx, code_corpus)
    dist = tg.DistributedTrigramIndex(idx, code_corpus, n_actors=2)
    try:
        assert dist.substring_search(
            "QZCOMMONNEEDLE", ignore_case=True
        ).equals(
            local.substring_search("QZCOMMONNEEDLE", ignore_case=True)
        )
    finally:
        dist.shutdown()


def test_filters_and_match_stats(code_corpus, tri_index, monkeypatch):
    """Metadata equality filters + per-group rollup, fetch AND streaming
    paths, against a brute force over (content, lang)."""
    files = sorted(
        os.path.join(code_corpus, f)
        for f in os.listdir(code_corpus)
        if f.endswith(".parquet")
    )
    texts, langs = [], []
    for f in files:
        t = pq.read_table(f, columns=["content", "lang"])
        texts += t["content"].to_pylist()
        langs += t["lang"].to_pylist()
    needle = "qzcommonneedle"
    want_ids = [
        i
        for i, (s, lg) in enumerate(zip(texts, langs))
        if needle in (s or "") and lg == "python"
    ]
    got = tri_index.substring_search(needle, filters={"lang": "python"})
    assert got["doc_id"].to_pylist() == want_ids

    stats = tri_index.match_stats_by(needle, "lang")
    want = {}
    for s, lg in zip(texts, langs):
        n = (s or "").count(needle)
        if n:
            d, m = want.get(lg, (0, 0))
            want[lg] = (d + 1, m + n)
    got_stats = {
        r["lang"]: (r["n_docs"], r["n_matches"])
        for r in stats.to_pylist()
    }
    assert got_stats == want
    assert stats["lang"].to_pylist() == sorted(want)

    # streaming path parity for both
    monkeypatch.setattr(tg, "VERIFY_FETCH_CAP", -1)
    assert tri_index.substring_search(
        needle, filters={"lang": "python"}
    ).equals(got)
    assert tri_index.match_stats_by(needle, "lang").equals(stats)


def test_grep_with_filter(code_corpus, tri_index):
    full = tri_index.grep("qzcommonneedle")
    scoped = tri_index.grep(
        "qzcommonneedle", filters={"lang": "python"}
    )
    assert 0 < scoped.num_rows < full.num_rows
    ids = set(scoped["doc_id"].to_pylist())
    assert ids <= set(full["doc_id"].to_pylist())


def test_like_search(code_corpus, tri_index):
    """LIKE semantics parity against a regex translation of the
    pattern (fullmatch, % -> .*, _ -> .), including the anchored
    (no leading %) case."""
    import re as _re

    files = sorted(
        os.path.join(code_corpus, f)
        for f in os.listdir(code_corpus)
        if f.endswith(".parquet")
    )
    texts = []
    for f in files:
        texts += pq.read_table(f, columns=["content"])[
            "content"
        ].to_pylist()

    def like_re(pattern):
        out = ""
        for ch in pattern:
            out += (
                ".*" if ch == "%" else "." if ch == "_"
                else _re.escape(ch)
            )
        return _re.compile(out, _re.DOTALL)

    for pattern in [
        "%qzcommonneedle%qzpairneedlea%",
        "%qzuniqueneedle%",
        "qzneverstarts%",
    ]:
        got = tri_index.like_search(pattern)["doc_id"].to_pylist()
        rx = like_re(pattern)
        want = [
            i
            for i, s in enumerate(texts)
            if rx.fullmatch(s or "")
        ]
        assert got == want, pattern


def test_inline_ignorecase_flag_fullscans(code_corpus, tri_index):
    """(?i) inline flag: literals are not case-stable, so the extractor
    must require nothing (full scan) rather than emit case-sensitive
    candidates that drop matches."""
    assert tg.required_literals("(?i)qzcommonneedle") is None
    got = tri_index.regexp_search("(?i)QZCOMMONNEEDLE")
    want = tri_index.substring_search("qzcommonneedle")
    assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
    # scoped group: the group's literals are skipped, the rest required
    assert tg.required_literals("(?i:foo)barbaz") == [{"barbaz"}]


def test_resume_with_changed_segment_docs(code_corpus, tmp_path):
    """Re-running with a different segment_docs must serve the NEW
    plan's segments (range-named + manifest-listed), never skip ranges
    under a stale name."""
    idx = str(tmp_path / "idx_replan")
    tg.build_trigram_index(
        code_corpus,
        idx,
        tg.TrigramConfig(text_col="content", segment_docs=64),
    )
    before = tg.TrigramIndex(idx, code_corpus)
    n_before = len(before.segments)
    assert n_before > 1
    hits_before = before.substring_search("qzcommonneedle")
    tg.build_trigram_index(
        code_corpus, idx, tg.TrigramConfig(text_col="content")
    )
    after = tg.TrigramIndex(idx, code_corpus)
    assert len(after.segments) == 1  # the new single-segment plan
    assert after.substring_search("qzcommonneedle").equals(hits_before)


def test_all_short_docs_commits_empty_segment(tmp_path, ray_session):
    src = str(tmp_path / "short.parquet")
    pq.write_table(
        pa.table({"content": pa.array(["a", "bb", None, ""])}), src
    )
    idx = str(tmp_path / "idx_short")
    tg.build_trigram_index(
        src, idx, tg.TrigramConfig(text_col="content")
    )
    ti = tg.TrigramIndex(idx, src)
    assert len(ti.segments) == 1
    assert ti.substring_search("abc").num_rows == 0


def test_match_stats_filters(code_corpus, tri_index):
    full = tri_index.match_stats_by("qzcommonneedle", "lang")
    only = tri_index.match_stats_by(
        "qzcommonneedle", "lang", filters={"lang": "python"}
    )
    assert only["lang"].to_pylist() == ["python"]
    frow = full.to_pylist()
    want = next(r for r in frow if r["lang"] == "python")
    assert only.to_pylist()[0] == want


def test_like_backslash_escape(tmp_path, ray_session):
    """A backslash-escaped %: match_like treats it as a literal '%';
    runs containing the backslash must not poison the trigram filter."""
    src = str(tmp_path / "pct.parquet")
    pq.write_table(
        pa.table(
            {"content": pa.array(["abcdef%ghijkl", "abcdefghijkl"])}
        ),
        src,
    )
    idx = str(tmp_path / "idx_pct")
    tg.build_trigram_index(
        src, idx, tg.TrigramConfig(text_col="content")
    )
    ti = tg.TrigramIndex(idx, src)
    got = ti.like_search(r"%abcdef\%ghijkl%")
    assert got["doc_id"].to_pylist() == [0]


def test_trigram_ingest_delta(code_corpus, tmp_path, ray_session):
    """Delta ingest appends a fresh segment with continuing dense ids;
    search spans old + new docs; re-ingesting the same path is a no-op
    (canonical-path dedup)."""
    idx = str(tmp_path / "idx_delta")
    tg.build_trigram_index(
        code_corpus, idx, tg.TrigramConfig(text_col="content")
    )
    before = tg.TrigramIndex(idx, code_corpus)
    n_before = before.substring_search("qzcommonneedle").num_rows

    delta = str(tmp_path / "delta.parquet")
    pq.write_table(
        pa.table(
            {
                "content": pa.array(
                    ["brand new qzcommonneedle delta doc", "other"]
                )
            }
        ),
        delta,
    )
    man = tg.trigram_ingest_delta(idx, delta)
    assert len(man["segments"]) == 2
    src_all = [f["path"] for f in man["files"]]
    after = tg.TrigramIndex(idx, src_all)
    hits = after.substring_search("qzcommonneedle")
    assert hits.num_rows == n_before + 1
    # the delta doc's id continues after the original corpus
    files = sorted(
        os.path.join(code_corpus, f)
        for f in os.listdir(code_corpus)
        if f.endswith(".parquet")
    )
    n_orig = sum(
        pq.ParquetFile(f).metadata.num_rows for f in files
    )
    assert hits["doc_id"].to_pylist()[-1] == n_orig
    # idempotent re-ingest
    man2 = tg.trigram_ingest_delta(idx, delta)
    assert man2["segments"] == man["segments"]


@pytest.fixture(scope="module")
def nocase_corpus(ray_session, tmp_path_factory):
    """Adversarial corpus for (?i) regex candidate soundness: mixed-case
    hits, RE2-Unicode-fold hits the trigram filter CANNOT see by bytes
    (KELVIN SIGN folds to k, LONG S folds to s), and decoys."""
    d = str(tmp_path_factory.mktemp("nocase"))
    texts = [
        "def FetchNeedle(): pass",
        "FETCHNEEDLE in caps",
        "fetchneedle lower",
        "fetchNEEDLE mixed",
        "no match here",
        "partial fetchneed only",
        "alt branch QZALTMARK here",
        "alt branch qzaltmark lower",
        "Kask is kelvin kask",   # (?i)kask matches via KELVIN fold
        "ſtop is long-s stop",   # (?i)stop matches via LONG S fold
        "STOP normal caps",
        "kask normal lower",
    ]
    pq.write_table(
        pa.table({"content": pa.array(texts, type=pa.string())}),
        os.path.join(d, "docs.parquet"),
    )
    return d


@pytest.fixture(scope="module")
def nocase_index(ray_session, nocase_corpus, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("nocase_idx"))
    tg.build_trigram_index(
        nocase_corpus, idx, tg.TrigramConfig(text_col="content")
    )
    return tg.TrigramIndex(idx, nocase_corpus)


@pytest.mark.parametrize(
    "pattern",
    [
        "fetchneedle",
        "FetchNeedle\\(",
        "(fetchneedle|qzaltmark)",
        "kask",          # k-window positions excluded (KELVIN fold)
        "stop",          # s-window positions excluded (LONG S fold)
        "(?i)fetchneedle",  # inline flag + fold extractor
    ],
)
def test_nocase_regex_candidates_superset_of_fullscan(
    nocase_index, pattern
):
    """(?i) regex candidates must cover every full-scan hit — including
    docs that match only through RE2's Unicode simple folding."""
    full = nocase_index.regexp_search(pattern, ignore_case=True)
    cand = nocase_index.regex_candidates(pattern, ignore_case=True)
    if cand is not None:
        assert set(full["doc_id"].to_pylist()) <= set(cand.tolist())
    # end-to-end parity: indexed path == honest full scan
    import datamart_ray.index.trigram as tgmod

    old = tgmod.VERIFY_FETCH_CAP
    try:
        tgmod.VERIFY_FETCH_CAP = -1
        slow = nocase_index.regexp_search(pattern, ignore_case=True)
    finally:
        tgmod.VERIFY_FETCH_CAP = old
    assert full.equals(slow)


def test_nocase_regex_candidates_prune(nocase_index):
    """The (?i) candidate filter actually prunes (not a vacuous
    full-scan): a selective literal yields fewer candidates than docs."""
    cand = nocase_index.regex_candidates(
        "fetchneedle", ignore_case=True
    )
    assert cand is not None
    assert 0 < cand.size < 12
    hits = nocase_index.regexp_search(
        "fetchneedle", ignore_case=True
    )
    assert hits["doc_id"].to_pylist() == [0, 1, 2, 3]


def test_nocase_regex_kelvin_long_s_exact(nocase_index):
    """Docs matching ONLY via Unicode folds are still found (their
    windows were excluded from the requirement, so the filter cannot
    lose them)."""
    kask = nocase_index.regexp_search("kask", ignore_case=True)
    assert 8 in kask["doc_id"].to_pylist()  # KELVIN-SIGN doc
    stop = nocase_index.regexp_search("stop", ignore_case=True)
    assert 9 in stop["doc_id"].to_pylist()  # LONG-S doc
    # non-ASCII literal → None (full scan), never wrong
    assert nocase_index.regex_candidates(
        "naïve", ignore_case=True
    ) is None


def test_dense_partials_huge_doc_sliced_path(monkeypatch):
    """A single doc above the window cap takes the sliced per-doc scan
    and must produce the identical postings (boundary windows across
    slice edges included)."""
    from datamart_ray.index import codec

    monkeypatch.setattr(tg, "_CHUNK_WINDOW_CAP", 1000)
    rng = np.random.default_rng(3)
    big = "".join(
        rng.choice(list("abcdef() {}\n"), 5000)
    )
    texts = ["small one", big, "another small qz"]
    arr = pa.array(texts, type=pa.string())
    got_t = tg.dense_partials(arr, 100)
    merged = tg._merge_bucket(got_t)
    got = {
        int(t_): codec.decode_docids(b_).tolist()
        for t_, b_ in zip(
            merged["tri"].to_pylist(), merged["docs"].to_pylist()
        )
    }
    pairs = tg.trigram_pairs(
        arr, 100 + np.arange(3, dtype=np.int64)
    )
    want = _brute_postings(
        pairs["tri"].to_numpy(zero_copy_only=False),
        pairs["doc_id"].to_numpy(zero_copy_only=False),
    )
    assert got == want


def test_ilike_search_exact_and_candidates_sound(nocase_index):
    """ILIKE: indexed candidates cover every full-scan hit (incl. the
    Unicode-fold-only docs) and the result equals the honest full
    scan."""
    import datamart_ray.index.trigram as tgmod

    for pat in ["%FETCHNEEDLE%", "%kask%", "%Stop%", "%fetch%needle%"]:
        fast = nocase_index.like_search(pat, ignore_case=True)
        old = tgmod.VERIFY_FETCH_CAP
        try:
            tgmod.VERIFY_FETCH_CAP = -1
            slow = nocase_index.like_search(pat, ignore_case=True)
        finally:
            tgmod.VERIFY_FETCH_CAP = old
        assert fast.equals(slow), pat
    # GROUND TRUTH (not the engine's own streaming path, which still
    # pre-filters by candidates): Arrow match_like over the raw corpus
    import os as _os

    src_files = sorted(
        _os.path.join(nocase_index.src, f)
        for f in _os.listdir(nocase_index.src)
        if f.endswith(".parquet")
    )
    texts = pa.concat_tables(
        [pq.read_table(f, columns=["content"]) for f in src_files]
    )["content"]
    for pat in ["%FETCHNEEDLE%", "%fetch%needle%", "%kask%", "%Stop%"]:
        want = [
            i
            for i, m in enumerate(
                pc.match_like(
                    texts, pat, ignore_case=True
                ).to_pylist()
            )
            if m
        ]
        got = nocase_index.like_search(
            pat, ignore_case=True
        )["doc_id"].to_pylist()
        assert got == want, pat
    # Unicode-fold docs found (their windows were excluded, not lost)
    assert 9 in nocase_index.like_search(
        "%stop%", ignore_case=True
    )["doc_id"].to_pylist()
