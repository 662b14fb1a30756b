"""Full-text pipelines over the ``documents`` table — the engine's public
face for the driver's correctness gate.

Every entry has a DuckDB SQL twin built from the *same* Analyzer via
``Analyzer.sql_tokens_expr`` so tokenization is definitionally identical.
The BM25 entries run the real engine (index build → SearchEngine) against a
pure-SQL BM25 computed with the same formula, same global stats, same
ordered accumulation, same (score desc, doc_id asc) tie-break. Scores are
ROUND(x, 4) on both sides (float-sum association differs between systems).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from datamart_ray.util import (
    artifact_root,
    ensure_fast_shuffle,
    round_away,
)
from ray.data.aggregate import Count, Max, Min, Sum

from datamart_ray.analyzer import Analyzer
from datamart_ray.index.build import IndexConfig, build_index
from datamart_ray.search.engine import SearchEngine

ANALYZER = Analyzer()  # lowercase + [a-z0-9]+ — SQL-reproducible
BM25_QUERY = "window hash join"
BM25_FILTER_QUERY = "batch stream"
PHRASE_QUERY = "window join"  # consecutive-token match, non-vacuous at all sf
# misspelled on purpose: "sow" expands to {row, slow}, "hach" to {hash}
# at edit distance 1 over this corpus's vocabulary (multi-expansion)
FUZZY_QUERY = "sow hach"
# expands to {scan, slow, small, sort, spark, stream} over this corpus
PREFIX_QUERY = "s"
# bool query: must match "window", "hash"/"join" boost, "stream" excluded
BOOL_MUST = "window"
BOOL_SHOULD = "hash join"
BOOL_NOT = "stream"
# inclusive n_chars range filter (both sf fixtures span ~47..558 chars)
NCHARS_LO, NCHARS_HI = 150, 350
WILDCARD_PATTERN = "s?a*"  # expands to spark/scan/small on this corpus
REGEXP_PATTERN = "s(can|mall)|jo.n"  # expands to scan/small/join
BOOL_MSM_SHOULD = "hash join stream scan"
BOOL_MSM_N = 2  # minimum_should_match
# "window" exact + "jo" prefix (expands over {join, ...}) — non-vacuous
PHRASE_PREFIX_QUERY = "window jo"
BM25_K = 10

_ENGINES: dict[str, SearchEngine] = {}
_POS_ENGINES: dict[str, SearchEngine] = {}


def _docs_path(sf_dir: str) -> str:
    return f"{sf_dir}/documents.parquet"


def get_engine(sf_dir: str) -> SearchEngine:
    """Build (resume) the documents index for `sf_dir` and cache the engine.

    The on-disk index doubles as a cross-process cache: ``build_index``
    skips committed segments, so repeat calls only pay footer reads."""
    sf_dir = os.path.abspath(sf_dir)
    if sf_dir in _ENGINES:
        return _ENGINES[sf_dir]
    src = _docs_path(sf_dir)
    # ":m2" = config fingerprint — n_chars joined docmeta (range
    # filters); a stale cached index without it must not be resumed
    key = hashlib.sha1(
        f"{src}:{os.path.getmtime(src)}:{os.path.getsize(src)}:m2".encode()
    ).hexdigest()[:12]
    index_dir = f"{artifact_root(src)}/idx/{key}"
    cfg = IndexConfig(
        analyzer=ANALYZER,
        content_col="text",
        id_col="doc_id",
        meta_cols=("lang", "source", "n_chars"),
    )
    build_index(src, index_dir, cfg)
    eng = SearchEngine(index_dir, filter_cols=("lang", "source", "n_chars"))
    _ENGINES[sf_dir] = eng
    return eng


_FIELD_ENGINES: dict[tuple[str, str], SearchEngine] = {}


def get_field_engine(sf_dir: str, col: str) -> SearchEngine:
    """Per-field engine for multi-field queries: a separate index whose
    postings come from `col` (each field owns its df/avgdl statistics,
    exactly as ES keeps per-field stats). Built once per (corpus, field)
    and cached like :func:`get_engine`."""
    sf_dir = os.path.abspath(sf_dir)
    ck = (sf_dir, col)
    if ck in _FIELD_ENGINES:
        return _FIELD_ENGINES[ck]
    src = _docs_path(sf_dir)
    key = hashlib.sha1(
        f"{src}:{os.path.getmtime(src)}:{os.path.getsize(src)}:f-{col}".encode()
    ).hexdigest()[:12]
    index_dir = f"{artifact_root(src)}/idx/{key}"
    cfg = IndexConfig(
        analyzer=ANALYZER,
        content_col=col,
        id_col="doc_id",
    )
    build_index(src, index_dir, cfg)
    eng = SearchEngine(index_dir, lazy=False)
    _FIELD_ENGINES[ck] = eng
    return eng


def get_pos_engine(sf_dir: str) -> SearchEngine:
    """Positional-index engine for phrase queries — a SEPARATE on-disk
    index (suffix ``-pos``) so the headline non-positional build keeps
    its size and throughput; built once per corpus and cached like
    :func:`get_engine`."""
    sf_dir = os.path.abspath(sf_dir)
    if sf_dir in _POS_ENGINES:
        return _POS_ENGINES[sf_dir]
    src = _docs_path(sf_dir)
    key = hashlib.sha1(
        f"{src}:{os.path.getmtime(src)}:{os.path.getsize(src)}:pos".encode()
    ).hexdigest()[:12]
    index_dir = f"{artifact_root(src)}/idx/{key}"
    cfg = IndexConfig(
        analyzer=ANALYZER,
        content_col="text",
        id_col="doc_id",
        meta_cols=("lang", "source"),
        positions=True,
    )
    build_index(src, index_dir, cfg)
    eng = SearchEngine(index_dir, lazy=False)
    _POS_ENGINES[sf_dir] = eng
    return eng


# ----------------------------------------------------------------------
# Ray pipelines
# ----------------------------------------------------------------------

def ft_token_counts(sf_dir: str) -> pd.DataFrame:
    """Per-document token count (text-analysis op; analog of the doclen
    stat every BM25 build needs — A10)."""
    ds = rd.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])

    def count_tokens(t: pa.Table) -> pa.Table:
        lists = ANALYZER.token_lists(t["text"])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pc.cast(
                    pc.list_value_length(lists), pa.int64()
                ),
            }
        )

    return ds.map_batches(count_tokens, batch_format="pyarrow").to_pandas()


# NB: single backslash — r"\s" — so the class really excludes whitespace.
# (The r2 version had r"\\s" inside the raw string: a literal backslash +
# 's', which let whitespace runs be absorbed into punctuation pretokens;
# both engine and oracle shared the constant so the gate stayed green, but
# the count was not the documented GPT-2-style pretokenizer. ADVICE r2.)
BPE_PRETOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def ft_bpe_token_counts(sf_dir: str) -> pd.DataFrame:
    """Per-document BPE-ish pretoken count: the GPT-2-style pretokenizer
    shape (letter runs | digit runs | punctuation runs) reduced to an
    RE2-safe pattern (no lookahead) so the Arrow kernel and the DuckDB
    twin run the IDENTICAL regex. One count_substring_regex per batch —
    the "how many tokens will the tokenizer emit" pass every LLM data
    pipeline budgets with."""
    ds = rd.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])

    def count_pretokens(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(
            pc.fill_null(t["text"], ""), BPE_PRETOKEN_RE
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_pretokens": pc.cast(n, pa.int64()),
            }
        )

    return ds.map_batches(count_pretokens, batch_format="pyarrow").to_pandas()


def ft_df_top_terms(sf_dir: str) -> pd.DataFrame:
    """Top-20 terms by document frequency (A10 df stat + K7 most_common).
    Distinct (term, doc) inside each batch (vectorized), then a partial
    count per batch, then the small groupby — the partial+final pattern."""
    ensure_fast_shuffle()
    ds = rd.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])

    def partial_df(t: pa.Table) -> pa.Table:
        tf, _ = ANALYZER.term_frequencies(t["text"])
        # one row per (doc, term) already → partial df = count per term
        part = tf.group_by("term").aggregate([("row_idx", "count")])
        return part.rename_columns(["term", "pdf"])

    out = (
        ds.map_batches(partial_df, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("pdf", alias_name="df"))
        .sort(["df", "term"], descending=[True, False])
        .limit(20)
        .to_pandas()
    )
    out["df"] = out["df"].astype("int64")
    return out


def ft_bm25_topk(sf_dir: str) -> pd.DataFrame:
    """BM25 top-k through the real engine (index build + query)."""
    eng = get_engine(sf_dir)
    t = eng.search(BM25_QUERY, k=BM25_K, mode="and")
    out = t.to_pandas()
    out["score"] = round_away(out["score"], 4)
    return out


def ft_phrase_topk(sf_dir: str) -> pd.DataFrame:
    """match_phrase BM25 top-k through the positional index: docs where
    the query tokens appear CONSECUTIVELY, tf = phrase start positions
    (overlapping count), idf from the phrase df — the ES ``match_phrase``
    analog the reference's text search exposes (SURVEY §2.6 K1 family).
    The DuckDB twin computes the identical positional intersection with
    a lateral UNNEST over token indices."""
    eng = get_pos_engine(sf_dir)
    t = eng.phrase_search(PHRASE_QUERY, k=BM25_K)
    out = t.to_pandas()
    out["score"] = round_away(out["score"], 4)
    return out


def _phrase_sql(phrase: str, k: int) -> str:
    terms = ANALYZER.tokenize(phrase)
    m = len(terms)
    conds = " AND ".join(
        f"ts[i+{j + 1}] = '{t}'" for j, t in enumerate(terms)
    )
    return f"""
        WITH toks AS (
            SELECT doc_id, {ANALYZER.sql_tokens_expr('text')} AS ts
            FROM documents
        ),
        m AS (
            SELECT doc_id, count(*)::DOUBLE AS ptf
            FROM toks,
                 UNNEST(range(0, greatest(len(ts) - {m - 1}, 0))) AS r(i)
            WHERE {conds}
            GROUP BY doc_id
        ),
        dl AS (SELECT doc_id, len(ts)::DOUBLE AS dl FROM toks),
        stats AS (
            SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                   (SELECT sum(dl) FROM dl)
                   / (SELECT count(*) FROM documents)::DOUBLE AS avgdl,
                   (SELECT count(*) FROM m)::DOUBLE AS df
        )
        SELECT m.doc_id,
               ROUND(ln(1 + (s.n - s.df + 0.5) / (s.df + 0.5))
                     * m.ptf * (1.2 + 1)
                     / (m.ptf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)),
                     4) AS score
        FROM m JOIN dl USING (doc_id) CROSS JOIN stats s
        ORDER BY score DESC, doc_id
        LIMIT {k}
    """


def ft_fuzzy_topk(sf_dir: str) -> pd.DataFrame:
    """Fuzzy (edit-distance ≤ 1) BM25 top-k: each query token expands
    over the index's term dictionary, the expansion union is scored as
    an OR query — the ES ``fuzziness: 1`` analog. The DuckDB twin
    expands with ``levenshtein()`` over the corpus vocabulary and sums
    contributions in the same lexicographic term order."""
    eng = get_engine(sf_dir)
    t = eng.fuzzy_search(FUZZY_QUERY, k=BM25_K, max_edits=1)
    out = t.to_pandas()
    out["score"] = round_away(out["score"], 4)
    return out


def _fuzzy_sql(query: str, k: int, max_edits: int = 1) -> str:
    qterms = list(dict.fromkeys(ANALYZER.tokenize(query)))
    match = " OR ".join(
        f"levenshtein(term, '{q}') <= {max_edits}" for q in qterms
    )
    return f"""
        WITH {_tok_cte()},
        tf AS (
            SELECT doc_id, term, count(*)::DOUBLE AS tf
            FROM tok GROUP BY doc_id, term
        ),
        dl AS (
            SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY doc_id
        ),
        stats AS (
            SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                   (SELECT sum(dl) FROM dl)
                   / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        qterms AS (
            SELECT DISTINCT term FROM df WHERE {match}
        ),
        contrib AS (
            SELECT tf.doc_id, tf.term,
                   ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                   * tf.tf * (1.2 + 1)
                   / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS c
            FROM tf
            JOIN qterms q USING (term)
            JOIN df USING (term)
            JOIN dl USING (doc_id)
            CROSS JOIN stats s
        ),
        scored AS (
            SELECT doc_id, sum(c ORDER BY term) AS score
            FROM contrib GROUP BY doc_id
        )
        SELECT doc_id, ROUND(score, 4) AS score
        FROM scored
        ORDER BY scored.score DESC, doc_id
        LIMIT {k}
    """


def ft_prefix_topk(sf_dir: str) -> pd.DataFrame:
    """Prefix-match BM25 top-k: query tokens expand over the term
    dictionary by binary-search range (O(log vocab)), expansion union
    scored as OR — the ES ``prefix`` query analog. Twin expands with
    ``LIKE 'p%'`` and sums in the same lexicographic order."""
    eng = get_engine(sf_dir)
    t = eng.prefix_search(PREFIX_QUERY, k=BM25_K)
    out = t.to_pandas()
    out["score"] = round_away(out["score"], 4)
    return out


def ft_wildcard_topk(sf_dir: str) -> pd.DataFrame:
    """Wildcard BM25 top-k (the ES ``wildcard`` query analog): the
    pattern expands over the term dictionary (literal-prefix binary
    search + one vectorized LIKE kernel per segment), the expansion
    union scored as OR. The DuckDB twin expands with the same SQL LIKE
    pattern over the corpus vocabulary."""
    eng = get_engine(sf_dir)
    t = eng.wildcard_search(WILDCARD_PATTERN, k=BM25_K)
    out = t.to_pandas()
    out["score"] = round_away(out["score"], 4)
    return out


def _wildcard_sql(pattern: str, k: int) -> str:
    like = pattern.replace("*", "%").replace("?", "_")
    return f"""
        WITH {_tok_cte()},
        tf AS (
            SELECT doc_id, term, count(*)::DOUBLE AS tf
            FROM tok GROUP BY doc_id, term
        ),
        dl AS (
            SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY doc_id
        ),
        stats AS (
            SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                   (SELECT sum(dl) FROM dl)
                   / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        qterms AS (
            SELECT DISTINCT term FROM df WHERE term LIKE '{like}'
        ),
        contrib AS (
            SELECT tf.doc_id, tf.term,
                   ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                   * tf.tf * (1.2 + 1)
                   / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS c
            FROM tf
            JOIN qterms q USING (term)
            JOIN df USING (term)
            JOIN dl USING (doc_id)
            CROSS JOIN stats s
        ),
        scored AS (
            SELECT doc_id, sum(c ORDER BY term) AS score
            FROM contrib GROUP BY doc_id
        )
        SELECT doc_id, ROUND(score, 4) AS score
        FROM scored
        ORDER BY scored.score DESC, doc_id
        LIMIT {k}
    """


def ft_regexp_topk(sf_dir: str) -> pd.DataFrame:
    """Regexp BM25 top-k (the ES ``regexp`` query analog): the RE2
    pattern — anchored at both ends, as ES anchors it — expands over the
    term dictionary (leading-literal binary-search bound + one
    vectorized RE2 kernel per segment), the expansion union scored as
    OR. The DuckDB twin expands with ``regexp_full_match`` (the same
    RE2 dialect) over the corpus vocabulary."""
    eng = get_engine(sf_dir)
    t = eng.regexp_search(REGEXP_PATTERN, k=BM25_K)
    out = t.to_pandas()
    out["score"] = round_away(out["score"], 4)
    return out


def _regexp_sql(pattern: str, k: int) -> str:
    return f"""
        WITH {_tok_cte()},
        tf AS (
            SELECT doc_id, term, count(*)::DOUBLE AS tf
            FROM tok GROUP BY doc_id, term
        ),
        dl AS (
            SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY doc_id
        ),
        stats AS (
            SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                   (SELECT sum(dl) FROM dl)
                   / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        qterms AS (
            SELECT DISTINCT term FROM df
            WHERE regexp_full_match(term, '{pattern}')
        ),
        contrib AS (
            SELECT tf.doc_id, tf.term,
                   ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                   * tf.tf * (1.2 + 1)
                   / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS c
            FROM tf
            JOIN qterms q USING (term)
            JOIN df USING (term)
            JOIN dl USING (doc_id)
            CROSS JOIN stats s
        ),
        scored AS (
            SELECT doc_id, sum(c ORDER BY term) AS score
            FROM contrib GROUP BY doc_id
        )
        SELECT doc_id, ROUND(score, 4) AS score
        FROM scored
        ORDER BY scored.score DESC, doc_id
        LIMIT {k}
    """


def ft_highlight_topk(sf_dir: str) -> pd.DataFrame:
    """ES ``highlight`` analog: BM25 AND top-k, then each hit's text
    with every query-term occurrence wrapped in ``[...]`` markers.
    Matching is pinned to RE2 ``(?i)\\b(t1|t2|...)\\b`` — identical in
    Arrow's replace_substring_regex and DuckDB's regexp_replace — a
    documented deviation from the analyzer's ``[a-z0-9]+`` boundaries
    (``\\b`` treats ``_`` as a word char). Only the k hit texts are
    fetched (broadcast id filter), never the corpus."""
    from datamart_ray.util import fetch_rows_by_ids

    eng = get_engine(sf_dir)
    t = eng.search(BM25_QUERY, k=BM25_K, mode="and")
    ids = t["doc_id"].to_pylist()
    scores = dict(zip(ids, round_away(t["score"].to_numpy(), 4)))
    rows = fetch_rows_by_ids(
        _docs_path(sf_dir), "doc_id", ids, ["doc_id", "text"]
    )
    terms = sorted(set(ANALYZER.tokenize(BM25_QUERY)))
    pat = r"(?i)\b(" + "|".join(terms) + r")\b"
    snip = pc.replace_substring_regex(
        rows["text"], pattern=pat, replacement=r"[\0]"
    )
    out = pd.DataFrame(
        {
            "doc_id": rows["doc_id"].to_pylist(),
            "snippet": snip.to_pylist(),
        }
    )
    out["score"] = out["doc_id"].map(scores)
    return out.sort_values(
        ["score", "doc_id"], ascending=[False, True]
    ).reset_index(drop=True)[["doc_id", "score", "snippet"]]


def _highlight_sql(query: str, k: int) -> str:
    terms = sorted(set(ANALYZER.tokenize(query)))
    pat = r"(?i)\b(" + "|".join(terms) + r")\b"
    return f"""
        SELECT t.doc_id, t.score,
               regexp_replace(d.text, '{pat}', '[\\0]', 'g') AS snippet
        FROM ({_bm25_sql(query, k)}) t
        JOIN documents d USING (doc_id)
        ORDER BY t.score DESC, t.doc_id
    """


def ft_explain_topk(sf_dir: str) -> pd.DataFrame:
    """ES ``explain=true`` analog: the per-(doc, term) BM25 breakdown
    (tf, global df, idf, contribution) for the query's top-k docs; the
    contribs sum to the doc's search score. The DuckDB twin exposes the
    same columns from its contrib CTE restricted to the top-k set."""
    eng = get_engine(sf_dir)
    ids = eng.search(BM25_QUERY, k=BM25_K, mode="and")["doc_id"].to_pylist()
    t = eng.explain(BM25_QUERY, ids)
    out = t.to_pandas()
    out["idf"] = round_away(out["idf"], 4)
    out["contrib"] = round_away(out["contrib"], 4)
    return out


def _explain_sql(query: str, k: int) -> str:
    terms = sorted(set(ANALYZER.tokenize(query)))
    qvals = ", ".join(f"('{t}')" for t in terms)
    return f"""
        WITH {_tok_cte()},
        tf AS (
            SELECT doc_id, term, count(*)::DOUBLE AS tf
            FROM tok GROUP BY doc_id, term
        ),
        dl AS (
            SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY doc_id
        ),
        stats AS (
            SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                   (SELECT sum(dl) FROM dl)
                   / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        qterms(term) AS (VALUES {qvals}),
        topk AS ({_bm25_sql(query, k)})
        SELECT tf.doc_id, tf.term,
               tf.tf::BIGINT AS tf,
               df.df::BIGINT AS df,
               ROUND(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)), 4)
                   AS idf,
               ROUND(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf * (1.2 + 1)
                     / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)),
                     4) AS contrib
        FROM tf
        JOIN qterms USING (term)
        JOIN df USING (term)
        JOIN dl USING (doc_id)
        JOIN topk ON tf.doc_id = topk.doc_id
        CROSS JOIN stats s
        ORDER BY tf.doc_id, tf.term
    """


def ft_facet_lang_stats(sf_dir: str) -> pd.DataFrame:
    """ES terms-aggregation with a metric sub-aggregation: per language,
    match count AND mean BM25 score over EVERY doc matching the query —
    the bucket+metric shape ES's aggs compose."""
    eng = get_engine(sf_dir)
    t = eng.facet_stats(BM25_QUERY, "lang", mode="and")
    out = t.to_pandas()
    out["avg_score"] = round_away(out["avg_score"], 4)
    return out


def _facet_stats_sql(query: str, col: str) -> str:
    terms = list(dict.fromkeys(ANALYZER.tokenize(query)))
    qvals = ", ".join(f"('{t}', {i})" for i, t in enumerate(terms))
    return f"""
        WITH {_tok_cte()},
        tf AS (
            SELECT doc_id, term, count(*)::DOUBLE AS tf
            FROM tok GROUP BY doc_id, term
        ),
        dl AS (
            SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY doc_id
        ),
        stats AS (
            SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                   (SELECT sum(dl) FROM dl)
                   / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        qterms(term, qord) AS (VALUES {qvals}),
        contrib AS (
            SELECT tf.doc_id, q.qord,
                   ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                   * tf.tf * (1.2 + 1)
                   / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS c
            FROM tf
            JOIN qterms q USING (term)
            JOIN df USING (term)
            JOIN dl USING (doc_id)
            CROSS JOIN stats s
        ),
        scored AS (
            SELECT doc_id, sum(c ORDER BY qord) AS score, count(*) AS nt
            FROM contrib GROUP BY doc_id
        )
        SELECT d.{col},
               count(*)::BIGINT AS n,
               ROUND(sum(s.score) / count(*), 4) AS avg_score
        FROM scored s JOIN documents d USING (doc_id)
        WHERE s.nt = {len(terms)}
        GROUP BY d.{col}
        ORDER BY n DESC, d.{col} NULLS LAST
    """


SUGGEST_SIZE = 3
SUGGEST_EDITS = 2


def ft_term_suggest(sf_dir: str) -> pd.DataFrame:
    """ES term-suggester analog: for each (misspelled) query token, the
    top dictionary corrections within 2 edits, ranked distance asc →
    df desc → term. The DuckDB twin ranks with ``levenshtein`` +
    ``row_number`` over the corpus vocabulary."""
    eng = get_engine(sf_dir)
    parts = []
    for tok in list(dict.fromkeys(ANALYZER.tokenize(FUZZY_QUERY))):
        t = eng.suggest(tok, size=SUGGEST_SIZE, max_edits=SUGGEST_EDITS)
        p = t.to_pandas()
        p.insert(0, "input_term", tok)
        parts.append(p)
    return pd.concat(parts, ignore_index=True)


def _suggest_sql(query: str, size: int, max_edits: int) -> str:
    toks = list(dict.fromkeys(ANALYZER.tokenize(query)))
    qvals = ", ".join(f"('{t}')" for t in toks)
    return f"""
        WITH {_tok_cte()},
        tf AS (
            SELECT doc_id, term FROM tok GROUP BY doc_id, term
        ),
        df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
        q(input_term) AS (VALUES {qvals}),
        cand AS (
            SELECT q.input_term, df.term AS suggestion,
                   levenshtein(q.input_term, df.term)::BIGINT AS distance,
                   df.df
            FROM q JOIN df
              ON levenshtein(q.input_term, df.term) <= {max_edits}
             AND df.term <> q.input_term
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY input_term
                ORDER BY distance, df DESC, suggestion
            ) AS rn FROM cand
        )
        SELECT input_term, suggestion, distance, df
        FROM ranked WHERE rn <= {size}
        ORDER BY input_term, distance, df DESC, suggestion
    """


CARD_COLS = ("lang", "source")  # cardinality-agg fields
AUTO_PREFIX = "s"  # completion-suggester prefix (6 terms on this corpus)
AUTO_SIZE = 5
BOOSTING_NEG = "stream"  # boosting-query negative clause
NEG_BOOST = 0.5
FS_FACTOR = 0.01  # field_value_factor over n_chars, log1p modifier


def ft_facet_cardinality(sf_dir: str) -> pd.DataFrame:
    """ES cardinality-aggregation analog (exact distinct — the pinned
    deviation from ES's HLL++): distinct lang/source values over EVERY
    doc matching the AND query."""
    eng = get_engine(sf_dir)
    return eng.facet_cardinality(
        BM25_QUERY, CARD_COLS, mode="and"
    ).to_pandas()


def _cardinality_sql(query: str, cols: tuple[str, ...]) -> str:
    terms = list(dict.fromkeys(ANALYZER.tokenize(query)))
    tlist = ", ".join(f"'{t}'" for t in terms)
    arms = "\n            UNION ALL\n".join(
        f"""            SELECT '{c}' AS field,
                   count(DISTINCT d.{c})::BIGINT AS cardinality
            FROM cand JOIN documents d USING (doc_id)"""
        for c in sorted(cols)
    )
    return f"""
        WITH {_tok_cte()},
        tf AS (
            SELECT doc_id, term FROM tok
            WHERE term IN ({tlist}) GROUP BY doc_id, term
        ),
        cand AS (
            SELECT doc_id FROM tf GROUP BY doc_id
            HAVING count(*) = {len(terms)}
        )
        SELECT * FROM (
{arms}
        ) ORDER BY field
    """


def ft_autocomplete(sf_dir: str) -> pd.DataFrame:
    """ES completion-suggester analog: dictionary terms under a prefix
    ranked by global df desc, term asc — the search-box type-ahead."""
    eng = get_engine(sf_dir)
    return eng.autocomplete(AUTO_PREFIX, size=AUTO_SIZE).to_pandas()


def _autocomplete_sql(prefix: str, size: int) -> str:
    return f"""
        WITH {_tok_cte()},
        tf AS (SELECT doc_id, term FROM tok GROUP BY doc_id, term),
        df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term)
        SELECT term, df FROM df WHERE term LIKE '{prefix}%'
        ORDER BY df DESC, term LIMIT {size}
    """


def _scored_or_cte(terms: list[str]) -> str:
    """The shared exhaustive OR-scored CTE chain (tok → … → scored) with
    the engine's pinned query-order accumulation — the base for the
    rank-changing score-rewrite twins (boosting, function_score)."""
    qvals = ", ".join(f"('{t}', {i})" for i, t in enumerate(terms))
    return f"""{_tok_cte()},
        tf AS (
            SELECT doc_id, term, count(*)::DOUBLE AS tf
            FROM tok GROUP BY doc_id, term
        ),
        dl AS (
            SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY doc_id
        ),
        stats AS (
            SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                   (SELECT sum(dl) FROM dl)
                   / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        qterms(term, qord) AS (VALUES {qvals}),
        contrib AS (
            SELECT tf.doc_id, q.qord,
                   ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                   * tf.tf * (1.2 + 1)
                   / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS c
            FROM tf
            JOIN qterms q USING (term)
            JOIN df USING (term)
            JOIN dl USING (doc_id)
            CROSS JOIN stats s
        ),
        scored AS (
            SELECT doc_id, sum(c ORDER BY qord) AS score
            FROM contrib GROUP BY doc_id
        )"""


def ft_boosting_topk(sf_dir: str) -> pd.DataFrame:
    """ES ``boosting`` query analog: positive OR-scored, docs matching
    the negative clause demoted by ×NEG_BOOST (kept, not excluded)."""
    eng = get_engine(sf_dir)
    out = eng.boosting_search(
        BM25_QUERY, BOOSTING_NEG, NEG_BOOST, k=BM25_K, mode="or"
    ).to_pandas()
    out["score"] = round_away(out["score"], 4)
    return out


def _boosting_sql(pos: str, neg: str, nb: float, k: int) -> str:
    terms = list(dict.fromkeys(ANALYZER.tokenize(pos)))
    neg_terms = list(dict.fromkeys(ANALYZER.tokenize(neg)))
    nlist = ", ".join(f"'{t}'" for t in neg_terms)
    return f"""
        WITH {_scored_or_cte(terms)},
        neg AS (
            SELECT DISTINCT doc_id FROM tok WHERE term IN ({nlist})
        ),
        boosted AS (
            SELECT s.doc_id,
                   CASE WHEN n.doc_id IS NULL THEN s.score
                        ELSE s.score * {nb} END AS fscore
            FROM scored s LEFT JOIN neg n USING (doc_id)
        )
        SELECT doc_id, ROUND(fscore, 4) AS score
        FROM boosted ORDER BY fscore DESC, doc_id LIMIT {k}
    """


def ft_function_score_topk(sf_dir: str) -> pd.DataFrame:
    """ES ``function_score`` + ``field_value_factor`` analog (log1p
    modifier, multiply boost mode — the reference folds dataset priors
    into keyword ranking exactly this way): BM25 × ln(1 + factor ×
    n_chars)."""
    eng = get_engine(sf_dir)
    out = eng.function_score_search(
        BM25_QUERY, "n_chars", FS_FACTOR, k=BM25_K, mode="or"
    ).to_pandas()
    out["score"] = round_away(out["score"], 4)
    return out


def ft_boosting_dist_topk(sf_dir: str) -> pd.DataFrame:
    """Distributed boosting query through the scorer-actor pool
    (global-df round, exhaustive per-actor scoring + segment-local
    negative demotion, local top-k); rank-identical to
    ft_boosting_topk, which the shared SQL twin gates."""
    from datamart_ray.search.engine import DistributedSearchEngine

    eng = get_engine(sf_dir)  # ensures the index exists
    idx_dir = eng.readers[0].seg_dir.rsplit("/segments/", 1)[0]
    deng = DistributedSearchEngine(idx_dir, lazy=False, max_actors=4)
    try:
        t = deng.boosting_search(
            BM25_QUERY, BOOSTING_NEG, NEG_BOOST, k=BM25_K, mode="or"
        )
    finally:
        deng.shutdown()
    out = t.to_pandas()
    out["score"] = round_away(out["score"], 4)
    return out


def ft_function_score_dist_topk(sf_dir: str) -> pd.DataFrame:
    """Distributed function_score/field_value_factor through the
    scorer-actor pool — the log1p multiplier reads each actor's OWN
    docmeta (filter_cols pass-through loads n_chars), so the rewrite
    commutes with actor packing; rank-identical to
    ft_function_score_topk, which the shared SQL twin gates."""
    from datamart_ray.search.engine import DistributedSearchEngine

    eng = get_engine(sf_dir)  # ensures the index exists
    idx_dir = eng.readers[0].seg_dir.rsplit("/segments/", 1)[0]
    deng = DistributedSearchEngine(
        idx_dir,
        lazy=False,
        max_actors=4,
        filter_cols=("lang", "source", "n_chars"),
    )
    try:
        t = deng.function_score_search(
            BM25_QUERY, "n_chars", FS_FACTOR, k=BM25_K, mode="or"
        )
    finally:
        deng.shutdown()
    out = t.to_pandas()
    out["score"] = round_away(out["score"], 4)
    return out


CONST_BOOST = 1.5  # constant_score filter-context boost
RESCORE_WINDOW = 50  # ES rescore window_size
RESCORE_QW = 1.0  # query_weight
RESCORE_RW = 2.0  # rescore_query_weight


def ft_match_counts(sf_dir: str) -> pd.DataFrame:
    """ES ``_count`` API analog: number of matching docs for the AND
    and OR readings of the reference query — counting only, no
    scoring/ranking work."""
    eng = get_engine(sf_dir)
    return pd.DataFrame(
        {
            "mode": ["and", "or"],
            "n_matches": pd.array(
                [
                    eng.match_count(BM25_QUERY, mode="and"),
                    eng.match_count(BM25_QUERY, mode="or"),
                ],
                dtype="int64",
            ),
        }
    )


def _match_counts_sql(query: str) -> str:
    terms = list(dict.fromkeys(ANALYZER.tokenize(query)))
    tlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
        WITH {_tok_cte()},
        hits AS (
            SELECT doc_id, count(DISTINCT term) AS nt
            FROM tok WHERE term IN ({tlist}) GROUP BY doc_id
        )
        SELECT 'and' AS mode,
               (SELECT count(*) FROM hits
                WHERE nt = {len(terms)})::BIGINT AS n_matches
        UNION ALL
        SELECT 'or', (SELECT count(*) FROM hits)::BIGINT
        ORDER BY mode
    """


def ft_constant_score(sf_dir: str) -> pd.DataFrame:
    """ES ``constant_score`` analog: filter context, every match scores
    exactly the boost — ranking reduces to docID order."""
    eng = get_engine(sf_dir)
    out = eng.constant_score_search(
        BM25_QUERY, CONST_BOOST, k=BM25_K, mode="and"
    ).to_pandas()
    return out


def _constant_score_sql(query: str, boost: float, k: int) -> str:
    terms = list(dict.fromkeys(ANALYZER.tokenize(query)))
    tlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
        WITH {_tok_cte()},
        hits AS (
            SELECT doc_id
            FROM tok WHERE term IN ({tlist})
            GROUP BY doc_id
            HAVING count(DISTINCT term) = {len(terms)}
        )
        SELECT doc_id, {boost}::DOUBLE AS score
        FROM hits ORDER BY doc_id LIMIT {k}
    """


# percolator: stored queries matched against the streaming corpus
# (ES percolate = reverse search / alerting). (query_id, query, mode)
PERC_QUERIES = (
    ("alert_merge_join", "merge join", "and"),
    ("alert_window_stream", "window stream", "and"),
    ("alert_dup", "dup", "or"),
    ("alert_scan_or_filter", "scan filter", "or"),
)


def ft_percolate(sf_dir: str) -> pd.DataFrame:
    """ES ``percolate`` analog (reverse search / alerting): a small set
    of STORED queries is broadcast once; every doc streams through
    ``map_batches``, where a per-batch (docs × stored-vocabulary)
    presence matrix evaluates all queries vectorized; per-query partial
    aggregates (count, min/max docID) combine map-side so only
    O(queries) rows ride the shuffle. Scale shape: stored-query sets
    are small and broadcastable; the corpus never materializes."""
    specs = [
        (qid, list(dict.fromkeys(ANALYZER.tokenize(q))), mode == "and")
        for qid, q, mode in PERC_QUERIES
    ]
    vocab = sorted({t for _, ts, _ in specs for t in ts})
    term_idx = {t: i for i, t in enumerate(vocab)}
    vocab_arr = pa.array(vocab)

    def perc_partial(batch: pa.Table) -> pa.Table:
        tf, _ = ANALYZER.term_frequencies(batch["text"])
        keep = pc.is_in(tf["term"], value_set=vocab_arr)
        tf = tf.filter(keep)
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        pres = np.zeros((len(batch), len(vocab)), dtype=bool)
        if tf.num_rows:
            rows = tf["row_idx"].to_numpy(zero_copy_only=False)
            codes = np.array(
                [term_idx[t] for t in tf["term"].to_pylist()],
                dtype=np.int64,
            )
            pres[rows, codes] = True
        qids, ns, mins, maxs = [], [], [], []
        for qid, ts, is_and in specs:
            cols = [term_idx[t] for t in ts]
            m = (
                pres[:, cols].all(axis=1)
                if is_and
                else pres[:, cols].any(axis=1)
            )
            ids = d[m]
            if ids.size:
                qids.append(qid)
                ns.append(int(ids.size))
                mins.append(int(ids.min()))
                maxs.append(int(ids.max()))
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.string()),
                "n": pa.array(ns, type=pa.int64()),
                "min_doc": pa.array(mins, type=pa.int64()),
                "max_doc": pa.array(maxs, type=pa.int64()),
            }
        )

    agg = (
        rd.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
        .map_batches(perc_partial, batch_format="pyarrow")
        .groupby("query_id")
        .aggregate(Sum("n"), Min("min_doc"), Max("max_doc"))
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "query_id": agg["query_id"],
            "n_matches": agg["sum(n)"].astype("int64"),
            "min_doc": agg["min(min_doc)"].astype("int64"),
            "max_doc": agg["max(max_doc)"].astype("int64"),
        }
    )
    return out.sort_values("query_id").reset_index(drop=True)


def _percolate_sql() -> str:
    qterm_vals, qmeta_vals = [], []
    for qid, q, mode in PERC_QUERIES:
        ts = list(dict.fromkeys(ANALYZER.tokenize(q)))
        qmeta_vals.append(
            f"('{qid}', {len(ts)}, {'true' if mode == 'and' else 'false'})"
        )
        qterm_vals.extend(f"('{qid}', '{t}')" for t in ts)
    return f"""
        WITH {_tok_cte()},
        dt AS (SELECT DISTINCT doc_id, term FROM tok),
        qt(query_id, term) AS (VALUES {", ".join(qterm_vals)}),
        qm(query_id, nt, mode_and) AS (VALUES {", ".join(qmeta_vals)}),
        hits AS (
            SELECT qt.query_id, dt.doc_id,
                   count(DISTINCT dt.term) AS k
            FROM dt JOIN qt USING (term)
            GROUP BY qt.query_id, dt.doc_id
        ),
        matched AS (
            SELECT h.query_id, h.doc_id
            FROM hits h JOIN qm USING (query_id)
            WHERE (qm.mode_and AND h.k = qm.nt) OR NOT qm.mode_and
        )
        SELECT query_id,
               count(*)::BIGINT AS n_matches,
               min(doc_id)::BIGINT AS min_doc,
               max(doc_id)::BIGINT AS max_doc
        FROM matched GROUP BY query_id ORDER BY query_id
    """


SIG_K = 15  # significant_terms size
SIG_MIN_DOC_COUNT = 3  # ES min_doc_count analog


def ft_significant_terms(sf_dir: str) -> pd.DataFrame:
    """ES ``significant_terms`` aggregation analog: terms
    over-represented in the docs matching the AND query vs the whole
    corpus, scored by foreground/background lift
    (fg_df/n_fg) / (bg_df/N) — the deterministic percentage heuristic
    (ES default JLH multiplies this by the absolute difference; the
    lift alone is pinned here for SQL matchability). Ray-Data-first
    shape: the match set comes from the index (no corpus scan to
    match), is broadcast once via ``ray.put``, and foreground doc
    frequencies are computed distributed — tokenize only matched docs
    inside ``map_batches``, count distinct (doc, term) per batch
    (map-side combine), one vocabulary-sized groupby-sum. Background
    df comes from the index dictionary (no second scan)."""
    import ray as _ray

    eng = get_engine(sf_dir)
    ids = eng.match_docs(BM25_QUERY, mode="and")
    n_fg, n_docs = ids.size, eng.n_docs
    if not n_fg:
        return pd.DataFrame(
            {
                "term": pd.Series([], dtype="object"),
                "fg_count": pd.Series([], dtype="int64"),
                "bg_count": pd.Series([], dtype="int64"),
                "score": pd.Series([], dtype="float64"),
            }
        )
    ids_ref = _ray.put(ids)  # already sorted

    def fg_counts(batch: pa.Table) -> pa.Table:
        matched = _ray.get(ids_ref)
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.clip(
            np.searchsorted(matched, d), 0, matched.size - 1
        )
        keep = matched[pos] == d
        if not keep.any():
            return pa.table(
                {
                    "term": pa.array([], type=pa.string()),
                    "fg": pa.array([], type=pa.int64()),
                }
            )
        tf, _ = ANALYZER.term_frequencies(
            batch.filter(pa.array(keep))["text"]
        )
        # distinct (doc, term) is already grouped; combine to per-term
        # doc counts inside the task (map-side combine)
        g = tf.group_by("term").aggregate([("row_idx", "count")])
        return pa.table(
            {
                "term": g["term"],
                "fg": pc.cast(g["row_idx_count"], pa.int64()),
            }
        )

    fg = (
        rd.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
        .map_batches(fg_counts, batch_format="pyarrow")
        .groupby("term")
        .sum("fg")
        .to_pandas()
    )
    fg = fg[fg["sum(fg)"] >= SIG_MIN_DOC_COUNT]
    bg = np.array([eng.df(t) for t in fg["term"]], dtype=np.float64)
    lift = (fg["sum(fg)"].to_numpy(np.float64) / n_fg) / (bg / n_docs)
    out = pd.DataFrame(
        {
            "term": fg["term"].to_numpy(),
            "fg_count": fg["sum(fg)"].astype("int64").to_numpy(),
            "bg_count": bg.astype("int64"),
            "score": lift,
        }
    )
    out = out.sort_values(
        ["score", "term"], ascending=[False, True]
    ).head(SIG_K)
    out["score"] = round_away(out["score"], 4)
    return out.reset_index(drop=True)


def _significant_terms_sql(query: str, k: int, min_dc: int) -> str:
    terms = list(dict.fromkeys(ANALYZER.tokenize(query)))
    qvals = ", ".join(f"('{t}')" for t in terms)
    return f"""
        WITH {_tok_cte()},
        dt AS (SELECT DISTINCT doc_id, term FROM tok),
        qterms(term) AS (VALUES {qvals}),
        matched AS (
            SELECT doc_id FROM dt JOIN qterms USING (term)
            GROUP BY doc_id HAVING count(*) = {len(terms)}
        ),
        stats AS (
            SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
                   (SELECT count(*) FROM matched)::DOUBLE AS n_fg
        ),
        fg AS (
            SELECT term, count(*)::DOUBLE AS fg_df
            FROM dt JOIN matched USING (doc_id) GROUP BY term
        ),
        bg AS (SELECT term, count(*)::DOUBLE AS bg_df FROM dt GROUP BY term)
        SELECT fg.term,
               fg.fg_df::BIGINT AS fg_count,
               bg.bg_df::BIGINT AS bg_count,
               ROUND((fg.fg_df / s.n_fg) / (bg.bg_df / s.n_docs), 4)
                   AS score
        FROM fg JOIN bg USING (term) CROSS JOIN stats s
        WHERE fg.fg_df >= {min_dc}
        ORDER BY (fg.fg_df / s.n_fg) / (bg.bg_df / s.n_docs) DESC, fg.term
        LIMIT {k}
    """


def ft_index_stats(sf_dir: str) -> pd.DataFrame:
    """ES ``_stats`` / ``_cat/indices`` analog: one row of corpus
    statistics straight from the index manifests + segment
    dictionaries (no corpus scan at query time)."""
    eng = get_engine(sf_dir)
    out = eng.index_stats().to_pandas()
    out["avgdl"] = round_away(out["avgdl"], 4)
    return out


def _index_stats_sql() -> str:
    return f"""
        WITH {_tok_cte()}
        SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
               (SELECT count(*) FROM tok)::BIGINT AS total_tokens,
               ROUND((SELECT count(*) FROM tok)::DOUBLE
                     / (SELECT count(*) FROM documents), 4) AS avgdl,
               (SELECT count(DISTINCT term) FROM tok)::BIGINT
                   AS n_distinct_terms
    """


def ft_rescore_topk(sf_dir: str) -> pd.DataFrame:
    """ES ``rescore`` API analog: top RESCORE_WINDOW docs of the OR
    query get a match_phrase proximity bonus (combine mode ``total``:
    query_weight × bm25 + rescore_query_weight × phrase_bm25), then the
    window re-ranks and truncates to k. Uses the positional index for
    the phrase leg."""
    eng = get_pos_engine(sf_dir)
    t = eng.rescore_search(
        BM25_QUERY,
        PHRASE_QUERY,
        window_size=RESCORE_WINDOW,
        k=BM25_K,
        query_weight=RESCORE_QW,
        rescore_weight=RESCORE_RW,
        mode="or",
    )
    out = t.to_pandas()
    out["score"] = round_away(out["score"], 4)
    return out


def ft_rescore_dist_topk(sf_dir: str) -> pd.DataFrame:
    """Distributed rescore through the scorer-actor pool (distributed
    base window + distributed phrase round, shared combine);
    rank-identical to ft_rescore_topk, which the shared SQL twin
    gates."""
    from datamart_ray.search.engine import DistributedSearchEngine

    eng = get_pos_engine(sf_dir)  # ensures the positional index exists
    idx_dir = eng.readers[0].seg_dir.rsplit("/segments/", 1)[0]
    deng = DistributedSearchEngine(idx_dir, lazy=False, max_actors=4)
    try:
        t = deng.rescore_search(
            BM25_QUERY,
            PHRASE_QUERY,
            window_size=RESCORE_WINDOW,
            k=BM25_K,
            query_weight=RESCORE_QW,
            rescore_weight=RESCORE_RW,
            mode="or",
        )
    finally:
        deng.shutdown()
    out = t.to_pandas()
    out["score"] = round_away(out["score"], 4)
    return out


def _rescore_sql(
    query: str, phrase: str, window: int, k: int, qw: float, rw: float
) -> str:
    terms = list(dict.fromkeys(ANALYZER.tokenize(query)))
    pterms = ANALYZER.tokenize(phrase)
    m = len(pterms)
    conds = " AND ".join(
        f"ts[i+{j + 1}] = '{t}'" for j, t in enumerate(pterms)
    )
    return f"""
        WITH {_scored_or_cte(terms)},
        win AS (
            SELECT doc_id, score FROM scored
            ORDER BY score DESC, doc_id LIMIT {window}
        ),
        parr AS (
            SELECT doc_id, {ANALYZER.sql_tokens_expr('text')} AS ts
            FROM documents
        ),
        pm AS (
            SELECT doc_id, count(*)::DOUBLE AS ptf
            FROM parr,
                 UNNEST(range(0, greatest(len(ts) - {m - 1}, 0))) AS r(i)
            WHERE {conds}
            GROUP BY doc_id
        ),
        pstats AS (
            SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                   (SELECT sum(len(ts)) FROM parr)
                   / (SELECT count(*) FROM documents)::DOUBLE AS avgdl,
                   (SELECT count(*) FROM pm)::DOUBLE AS pdf
        ),
        pscore AS (
            SELECT pm.doc_id,
                   ln(1 + (s.n - s.pdf + 0.5) / (s.pdf + 0.5))
                   * pm.ptf * (1.2 + 1)
                   / (pm.ptf + 1.2 * (1 - 0.75
                      + 0.75 * len(parr.ts) / s.avgdl)) AS pscore
            FROM pm JOIN parr USING (doc_id) CROSS JOIN pstats s
        )
        SELECT w.doc_id,
               ROUND({qw} * w.score
                     + {rw} * COALESCE(p.pscore, 0), 4) AS score
        FROM win w LEFT JOIN pscore p USING (doc_id)
        ORDER BY {qw} * w.score + {rw} * COALESCE(p.pscore, 0) DESC,
                 doc_id
        LIMIT {k}
    """


def _function_score_sql(query: str, factor: float, k: int) -> str:
    terms = list(dict.fromkeys(ANALYZER.tokenize(query)))
    return f"""
        WITH {_scored_or_cte(terms)},
        boosted AS (
            SELECT s.doc_id,
                   s.score * ln(1 + {factor} * d.n_chars) AS fscore
            FROM scored s JOIN documents d USING (doc_id)
        )
        SELECT doc_id, ROUND(fscore, 4) AS score
        FROM boosted ORDER BY fscore DESC, doc_id LIMIT {k}
    """


MULTI_QUERY = "window src13"  # text terms + a source-field term
MULTI_BOOST = 3.0  # source field boost (the reference boosts id^10)


def ft_multimatch_topk(sf_dir: str) -> pd.DataFrame:
    """ES ``multi_match`` (most_fields) analog — the reference's main
    dataset-search scores keyword queries over several fields with
    per-field boosts (apiserver/apiserver/search/__init__.py:55-107:
    multi_match over ``id^10, description, name, attribute_keywords``).
    Here: score = BM25(text) + MULTI_BOOST × BM25(source), each field
    with its OWN df/avgdl statistics (separate per-field index, as ES
    keeps per-field stats). Exactness note: both fields are scored over
    their FULL OR match sets before combining (k = n_docs) — the
    doc-at-a-time merged traversal is the serving-scale path; this
    two-pass form is the exact semantics the twin can mirror."""
    eng_t = get_engine(sf_dir)
    eng_s = get_field_engine(sf_dir, "source")
    st = eng_t.search(MULTI_QUERY, k=eng_t.n_docs, mode="or").to_pandas()
    ss = eng_s.search(MULTI_QUERY, k=eng_s.n_docs, mode="or").to_pandas()
    m = st.merge(ss, on="doc_id", how="outer", suffixes=("_t", "_s"))
    m = m.fillna({"score_t": 0.0, "score_s": 0.0})
    m["score"] = m["score_t"] + MULTI_BOOST * m["score_s"]
    m = m.sort_values(
        ["score", "doc_id"], ascending=[False, True]
    ).head(BM25_K)
    out = m[["doc_id", "score"]].reset_index(drop=True)
    out["doc_id"] = out["doc_id"].astype("int64")
    out["score"] = round_away(out["score"], 4)
    return out


TIE_BREAKER = 0.3


def ft_multimatch_best_topk(sf_dir: str) -> pd.DataFrame:
    """ES ``multi_match`` (best_fields + tie_breaker) analog: score =
    max(field scores) + tie_breaker × sum(other field scores) — ES's
    dis_max composition. Same per-field statistics as
    :func:`ft_multimatch_topk`; only the combination differs."""
    eng_t = get_engine(sf_dir)
    eng_s = get_field_engine(sf_dir, "source")
    st = eng_t.search(MULTI_QUERY, k=eng_t.n_docs, mode="or").to_pandas()
    ss = eng_s.search(MULTI_QUERY, k=eng_s.n_docs, mode="or").to_pandas()
    m = st.merge(ss, on="doc_id", how="outer", suffixes=("_t", "_s"))
    m = m.fillna({"score_t": 0.0, "score_s": 0.0})
    hi = m[["score_t", "score_s"]].max(axis=1)
    lo = m[["score_t", "score_s"]].min(axis=1)
    m["score"] = hi + TIE_BREAKER * lo
    m = m.sort_values(
        ["score", "doc_id"], ascending=[False, True]
    ).head(BM25_K)
    out = m[["doc_id", "score"]].reset_index(drop=True)
    out["doc_id"] = out["doc_id"].astype("int64")
    out["score"] = round_away(out["score"], 4)
    return out


def _multimatch_best_sql(query: str, k: int, tb: float) -> str:
    terms = list(dict.fromkeys(ANALYZER.tokenize(query)))
    return f"""
        WITH {_field_scored_cte("t", "text", terms)},
        {_field_scored_cte("s", "source", terms)}
        SELECT coalesce(t.doc_id, s.doc_id)::BIGINT AS doc_id,
               ROUND(greatest(coalesce(t.score, 0), coalesce(s.score, 0))
                     + {tb} * least(coalesce(t.score, 0),
                                    coalesce(s.score, 0)), 4) AS score
        FROM scored_t t FULL OUTER JOIN scored_s s
          ON t.doc_id = s.doc_id
        ORDER BY score DESC, doc_id
        LIMIT {k}
    """


def _field_scored_cte(name: str, col: str, terms: list[str]) -> str:
    """One field's exhaustive OR-scored CTE chain (own tf/dl/stats/df),
    accumulation pinned to lexicographic term order."""
    qvals = ", ".join(f"('{t}')" for t in sorted(set(terms)))
    return f"""
        tok_{name} AS (
            SELECT doc_id, unnest({ANALYZER.sql_tokens_expr(col)}) AS term
            FROM documents
        ),
        tf_{name} AS (
            SELECT doc_id, term, count(*)::DOUBLE AS tf
            FROM tok_{name} GROUP BY doc_id, term
        ),
        dl_{name} AS (
            SELECT doc_id, count(*)::DOUBLE AS dl
            FROM tok_{name} GROUP BY doc_id
        ),
        stats_{name} AS (
            SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                   (SELECT sum(dl) FROM dl_{name})
                   / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
        ),
        df_{name} AS (
            SELECT term, count(*)::DOUBLE AS df
            FROM tf_{name} GROUP BY term
        ),
        qterms_{name}(term) AS (VALUES {qvals}),
        contrib_{name} AS (
            SELECT tf.doc_id, tf.term,
                   ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                   * tf.tf * (1.2 + 1)
                   / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS c
            FROM tf_{name} tf
            JOIN qterms_{name} q USING (term)
            JOIN df_{name} df USING (term)
            JOIN dl_{name} dl USING (doc_id)
            CROSS JOIN stats_{name} s
        ),
        scored_{name} AS (
            SELECT doc_id, sum(c ORDER BY term) AS score
            FROM contrib_{name} GROUP BY doc_id
        )"""


def _multimatch_sql(query: str, k: int, boost: float) -> str:
    terms = list(dict.fromkeys(ANALYZER.tokenize(query)))
    return f"""
        WITH {_field_scored_cte("t", "text", terms)},
        {_field_scored_cte("s", "source", terms)}
        SELECT coalesce(t.doc_id, s.doc_id)::BIGINT AS doc_id,
               ROUND(coalesce(t.score, 0) + {boost} * coalesce(s.score, 0),
                     4) AS score
        FROM scored_t t FULL OUTER JOIN scored_s s
          ON t.doc_id = s.doc_id
        ORDER BY score DESC, doc_id
        LIMIT {k}
    """


def ft_multimatch_cross_topk(sf_dir: str) -> pd.DataFrame:
    """ES ``multi_match`` (cross_fields, term-centric) — the reference's
    ACTUAL keyword-search mode (apiserver/apiserver/search/__init__.py:
    65-77: multi_match cross_fields over ``id^10, description, name,
    attribute_keywords``): per query term, take the best boosted field
    contribution (dis_max per term), then sum over terms. Pinned
    deviation: per-field contributions use each field's own df (ES
    blends dfs across fields); accumulation pinned to lexicographic
    term order (the twin's ``sum(c ORDER BY term)``)."""
    eng_t = get_engine(sf_dir)
    eng_s = get_field_engine(sf_dir, "source")
    terms = sorted(set(ANALYZER.tokenize(MULTI_QUERY)))
    total: pd.Series | None = None
    for t in terms:
        st = (
            eng_t.search(t, k=eng_t.n_docs, mode="or")
            .to_pandas()
            .set_index("doc_id")["score"]
        )
        ss = (
            eng_s.search(t, k=eng_s.n_docs, mode="or")
            .to_pandas()
            .set_index("doc_id")["score"]
        )
        m = pd.concat(
            [st.rename("a"), (MULTI_BOOST * ss).rename("b")], axis=1
        ).fillna(0.0)
        per = m.max(axis=1)
        total = per if total is None else total.add(per, fill_value=0.0)
    out = total.rename("score").reset_index()
    out = out.sort_values(
        ["score", "doc_id"], ascending=[False, True]
    ).head(BM25_K).reset_index(drop=True)
    out["doc_id"] = out["doc_id"].astype("int64")
    out["score"] = round_away(out["score"], 4)
    return out


def _multimatch_cross_sql(query: str, k: int, boost: float) -> str:
    terms = list(dict.fromkeys(ANALYZER.tokenize(query)))
    return f"""
        WITH {_field_scored_cte("t", "text", terms)},
        {_field_scored_cte("s", "source", terms)},
        merged AS (
            SELECT coalesce(ct.doc_id, cs.doc_id) AS doc_id,
                   coalesce(ct.term, cs.term) AS term,
                   greatest(coalesce(ct.c, 0),
                            {boost} * coalesce(cs.c, 0)) AS c
            FROM contrib_t ct FULL OUTER JOIN contrib_s cs
              ON ct.doc_id = cs.doc_id AND ct.term = cs.term
        ),
        final AS (
            SELECT doc_id, sum(c ORDER BY term) AS score
            FROM merged GROUP BY doc_id
        )
        SELECT doc_id::BIGINT AS doc_id, ROUND(score, 4) AS score
        FROM final ORDER BY final.score DESC, doc_id LIMIT {k}
    """


def ft_boxplot(sf_dir: str) -> pd.DataFrame:
    """ES ``boxplot`` aggregation: min / q1 / median / q3 / max of
    n_chars over every AND match — exact linear-interpolation
    quantiles (quantile_cont parity; ES uses TDigest — same pinned
    deviation as the percentiles entry)."""
    eng = get_engine(sf_dir)
    t = eng.matched_percentiles(
        BM25_QUERY, "n_chars", (0.0, 0.25, 0.5, 0.75, 1.0), mode="and"
    ).to_pandas()
    vals = round_away(t["value"], 4)
    return pd.DataFrame(
        {
            "stat": ["min", "q1", "median", "q3", "max"],
            "value": vals.to_numpy(),
        }
    )


def _boxplot_sql(query: str, col: str) -> str:
    stats = [
        ("min", 0.0), ("q1", 0.25), ("median", 0.5),
        ("q3", 0.75), ("max", 1.0),
    ]
    parts = [
        f"""SELECT '{name}' AS stat,
            ROUND(quantile_cont(v, {q}), 4) AS value FROM vals"""
        for name, q in stats
    ]
    body = "\n        UNION ALL\n".join(parts)
    return f"""
        WITH {_matched_cte(query)},
        vals AS (
            SELECT d.{col}::DOUBLE AS v
            FROM matched m JOIN documents d USING (doc_id)
            WHERE d.{col} IS NOT NULL
        )
        {body}
    """


def ft_string_stats(sf_dir: str) -> pd.DataFrame:
    """ES ``string_stats`` aggregation (with show_distribution's
    Shannon entropy) over the `lang` keyword of every AND match:
    count, min/max/avg length, and the character-distribution entropy
    −Σ p·log2(p). Entropy sums run over characters in ascending code
    order (pinned, matching the twin's ORDER BY)."""
    import math

    eng = get_engine(sf_dir)
    _, _, v = eng._score_all_with_meta(BM25_QUERY, "lang", "and", None)
    vals = [x for x in v.to_pylist() if x is not None]
    n = len(vals)
    lens = [len(x) for x in vals]
    from collections import Counter

    chars = Counter()
    for x in vals:
        chars.update(x)
    total = sum(chars.values())
    ent = 0.0
    for c in sorted(chars):  # ascending char order == twin ORDER BY
        p = chars[c] / total
        ent -= p * math.log2(p)
    return pd.DataFrame(
        {
            "n": pd.array([n], dtype="int64"),
            "min_len": pd.array([min(lens)], dtype="int64"),
            "max_len": pd.array([max(lens)], dtype="int64"),
            "avg_len": [
                round_away(pd.Series([sum(lens) / n]), 4)[0]
            ],
            "entropy": [round_away(pd.Series([ent]), 4)[0]],
        }
    )


def _string_stats_sql(query: str, col: str) -> str:
    return f"""
        WITH {_matched_cte(query)},
        vals AS (
            SELECT d.{col} AS v
            FROM matched m JOIN documents d USING (doc_id)
            WHERE d.{col} IS NOT NULL
        ),
        chars AS (
            SELECT unnest(string_split(v, '')) AS c FROM vals
        ),
        dist AS (
            SELECT c, count(*)::BIGINT AS cnt FROM chars GROUP BY c
        ),
        tot AS (SELECT sum(cnt)::DOUBLE AS t FROM dist)
        SELECT (SELECT count(*) FROM vals)::BIGINT AS n,
               (SELECT min(len(v)) FROM vals)::BIGINT AS min_len,
               (SELECT max(len(v)) FROM vals)::BIGINT AS max_len,
               (SELECT ROUND(sum(len(v))::DOUBLE / count(*), 4)
                FROM vals) AS avg_len,
               (SELECT ROUND(
                    -sum((cnt / t.t) * log2(cnt / t.t) ORDER BY c), 4)
                FROM dist CROSS JOIN tot t) AS entropy
    """


def ft_mad(sf_dir: str) -> pd.DataFrame:
    """ES ``median_absolute_deviation`` aggregation over n_chars of
    every AND match — EXACT (median of |v − median|, linear
    interpolation both times; ES's TDigest approximation is the same
    pinned deviation as the percentiles entry)."""
    import numpy as np

    eng = get_engine(sf_dir)
    _, _, v = eng._score_all_with_meta(BM25_QUERY, "n_chars", "and", None)
    x = v.drop_null().to_numpy(zero_copy_only=False).astype(np.float64)
    med = float(np.quantile(x, 0.5, method="linear"))
    mad = float(np.quantile(np.abs(x - med), 0.5, method="linear"))
    return pd.DataFrame(
        {
            "median": [round_away(pd.Series([med]), 4)[0]],
            "mad": [round_away(pd.Series([mad]), 4)[0]],
        }
    )


def _mad_sql(query: str, col: str) -> str:
    return f"""
        WITH {_matched_cte(query)},
        vals AS (
            SELECT d.{col}::DOUBLE AS v
            FROM matched m JOIN documents d USING (doc_id)
            WHERE d.{col} IS NOT NULL
        ),
        med AS (SELECT quantile_cont(v, 0.5) AS m FROM vals)
        SELECT ROUND((SELECT m FROM med), 4) AS median,
               ROUND(
                   (SELECT quantile_cont(abs(v - med.m), 0.5)
                    FROM vals CROSS JOIN med), 4
               ) AS mad
    """


MULTI_TERMS_SIZE = 10


def ft_multi_terms(sf_dir: str) -> pd.DataFrame:
    """ES ``multi_terms`` aggregation: compound (lang, source) buckets
    over the AND match set ordered by DOC COUNT desc (the difference
    from `composite`, which orders by key for pagination), ties by
    (lang, source) asc, top MULTI_TERMS_SIZE."""
    eng = get_engine(sf_dir)
    t = eng.matched_composite(
        BM25_QUERY, ("lang", "source"), size=10_000_000, mode="and"
    ).to_pandas()
    out = (
        t.sort_values(
            ["n", "lang", "source"], ascending=[False, True, True]
        )
        .head(MULTI_TERMS_SIZE)
        .reset_index(drop=True)
    )
    out["n"] = out["n"].astype("int64")
    return out


def _multi_terms_sql(query: str, size: int) -> str:
    return f"""
        WITH {_matched_cte(query)}
        SELECT d.lang, d.source, count(*)::BIGINT AS n
        FROM matched m JOIN documents d USING (doc_id)
        GROUP BY d.lang, d.source
        ORDER BY n DESC, d.lang, d.source
        LIMIT {size}
    """


TTEST_GROUPS = ("en", "de")  # compare n_chars between two lang filters


def ft_t_test(sf_dir: str) -> pd.DataFrame:
    """ES ``t_test`` aggregation (heteroscedastic/Welch): the
    t-statistic of n_chars between two keyword-filtered match groups.
    Each group contributes exact int64 (n, Σv, Σv²); the statistic
    derives once from the six integers with the pinned formula
    t = (m1−m2) / sqrt(s1²/n1 + s2²/n2), sample variances
    s² = (Σv² − (Σv)²/n)/(n−1) — the twin spells the same chain."""
    import math

    eng = get_engine(sf_dir)
    stats = []
    for lang in TTEST_GROUPS:
        _, _, v = eng._score_all_with_meta(
            BM25_QUERY, "n_chars", "and", {"lang": lang}
        )
        arr = v.drop_null()
        import numpy as np

        x = arr.to_numpy(zero_copy_only=False).astype(np.int64)
        stats.append((int(x.size), int(x.sum()), int((x * x).sum())))
    (n1, s1, q1), (n2, s2, q2) = stats
    m1 = s1 / n1
    m2 = s2 / n2
    var1 = (q1 - (s1 * s1) / n1) / (n1 - 1)
    var2 = (q2 - (s2 * s2) / n2) / (n2 - 1)
    t = (m1 - m2) / math.sqrt(var1 / n1 + var2 / n2)
    return pd.DataFrame(
        {
            "n_a": pd.array([n1], dtype="int64"),
            "n_b": pd.array([n2], dtype="int64"),
            "t_stat": [round_away(pd.Series([t]), 4)[0]],
        }
    )


def _t_test_sql(query: str, col: str, groups: tuple) -> str:
    ga, gb = groups
    return f"""
        WITH {_matched_cte(query)},
        j AS (
            SELECT d.lang, d.{col}::BIGINT AS v
            FROM matched m JOIN documents d USING (doc_id)
            WHERE d.{col} IS NOT NULL
        ),
        s AS (
            SELECT lang, count(*)::BIGINT AS n, sum(v)::BIGINT AS sv,
                   sum(v * v)::BIGINT AS sq
            FROM j WHERE lang IN ('{ga}', '{gb}') GROUP BY lang
        ),
        w AS (
            SELECT
                (SELECT n FROM s WHERE lang = '{ga}') AS n1,
                (SELECT sv FROM s WHERE lang = '{ga}') AS s1,
                (SELECT sq FROM s WHERE lang = '{ga}') AS q1,
                (SELECT n FROM s WHERE lang = '{gb}') AS n2,
                (SELECT sv FROM s WHERE lang = '{gb}') AS s2,
                (SELECT sq FROM s WHERE lang = '{gb}') AS q2
        )
        SELECT n1::BIGINT AS n_a, n2::BIGINT AS n_b,
               ROUND(
                   (s1::DOUBLE / n1 - s2::DOUBLE / n2)
                   / sqrt(
                       ((q1::DOUBLE - (s1::DOUBLE * s1::DOUBLE) / n1)
                        / (n1 - 1)) / n1
                       + ((q2::DOUBLE - (s2::DOUBLE * s2::DOUBLE) / n2)
                          / (n2 - 1)) / n2
                   ), 4
               ) AS t_stat
        FROM w
    """


RARE_MAX_DOC_COUNT = 2
RARE_SIZE = 30


def ft_rare_terms(sf_dir: str) -> pd.DataFrame:
    """ES ``rare_terms`` aggregation analog: the long-tail buckets a
    terms agg hides — terms appearing in at most RARE_MAX_DOC_COUNT of
    the docs matching the AND query, ordered (doc count asc, term
    asc), first RARE_SIZE. Exact counts (ES uses a CuckooFilter
    approximation — pinned deviation for SQL matchability). Same
    distributed shape as significant_terms: match set from the index,
    broadcast once; per-batch distinct (doc, term) partials; one
    vocabulary-bounded groupby."""
    import ray as _ray

    eng = get_engine(sf_dir)
    ids = eng.match_docs(BM25_QUERY, mode="and")
    empty = pd.DataFrame(
        {
            "term": pd.Series([], dtype="object"),
            "n": pd.Series([], dtype="int64"),
        }
    )
    if not ids.size:
        return empty
    ids_ref = _ray.put(ids)

    def fg_counts(batch: pa.Table) -> pa.Table:
        matched = _ray.get(ids_ref)
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(matched, d), 0, matched.size - 1)
        keep = matched[pos] == d
        if not keep.any():
            return pa.table(
                {
                    "term": pa.array([], type=pa.string()),
                    "fg": pa.array([], type=pa.int64()),
                }
            )
        tf, _ = ANALYZER.term_frequencies(
            batch.filter(pa.array(keep))["text"]
        )
        part = tf.group_by("term").aggregate([("row_idx", "count")])
        return part.rename_columns(["term", "fg"])

    from ray.data.aggregate import Sum

    counts = (
        rd.read_parquet(
            _docs_path(sf_dir), columns=["doc_id", "text"]
        )
        .map_batches(fg_counts, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("fg", alias_name="n"))
        .to_pandas()
    )
    out = counts[counts["n"] <= RARE_MAX_DOC_COUNT]
    out = out.sort_values(["n", "term"]).head(RARE_SIZE).reset_index(
        drop=True
    )
    out["n"] = out["n"].astype("int64")
    return out[["term", "n"]]


def _rare_terms_sql(query: str, max_dc: int, size: int) -> str:
    return f"""
        WITH {_matched_cte(query)},
        fg AS (
            SELECT term, count(DISTINCT doc_id)::BIGINT AS n
            FROM tok JOIN matched USING (doc_id)
            GROUP BY term
        )
        SELECT term, n FROM fg
        WHERE n <= {max_dc}
        ORDER BY n, term
        LIMIT {size}
    """


def ft_top_metrics(sf_dir: str) -> pd.DataFrame:
    """ES ``top_metrics`` aggregation analog: per lang bucket, the
    n_chars metric of that bucket's top-ranked match (rank = rounded
    score desc, docID asc — pinned so the twin's window function
    reproduces the pick). Built on the grouped-top-hits machinery
    (per_group=1) plus one docmeta gather."""
    import numpy as np

    eng = get_engine(sf_dir)
    d, s, v = eng._score_all_with_meta(BM25_QUERY, "lang", "and", None)
    full = pd.DataFrame(
        {
            "lang": v.to_pandas(),
            "doc_id": d.astype("int64"),
            # head pick runs on the ROUNDED score (docID tiebreak) so
            # the twin's window function reproduces it bit-for-bit
            "score": round_away(s, 4),
        }
    )
    heads = (
        full.sort_values(
            ["lang", "score", "doc_id"], ascending=[True, False, True]
        )
        # dropna=False: a null-lang bucket must surface like the twin's
        # NULL partition row (PARTITION BY d.lang keeps NULLs)
        .groupby("lang", as_index=False, dropna=False)
        .first()
    )
    nch = {}
    for r in eng.readers:
        ids = r._doc_ids
        c = r._meta["n_chars"].to_numpy(zero_copy_only=False)
        for dd in heads["doc_id"].to_numpy():
            pos = np.searchsorted(ids, dd)
            if pos < ids.size and ids[pos] == dd:
                nch[int(dd)] = int(c[pos])
    out = pd.DataFrame(
        {
            "lang": heads["lang"],
            "doc_id": heads["doc_id"].astype("int64"),
            "score": heads["score"],
            "n_chars": heads["doc_id"].map(nch).astype("int64"),
        }
    ).sort_values("lang").reset_index(drop=True)
    return out


def _top_metrics_sql(query: str) -> str:
    # full-match BM25 scores + per-lang head by (rounded score, doc_id)
    inner = _bm25_sql(query, 10_000_000)
    return f"""
        WITH scored_all AS ({inner}),
        ranked AS (
            SELECT d.lang, s.doc_id, s.score, d.n_chars,
                   row_number() OVER (
                       PARTITION BY d.lang
                       ORDER BY s.score DESC, s.doc_id
                   ) AS rn
            FROM scored_all s JOIN documents d USING (doc_id)
        )
        SELECT lang, doc_id, score, n_chars
        FROM ranked WHERE rn = 1
        ORDER BY lang
    """


def ft_ingest_pipeline(sf_dir: str) -> pd.DataFrame:
    """ES ingest-pipeline analog: a pinned processor chain applied to
    every document BEFORE indexing/counting — gsub (digit runs → '0'),
    lowercase, trim — then the per-doc token count of the processed
    text. The processors are vectorized Arrow kernels per batch (the
    exact shape an ingest node's processor list compiles to); the twin
    spells the identical chain in SQL, so the entry gates the whole
    processor semantics, not just the count."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def process(t: pa.Table) -> pa.Table:
        x = pc.fill_null(t["text"], "")
        x = pc.replace_substring_regex(x, r"[0-9]+", "0")  # gsub
        x = pc.utf8_lower(x)  # lowercase
        x = pc.utf8_trim_whitespace(x)  # trim
        lists = ANALYZER.token_lists(x)
        n = pc.list_value_length(lists)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pc.cast(n, pa.int64()),
            }
        )

    out = (
        ds.map_batches(process, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_tokens"] = out["n_tokens"].astype("int64")
    return out


def _ingest_pipeline_sql() -> str:
    toks = ANALYZER.sql_tokens_expr(
        "trim(lower(regexp_replace(coalesce(text, ''), '[0-9]+', '0', 'g')))"
    )
    return f"""
        SELECT doc_id, len({toks})::BIGINT AS n_tokens
        FROM documents
        ORDER BY doc_id
    """


def ft_multimatch_blended_topk(sf_dir: str) -> pd.DataFrame:
    """ES ``multi_match`` cross_fields with TRUE BlendedTermQuery df
    semantics — closes the pinned per-field-df deviation of
    ft_multimatch_cross_topk: each term's idf is computed from the
    blended document frequency max(df over fields) (Lucene
    BlendedTermQuery's rewrite), tf/doclen stay per-field, the best
    boosted field contribution wins per term (dis_max), terms sum in
    lexicographic order. Engine side rescales each field's per-term
    score by idf_blend/idf_field — same arithmetic family as the
    boosting/function_score rescale paths."""
    import math

    eng_t = get_engine(sf_dir)
    eng_s = get_field_engine(sf_dir, "source")
    terms = sorted(set(ANALYZER.tokenize(MULTI_QUERY)))
    n = eng_t.n_docs

    def idf(df: int) -> float:
        return math.log1p((n - df + 0.5) / (df + 0.5))

    total: pd.Series | None = None
    for t in terms:
        df_blend = max(eng_t.df(t), eng_s.df(t))
        if df_blend == 0:
            continue
        i_blend = idf(df_blend)
        parts = []
        for eng, boost in ((eng_t, 1.0), (eng_s, MULTI_BOOST)):
            df_f = eng.df(t)
            if df_f == 0:
                continue
            s = (
                eng.search(t, k=eng.n_docs, mode="or")
                .to_pandas()
                .set_index("doc_id")["score"]
            )
            parts.append(boost * (i_blend / idf(df_f)) * s)
        if not parts:
            continue
        m = pd.concat(parts, axis=1).fillna(0.0)
        per = m.max(axis=1)
        total = per if total is None else total.add(per, fill_value=0.0)
    if total is None:  # no query term matches either field
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "score": pd.Series([], dtype="float64"),
            }
        )
    out = total.rename("score").reset_index()
    out = out.sort_values(
        ["score", "doc_id"], ascending=[False, True]
    ).head(BM25_K).reset_index(drop=True)
    out["doc_id"] = out["doc_id"].astype("int64")
    out["score"] = round_away(out["score"], 4)
    return out


def _multimatch_blended_sql(query: str, k: int, boost: float) -> str:
    terms = list(dict.fromkeys(ANALYZER.tokenize(query)))
    return f"""
        WITH {_field_scored_cte("t", "text", terms)},
        {_field_scored_cte("s", "source", terms)},
        df_blend AS (
            SELECT q.term,
                   greatest(coalesce(dt.df, 0), coalesce(ds.df, 0)) AS df
            FROM qterms_t q
            LEFT JOIN df_t dt USING (term)
            LEFT JOIN df_s ds USING (term)
        ),
        idf AS (
            SELECT b.term,
                   ln(1 + (s.n - b.df + 0.5) / (b.df + 0.5)) AS i_blend
            FROM df_blend b CROSS JOIN stats_t s
            WHERE b.df > 0
        ),
        -- rescale each field's contribution from its own idf to the
        -- blended idf (same arithmetic as the engine)
        rescaled AS (
            SELECT c.doc_id, c.term,
                   greatest(
                       coalesce(
                           (i.i_blend
                            / ln(1 + (st.n - dt.df + 0.5) / (dt.df + 0.5)))
                           * c.c, 0),
                       0) AS c
            FROM contrib_t c
            JOIN idf i USING (term)
            JOIN df_t dt USING (term)
            CROSS JOIN stats_t st
        ),
        rescaled_s AS (
            SELECT c.doc_id, c.term,
                   {boost} * (i.i_blend
                    / ln(1 + (ss.n - ds.df + 0.5) / (ds.df + 0.5)))
                   * c.c AS c
            FROM contrib_s c
            JOIN idf i USING (term)
            JOIN df_s ds USING (term)
            CROSS JOIN stats_s ss
        ),
        merged AS (
            SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
                   coalesce(a.term, b.term) AS term,
                   greatest(coalesce(a.c, 0), coalesce(b.c, 0)) AS c
            FROM rescaled a FULL OUTER JOIN rescaled_s b
              ON a.doc_id = b.doc_id AND a.term = b.term
        ),
        final AS (
            SELECT doc_id, sum(c ORDER BY term) AS score
            FROM merged GROUP BY doc_id
        )
        SELECT doc_id::BIGINT AS doc_id, ROUND(score, 4) AS score
        FROM final ORDER BY final.score DESC, doc_id LIMIT {k}
    """


TERMS_FILTER_LANGS = ("de", "fr")  # ES `terms` query: lang IN (...)
SORT_FIELD = "n_chars"


def ft_bm25_terms_filter(sf_dir: str) -> pd.DataFrame:
    """ES ``terms`` query analog (multi-value keyword filter): BM25 AND
    search restricted to docs whose lang is IN a value set — the
    list-valued filter path through docmeta (scalar = ES `term`,
    list = ES `terms`, tuple = ES `range`)."""
    eng = get_engine(sf_dir)
    t = eng.search(
        BM25_FILTER_QUERY,
        k=BM25_K,
        mode="and",
        filters={"lang": list(TERMS_FILTER_LANGS)},
    )
    out = t.to_pandas()
    out["score"] = round_away(out["score"], 4)
    return out


def _terms_filter_sql(query: str, k: int, langs: tuple[str, ...]) -> str:
    terms = list(dict.fromkeys(ANALYZER.tokenize(query)))
    llist = ", ".join(f"'{v}'" for v in langs)
    return f"""
        WITH {_scored_or_cte(terms)},
        cnt AS (
            SELECT doc_id, count(DISTINCT term) AS nt FROM tok
            WHERE term IN ({', '.join(f"'{t}'" for t in terms)})
            GROUP BY doc_id
        )
        SELECT s.doc_id, ROUND(s.score, 4) AS score
        FROM scored s
        JOIN cnt USING (doc_id)
        JOIN documents d USING (doc_id)
        WHERE cnt.nt = {len(terms)} AND d.lang IN ({llist})
        ORDER BY s.score DESC, doc_id LIMIT {k}
    """


def ft_sort_by_field(sf_dir: str) -> pd.DataFrame:
    """ES field-sort analog (``sort: [{n_chars: desc}]``): the query's
    full AND match set ordered by a docmeta column, doc_id tiebreak,
    no scoring — the list-page "sort by size/date" path."""
    eng = get_engine(sf_dir)
    out = eng.sort_by_field(
        BM25_QUERY, SORT_FIELD, k=BM25_K, descending=True, mode="and"
    ).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    out[SORT_FIELD] = out[SORT_FIELD].astype("int64")
    return out


def _sort_by_field_sql(query: str, col: str, k: int) -> str:
    terms = list(dict.fromkeys(ANALYZER.tokenize(query)))
    tlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
        WITH {_tok_cte()},
        tf AS (
            SELECT doc_id, term FROM tok
            WHERE term IN ({tlist}) GROUP BY doc_id, term
        ),
        cand AS (
            SELECT doc_id FROM tf GROUP BY doc_id
            HAVING count(*) = {len(terms)}
        )
        SELECT c.doc_id, d.{col}::BIGINT AS {col}
        FROM cand c JOIN documents d USING (doc_id)
        ORDER BY d.{col} DESC, c.doc_id LIMIT {k}
    """


PHRASE_SUGGEST_SIZE = 3
PHRASE_SUGGEST_PER_TOKEN = 3


def ft_phrase_suggest(sf_dir: str) -> pd.DataFrame:
    """ES phrase-suggester analog over the misspelled FUZZY_QUERY:
    per-token top corrections cross-multiplied into candidate phrases,
    ranked (total edit distance asc, df product desc, phrase asc) —
    the pinned LM-free deviation documented on
    SearchEngine.suggest_phrase."""
    eng = get_engine(sf_dir)
    return eng.suggest_phrase(
        FUZZY_QUERY,
        size=PHRASE_SUGGEST_SIZE,
        max_edits=SUGGEST_EDITS,
        per_token=PHRASE_SUGGEST_PER_TOKEN,
    ).to_pandas()


def _phrase_suggest_sql(
    query: str, size: int, max_edits: int, per_token: int
) -> str:
    toks = list(ANALYZER.tokenize(query))
    cands = []
    for i, t in enumerate(toks):
        cands.append(
            f"""c{i} AS (
            SELECT term AS w, levenshtein('{t}', term)::BIGINT AS d, df
            FROM df WHERE levenshtein('{t}', term) <= {max_edits}
            QUALIFY row_number() OVER (
                ORDER BY levenshtein('{t}', term), df DESC, term
            ) <= {per_token}
        )"""
        )
    phrase_expr = " || ' ' || ".join(f"c{i}.w" for i in range(len(toks)))
    dist_expr = " + ".join(f"c{i}.d" for i in range(len(toks)))
    dfp_expr = " * ".join(f"c{i}.df" for i in range(len(toks)))
    srcs = ", ".join(f"c{i}" for i in range(len(toks)))
    return f"""
        WITH {_tok_cte()},
        tf AS (SELECT doc_id, term FROM tok GROUP BY doc_id, term),
        df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
        {', '.join(cands)},
        combos AS (
            SELECT {phrase_expr} AS phrase,
                   ({dist_expr})::BIGINT AS total_distance,
                   ({dfp_expr})::BIGINT AS df_product
            FROM {srcs}
        )
        SELECT phrase, total_distance, df_product FROM combos
        ORDER BY total_distance, df_product DESC, phrase LIMIT {size}
    """


SYN_QUERY = "window merge"
SYNONYMS = {"merge": ("join",)}  # both in-vocabulary → non-vacuous


def ft_synonym_topk(sf_dir: str) -> pd.DataFrame:
    """Query-time synonym expansion (ES synonym filter in the search
    analyzer): "window merge" expands to {window, merge, join}, scored
    as an OR query — the twin scores the expanded term list directly."""
    eng = get_engine(sf_dir)
    out = eng.search_with_synonyms(
        SYN_QUERY, SYNONYMS, k=BM25_K, mode="or"
    ).to_pandas()
    out["score"] = round_away(out["score"], 4)
    return out


def ft_stopword_token_counts(sf_dir: str) -> pd.DataFrame:
    """Token counts under a stopword-filtering analyzer (ES ``stop``
    token filter) — same kernel as ft_token_counts with the stop set
    removed after lowercasing, SQL-reproducibly."""
    ana = Analyzer(stopwords=_STOPWORDS)
    ds = rd.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])

    def count_tokens(t: pa.Table) -> pa.Table:
        lists = ana.token_lists(t["text"])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pc.list_value_length(lists).cast(pa.int64()),
            }
        )

    return ds.map_batches(count_tokens, batch_format="pyarrow").to_pandas()


def ft_bool_msm_topk(sf_dir: str) -> pd.DataFrame:
    """``bool`` query with ``minimum_should_match``: no must clause,
    candidates must match ≥ BOOL_MSM_N distinct should tokens; score
    sums BM25 contributions of the present should terms. The ES knob
    the reference's multi-term keyword search relies on for precision
    (apiserver builds should-lists from query keywords)."""
    eng = get_engine(sf_dir)
    t = eng.bool_search(
        should=BOOL_MSM_SHOULD, k=BM25_K,
        minimum_should_match=BOOL_MSM_N,
    )
    out = t.to_pandas()
    out["score"] = round_away(out["score"], 4)
    return out


def ft_bool_topk(sf_dir: str) -> pd.DataFrame:
    """ES ``bool`` query analog (must/should/must_not) through the real
    engine: docs containing every must token and none of the must_not
    tokens, scored over must ∪ should contributions (lexicographic
    accumulation — the twin's ``sum(c ORDER BY term)``). Reference
    analog: the keyword+filter search body the apiserver builds
    (apiserver/apiserver/search/__init__.py:55-107 combines must/
    must_not/filter clauses in its ES query DSL)."""
    eng = get_engine(sf_dir)
    t = eng.bool_search(
        must=BOOL_MUST, should=BOOL_SHOULD, must_not=BOOL_NOT, k=BM25_K
    )
    out = t.to_pandas()
    out["score"] = round_away(out["score"], 4)
    return out


def ft_bm25_range_filter(sf_dir: str) -> pd.DataFrame:
    """BM25 AND query with a numeric range filter on docmeta
    (``n_chars`` BETWEEN lo AND hi) — the ES ``range`` filter analog the
    reference's variable constraints compile to
    (apiserver/apiserver/search/__init__.py range clauses). The filter
    runs inside the segment scorer on docmeta columns; postings of
    filtered-out docs are skipped before scoring."""
    eng = get_engine(sf_dir)
    t = eng.search(
        BM25_FILTER_QUERY,
        k=BM25_K,
        mode="and",
        filters={"n_chars": (NCHARS_LO, NCHARS_HI)},
    )
    out = t.to_pandas()
    out["score"] = round_away(out["score"], 4)
    return out


def ft_phrase_prefix_topk(sf_dir: str) -> pd.DataFrame:
    """match_phrase_prefix: leading tokens exact-consecutive, final
    token a dictionary-prefix expansion — the ES autocomplete query.
    tf = matching start positions, idf from the match df (same scoring
    as ft_phrase_topk). Twin: positional UNNEST with LIKE on the last
    slot."""
    eng = get_pos_engine(sf_dir)
    t = eng.phrase_prefix_search(PHRASE_PREFIX_QUERY, k=BM25_K)
    out = t.to_pandas()
    out["score"] = round_away(out["score"], 4)
    return out


def ft_bool_dist_topk(sf_dir: str) -> pd.DataFrame:
    """Distributed bool query through the scorer-actor pool (global-df
    round + per-actor bool scoring); rank-identical to ft_bool_topk,
    which the shared SQL twin gates."""
    from datamart_ray.search.engine import DistributedSearchEngine

    eng = get_engine(sf_dir)  # ensures the index exists
    idx_dir = eng.readers[0].seg_dir.rsplit("/segments/", 1)[0]
    deng = DistributedSearchEngine(idx_dir, lazy=False, max_actors=4)
    try:
        t = deng.bool_search(
            must=BOOL_MUST, should=BOOL_SHOULD, must_not=BOOL_NOT, k=BM25_K
        )
    finally:
        deng.shutdown()
    out = t.to_pandas()
    out["score"] = round_away(out["score"], 4)
    return out


MLT_SEED_DOC = 42  # more_like_this seed document
MLT_MAX_TERMS = 10
NCHARS_BIN = 50  # numeric facet histogram bin width


def ft_fuzzy_dist_topk(sf_dir: str) -> pd.DataFrame:
    """Distributed fuzzy query through the scorer-actor pool (expansion
    round → global-df round → per-actor OR scoring); rank-identical to
    ft_fuzzy_topk, which the shared SQL twin gates."""
    from datamart_ray.search.engine import DistributedSearchEngine

    eng = get_engine(sf_dir)  # ensures the index exists
    idx_dir = eng.readers[0].seg_dir.rsplit("/segments/", 1)[0]
    deng = DistributedSearchEngine(idx_dir, lazy=False, max_actors=4)
    try:
        t = deng.fuzzy_search(FUZZY_QUERY, k=BM25_K, max_edits=1)
    finally:
        deng.shutdown()
    out = t.to_pandas()
    out["score"] = round_away(out["score"], 4)
    return out


def ft_search_after_page2(sf_dir: str) -> pd.DataFrame:
    """ES search_after pagination: page 2 (ranks 11-20) of the BM25 AND
    query, fetched with the cursor = last row of page 1. The strict
    (score desc, doc_id asc) total order makes cursor pages equal
    OFFSET pages, which is what the twin computes."""
    eng = get_engine(sf_dir)
    p1 = eng.search(BM25_QUERY, k=BM25_K, mode="and")
    assert p1.num_rows == BM25_K, "page 1 underfull — fixture too small"
    cursor = (
        p1["score"][BM25_K - 1].as_py(),
        p1["doc_id"][BM25_K - 1].as_py(),
    )
    t = eng.search(BM25_QUERY, k=BM25_K, mode="and", search_after=cursor)
    out = t.to_pandas()
    out["score"] = round_away(out["score"], 4)
    return out


def ft_more_like_this(sf_dir: str) -> pd.DataFrame:
    """ES more_like_this: seed doc 42's top tf×idf terms (max 10, ties
    by term) scored as an OR query, seed excluded. The seed text rides
    the distributed lookup path (fetch_rows_by_ids), term selection and
    df come from the index."""
    from datamart_ray.util import fetch_rows_by_ids

    eng = get_engine(sf_dir)
    seed = fetch_rows_by_ids(
        _docs_path(sf_dir), "doc_id", (MLT_SEED_DOC,), columns=["text"]
    )
    text = seed["text"][0].as_py()
    t = eng.more_like_this(
        text, k=BM25_K, max_query_terms=MLT_MAX_TERMS, exclude=MLT_SEED_DOC
    )
    out = t.to_pandas()
    out["score"] = round_away(out["score"], 4)
    return out


def ft_match_positions(sf_dir: str) -> pd.DataFrame:
    """Highlight-offsets analog: token positions of every query-term
    occurrence within the BM25 top-k docs, via the positional index
    (decodes bounded by the 10-doc filter)."""
    eng = get_engine(sf_dir)
    top = eng.search(BM25_QUERY, k=BM25_K, mode="and")
    pos_eng = get_pos_engine(sf_dir)
    t = pos_eng.match_positions(BM25_QUERY, top["doc_id"].to_numpy())
    return t.to_pandas()


def ft_facet_nchars_hist(sf_dir: str) -> pd.DataFrame:
    """ES histogram aggregation: fixed-width n_chars bins over every
    doc matching the BM25 AND query."""
    eng = get_engine(sf_dir)
    t = eng.numeric_facet(BM25_QUERY, "n_chars", NCHARS_BIN, mode="and")
    return t.to_pandas()


def ft_phrase_dist_topk(sf_dir: str) -> pd.DataFrame:
    """Distributed match_phrase through the scorer-actor pool (two-round
    count→score protocol; rank-identical to the in-process path, which
    the shared SQL twin gates)."""
    from datamart_ray.search.engine import DistributedSearchEngine

    eng = get_pos_engine(sf_dir)  # ensures the positional index exists
    idx_dir = eng.readers[0].seg_dir.rsplit("/segments/", 1)[0]
    deng = DistributedSearchEngine(idx_dir, lazy=False, max_actors=4)
    try:
        t = deng.phrase_search(PHRASE_QUERY, k=BM25_K)
    finally:
        deng.shutdown()
    out = t.to_pandas()
    out["score"] = round_away(out["score"], 4)
    return out


def ft_phrase_slop_topk(sf_dir: str) -> pd.DataFrame:
    """Sloppy ordered phrase (slop=2): tf counts start positions of the
    first token from which the second token follows within 1+slop
    positions — the ordered-window variant of ES's match_phrase slop
    (documented deviation: ES slop is a position edit distance). Twin
    expands the window test as an OR over the next `slop+1` list
    indices."""
    eng = get_pos_engine(sf_dir)
    t = eng.phrase_search(PHRASE_QUERY, k=BM25_K, slop=2)
    out = t.to_pandas()
    out["score"] = round_away(out["score"], 4)
    return out


def _phrase_slop_sql(phrase: str, k: int, slop: int) -> str:
    t1, t2 = ANALYZER.tokenize(phrase)
    # t1 sits at list index i+1, so the ordered window for t2 is the
    # next slop+1 indices: i+2 .. i+2+slop
    window = " OR ".join(
        f"ts[i+{g}] = '{t2}'" for g in range(2, slop + 3)
    )
    return f"""
        WITH toks AS (
            SELECT doc_id, {ANALYZER.sql_tokens_expr('text')} AS ts
            FROM documents
        ),
        m AS (
            SELECT doc_id, count(*)::DOUBLE AS ptf
            FROM toks,
                 UNNEST(range(0, greatest(len(ts) - 1, 0))) AS r(i)
            WHERE ts[i+1] = '{t1}' AND ({window})
            GROUP BY doc_id
        ),
        dl AS (SELECT doc_id, len(ts)::DOUBLE AS dl FROM toks),
        stats AS (
            SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                   (SELECT sum(dl) FROM dl)
                   / (SELECT count(*) FROM documents)::DOUBLE AS avgdl,
                   (SELECT count(*) FROM m)::DOUBLE AS df
        )
        SELECT m.doc_id,
               ROUND(ln(1 + (s.n - s.df + 0.5) / (s.df + 0.5))
                     * m.ptf * (1.2 + 1)
                     / (m.ptf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)),
                     4) AS score
        FROM m JOIN dl USING (doc_id) CROSS JOIN stats s
        ORDER BY score DESC, doc_id
        LIMIT {k}
    """


def _prefix_sql(query: str, k: int) -> str:
    qterms = list(dict.fromkeys(ANALYZER.tokenize(query)))
    match = " OR ".join(f"term LIKE '{q}%'" for q in qterms)
    return f"""
        WITH {_tok_cte()},
        tf AS (
            SELECT doc_id, term, count(*)::DOUBLE AS tf
            FROM tok GROUP BY doc_id, term
        ),
        dl AS (
            SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY doc_id
        ),
        stats AS (
            SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                   (SELECT sum(dl) FROM dl)
                   / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        qterms AS (
            SELECT DISTINCT term FROM df WHERE {match}
        ),
        contrib AS (
            SELECT tf.doc_id, tf.term,
                   ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                   * tf.tf * (1.2 + 1)
                   / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS c
            FROM tf
            JOIN qterms q USING (term)
            JOIN df USING (term)
            JOIN dl USING (doc_id)
            CROSS JOIN stats s
        ),
        scored AS (
            SELECT doc_id, sum(c ORDER BY term) AS score
            FROM contrib GROUP BY doc_id
        )
        SELECT doc_id, ROUND(score, 4) AS score
        FROM scored
        ORDER BY scored.score DESC, doc_id
        LIMIT {k}
    """


def ft_bm25_facet_lang(sf_dir: str) -> pd.DataFrame:
    """Facet (ES terms-aggregation) over EVERY doc matching the AND
    query — counts per `lang`, sorted (n desc, lang asc). Exercises the
    full-match path (not top-k) plus the docmeta lookup."""
    eng = get_engine(sf_dir)
    t = eng.facet_counts(BM25_QUERY, "lang", mode="and")
    out = t.to_pandas()
    out["n"] = out["n"].astype("int64")
    return out


def _facet_sql(query: str, col: str) -> str:
    terms = list(dict.fromkeys(ANALYZER.tokenize(query)))
    qvals = ", ".join(f"('{t}')" for t in terms)
    return f"""
        WITH {_tok_cte()},
        qterms(term) AS (VALUES {qvals}),
        matched AS (
            SELECT doc_id
            FROM (SELECT DISTINCT doc_id, term FROM tok) x
            JOIN qterms USING (term)
            GROUP BY doc_id
            HAVING count(*) = {len(terms)}
        )
        SELECT d.{col}, count(*)::BIGINT AS n
        FROM matched m JOIN documents d USING (doc_id)
        GROUP BY d.{col}
        ORDER BY n DESC, d.{col}
    """


def ft_facet_dist_lang(sf_dir: str) -> pd.DataFrame:
    """Distributed facet (terms aggregation) through the scorer-actor
    pool: per-actor {value → count} partials, driver merge — gates the
    distributed FULL-MATCH path (search tops out at k; facet touches
    every match). Same SQL twin as the in-process ft_bm25_facet_lang."""
    from datamart_ray.search.engine import DistributedSearchEngine

    eng = get_engine(sf_dir)  # ensures the on-disk index exists
    index_dir = eng.readers[0].seg_dir.rsplit("/segments/", 1)[0]
    deng = DistributedSearchEngine(index_dir, max_actors=4)
    try:
        t = deng.facet_counts(BM25_QUERY, "lang", mode="and")
    finally:
        deng.shutdown()
    out = t.to_pandas()
    out["n"] = out["n"].astype("int64")
    return out


TOPHITS_PER_GROUP = 3  # ES top_hits size per bucket
SPAN_SLOP = 3  # span_near slop (unordered, two clauses)
PCT_QS = (0.25, 0.5, 0.75, 0.95, 0.99)  # percentiles-agg cut points
TV_DOC_ID = 42  # term_vectors target doc (exists at every sf)


def ft_top_hits_per_lang(sf_dir: str) -> pd.DataFrame:
    """ES top_hits aggregation: per-`lang` top-3 matching docs by BM25
    (the result-panel-per-bucket pattern next to a facet). Full-match
    scoring + one Arrow multi-key sort + vectorized per-group head."""
    eng = get_engine(sf_dir)
    t = eng.grouped_top_hits(
        BM25_QUERY, "lang", per_group=TOPHITS_PER_GROUP, mode="and"
    )
    out = t.to_pandas()
    out["score"] = round_away(out["score"], 4)
    return out


def _top_hits_sql(query: str, col: str, per_group: int) -> str:
    terms = list(dict.fromkeys(ANALYZER.tokenize(query)))
    qvals = ", ".join(f"('{t}', {i})" for i, t in enumerate(terms))
    return f"""
        WITH {_tok_cte()},
        tf AS (
            SELECT doc_id, term, count(*)::DOUBLE AS tf
            FROM tok GROUP BY doc_id, term
        ),
        dl AS (
            SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY doc_id
        ),
        stats AS (
            SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                   (SELECT sum(dl) FROM dl)
                   / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        qterms(term, qord) AS (VALUES {qvals}),
        contrib AS (
            SELECT tf.doc_id, q.qord,
                   ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                   * tf.tf * (1.2 + 1)
                   / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS c
            FROM tf
            JOIN qterms q USING (term)
            JOIN df USING (term)
            JOIN dl USING (doc_id)
            CROSS JOIN stats s
        ),
        scored AS (
            SELECT doc_id, sum(c ORDER BY qord) AS score, count(*) AS nt
            FROM contrib GROUP BY doc_id
        ),
        hits AS (
            SELECT doc_id, score FROM scored WHERE nt = {len(terms)}
        ),
        ranked AS (
            SELECT d.{col} AS {col}, h.doc_id, h.score,
                   row_number() OVER (
                       PARTITION BY d.{col}
                       ORDER BY h.score DESC, h.doc_id
                   ) AS rn
            FROM hits h JOIN documents d USING (doc_id)
        )
        SELECT {col}, doc_id, ROUND(score, 4) AS score
        FROM ranked WHERE rn <= {per_group}
        ORDER BY {col}, score DESC, doc_id
    """


def ft_collapse_source_topk(sf_dir: str) -> pd.DataFrame:
    """ES field collapsing: best matching doc per `source`, then the
    global top-k over the group winners — one-result-per-site dedup of
    a result page."""
    eng = get_engine(sf_dir)
    t = eng.collapse_search(BM25_QUERY, "source", k=BM25_K, mode="and")
    out = t.to_pandas()
    out["score"] = round_away(out["score"], 4)
    return out


def _collapse_sql(query: str, col: str, k: int) -> str:
    base = _top_hits_sql(query, col, 1)
    # reuse the ranked CTE; rewrap for (doc_id, col, score) top-k output
    head, _sel = base.rsplit("SELECT", 1)
    return f"""{head}
        SELECT doc_id, {col}, ROUND(score, 4) AS score
        FROM ranked WHERE rn = 1
        ORDER BY score DESC, doc_id
        LIMIT {k}
    """


def ft_nchars_percentiles(sf_dir: str) -> pd.DataFrame:
    """ES percentiles aggregation over `n_chars` of every matching doc
    — exact linear-interpolation quantiles (DuckDB quantile_cont twin;
    ES's t-digest approximation replaced by exact values, pinned
    deviation documented on the engine method)."""
    eng = get_engine(sf_dir)
    out = eng.matched_percentiles(
        BM25_QUERY, "n_chars", PCT_QS, mode="and"
    ).to_pandas()
    out["value"] = round_away(out["value"], 4)
    return out


def _percentiles_sql(query: str, col: str, pcts: tuple) -> str:
    terms = list(dict.fromkeys(ANALYZER.tokenize(query)))
    qvals = ", ".join(f"('{t}')" for t in terms)
    lst = ", ".join(str(p) for p in pcts)
    return f"""
        WITH {_tok_cte()},
        qterms(term) AS (VALUES {qvals}),
        matched AS (
            SELECT doc_id
            FROM (SELECT DISTINCT doc_id, term FROM tok) x
            JOIN qterms USING (term)
            GROUP BY doc_id
            HAVING count(*) = {len(terms)}
        ),
        vals AS (
            SELECT d.{col}::DOUBLE AS v
            FROM matched m JOIN documents d USING (doc_id)
            WHERE d.{col} IS NOT NULL
        ),
        q AS (SELECT quantile_cont(v, [{lst}]) AS qa FROM vals),
        u AS (
            SELECT unnest([{lst}]) AS pct, unnest(qa) AS value FROM q
        )
        SELECT pct, ROUND(value, 4) AS value FROM u
    """


HIST_INTERVAL = 200  # histogram-agg bucket width over n_chars


def ft_extended_stats(sf_dir: str) -> pd.DataFrame:
    """ES extended_stats aggregation over `n_chars` of every matching
    doc — exact integer n/min/max/sum, pinned-formula variance/std."""
    eng = get_engine(sf_dir)
    out = eng.matched_extended_stats(
        BM25_QUERY, "n_chars", mode="and"
    ).to_pandas()
    for c in ("avg", "variance", "std"):
        out[c] = round_away(out[c], 4)
    return out


def _extended_stats_sql(query: str, col: str) -> str:
    terms = list(dict.fromkeys(ANALYZER.tokenize(query)))
    qvals = ", ".join(f"('{t}')" for t in terms)
    return f"""
        WITH {_tok_cte()},
        qterms(term) AS (VALUES {qvals}),
        matched AS (
            SELECT doc_id
            FROM (SELECT DISTINCT doc_id, term FROM tok) x
            JOIN qterms USING (term)
            GROUP BY doc_id
            HAVING count(*) = {len(terms)}
        ),
        vals AS (
            SELECT d.{col}::BIGINT AS v
            FROM matched m JOIN documents d USING (doc_id)
            WHERE d.{col} IS NOT NULL
        ),
        agg AS (
            SELECT count(*)::BIGINT AS n, min(v) AS mn, max(v) AS mx,
                   sum(v)::BIGINT AS s, sum(v * v)::BIGINT AS sq
            FROM vals
        )
        SELECT n, mn AS min, mx AS max, s AS sum,
               ROUND(s / n::DOUBLE, 4) AS avg,
               ROUND((sq - (s * s) / n::DOUBLE) / n::DOUBLE, 4)
                   AS variance,
               ROUND(sqrt((sq - (s * s) / n::DOUBLE) / n::DOUBLE), 4)
                   AS std
        FROM agg
    """


def ft_nchars_histogram(sf_dir: str) -> pd.DataFrame:
    """ES histogram aggregation: fixed-interval buckets over `n_chars`
    of every matching doc (min_doc_count=1)."""
    eng = get_engine(sf_dir)
    out = eng.matched_histogram(
        BM25_QUERY, "n_chars", HIST_INTERVAL, mode="and"
    ).to_pandas()
    return out


def _nchars_histogram_sql(query: str, col: str, interval: int) -> str:
    terms = list(dict.fromkeys(ANALYZER.tokenize(query)))
    qvals = ", ".join(f"('{t}')" for t in terms)
    return f"""
        WITH {_tok_cte()},
        qterms(term) AS (VALUES {qvals}),
        matched AS (
            SELECT doc_id
            FROM (SELECT DISTINCT doc_id, term FROM tok) x
            JOIN qterms USING (term)
            GROUP BY doc_id
            HAVING count(*) = {len(terms)}
        )
        SELECT (d.{col} // {interval}) * {interval} AS bucket,
               count(*)::BIGINT AS n
        FROM matched m JOIN documents d USING (doc_id)
        WHERE d.{col} IS NOT NULL
        GROUP BY bucket
        ORDER BY bucket
    """


def ft_top_hits_dist(sf_dir: str) -> pd.DataFrame:
    """Distributed top_hits through the scorer-actor pool (per-actor
    pre-truncated group heads, driver re-head) — same SQL twin as the
    in-process entry, so the driver gates actor-count invariance."""
    from datamart_ray.search.engine import DistributedSearchEngine

    eng = get_engine(sf_dir)
    index_dir = eng.readers[0].seg_dir.rsplit("/segments/", 1)[0]
    deng = DistributedSearchEngine(index_dir, max_actors=4)
    try:
        t = deng.grouped_top_hits(
            BM25_QUERY, "lang", per_group=TOPHITS_PER_GROUP, mode="and"
        )
    finally:
        deng.shutdown()
    out = t.to_pandas()
    out["score"] = round_away(out["score"], 4)
    return out


def ft_extended_stats_dist(sf_dir: str) -> pd.DataFrame:
    """Distributed extended_stats (integer partials merged exactly on
    the driver) — same SQL twin as ft_extended_stats."""
    from datamart_ray.search.engine import DistributedSearchEngine

    eng = get_engine(sf_dir)
    index_dir = eng.readers[0].seg_dir.rsplit("/segments/", 1)[0]
    deng = DistributedSearchEngine(
        index_dir, max_actors=4,
        filter_cols=("lang", "source", "n_chars"),
    )
    try:
        out = deng.matched_extended_stats(
            BM25_QUERY, "n_chars", mode="and"
        ).to_pandas()
    finally:
        deng.shutdown()
    for c in ("avg", "variance", "std"):
        out[c] = round_away(out[c], 4)
    return out


FILTER_BUCKETS = (
    # ES `filters` aggregation: named filter buckets, each counted over
    # the whole corpus independently (AND semantics per bucket)
    ("hash_join", "window hash join"),
    ("phrase_terms", "window join"),
    ("single", "json"),
)


def ft_filters_agg(sf_dir: str) -> pd.DataFrame:
    """ES ``filters`` aggregation analog: one named bucket per stored
    filter query, each bucket = its AND match count (the `_count` path
    per bucket — counting only, no scoring)."""
    eng = get_engine(sf_dir)
    return pd.DataFrame(
        {
            "bucket": [n for n, _ in FILTER_BUCKETS],
            "n": pd.array(
                [
                    eng.match_count(q, mode="and")
                    for _, q in FILTER_BUCKETS
                ],
                dtype="int64",
            ),
        }
    )


def _filters_agg_sql(buckets: tuple) -> str:
    parts = []
    for name, query in buckets:
        terms = list(dict.fromkeys(ANALYZER.tokenize(query)))
        qvals = ", ".join(f"('{t}')" for t in terms)
        parts.append(f"""
        SELECT '{name}' AS bucket, (
            SELECT count(*) FROM (
                SELECT doc_id
                FROM (SELECT DISTINCT doc_id, term FROM tok) x
                JOIN (VALUES {qvals}) q(term) USING (term)
                GROUP BY doc_id
                HAVING count(*) = {len(terms)}
            )
        )::BIGINT AS n""")
    body = "\n        UNION ALL\n".join(parts)
    return f"""
        WITH {_tok_cte()}
        {body}
    """


RANGE_EDGES = ((None, 150), (150, 300), (300, 450), (450, None))
COMPOSITE_COLS = ("lang", "source")
COMPOSITE_SIZE = 8  # composite-agg page size
SCROLL_PAGE_SIZE = 15
SCROLL_PAGE = 2  # 0-based: ranks 31-45


def _matched_cte(query: str) -> str:
    """tok + qterms + matched CTE body shared by the match-set
    aggregation twins (AND semantics, same shape as the histogram
    twin)."""
    terms = list(dict.fromkeys(ANALYZER.tokenize(query)))
    qvals = ", ".join(f"('{t}')" for t in terms)
    return f"""{_tok_cte()},
        qterms(term) AS (VALUES {qvals}),
        matched AS (
            SELECT doc_id
            FROM (SELECT DISTINCT doc_id, term FROM tok) x
            JOIN qterms USING (term)
            GROUP BY doc_id
            HAVING count(*) = {len(terms)}
        )"""


def ft_range_agg(sf_dir: str) -> pd.DataFrame:
    """ES ``range`` aggregation: named half-open n_chars buckets over
    every BM25 AND match, each with count + exact-integer-sum avg."""
    eng = get_engine(sf_dir)
    out = eng.matched_range_agg(
        BM25_QUERY, "n_chars", RANGE_EDGES, mode="and"
    ).to_pandas()
    out["avg"] = round_away(out["avg"], 4)
    return out.sort_values("bucket").reset_index(drop=True)


def ft_range_agg_dist(sf_dir: str) -> pd.DataFrame:
    """Distributed ``range`` aggregation through the scorer-actor pool
    (per-actor exact integer partials, driver merge) — same twin as
    the in-process entry, gating actor-count invariance."""
    from datamart_ray.search.engine import DistributedSearchEngine

    eng = get_engine(sf_dir)
    index_dir = eng.readers[0].seg_dir.rsplit("/segments/", 1)[0]
    deng = DistributedSearchEngine(
        index_dir, max_actors=4,
        filter_cols=("lang", "source", "n_chars"),
    )
    try:
        out = deng.matched_range_agg(
            BM25_QUERY, "n_chars", RANGE_EDGES, mode="and"
        ).to_pandas()
    finally:
        deng.shutdown()
    out["avg"] = round_away(out["avg"], 4)
    return out.sort_values("bucket").reset_index(drop=True)


def _range_agg_sql(query: str, col: str, edges: tuple) -> str:
    parts = []
    for lo, hi in edges:
        name = f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"
        conds = []
        if lo is not None:
            conds.append(f"v >= {lo}")
        if hi is not None:
            conds.append(f"v < {hi}")
        where = " AND ".join(conds) if conds else "TRUE"
        parts.append(f"""
        SELECT '{name}' AS bucket, count(v)::BIGINT AS n,
               CASE WHEN count(v) = 0 THEN NULL
                    ELSE ROUND(sum(v)::DOUBLE / count(v), 4)
               END AS avg
        FROM vals WHERE {where}""")
    body = "\n        UNION ALL\n".join(parts)
    return f"""
        WITH {_matched_cte(query)},
        vals AS (
            SELECT d.{col}::BIGINT AS v
            FROM matched m JOIN documents d USING (doc_id)
            WHERE d.{col} IS NOT NULL
        )
        SELECT * FROM ({body}) ORDER BY bucket
    """


def ft_composite_agg(sf_dir: str) -> pd.DataFrame:
    """ES ``composite`` aggregation with after-key pagination: page 2
    of the (lang, source) buckets of the BM25 AND match set, fetched
    with the cursor = last key of page 1 (the composite contract:
    key-ordered buckets walked in fixed-size pages)."""
    eng = get_engine(sf_dir)
    p1 = eng.matched_composite(
        BM25_QUERY, COMPOSITE_COLS, COMPOSITE_SIZE, mode="and"
    )
    assert p1.num_rows == COMPOSITE_SIZE, "page 1 underfull"
    after = (
        p1[COMPOSITE_COLS[0]][-1].as_py(),
        p1[COMPOSITE_COLS[1]][-1].as_py(),
    )
    t = eng.matched_composite(
        BM25_QUERY, COMPOSITE_COLS, COMPOSITE_SIZE, after=after,
        mode="and",
    )
    return t.to_pandas()


def _composite_sql(query: str, cols: tuple, size: int, page: int) -> str:
    c0, c1 = cols
    return f"""
        WITH {_matched_cte(query)}
        SELECT d.{c0}, d.{c1}, count(*)::BIGINT AS n
        FROM matched m JOIN documents d USING (doc_id)
        GROUP BY d.{c0}, d.{c1}
        ORDER BY d.{c0}, d.{c1}
        LIMIT {size} OFFSET {page * size}
    """


def ft_adjacency_matrix(sf_dir: str) -> pd.DataFrame:
    """ES ``adjacency_matrix`` aggregation over the stored FILTER
    BUCKETS: per-filter match counts plus every pairwise-intersection
    bucket ("A&B"), zero-count buckets omitted."""
    eng = get_engine(sf_dir)
    return eng.adjacency_matrix(FILTER_BUCKETS, mode="and").to_pandas()


def _adjacency_matrix_sql(buckets: tuple) -> str:
    ctes, singles, pairs = [], [], []
    for name, query in buckets:
        terms = list(dict.fromkeys(ANALYZER.tokenize(query)))
        qvals = ", ".join(f"('{t}')" for t in terms)
        ctes.append(f"""
        m_{name} AS (
            SELECT doc_id
            FROM (SELECT DISTINCT doc_id, term FROM tok) x
            JOIN (VALUES {qvals}) q(term) USING (term)
            GROUP BY doc_id
            HAVING count(*) = {len(terms)}
        )""")
        singles.append(
            f"SELECT '{name}' AS bucket,"
            f" (SELECT count(*) FROM m_{name})::BIGINT AS n"
        )
    names = [n for n, _ in buckets]
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            pairs.append(f"""
            SELECT '{names[i]}&{names[j]}' AS bucket, (
                SELECT count(*) FROM (
                    SELECT doc_id FROM m_{names[i]}
                    INTERSECT
                    SELECT doc_id FROM m_{names[j]}
                )
            )::BIGINT AS n""")
    body = "\n        UNION ALL\n".join(singles + pairs)
    return f"""
        WITH {_tok_cte()},
        {','.join(ctes)}
        SELECT * FROM ({body}) WHERE n > 0 ORDER BY bucket
    """


def ft_weighted_avg(sf_dir: str) -> pd.DataFrame:
    """ES ``weighted_avg`` aggregation: n_chars weighted by token
    length (the index doclen field) over every BM25 AND match — exact
    int64 sums, one final division."""
    eng = get_engine(sf_dir)
    out = eng.matched_weighted_avg(
        BM25_QUERY, "n_chars", mode="and"
    ).to_pandas()
    out["weighted_avg"] = round_away(out["weighted_avg"], 4)
    return out


def _weighted_avg_sql(query: str, col: str) -> str:
    return f"""
        WITH {_matched_cte(query)},
        dl AS (
            SELECT doc_id, count(*)::BIGINT AS w FROM tok GROUP BY doc_id
        ),
        j AS (
            SELECT d.{col}::BIGINT AS v, dl.w
            FROM matched m
            JOIN documents d USING (doc_id)
            JOIN dl USING (doc_id)
            WHERE d.{col} IS NOT NULL
        )
        SELECT (SELECT count(*) FROM matched)::BIGINT AS n,
               ROUND(sum(v * w)::DOUBLE / sum(w)::DOUBLE, 4)
                   AS weighted_avg
        FROM j
    """


def ft_weighted_avg_dist(sf_dir: str) -> pd.DataFrame:
    """Distributed weighted_avg through the scorer-actor pool (exact
    integer partials, one driver division) — same twin as the
    in-process entry, gating actor-count invariance."""
    from datamart_ray.search.engine import DistributedSearchEngine

    eng = get_engine(sf_dir)
    index_dir = eng.readers[0].seg_dir.rsplit("/segments/", 1)[0]
    deng = DistributedSearchEngine(
        index_dir, max_actors=4,
        filter_cols=("lang", "source", "n_chars"),
    )
    try:
        out = deng.matched_weighted_avg(
            BM25_QUERY, "n_chars", mode="and"
        ).to_pandas()
    finally:
        deng.shutdown()
    out["weighted_avg"] = round_away(out["weighted_avg"], 4)
    return out


def ft_script_fields(sf_dir: str) -> pd.DataFrame:
    """ES ``script_fields`` / runtime-field analog: every top-k hit
    carries a query-time computed column — here
    ``score_per_kchar = rounded_score / (n_chars / 1000)`` (a
    length-normalized relevance density). The computation happens at
    serving time from the hit's score and docmeta, no reindex; both
    sides derive it from the 4-digit rounded score so the division
    chain is pinned."""
    import numpy as np

    eng = get_engine(sf_dir)
    top = eng.search(BM25_QUERY, k=BM25_K, mode="and").to_pandas()
    nch = {}
    for r in eng.readers:
        ids = r._doc_ids
        c = r._meta["n_chars"].to_numpy(zero_copy_only=False)
        for d in top["doc_id"].to_numpy():
            pos = np.searchsorted(ids, d)
            if pos < ids.size and ids[pos] == d:
                nch[int(d)] = int(c[pos])
    top["score"] = round_away(top["score"], 4)
    top["n_chars"] = top["doc_id"].map(nch).astype("int64")
    top["score_per_kchar"] = round_away(
        top["score"] / (top["n_chars"] / 1000.0), 4
    )
    return top[["doc_id", "score", "n_chars", "score_per_kchar"]]


def _script_fields_sql(query: str, k: int) -> str:
    return f"""
        SELECT t.doc_id, t.score, d.n_chars,
               ROUND(t.score / (d.n_chars / 1000.0), 4)
                   AS score_per_kchar
        FROM ({_bm25_sql(query, k)}) t
        JOIN documents d USING (doc_id)
        ORDER BY t.score DESC, t.doc_id
    """


def ft_scroll_page3(sf_dir: str) -> pd.DataFrame:
    """ES scroll-API analog: the third fixed-size page (ranks 31-45)
    of the full (score desc, docID asc) BM25 ranking — deep pagination
    past the search_after entry's depth."""
    eng = get_engine(sf_dir)
    t = eng.scroll_page(
        BM25_QUERY, SCROLL_PAGE_SIZE, SCROLL_PAGE, mode="and"
    )
    out = t.to_pandas()
    out["score"] = round_away(out["score"], 4)
    return out


def ft_matrix_stats(sf_dir: str) -> pd.DataFrame:
    """ES ``matrix_stats`` aggregation over the (n_chars, doclen)
    field pair across all live docs: count, mean, population variance,
    covariance, Pearson correlation — exact int64 partial sums per
    segment, float moments derived once with the twin's formula."""
    eng = get_engine(sf_dir)
    out = eng.matrix_stats("n_chars").to_pandas()
    for c in ("mean", "variance", "covariance", "correlation"):
        out[c] = round_away(out[c], 4)
    return out


def _matrix_stats_sql(col: str) -> str:
    return f"""
        WITH {_tok_cte()},
        dl AS (
            SELECT doc_id, count(*)::BIGINT AS y FROM tok GROUP BY doc_id
        ),
        j AS (
            SELECT d.{col}::BIGINT AS x, coalesce(dl.y, 0)::BIGINT AS y
            FROM documents d LEFT JOIN dl USING (doc_id)
        ),
        s AS (
            SELECT count(*)::BIGINT AS n,
                   sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
                   sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy,
                   sum(x * y)::BIGINT AS sxy
            FROM j
        ),
        m AS (
            SELECT n,
                   sx::DOUBLE / n AS mean_x, sy::DOUBLE / n AS mean_y,
                   (sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n) / n
                       AS var_x,
                   (syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n) / n
                       AS var_y,
                   (sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE / n) / n
                       AS cov
            FROM s
        )
        SELECT '{col}' AS field, n, ROUND(mean_x, 4) AS mean,
               ROUND(var_x, 4) AS variance, ROUND(cov, 4) AS covariance,
               ROUND(cov / sqrt(var_x * var_y), 4) AS correlation
        FROM m
        UNION ALL
        SELECT 'doclen', n, ROUND(mean_y, 4), ROUND(var_y, 4),
               ROUND(cov, 4), ROUND(cov / sqrt(var_x * var_y), 4)
        FROM m
    """


def ft_bucket_stats(sf_dir: str) -> pd.DataFrame:
    """ES ``stats_bucket`` pipeline aggregation: min/max/sum/avg of
    the per-lang bucket counts of the terms aggregation over the BM25
    AND match set."""
    eng = get_engine(sf_dir)
    out = eng.bucket_stats(BM25_QUERY, "lang", mode="and").to_pandas()
    out["avg"] = round_away(out["avg"], 4)
    return out


def _bucket_stats_sql(query: str, col: str) -> str:
    return f"""
        WITH {_matched_cte(query)},
        f AS (
            SELECT d.{col}, count(*)::BIGINT AS n
            FROM matched m JOIN documents d USING (doc_id)
            GROUP BY d.{col}
        )
        SELECT count(*)::BIGINT AS n_buckets,
               min(n)::BIGINT AS min, max(n)::BIGINT AS max,
               sum(n)::BIGINT AS sum,
               ROUND(sum(n)::DOUBLE / count(*), 4) AS avg
        FROM f
    """


PCTRANK_VALUES = (100, 250, 400, 550)  # percentile_ranks probe values
MSEARCH_PLAN = (  # (query, mode, k) per msearch slot
    (BM25_QUERY, "and", 10),
    ("merge sort stream", "and", 10),
    (BM25_QUERY, "or", 10),
)


def ft_percentile_ranks(sf_dir: str) -> pd.DataFrame:
    """ES ``percentile_ranks`` aggregation: % of BM25 AND matches with
    n_chars ≤ each probe value (exact counts, no t-digest)."""
    eng = get_engine(sf_dir)
    out = eng.matched_percentile_ranks(
        BM25_QUERY, "n_chars", PCTRANK_VALUES, mode="and"
    ).to_pandas()
    out["rank_pct"] = round_away(out["rank_pct"], 4)
    return out


def _percentile_ranks_sql(query: str, col: str, values: tuple) -> str:
    vvals = ", ".join(f"({v})" for v in values)
    return f"""
        WITH {_matched_cte(query)},
        vals AS (
            SELECT d.{col}::BIGINT AS v
            FROM matched m JOIN documents d USING (doc_id)
            WHERE d.{col} IS NOT NULL
        ),
        probes(value) AS (VALUES {vvals})
        SELECT p.value::BIGINT AS value,
               ROUND(
                   100.0 * (SELECT count(*) FROM vals WHERE v <= p.value)
                   / (SELECT count(*) FROM vals), 4
               ) AS rank_pct
        FROM probes p
        ORDER BY value
    """


def ft_percentile_ranks_dist(sf_dir: str) -> pd.DataFrame:
    """Distributed percentile_ranks through the scorer-actor pool
    (exact integer partials, per-probe division on the driver) — same
    twin as the in-process entry."""
    from datamart_ray.search.engine import DistributedSearchEngine

    eng = get_engine(sf_dir)
    index_dir = eng.readers[0].seg_dir.rsplit("/segments/", 1)[0]
    deng = DistributedSearchEngine(
        index_dir, max_actors=4,
        filter_cols=("lang", "source", "n_chars"),
    )
    try:
        out = deng.matched_percentile_ranks(
            BM25_QUERY, "n_chars", PCTRANK_VALUES, mode="and"
        ).to_pandas()
    finally:
        deng.shutdown()
    out["rank_pct"] = round_away(out["rank_pct"], 4)
    return out


def ft_msearch(sf_dir: str) -> pd.DataFrame:
    """ES ``_msearch`` analog: one pipelined batch of queries through
    the scorer-actor pool (one df round for the union of terms, all
    scoring calls in flight) — output (qid, doc_id, score) rows,
    identical to running each query alone."""
    from datamart_ray.search.engine import DistributedSearchEngine

    eng = get_engine(sf_dir)
    index_dir = eng.readers[0].seg_dir.rsplit("/segments/", 1)[0]
    deng = DistributedSearchEngine(index_dir, max_actors=4)
    try:
        results = deng.search_many(
            [
                {"query": q, "mode": m, "k": k}
                for q, m, k in MSEARCH_PLAN
            ]
        )
    finally:
        deng.shutdown()
    frames = []
    for qid, t in enumerate(results):
        f = t.to_pandas()
        f.insert(0, "qid", qid)
        frames.append(f)
    out = pd.concat(frames, ignore_index=True)
    out["qid"] = out["qid"].astype("int64")
    out["score"] = round_away(out["score"], 4)
    return out


def _msearch_sql(plan: tuple) -> str:
    parts = [
        f"SELECT {qid}::BIGINT AS qid, * FROM ("
        + _bm25_sql(q, k, mode_or=(m == "or"))
        + ")"
        for qid, (q, m, k) in enumerate(plan)
    ]
    return (
        "SELECT * FROM (\n"
        + "\nUNION ALL\n".join(parts)
        + "\n) ORDER BY qid, score DESC, doc_id"
    )


FACET_APPROX_SIZE = 5
FACET_APPROX_SHARD = 100  # >= per-actor distinct langs => exact, bounds 0


def ft_facet_approx_lang(sf_dir: str) -> pd.DataFrame:
    """ES terms aggregation in its real bounded-traffic mode: each
    scorer actor ships only its top shard_size buckets and the result
    carries per-bucket doc_count_error_upper_bound. At this fixture's
    cardinality shard_size covers every bucket, so the entry gates the
    wiring against the EXACT facet twin (all bounds must be 0)."""
    from datamart_ray.search.engine import DistributedSearchEngine

    eng = get_engine(sf_dir)
    index_dir = eng.readers[0].seg_dir.rsplit("/segments/", 1)[0]
    deng = DistributedSearchEngine(index_dir, max_actors=4)
    try:
        out = deng.facet_counts_approx(
            BM25_QUERY,
            "lang",
            size=FACET_APPROX_SIZE,
            shard_size=FACET_APPROX_SHARD,
            mode="and",
        ).to_pandas()
    finally:
        deng.shutdown()
    return out


def _facet_approx_sql(query: str, col: str, size: int) -> str:
    return f"""
        SELECT *, 0::BIGINT AS doc_count_error_upper_bound
        FROM ({_facet_sql(query, col)})
        LIMIT {size}
    """


SAMPLER_SHARD = 50  # diversified_sampler shard_size (candidate window)
SAMPLER_MAX_PER = 2  # max_docs_per_value


def ft_diversified_sampler(sf_dir: str) -> pd.DataFrame:
    """ES ``diversified_sampler`` aggregation with an ``avg``
    sub-aggregation: take the top SAMPLER_SHARD BM25 matches, keep at
    most SAMPLER_MAX_PER docs per `source` walking in rank order
    (rank = rounded score desc, docID asc — pinned so the twin's
    window functions reproduce it bit-for-bit), then aggregate mean
    n_chars over the de-biased sample. Integer sum, one division."""
    eng = get_engine(sf_dir)
    top = eng.search(BM25_QUERY, k=SAMPLER_SHARD, mode="and").to_pandas()
    meta = eng.readers
    # attach source + n_chars via the docmeta already in memory
    import numpy as np

    src = {}
    nch = {}
    for r in meta:
        ids = r._doc_ids
        s = r._meta["source"].to_numpy(zero_copy_only=False)
        c = r._meta["n_chars"].to_numpy(zero_copy_only=False)
        for d in top["doc_id"].to_numpy():
            pos = np.searchsorted(ids, d)
            if pos < ids.size and ids[pos] == d:
                src[int(d)] = s[pos]
                nch[int(d)] = int(c[pos])
    top["source"] = top["doc_id"].map(src)
    top["n_chars"] = top["doc_id"].map(nch)
    top["r"] = round_away(top["score"], 4)
    top = top.sort_values(["r", "doc_id"], ascending=[False, True])
    keep = top.groupby("source").cumcount() < SAMPLER_MAX_PER
    sample = top[keep]
    n = len(sample)
    s = int(sample["n_chars"].sum())
    return pd.DataFrame(
        {
            "n_sample": pd.array([n], dtype="int64"),
            "avg_nchars": [round_away(pd.Series([s / n]), 4)[0]],
        }
    )


def _diversified_sampler_sql(
    query: str, shard: int, max_per: int
) -> str:
    inner = _bm25_sql(query, shard)
    return f"""
        WITH top_hits AS ({inner}),
        ranked AS (
            SELECT t.doc_id, t.score, d.source, d.n_chars,
                   row_number() OVER (
                       PARTITION BY d.source
                       ORDER BY t.score DESC, t.doc_id
                   ) AS rn
            FROM top_hits t JOIN documents d USING (doc_id)
        )
        SELECT count(*)::BIGINT AS n_sample,
               ROUND(sum(n_chars)::DOUBLE / count(*), 4) AS avg_nchars
        FROM ranked WHERE rn <= {max_per}
    """


RRF_WINDOW = 50  # per-leg candidate window (ES rank_window_size)
RRF_K = 60  # ES rrf rank_constant default
RRF_TOPK = 10
RRF_QVEC = 7  # query = this row's embedding (vec_id aligns with doc_id)


def hy_rrf_hybrid(sf_dir: str) -> pd.DataFrame:
    """ES 8 hybrid retrieval with reciprocal-rank fusion: a BM25 leg
    (OR-mode top-window over `documents`) and a vector leg (distributed
    brute cosine top-window over `embeddings`, query = RRF_QVEC's
    embedding) fused as Σ 1/(RRF_K + rank). Window membership is
    decided on raw scores (each leg's gated top-k semantics); ranks
    within a window are assigned on the ROUNDED leg score with docID
    tie-break, so both legs' rank orders are reproducible by the SQL
    twin bit-for-bit. Docs absent from a leg contribute 0 from it, as
    in ES."""
    from datamart_ray.stages.similarity import _brute_topk

    eng = get_engine(sf_dir)
    bm = eng.search(BM25_QUERY, k=RRF_WINDOW, mode="or").to_pandas()
    bm["s"] = round_away(bm["score"], 4)
    bm = bm.sort_values(["s", "doc_id"], ascending=[False, True])
    bm_rank = {
        int(d): i + 1 for i, d in enumerate(bm["doc_id"].tolist())
    }
    vec = _brute_topk(
        os.path.join(sf_dir, "embeddings.parquet"),
        (RRF_QVEC,),
        RRF_WINDOW,
        "vec_id",
        "embedding",
    )
    vec = vec.sort_values(["sim", "neighbor_id"], ascending=[False, True])
    v_rank = {
        int(d): i + 1 for i, d in enumerate(vec["neighbor_id"].tolist())
    }
    rows = []
    for d in sorted(set(bm_rank) | set(v_rank)):
        r = 0.0
        if d in bm_rank:
            r += 1.0 / (RRF_K + bm_rank[d])
        if d in v_rank:  # leg order pinned: bm25 first, then vector
            r += 1.0 / (RRF_K + v_rank[d])
        rows.append((d, r))
    rows.sort(key=lambda x: (-x[1], x[0]))
    rows = rows[:RRF_TOPK]
    out = pd.DataFrame(rows, columns=["doc_id", "rrf"])
    out["rrf"] = round_away(out["rrf"], 6)
    return out


def _rrf_sql(
    query: str, qvec: int, window: int, rk: int, k: int
) -> str:
    terms = list(dict.fromkeys(ANALYZER.tokenize(query)))
    qvals = ", ".join(f"('{t}', {i})" for i, t in enumerate(terms))
    return f"""
        WITH {_tok_cte()},
        tf AS (
            SELECT doc_id, term, count(*)::DOUBLE AS tf
            FROM tok GROUP BY doc_id, term
        ),
        dl AS (
            SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY doc_id
        ),
        stats AS (
            SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                   (SELECT sum(dl) FROM dl)
                   / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        qterms(term, qord) AS (VALUES {qvals}),
        contrib AS (
            SELECT tf.doc_id, q.qord,
                   ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                   * tf.tf * (1.2 + 1)
                   / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS c
            FROM tf
            JOIN qterms q USING (term)
            JOIN df USING (term)
            JOIN dl USING (doc_id)
            CROSS JOIN stats s
        ),
        scored AS (
            SELECT doc_id, sum(c ORDER BY qord) AS score
            FROM contrib GROUP BY doc_id
        ),
        bmtop AS (
            SELECT doc_id, ROUND(score, 4) AS s
            FROM scored ORDER BY scored.score DESC, doc_id LIMIT {window}
        ),
        bmr AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY s DESC, doc_id) AS br
            FROM bmtop
        ),
        emb AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings
        ),
        qv AS (SELECT e FROM emb WHERE vec_id = {qvec}),
        sims AS (
            SELECT emb.vec_id AS doc_id,
                   list_cosine_similarity(qv.e, emb.e) AS raw
            FROM emb, qv WHERE emb.vec_id != {qvec}
        ),
        vtop AS (
            SELECT doc_id, ROUND(raw, 4) AS sim
            FROM sims ORDER BY raw DESC, doc_id LIMIT {window}
        ),
        vr AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY sim DESC, doc_id) AS vrk
            FROM vtop
        ),
        fused AS (
            SELECT COALESCE(b.doc_id, v.doc_id) AS doc_id,
                   COALESCE(1.0 / ({rk} + b.br), 0)
                   + COALESCE(1.0 / ({rk} + v.vrk), 0) AS rrf_raw
            FROM bmr b FULL OUTER JOIN vr v USING (doc_id)
        )
        SELECT doc_id, ROUND(rrf_raw, 6) AS rrf
        FROM fused ORDER BY rrf_raw DESC, doc_id LIMIT {k}
    """


def ft_grouped_percentiles(sf_dir: str) -> pd.DataFrame:
    """ES nested terms→percentiles aggregation: per-`lang` n_chars
    quantiles over every matching doc (exact quantile_cont parity)."""
    eng = get_engine(sf_dir)
    out = eng.matched_grouped_percentiles(
        BM25_QUERY, "lang", "n_chars", PCT_QS, mode="and"
    ).to_pandas()
    out["value"] = round_away(out["value"], 4)
    return out


def _grouped_percentiles_sql(
    query: str, group_col: str, val_col: str, pcts: tuple
) -> str:
    terms = list(dict.fromkeys(ANALYZER.tokenize(query)))
    qvals = ", ".join(f"('{t}')" for t in terms)
    lst = ", ".join(str(p) for p in pcts)
    return f"""
        WITH {_tok_cte()},
        qterms(term) AS (VALUES {qvals}),
        matched AS (
            SELECT doc_id
            FROM (SELECT DISTINCT doc_id, term FROM tok) x
            JOIN qterms USING (term)
            GROUP BY doc_id
            HAVING count(*) = {len(terms)}
        ),
        vals AS (
            SELECT d.{group_col} AS {group_col}, d.{val_col}::DOUBLE AS v
            FROM matched m JOIN documents d USING (doc_id)
            WHERE d.{val_col} IS NOT NULL
        ),
        g AS (
            SELECT {group_col}, quantile_cont(v, [{lst}]) AS qa
            FROM vals GROUP BY {group_col}
        ),
        u AS (
            SELECT {group_col}, unnest([{lst}]) AS pct,
                   unnest(qa) AS value
            FROM g
        )
        SELECT {group_col}, pct, ROUND(value, 4) AS value FROM u
        ORDER BY {group_col}, pct
    """


def ft_span_near_topk(sf_dir: str) -> pd.DataFrame:
    """ES span_near (in_order=false, slop=3) over the two PHRASE_QUERY
    terms: BM25 top-k where tf counts unordered position pairs within
    the slop window — the proximity-query family the positional index
    exists for."""
    eng = get_pos_engine(sf_dir)
    t = eng.span_near_search(PHRASE_QUERY, slop=SPAN_SLOP, k=BM25_K)
    out = t.to_pandas()
    out["score"] = round_away(out["score"], 4)
    return out


def _span_near_sql(query: str, slop: int, k: int) -> str:
    a, b = list(dict.fromkeys(ANALYZER.tokenize(query)))
    w = slop + 1
    return f"""
        WITH toks AS (
            SELECT doc_id, {ANALYZER.sql_tokens_expr('text')} AS ts
            FROM documents
        ),
        posa AS (
            SELECT doc_id, i FROM toks,
                 UNNEST(range(0, len(ts))) AS r(i)
            WHERE ts[i + 1] = '{a}'
        ),
        posb AS (
            SELECT doc_id, i FROM toks,
                 UNNEST(range(0, len(ts))) AS r(i)
            WHERE ts[i + 1] = '{b}'
        ),
        m AS (
            SELECT posa.doc_id, count(*)::DOUBLE AS ptf
            FROM posa JOIN posb
              ON posa.doc_id = posb.doc_id
             AND abs(posa.i - posb.i) <= {w}
            GROUP BY posa.doc_id
        ),
        dl AS (SELECT doc_id, len(ts)::DOUBLE AS dl FROM toks),
        stats AS (
            SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                   (SELECT sum(dl) FROM dl)
                   / (SELECT count(*) FROM documents)::DOUBLE AS avgdl,
                   (SELECT count(*) FROM m)::DOUBLE AS df
        )
        SELECT m.doc_id,
               ROUND(ln(1 + (s.n - s.df + 0.5) / (s.df + 0.5))
                     * m.ptf * (1.2 + 1)
                     / (m.ptf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)),
                     4) AS score
        FROM m JOIN dl USING (doc_id) CROSS JOIN stats s
        ORDER BY score DESC, doc_id
        LIMIT {k}
    """


def ft_term_vectors(sf_dir: str) -> pd.DataFrame:
    """ES term_vectors API (term_statistics=true) for one document:
    per-term in-doc tf, corpus df and idf. tf comes from re-analyzing
    the stored text (the ES path when term vectors aren't stored); df
    from the index's term dictionary (summed over segments)."""
    from collections import Counter

    from datamart_ray.util import fetch_rows_by_ids

    eng = get_engine(sf_dir)
    rows = fetch_rows_by_ids(
        os.path.join(sf_dir, "documents.parquet"),
        "doc_id",
        (TV_DOC_ID,),
        columns=["doc_id", "text"],
    )
    text = rows.column("text")[0].as_py() or ""
    tf = Counter(ANALYZER.tokenize(text))
    terms = sorted(tf)
    n = float(eng.n_docs)
    recs = []
    for t in terms:
        df = eng.df(t)
        idf = float(np.log1p((n - df + 0.5) / (df + 0.5)))
        recs.append((t, tf[t], df, idf))
    out = pd.DataFrame(
        recs, columns=["term", "tf", "df", "idf"]
    ).astype({"tf": "int64", "df": "int64"})
    out["idf"] = round_away(out["idf"], 4)
    return out


def _term_vectors_sql(doc_id: int) -> str:
    return f"""
        WITH {_tok_cte()},
        tf AS (
            SELECT term, count(*)::BIGINT AS tf
            FROM tok WHERE doc_id = {doc_id} GROUP BY term
        ),
        df AS (
            SELECT term, count(DISTINCT doc_id)::BIGINT AS df
            FROM tok GROUP BY term
        ),
        n AS (SELECT count(*)::DOUBLE AS n FROM documents)
        SELECT tf.term, tf.tf, df.df,
               ROUND(ln(1 + (n.n - df.df + 0.5) / (df.df + 0.5)), 4) AS idf
        FROM tf JOIN df USING (term) CROSS JOIN n
        ORDER BY tf.term
    """


def ft_bm25_lazy_topk(sf_dir: str) -> pd.DataFrame:
    """BM25 top-k through the giant-segment serving path: a fresh
    SearchEngine with lazy=True reads every term from the mmap
    posting-heap sidecar (index/heap.py) — same SQL twin as
    ft_bm25_topk, so the driver gates heap-served == eager-served."""
    from datamart_ray.search.engine import SearchEngine

    eng = get_engine(sf_dir)  # ensures the on-disk index exists
    index_dir = eng.readers[0].seg_dir.rsplit("/segments/", 1)[0]
    leng = SearchEngine(index_dir, lazy=True)
    out = leng.search(BM25_QUERY, k=BM25_K, mode="and").to_pandas()
    out["score"] = round_away(out["score"], 4)
    return out


def ft_bm25_or_topk(sf_dir: str) -> pd.DataFrame:
    """BM25 top-k in OR mode — gates the block-max pruned (WAND-family)
    scoring path against the exhaustive SQL union twin in the driver."""
    eng = get_engine(sf_dir)
    t = eng.search(BM25_QUERY, k=BM25_K, mode="or")
    out = t.to_pandas()
    out["score"] = round_away(out["score"], 4)
    return out


def ft_bm25_dist_topk(sf_dir: str) -> pd.DataFrame:
    """BM25 top-k through the DISTRIBUTED engine (per-segment scorer
    actors, global-stats exchange, driver heap merge) — the actor path
    gets its own oracle row; same SQL twin as the in-process entry."""
    from datamart_ray.search.engine import DistributedSearchEngine

    eng = get_engine(sf_dir)  # ensures the on-disk index exists
    index_dir = eng.readers[0].seg_dir.rsplit("/segments/", 1)[0]
    deng = DistributedSearchEngine(index_dir)
    try:
        t = deng.search(BM25_QUERY, k=BM25_K, mode="and")
    finally:
        deng.shutdown()
    out = t.to_pandas()
    out["score"] = round_away(out["score"], 4)
    return out


def ft_bm25_lang_filter(sf_dir: str) -> pd.DataFrame:
    """BM25 + keyword filter (reference: source/type terms filters,
    apiserver/apiserver/search/__init__.py:79-105). Stats stay global —
    filters restrict candidates, not df/N (ES filter-context semantics)."""
    eng = get_engine(sf_dir)
    t = eng.search(BM25_FILTER_QUERY, k=BM25_K, mode="and", filters={"lang": "en"})
    out = t.to_pandas()
    out["score"] = round_away(out["score"], 4)
    return out


def ft_exact_dedup(sf_dir: str) -> pd.DataFrame:
    """Exact dedup groups (U2: hash-partition + per-group first). The
    shuffle key is sha256(text) so long texts never ride the exchange."""
    ensure_fast_shuffle()
    ds = rd.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])

    def hash_text(t: pa.Table) -> pa.Table:
        shas = [
            hashlib.sha256((s or "").encode()).hexdigest()
            for s in t["text"].to_pylist()
        ]
        return pa.table({"doc_id": t["doc_id"], "h": pa.array(shas)})

    grouped = (
        ds.map_batches(hash_text, batch_format="pyarrow")
        .groupby("h")
        .aggregate(
            Min("doc_id", alias_name="keep_id"),
            Count(alias_name="n"),
        )
    )
    out = grouped.to_pandas()
    out = out[out["n"] > 1][["keep_id", "n"]].reset_index(drop=True)
    out["keep_id"] = out["keep_id"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out


_STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "for", "on", "with")


def ft_quality_scores(sf_dir: str) -> pd.DataFrame:
    """Per-document quality stats (text-analysis op: length, distinct
    ratio, stopword ratio — the profiling-stats analog, A2/A11)."""
    ds = rd.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    stop = set(_STOPWORDS)

    def quality(t: pa.Table) -> pa.Table:
        lists = ANALYZER.token_lists(t["text"])
        n_tok = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(lists)
        parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        is_stop = pc.is_in(
            flat, value_set=pa.array(sorted(stop))
        ).to_numpy(zero_copy_only=False)
        n_stop = np.bincount(
            parents, weights=is_stop.astype(np.float64), minlength=t.num_rows
        )
        # distinct tokens per doc
        pairs = pa.table({"p": pa.array(parents), "t": flat})
        uq = pairs.group_by(["p", "t"]).aggregate([])
        n_uniq = np.bincount(
            uq["p"].to_numpy(zero_copy_only=False), minlength=t.num_rows
        )
        n_tok_f = n_tok.astype(np.float64)
        safe = np.maximum(n_tok_f, 1.0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n_tok.astype(np.int64)),
                "n_uniq": pa.array(n_uniq.astype(np.int64)),
                "stop_ratio": pa.array(round_away(n_stop / safe, 4)),
                "uniq_ratio": pa.array(round_away(n_uniq / safe, 4)),
            }
        )

    return ds.map_batches(quality, batch_format="pyarrow").to_pandas()


# ----------------------------------------------------------------------
# DuckDB SQL twins
# ----------------------------------------------------------------------

def _tok_cte() -> str:
    return f"""
        tok AS (
            SELECT doc_id, unnest({ANALYZER.sql_tokens_expr('text')}) AS term
            FROM documents
        )
    """


def _bm25_sql(
    query: str,
    k: int,
    lang: str | None = None,
    mode_or: bool = False,
    nrange: tuple | None = None,
    offset: int = 0,
) -> str:
    terms = list(dict.fromkeys(ANALYZER.tokenize(query)))
    qvals = ", ".join(f"('{t}', {i})" for i, t in enumerate(terms))
    lang_join = (
        f"JOIN documents d ON tf.doc_id = d.doc_id AND d.lang = '{lang}'"
        if lang
        else ""
    )
    if nrange:
        lang_join += (
            f" JOIN documents d2 ON tf.doc_id = d2.doc_id"
            f" AND d2.n_chars BETWEEN {nrange[0]} AND {nrange[1]}"
        )
    return f"""
        WITH {_tok_cte()},
        tf AS (
            SELECT doc_id, term, count(*)::DOUBLE AS tf
            FROM tok GROUP BY doc_id, term
        ),
        dl AS (
            SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY doc_id
        ),
        stats AS (
            SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                   (SELECT sum(dl) FROM dl)
                   / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        qterms(term, qord) AS (VALUES {qvals}),
        contrib AS (
            SELECT tf.doc_id, q.qord,
                   ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                   * tf.tf * (1.2 + 1)
                   / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS c
            FROM tf
            JOIN qterms q USING (term)
            JOIN df USING (term)
            JOIN dl USING (doc_id)
            CROSS JOIN stats s
            {lang_join}
        ),
        scored AS (
            SELECT doc_id, sum(c ORDER BY qord) AS score, count(*) AS nt
            FROM contrib GROUP BY doc_id
        )
        SELECT doc_id, ROUND(score, 4) AS score
        FROM scored WHERE {'TRUE' if mode_or else f'nt = {len(terms)}'}
        ORDER BY scored.score DESC, doc_id
        LIMIT {k}{f' OFFSET {offset}' if offset else ''}
    """


def _bool_sql(
    must: str, should: str, must_not: str, k: int, min_should: int = 0
) -> str:
    """DuckDB twin of SearchEngine.bool_search: must-AND candidates,
    must_not exclusion, score summed over must ∪ should contributions
    ORDER BY term (the engine's pinned lexicographic accumulation).
    `min_should` > 0 adds the minimum_should_match candidate gate
    (≥ n distinct should terms per doc)."""
    must_t = list(dict.fromkeys(ANALYZER.tokenize(must)))
    should_t = [
        t
        for t in dict.fromkeys(ANALYZER.tokenize(should))
        if t not in must_t
    ]
    not_t = list(dict.fromkeys(ANALYZER.tokenize(must_not)))
    score_terms = sorted(set(must_t) | set(should_t))
    svals = ", ".join(f"('{t}')" for t in score_terms)
    if must_t:
        mvals = ", ".join(f"('{t}')" for t in must_t)
        cand_ctes = f"""
        mterms(term) AS (VALUES {mvals}),
        cand0 AS (
            SELECT doc_id FROM tf JOIN mterms USING (term)
            GROUP BY doc_id HAVING count(DISTINCT term) = {len(must_t)}
        )"""
    else:
        cand_ctes = """
        cand0 AS (
            SELECT DISTINCT doc_id FROM tf JOIN sterms USING (term)
        )"""
    if not_t:
        nvals = ", ".join(f"('{t}')" for t in not_t)
        cand_ctes += f""",
        nterms(term) AS (VALUES {nvals}),
        cand1 AS (
            SELECT doc_id FROM cand0
            WHERE doc_id NOT IN (
                SELECT tf.doc_id FROM tf JOIN nterms USING (term)
            )
        )"""
    else:
        cand_ctes += ",\n        cand1 AS (SELECT doc_id FROM cand0)"
    if min_should > 0 and should_t:
        shvals = ", ".join(f"('{t}')" for t in should_t)
        cand_ctes += f""",
        shterms(term) AS (VALUES {shvals}),
        cand AS (
            SELECT c.doc_id FROM cand1 c
            JOIN tf USING (doc_id)
            JOIN shterms USING (term)
            GROUP BY c.doc_id
            HAVING count(DISTINCT term) >= {min_should}
        )"""
    else:
        cand_ctes += ",\n        cand AS (SELECT doc_id FROM cand1)"
    return f"""
        WITH {_tok_cte()},
        tf AS (
            SELECT doc_id, term, count(*)::DOUBLE AS tf
            FROM tok GROUP BY doc_id, term
        ),
        dl AS (
            SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY doc_id
        ),
        stats AS (
            SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                   (SELECT sum(dl) FROM dl)
                   / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        sterms(term) AS (VALUES {svals}),
        {cand_ctes},
        contrib AS (
            SELECT tf.doc_id, tf.term,
                   ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                   * tf.tf * (1.2 + 1)
                   / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS c
            FROM tf
            JOIN sterms q USING (term)
            JOIN cand USING (doc_id)
            JOIN df USING (term)
            JOIN dl USING (doc_id)
            CROSS JOIN stats s
        ),
        scored AS (
            SELECT doc_id, sum(c ORDER BY term) AS score
            FROM contrib GROUP BY doc_id
        )
        SELECT doc_id, ROUND(score, 4) AS score
        FROM scored
        ORDER BY scored.score DESC, doc_id
        LIMIT {k}
    """


def _phrase_prefix_sql(phrase: str, k: int) -> str:
    """DuckDB twin of phrase_prefix_search: same positional UNNEST as
    _phrase_sql, with the last slot a LIKE-prefix condition."""
    terms = ANALYZER.tokenize(phrase)
    m = len(terms)
    conds = " AND ".join(
        f"ts[i+{j + 1}] = '{t}'" for j, t in enumerate(terms[:-1])
    )
    last = f"ts[i+{m}] LIKE '{terms[-1]}%'"
    conds = f"{conds} AND {last}" if conds else last
    return f"""
        WITH toks AS (
            SELECT doc_id, {ANALYZER.sql_tokens_expr('text')} AS ts
            FROM documents
        ),
        m AS (
            SELECT doc_id, count(*)::DOUBLE AS ptf
            FROM toks,
                 UNNEST(range(0, greatest(len(ts) - {m - 1}, 0))) AS r(i)
            WHERE {conds}
            GROUP BY doc_id
        ),
        dl AS (SELECT doc_id, len(ts)::DOUBLE AS dl FROM toks),
        stats AS (
            SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                   (SELECT sum(dl) FROM dl)
                   / (SELECT count(*) FROM documents)::DOUBLE AS avgdl,
                   (SELECT count(*) FROM m)::DOUBLE AS df
        )
        SELECT m.doc_id,
               ROUND(ln(1 + (s.n - s.df + 0.5) / (s.df + 0.5))
                     * m.ptf * (1.2 + 1)
                     / (m.ptf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)),
                     4) AS score
        FROM m JOIN dl USING (doc_id) CROSS JOIN stats s
        ORDER BY score DESC, doc_id
        LIMIT {k}
    """


def _mlt_sql(seed: int, k: int, max_terms: int) -> str:
    """DuckDB twin of more_like_this: seed term selection by
    (tf×idf desc, term) over the corpus df, OR-scored union with the
    engine's pinned lexicographic accumulation, seed excluded."""
    return f"""
        WITH {_tok_cte()},
        tf AS (
            SELECT doc_id, term, count(*)::DOUBLE AS tf
            FROM tok GROUP BY doc_id, term
        ),
        dl AS (
            SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY doc_id
        ),
        stats AS (
            SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                   (SELECT sum(dl) FROM dl)
                   / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
        ),
        df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        seed_w AS (
            SELECT tf.term,
                   tf.tf * ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) AS w
            FROM tf JOIN df USING (term) CROSS JOIN stats s
            WHERE tf.doc_id = {seed}
        ),
        qterms AS (
            SELECT term FROM seed_w ORDER BY w DESC, term LIMIT {max_terms}
        ),
        contrib AS (
            SELECT tf.doc_id, tf.term,
                   ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                   * tf.tf * (1.2 + 1)
                   / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS c
            FROM tf
            JOIN qterms q USING (term)
            JOIN df USING (term)
            JOIN dl USING (doc_id)
            CROSS JOIN stats s
            WHERE tf.doc_id != {seed}
        ),
        scored AS (
            SELECT doc_id, sum(c ORDER BY term) AS score
            FROM contrib GROUP BY doc_id
        )
        SELECT doc_id, ROUND(score, 4) AS score
        FROM scored
        ORDER BY scored.score DESC, doc_id
        LIMIT {k}
    """


def _match_positions_sql(query: str, k: int) -> str:
    """DuckDB twin of match_positions over the BM25 AND top-k: 0-based
    token positions of each query term inside those docs."""
    terms = sorted(set(ANALYZER.tokenize(query)))
    tlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
        WITH topk AS ({_bm25_sql(query, k)}),
        toks AS (
            SELECT doc_id, {ANALYZER.sql_tokens_expr('text')} AS ts
            FROM documents
            WHERE doc_id IN (SELECT doc_id FROM topk)
        )
        SELECT doc_id, ts[i + 1] AS term, i::BIGINT AS pos
        FROM toks, UNNEST(range(0, len(ts))) AS r(i)
        WHERE ts[i + 1] IN ({tlist})
        ORDER BY doc_id, term, pos
    """


def _nchars_hist_sql(query: str, width: int) -> str:
    """DuckDB twin of numeric_facet: fixed-width n_chars histogram over
    every doc matching the AND query."""
    terms = list(dict.fromkeys(ANALYZER.tokenize(query)))
    tvals = ", ".join(f"('{t}')" for t in terms)
    return f"""
        WITH {_tok_cte()},
        qterms(term) AS (VALUES {tvals}),
        matched AS (
            SELECT doc_id FROM (
                SELECT DISTINCT doc_id, term FROM tok JOIN qterms USING (term)
            ) GROUP BY doc_id HAVING count(*) = {len(terms)}
        )
        SELECT (d.n_chars // {width} * {width})::BIGINT AS bin_lo,
               count(*)::BIGINT AS n
        FROM matched m JOIN documents d USING (doc_id)
        GROUP BY bin_lo ORDER BY bin_lo
    """


def build_sql() -> dict[str, str]:
    return {
        "lk_doc_lookup": LK_LOOKUP_SQL,
        "ft_delta_df_top_terms": f"""
            WITH {_tok_cte()}
            SELECT term, count(DISTINCT doc_id) AS df FROM tok
            GROUP BY term ORDER BY df DESC, term LIMIT 20
        """,
        "ft_token_counts": f"""
            SELECT doc_id,
                   len({ANALYZER.sql_tokens_expr('text')})::BIGINT AS n_tokens
            FROM documents
        """,
        "ft_bpe_token_counts": f"""
            SELECT doc_id,
                   len(regexp_extract_all(
                       coalesce(text, ''), '{BPE_PRETOKEN_RE}'
                   ))::BIGINT AS n_pretokens
            FROM documents
        """,
        "ft_df_top_terms": f"""
            WITH {_tok_cte()}
            SELECT term, count(DISTINCT doc_id)::BIGINT AS df
            FROM tok GROUP BY term
            ORDER BY df DESC, term LIMIT 20
        """,
        "ft_bm25_topk": _bm25_sql(BM25_QUERY, BM25_K),
        "ft_phrase_topk": _phrase_sql(PHRASE_QUERY, BM25_K),
        "ft_fuzzy_topk": _fuzzy_sql(FUZZY_QUERY, BM25_K),
        "ft_prefix_topk": _prefix_sql(PREFIX_QUERY, BM25_K),
        "ft_phrase_dist_topk": _phrase_sql(PHRASE_QUERY, BM25_K),
        "ft_bm25_facet_lang": _facet_sql(BM25_QUERY, "lang"),
        "ft_facet_dist_lang": _facet_sql(BM25_QUERY, "lang"),
        "ft_phrase_slop_topk": _phrase_slop_sql(PHRASE_QUERY, BM25_K, 2),
        "ft_bm25_or_topk": _bm25_sql(BM25_QUERY, BM25_K, mode_or=True),
        "ft_bm25_dist_topk": _bm25_sql(BM25_QUERY, BM25_K),
        "ft_bm25_lang_filter": _bm25_sql(BM25_FILTER_QUERY, BM25_K, lang="en"),
        "ft_bool_topk": _bool_sql(BOOL_MUST, BOOL_SHOULD, BOOL_NOT, BM25_K),
        "ft_wildcard_topk": _wildcard_sql(WILDCARD_PATTERN, BM25_K),
        "ft_fuzzy_dist_topk": _fuzzy_sql(FUZZY_QUERY, BM25_K),
        "ft_regexp_topk": _regexp_sql(REGEXP_PATTERN, BM25_K),
        "ft_highlight_topk": _highlight_sql(BM25_QUERY, BM25_K),
        "ft_explain_topk": _explain_sql(BM25_QUERY, BM25_K),
        "ft_multimatch_topk": _multimatch_sql(
            MULTI_QUERY, BM25_K, MULTI_BOOST
        ),
        "ft_multimatch_best_topk": _multimatch_best_sql(
            MULTI_QUERY, BM25_K, TIE_BREAKER
        ),
        "ft_bm25_terms_filter": _terms_filter_sql(
            BM25_FILTER_QUERY, BM25_K, TERMS_FILTER_LANGS
        ),
        "ft_sort_by_field": _sort_by_field_sql(
            BM25_QUERY, SORT_FIELD, BM25_K
        ),
        "ft_phrase_suggest": _phrase_suggest_sql(
            FUZZY_QUERY,
            PHRASE_SUGGEST_SIZE,
            SUGGEST_EDITS,
            PHRASE_SUGGEST_PER_TOKEN,
        ),
        "ft_multimatch_cross_topk": _multimatch_cross_sql(
            MULTI_QUERY, BM25_K, MULTI_BOOST
        ),
        "ft_synonym_topk": _bm25_sql(
            "window merge join", BM25_K, mode_or=True
        ),
        "ft_stopword_token_counts": f"""
            SELECT doc_id,
                   len({Analyzer(stopwords=_STOPWORDS).sql_tokens_expr('text')}
                   )::BIGINT AS n_tokens
            FROM documents
        """,
        "ft_facet_cardinality": _cardinality_sql(BM25_QUERY, CARD_COLS),
        "ft_autocomplete": _autocomplete_sql(AUTO_PREFIX, AUTO_SIZE),
        "ft_boosting_topk": _boosting_sql(
            BM25_QUERY, BOOSTING_NEG, NEG_BOOST, BM25_K
        ),
        "ft_function_score_topk": _function_score_sql(
            BM25_QUERY, FS_FACTOR, BM25_K
        ),
        "ft_boosting_dist_topk": _boosting_sql(
            BM25_QUERY, BOOSTING_NEG, NEG_BOOST, BM25_K
        ),
        "ft_function_score_dist_topk": _function_score_sql(
            BM25_QUERY, FS_FACTOR, BM25_K
        ),
        "ft_match_counts": _match_counts_sql(BM25_QUERY),
        "ft_index_stats": _index_stats_sql(),
        "ft_significant_terms": _significant_terms_sql(
            BM25_QUERY, SIG_K, SIG_MIN_DOC_COUNT
        ),
        "ft_percolate": _percolate_sql(),
        "ft_rescore_dist_topk": _rescore_sql(
            BM25_QUERY, PHRASE_QUERY, RESCORE_WINDOW, BM25_K,
            RESCORE_QW, RESCORE_RW,
        ),
        "ft_top_hits_per_lang": _top_hits_sql(
            BM25_QUERY, "lang", TOPHITS_PER_GROUP
        ),
        "ft_collapse_source_topk": _collapse_sql(
            BM25_QUERY, "source", BM25_K
        ),
        "ft_nchars_percentiles": _percentiles_sql(
            BM25_QUERY, "n_chars", PCT_QS
        ),
        "ft_span_near_topk": _span_near_sql(PHRASE_QUERY, SPAN_SLOP, BM25_K),
        "ft_extended_stats": _extended_stats_sql(BM25_QUERY, "n_chars"),
        "ft_top_hits_dist": _top_hits_sql(
            BM25_QUERY, "lang", TOPHITS_PER_GROUP
        ),
        "ft_extended_stats_dist": _extended_stats_sql(
            BM25_QUERY, "n_chars"
        ),
        "ft_nchars_histogram": _nchars_histogram_sql(
            BM25_QUERY, "n_chars", HIST_INTERVAL
        ),
        "ft_grouped_percentiles": _grouped_percentiles_sql(
            BM25_QUERY, "lang", "n_chars", PCT_QS
        ),
        "ft_filters_agg": _filters_agg_sql(FILTER_BUCKETS),
        "hy_rrf_hybrid": _rrf_sql(
            BM25_QUERY, RRF_QVEC, RRF_WINDOW, RRF_K, RRF_TOPK
        ),
        "ft_term_vectors": _term_vectors_sql(TV_DOC_ID),
        "ft_constant_score": _constant_score_sql(
            BM25_QUERY, CONST_BOOST, BM25_K
        ),
        "ft_rescore_topk": _rescore_sql(
            BM25_QUERY, PHRASE_QUERY, RESCORE_WINDOW, BM25_K,
            RESCORE_QW, RESCORE_RW,
        ),
        "ft_facet_lang_stats": _facet_stats_sql(BM25_QUERY, "lang"),
        "ft_term_suggest": _suggest_sql(
            FUZZY_QUERY, SUGGEST_SIZE, SUGGEST_EDITS
        ),
        "ft_bool_msm_topk": _bool_sql(
            "", BOOL_MSM_SHOULD, "", BM25_K, min_should=BOOL_MSM_N
        ),
        "ft_bool_dist_topk": _bool_sql(
            BOOL_MUST, BOOL_SHOULD, BOOL_NOT, BM25_K
        ),
        "ft_search_after_page2": _bm25_sql(
            BM25_QUERY, BM25_K, offset=BM25_K
        ),
        "ft_more_like_this": _mlt_sql(MLT_SEED_DOC, BM25_K, MLT_MAX_TERMS),
        "ft_match_positions": _match_positions_sql(BM25_QUERY, BM25_K),
        "ft_facet_nchars_hist": _nchars_hist_sql(BM25_QUERY, NCHARS_BIN),
        "ft_bm25_range_filter": _bm25_sql(
            BM25_FILTER_QUERY, BM25_K, nrange=(NCHARS_LO, NCHARS_HI)
        ),
        "ft_phrase_prefix_topk": _phrase_prefix_sql(
            PHRASE_PREFIX_QUERY, BM25_K
        ),
        "ft_exact_dedup": """
            SELECT min(doc_id)::BIGINT AS keep_id, count(*)::BIGINT AS n
            FROM documents GROUP BY text HAVING count(*) > 1
        """,
        "ft_quality_scores": f"""
            WITH toks AS (
                SELECT doc_id, {ANALYZER.sql_tokens_expr('text')} AS ts
                FROM documents
            )
            SELECT doc_id,
                   len(ts)::BIGINT AS n_tokens,
                   len(list_distinct(ts))::BIGINT AS n_uniq,
                   ROUND(len(list_filter(ts, t -> t IN {_STOPWORDS}))
                         / greatest(len(ts), 1)::DOUBLE, 4) AS stop_ratio,
                   ROUND(len(list_distinct(ts))
                         / greatest(len(ts), 1)::DOUBLE, 4) AS uniq_ratio
            FROM toks
        """,
        "ft_range_agg": _range_agg_sql(BM25_QUERY, "n_chars", RANGE_EDGES),
        "ft_range_agg_dist": _range_agg_sql(
            BM25_QUERY, "n_chars", RANGE_EDGES
        ),
        "ft_composite_agg": _composite_sql(
            BM25_QUERY, COMPOSITE_COLS, COMPOSITE_SIZE, 1
        ),
        "ft_adjacency_matrix": _adjacency_matrix_sql(FILTER_BUCKETS),
        "ft_weighted_avg": _weighted_avg_sql(BM25_QUERY, "n_chars"),
        "ft_scroll_page3": _bm25_sql(
            BM25_QUERY,
            SCROLL_PAGE_SIZE,
            offset=SCROLL_PAGE * SCROLL_PAGE_SIZE,
        ),
        "ft_matrix_stats": _matrix_stats_sql("n_chars"),
        "ft_bucket_stats": _bucket_stats_sql(BM25_QUERY, "lang"),
        "ft_percentile_ranks": _percentile_ranks_sql(
            BM25_QUERY, "n_chars", PCTRANK_VALUES
        ),
        "ft_msearch": _msearch_sql(MSEARCH_PLAN),
        "ft_diversified_sampler": _diversified_sampler_sql(
            BM25_QUERY, SAMPLER_SHARD, SAMPLER_MAX_PER
        ),
        "ft_facet_approx_lang": _facet_approx_sql(
            BM25_QUERY, "lang", FACET_APPROX_SIZE
        ),
        "ft_weighted_avg_dist": _weighted_avg_sql(BM25_QUERY, "n_chars"),
        "ft_script_fields": _script_fields_sql(BM25_QUERY, BM25_K),
        "ft_multimatch_blended_topk": _multimatch_blended_sql(
            MULTI_QUERY, BM25_K, MULTI_BOOST
        ),
        "ft_ingest_pipeline": _ingest_pipeline_sql(),
        "ft_top_metrics": _top_metrics_sql(BM25_QUERY),
        "ft_percentile_ranks_dist": _percentile_ranks_sql(
            BM25_QUERY, "n_chars", PCTRANK_VALUES
        ),
        "ft_rare_terms": _rare_terms_sql(
            BM25_QUERY, RARE_MAX_DOC_COUNT, RARE_SIZE
        ),
        "ft_boxplot": _boxplot_sql(BM25_QUERY, "n_chars"),
        "ft_string_stats": _string_stats_sql(BM25_QUERY, "lang"),
        "ft_t_test": _t_test_sql(BM25_QUERY, "n_chars", TTEST_GROUPS),
        "ft_mad": _mad_sql(BM25_QUERY, "n_chars"),
        "ft_multi_terms": _multi_terms_sql(BM25_QUERY, MULTI_TERMS_SIZE),
    }


def lk_doc_lookup(sf_dir: str) -> pd.DataFrame:
    """J8 lookup-by-ID as a driver-gated entry: fetch a fixed id set from
    `documents` through the distributed broadcast-filter path
    (util.fetch_rows_by_ids) — only matching rows ever reach the driver."""
    from datamart_ray.util import fetch_rows_by_ids

    ids = (3, 17, 42, 108, 256, 499)
    t = fetch_rows_by_ids(
        _docs_path(sf_dir), "doc_id", list(ids),
        ["doc_id", "lang", "source", "n_chars"],
    )
    out = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    out["n_chars"] = out["n_chars"].astype("int64")
    return out


LK_LOOKUP_SQL = """
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE doc_id IN (3, 17, 42, 108, 256, 499)
    ORDER BY doc_id
"""


def ft_delta_df_top_terms(sf_dir: str) -> pd.DataFrame:
    """Incremental-ingest correctness as a driver-gated entry: split
    `documents` in half, build an index over the first half, delta-ingest
    the second (index/maintain.ingest_delta), then compute df top-terms
    from the FINAL index's per-segment term dictionaries. The DuckDB twin
    computes df over the whole table — equality proves delta ingest ==
    from-scratch build over the union (§2.9)."""
    import numpy as np
    import pyarrow.parquet as pq_

    from datamart_ray.index.build import build_index as _build
    from datamart_ray.index.maintain import ingest_delta

    src = _docs_path(sf_dir)
    key = hashlib.sha1(
        f"delta:{src}:{os.path.getmtime(src)}:{os.path.getsize(src)}".encode()
    ).hexdigest()[:12]
    base_dir = f"{artifact_root(src)}/delta/{key}"
    half_a = os.path.join(base_dir, "half_a.parquet")
    half_b = os.path.join(base_dir, "half_b.parquet")
    index_dir = os.path.join(base_dir, "idx")
    if not os.path.exists(os.path.join(base_dir, ".halves")):
        os.makedirs(base_dir, exist_ok=True)
        t = pq_.read_table(src)
        ids = t["doc_id"].to_numpy()
        mid = int(np.median(ids))
        import pyarrow.compute as pc_

        pq_.write_table(t.filter(pc_.less_equal(t["doc_id"], mid)), half_a)
        pq_.write_table(t.filter(pc_.greater(t["doc_id"], mid)), half_b)
        open(os.path.join(base_dir, ".halves"), "w").write("ok")
    cfg = IndexConfig(
        analyzer=ANALYZER,
        content_col="text",
        id_col="doc_id",
        meta_cols=("lang", "source"),
    )
    _build(half_a, index_dir, cfg)
    ingest_delta(index_dir, half_b, cfg)
    eng = SearchEngine(index_dir)
    # global df = sum of per-segment dictionary dfs
    dfs: dict[str, int] = {}
    for r in eng.readers:
        for term, df in zip(r._dict_terms, r._dict_dfs):
            dfs[term] = dfs.get(term, 0) + int(df)
    out = pd.DataFrame(
        sorted(dfs.items(), key=lambda kv: (-kv[1], kv[0]))[:20],
        columns=["term", "df"],
    )
    out["df"] = out["df"].astype("int64")
    return out


QUERIES = {
    "ft_token_counts": ft_token_counts,
    "ft_bpe_token_counts": ft_bpe_token_counts,
    "lk_doc_lookup": lk_doc_lookup,
    "ft_delta_df_top_terms": ft_delta_df_top_terms,
    "ft_df_top_terms": ft_df_top_terms,
    "ft_bm25_topk": ft_bm25_topk,
    "ft_phrase_topk": ft_phrase_topk,
    "ft_fuzzy_topk": ft_fuzzy_topk,
    "ft_prefix_topk": ft_prefix_topk,
    "ft_phrase_dist_topk": ft_phrase_dist_topk,
    "ft_bm25_facet_lang": ft_bm25_facet_lang,
    "ft_facet_dist_lang": ft_facet_dist_lang,
    "ft_phrase_slop_topk": ft_phrase_slop_topk,
    "ft_bm25_or_topk": ft_bm25_or_topk,
    "ft_bm25_dist_topk": ft_bm25_dist_topk,
    "ft_bm25_lang_filter": ft_bm25_lang_filter,
    "ft_bool_topk": ft_bool_topk,
    "ft_wildcard_topk": ft_wildcard_topk,
    "ft_fuzzy_dist_topk": ft_fuzzy_dist_topk,
    "ft_regexp_topk": ft_regexp_topk,
    "ft_highlight_topk": ft_highlight_topk,
    "ft_explain_topk": ft_explain_topk,
    "ft_multimatch_topk": ft_multimatch_topk,
    "ft_multimatch_best_topk": ft_multimatch_best_topk,
    "ft_bm25_terms_filter": ft_bm25_terms_filter,
    "ft_sort_by_field": ft_sort_by_field,
    "ft_phrase_suggest": ft_phrase_suggest,
    "ft_multimatch_cross_topk": ft_multimatch_cross_topk,
    "ft_synonym_topk": ft_synonym_topk,
    "ft_stopword_token_counts": ft_stopword_token_counts,
    "ft_facet_cardinality": ft_facet_cardinality,
    "ft_autocomplete": ft_autocomplete,
    "ft_boosting_topk": ft_boosting_topk,
    "ft_function_score_topk": ft_function_score_topk,
    "ft_boosting_dist_topk": ft_boosting_dist_topk,
    "ft_function_score_dist_topk": ft_function_score_dist_topk,
    "ft_match_counts": ft_match_counts,
    "ft_constant_score": ft_constant_score,
    "ft_rescore_topk": ft_rescore_topk,
    "ft_index_stats": ft_index_stats,
    "ft_significant_terms": ft_significant_terms,
    "ft_percolate": ft_percolate,
    "ft_rescore_dist_topk": ft_rescore_dist_topk,
    "ft_top_hits_per_lang": ft_top_hits_per_lang,
    "ft_collapse_source_topk": ft_collapse_source_topk,
    "ft_nchars_percentiles": ft_nchars_percentiles,
    "ft_span_near_topk": ft_span_near_topk,
    "ft_extended_stats": ft_extended_stats,
    "ft_top_hits_dist": ft_top_hits_dist,
    "ft_extended_stats_dist": ft_extended_stats_dist,
    "ft_nchars_histogram": ft_nchars_histogram,
    "ft_grouped_percentiles": ft_grouped_percentiles,
    "ft_filters_agg": ft_filters_agg,
    "hy_rrf_hybrid": hy_rrf_hybrid,
    "ft_term_vectors": ft_term_vectors,
    "ft_facet_lang_stats": ft_facet_lang_stats,
    "ft_term_suggest": ft_term_suggest,
    "ft_bool_msm_topk": ft_bool_msm_topk,
    "ft_bm25_range_filter": ft_bm25_range_filter,
    "ft_phrase_prefix_topk": ft_phrase_prefix_topk,
    "ft_bool_dist_topk": ft_bool_dist_topk,
    "ft_search_after_page2": ft_search_after_page2,
    "ft_more_like_this": ft_more_like_this,
    "ft_match_positions": ft_match_positions,
    "ft_facet_nchars_hist": ft_facet_nchars_hist,
    "ft_exact_dedup": ft_exact_dedup,
    "ft_quality_scores": ft_quality_scores,
    # r3 late batch: range/composite/adjacency/weighted_avg/matrix_stats
    # pipeline-agg analogs — appended at the END so the driver's
    # 50-entry correctness window keeps its existing membership
    "ft_range_agg": ft_range_agg,
    "ft_range_agg_dist": ft_range_agg_dist,
    "ft_composite_agg": ft_composite_agg,
    "ft_adjacency_matrix": ft_adjacency_matrix,
    "ft_weighted_avg": ft_weighted_avg,
    "ft_scroll_page3": ft_scroll_page3,
    "ft_matrix_stats": ft_matrix_stats,
    "ft_bucket_stats": ft_bucket_stats,
    "ft_percentile_ranks": ft_percentile_ranks,
    "ft_msearch": ft_msearch,
    "ft_diversified_sampler": ft_diversified_sampler,
    "ft_facet_approx_lang": ft_facet_approx_lang,
    "ft_weighted_avg_dist": ft_weighted_avg_dist,
    "ft_script_fields": ft_script_fields,
    "ft_multimatch_blended_topk": ft_multimatch_blended_topk,
    "ft_ingest_pipeline": ft_ingest_pipeline,
    "ft_top_metrics": ft_top_metrics,
    "ft_percentile_ranks_dist": ft_percentile_ranks_dist,
    "ft_rare_terms": ft_rare_terms,
    "ft_boxplot": ft_boxplot,
    "ft_string_stats": ft_string_stats,
    "ft_t_test": ft_t_test,
    "ft_mad": ft_mad,
    "ft_multi_terms": ft_multi_terms,
}

SQL = build_sql()
