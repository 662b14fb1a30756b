"""Content-level code search entries — trigram-filtered substring and
regex search with exact verification.

The reference's search surface is token-level only (ES ``match`` /
``wildcard`` / ``regexp`` over analyzed terms,
apiserver/apiserver/search/__init__.py:428-604); grep-style content
search has no reference analog. This family exists for the code-search
north star (BASELINE.json ``north_rule``) and follows the public trigram
design of Google Code Search / Zoekt (R. Cox 2012) — see
``index/trigram.py`` for the build/query pipeline.

Every entry returns (doc_id, n_matches) with a DuckDB twin:

    substring   WHERE contains(text, needle); n_matches via the
                length-difference idiom (both sides count non-overlapping
                leftmost occurrences)
    regex       WHERE regexp_matches(text, pat); n_matches =
                len(regexp_extract_all(...)) — DuckDB and Arrow both run
                RE2 with identical partial-match + non-overlap semantics

``cs_regex_fullscan`` pins the honest fallback: a pattern with no
required literal ≥ 3 bytes cannot use the trigram filter, so the verify
streams the corpus (distributed, docIDs-only to the driver).
"""

from __future__ import annotations

import hashlib
import os

import pandas as pd

from datamart_ray.index.trigram import (
    TrigramConfig,
    TrigramIndex,
    build_trigram_index,
)
from datamart_ray.util import artifact_root

# needles / patterns over the documents fixture vocabulary
SUBSTR_NEEDLE = "hash scan"
# three-word needle: df 4/2/10 at sf0.001/0.01/0.1 — selective but
# non-vacuous at every sweep scale
SUBSTR_RARE_NEEDLE = "order sort table"
REGEX_PATTERN = "(hash|merge) (scan|join)"
# character classes break every literal run below 3 bytes → trigram
# filter unusable → full-scan verify path (still matches 'scan')
REGEX_FULLSCAN_PATTERN = "s[co][ra]n"

_INDEXES: dict[str, TrigramIndex] = {}


def _docs_path(sf_dir: str) -> str:
    return f"{sf_dir}/documents.parquet"


def get_trigram_index(sf_dir: str) -> TrigramIndex:
    """Build (resume) the documents trigram index and cache the handle.

    Same on-disk cross-process cache contract as ``fulltext.get_engine``:
    committed segments are skipped on rebuild, the artifact key pins the
    source identity."""
    sf_dir = os.path.abspath(sf_dir)
    if sf_dir in _INDEXES:
        return _INDEXES[sf_dir]
    src = _docs_path(sf_dir)
    key = hashlib.sha1(
        f"{src}:{os.path.getmtime(src)}:{os.path.getsize(src)}:tri".encode()
    ).hexdigest()[:12]
    index_dir = f"{artifact_root(src)}/tridx/{key}"
    build_trigram_index(
        src, index_dir, TrigramConfig(text_col="text", id_col="doc_id")
    )
    idx = TrigramIndex(index_dir, src)
    _INDEXES[sf_dir] = idx
    return idx


def _hits_df(t) -> pd.DataFrame:
    out = t.to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_matches"] = out["n_matches"].astype("int64")
    return out


def cs_substring_hits(sf_dir: str) -> pd.DataFrame:
    """Substring content search through the trigram index: candidate
    docIDs from posting-list intersection, exact verify + occurrence
    count on candidates only."""
    return _hits_df(
        get_trigram_index(sf_dir).substring_search(SUBSTR_NEEDLE)
    )


def cs_substring_rare_hits(sf_dir: str) -> pd.DataFrame:
    """Rarer multi-word needle — more trigrams, tighter candidate set
    (exercises the rarest-first intersection order)."""
    return _hits_df(
        get_trigram_index(sf_dir).substring_search(SUBSTR_RARE_NEEDLE)
    )


def cs_regex_hits(sf_dir: str) -> pd.DataFrame:
    """Regex content search: required-literal DNF → per-alternative
    trigram intersection → union → exact RE2 verify on candidates."""
    return _hits_df(
        get_trigram_index(sf_dir).regexp_search(REGEX_PATTERN)
    )


NOCASE_NEEDLE = "HASH Scan"  # wrong-case needle over a lowercase corpus
FILTER_LANG = "en"  # lang filter for the scoped-search entry


def cs_substring_lang_filter(sf_dir: str) -> pd.DataFrame:
    """Scoped content search (Zoekt-style lang/repo filter): metadata
    equality filters ride the same pruned verify reads — never a second
    corpus pass or join."""
    return _hits_df(
        get_trigram_index(sf_dir).substring_search(
            SUBSTR_NEEDLE, filters={"lang": FILTER_LANG}
        )
    )


def cs_match_stats_by_lang(sf_dir: str) -> pd.DataFrame:
    """Per-group match rollup (grep -c per lang): (lang, n_docs,
    n_matches); rollup is over hit rows only, hits-bounded."""
    out = (
        get_trigram_index(sf_dir)
        .match_stats_by(SUBSTR_NEEDLE, "lang")
        .to_pandas()
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_matches"] = out["n_matches"].astype("int64")
    return out


def cs_substring_nocase(sf_dir: str) -> pd.DataFrame:
    """Case-insensitive substring search (grep -i): candidates from
    per-position case-variant unions over the same index, verify via
    the lower-both-sides idiom. PINNED DEVIATION: the engine folds
    ASCII only (``ascii_lower`` — byte-stable, so the trigram
    candidate filter provably covers the kernel), while the DuckDB
    twin's ``lower()`` is Unicode; they agree on any ASCII corpus
    (this fixture) and diverge only on non-ASCII cased characters,
    where the engine is deliberately conservative. The needle's case
    is wrong for the fixture, so a broken fold returns zero rows and
    fails the row-count gate."""
    return _hits_df(
        get_trigram_index(sf_dir).substring_search(
            NOCASE_NEEDLE, ignore_case=True
        )
    )


NOCASE_REGEX = "(HASH|Merge) (scan|JOIN)"  # wrong-case alternation


def cs_regex_nocase(sf_dir: str) -> pd.DataFrame:
    """Case-insensitive regex search (grep -iE) with INDEXED candidate
    bounding (NEW r5): the pattern's required-literal DNF is extracted
    with ``fold=True`` and each ASCII literal becomes per-position
    case-variant trigram unions (``nocase_literal_positions`` — the
    positions RE2's Unicode simple folding can evade, k/s windows, are
    excluded so the filter stays sound). Verify is RE2 ``(?i)`` — the
    identical flag DuckDB's regexp engine uses, so the twin
    (``regexp_matches(text, pattern, 'i')``) agrees exactly. The
    needle's case is wrong for the fixture, so a broken variant
    expansion returns zero rows and fails the row-count gate."""
    return _hits_df(
        get_trigram_index(sf_dir).regexp_search(
            NOCASE_REGEX, ignore_case=True
        )
    )


def cs_regex_fullscan(sf_dir: str) -> pd.DataFrame:
    """Regex with no usable literal — pins the distributed full-scan
    verify fallback (same result contract, no trigram pruning)."""
    return _hits_df(
        get_trigram_index(sf_dir).regexp_search(REGEX_FULLSCAN_PATTERN)
    )


LIKE_PATTERN = "%hash scan%order%"  # ordered multi-literal LIKE


def cs_like_search(sf_dir: str) -> pd.DataFrame:
    """SQL LIKE content search: trigram AND over every ≥3-byte literal
    run between wildcards, Arrow match_like verify — DuckDB LIKE twin."""
    return _hits_df(
        get_trigram_index(sf_dir).like_search(LIKE_PATTERN)
    )


def _like_sql(pattern: str) -> str:
    return f"""
        SELECT doc_id, 1::BIGINT AS n_matches
        FROM documents
        WHERE text LIKE '{pattern}'
        ORDER BY doc_id
    """


# deterministic camelCase derivation for the identifier-splitting
# entry: both sides apply the SAME replace chain to documents.text, so
# the fixture (all-lowercase word soup) gains real camelCase/PascalCase
# identifiers at corpus frequency. A broken split_camel would lowercase
# 'hashScan' into the single term 'hashscan' and hash-mismatch.
IDENT_REPLACES = (
    ("hash scan", "hashScan"),
    ("key order", "keyOrder"),
    ("merge part", "MergePart"),
)
IDENT_TOP_K = 20


def cs_ident_token_counts(sf_dir: str) -> pd.DataFrame:
    """Identifier-aware code tokenization: camelCase-derived content →
    Analyzer(split_camel=True) → global term counts, top 20 (n desc,
    term asc). Distributed: per-batch Arrow hash-agg partials, one
    vocabulary-bounded groupby."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data as rd
    from ray.data.aggregate import Sum

    from datamart_ray.analyzer import Analyzer
    from datamart_ray.util import ensure_fast_shuffle

    ensure_fast_shuffle()
    an = Analyzer(split_camel=True)
    ds = rd.read_parquet(_docs_path(sf_dir), columns=["text"])

    def counts(t: pa.Table) -> pa.Table:
        s = pc.fill_null(t["text"], "")
        for old, new in IDENT_REPLACES:
            s = pc.replace_substring(s, old, new)
        flat = pc.list_flatten(an.token_lists(s))
        return (
            pa.table({"term": flat})
            .group_by("term")
            .aggregate([("term", "count")])
            .rename_columns(["term", "n"])
        )

    out = (
        ds.map_batches(counts, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "term"], descending=[True, False])
        .limit(IDENT_TOP_K)
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return out


def _ident_sql() -> str:
    from datamart_ray.analyzer import Analyzer

    derived = "text"
    for old, new in IDENT_REPLACES:
        derived = f"replace({derived}, '{old}', '{new}')"
    toks = Analyzer(split_camel=True).sql_tokens_expr("d.text")
    return f"""
        WITH d AS (SELECT {derived} AS text FROM documents),
        t AS (SELECT unnest({toks}) AS term FROM d)
        SELECT term, count(*)::BIGINT AS n FROM t
        GROUP BY term ORDER BY n DESC, term LIMIT {IDENT_TOP_K}
    """


def _substring_sql(needle: str) -> str:
    return f"""
        SELECT doc_id,
               CAST((length(text) - length(replace(text, '{needle}', '')))
                    / length('{needle}') AS BIGINT) AS n_matches
        FROM documents
        WHERE contains(text, '{needle}')
        ORDER BY doc_id
    """


def _substring_filter_sql(needle: str, lang: str) -> str:
    return f"""
        SELECT doc_id,
               CAST((length(text) - length(replace(text, '{needle}', '')))
                    / length('{needle}') AS BIGINT) AS n_matches
        FROM documents
        WHERE contains(text, '{needle}') AND lang = '{lang}'
        ORDER BY doc_id
    """


def _match_stats_sql(needle: str) -> str:
    return f"""
        SELECT lang,
               count(*)::BIGINT AS n_docs,
               CAST(sum((length(text)
                         - length(replace(text, '{needle}', '')))
                        / length('{needle}')) AS BIGINT) AS n_matches
        FROM documents
        WHERE contains(text, '{needle}')
        GROUP BY lang
        ORDER BY lang
    """


def _substring_nocase_sql(needle: str) -> str:
    lo = needle.lower()
    return f"""
        SELECT doc_id,
               CAST((length(lower(text))
                     - length(replace(lower(text), '{lo}', '')))
                    / length('{lo}') AS BIGINT) AS n_matches
        FROM documents
        WHERE contains(lower(text), '{lo}')
        ORDER BY doc_id
    """


def _regex_sql(pattern: str) -> str:
    return f"""
        SELECT doc_id,
               len(regexp_extract_all(text, '{pattern}')) AS n_matches
        FROM documents
        WHERE regexp_matches(text, '{pattern}')
        ORDER BY doc_id
    """


def _regex_nocase_sql(pattern: str) -> str:
    # DuckDB's regexp engine is RE2 with the same 'i' flag semantics as
    # the engine's (?i) — Unicode simple folding both sides
    return f"""
        SELECT doc_id,
               len(regexp_extract_all(text, '{pattern}', 0, 'i'))
                   AS n_matches
        FROM documents
        WHERE regexp_matches(text, '{pattern}', 'i')
        ORDER BY doc_id
    """


ILIKE_PATTERN = "%HASH Scan%Order%"  # wrong-case ordered multi-literal


def cs_ilike_search(sf_dir: str) -> pd.DataFrame:
    """Case-insensitive SQL LIKE (ILIKE) content search (NEW r5):
    candidates from per-position case-variant trigram unions per
    literal run (k/s windows excluded for Unicode-fold soundness),
    verify via Arrow ``match_like(ignore_case=True)`` — DuckDB
    ``ILIKE`` twin. Identical on this ASCII fixture; the engine's
    Arrow kernel additionally folds LONG S/KELVIN SIGN (pinned
    deviation, documented in ``TrigramIndex.like_search``). The
    pattern's case is wrong for the corpus, so a broken variant
    expansion returns zero rows and fails the row-count gate."""
    return _hits_df(
        get_trigram_index(sf_dir).like_search(
            ILIKE_PATTERN, ignore_case=True
        )
    )


def _ilike_sql(pattern: str) -> str:
    return f"""
        SELECT doc_id, 1::BIGINT AS n_matches
        FROM documents
        WHERE text ILIKE '{pattern}'
        ORDER BY doc_id
    """


QUERIES = {
    "cs_ilike_search": cs_ilike_search,
    "cs_substring_hits": cs_substring_hits,
    "cs_substring_rare_hits": cs_substring_rare_hits,
    "cs_regex_hits": cs_regex_hits,
    "cs_regex_nocase": cs_regex_nocase,
    "cs_regex_fullscan": cs_regex_fullscan,
    "cs_substring_nocase": cs_substring_nocase,
    "cs_substring_lang_filter": cs_substring_lang_filter,
    "cs_match_stats_by_lang": cs_match_stats_by_lang,
    "cs_like_search": cs_like_search,
    "cs_ident_token_counts": cs_ident_token_counts,
}

SQL = {
    "cs_like_search": _like_sql(LIKE_PATTERN),
    "cs_ilike_search": _ilike_sql(ILIKE_PATTERN),
    "cs_substring_nocase": _substring_nocase_sql(NOCASE_NEEDLE),
    "cs_substring_lang_filter": _substring_filter_sql(
        SUBSTR_NEEDLE, FILTER_LANG
    ),
    "cs_match_stats_by_lang": _match_stats_sql(SUBSTR_NEEDLE),
    "cs_ident_token_counts": _ident_sql(),
    "cs_substring_hits": _substring_sql(SUBSTR_NEEDLE),
    "cs_substring_rare_hits": _substring_sql(SUBSTR_RARE_NEEDLE),
    "cs_regex_hits": _regex_sql(REGEX_PATTERN),
    "cs_regex_nocase": _regex_nocase_sql(NOCASE_REGEX),
    "cs_regex_fullscan": _regex_sql(REGEX_FULLSCAN_PATTERN),
}
