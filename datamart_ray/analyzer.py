"""Analyzer chain: text column → per-document term-frequency pairs.

The reference's analyzer (coordinator/coordinator/elasticsearch.yml:2-20) is
``html_strip → standard tokenizer → lowercase → english stemmer``, applied
identically at index and search time. We pin our own equivalent chain —
``(html_strip) → lowercase → regex tokenize`` — and use the *same* Analyzer
object on both the index-build and the query path (the ``default_search =
default`` parity requirement).

The default token pattern ``[a-z0-9]+`` is chosen so the DuckDB oracle can
reproduce it exactly with ``regexp_extract_all(lower(text), '[a-z0-9]+')``.
Stemming is intentionally off by default (documented deviation: our engine is
its own golden reference per SURVEY.md §1.3).

All kernels are Arrow-native (``pyarrow.compute``) — no Python loops over
rows: lowercase → split on the complement pattern → list-flatten with parent
indices → hash-aggregate (term, doc) counts in Arrow C++.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_HTML_TAG_RE = r"<[^>]*>"
# camelCase boundary rules (identifier splitting; pinned order 1 → 2)
_CAMEL_RE1 = "([a-z0-9])([A-Z])"
_CAMEL_RE2 = "([A-Z]+)([A-Z][a-z])"


@dataclass(frozen=True)
class Analyzer:
    """Tokenizer configuration, shared verbatim between index and query."""

    lowercase: bool = True
    token_chars: str = "a-z0-9"  # tokens are maximal runs of these chars
    html_strip: bool = False
    min_token_len: int = 1
    max_token_len: int = 0  # 0 = unlimited
    stem: str | None = None  # "porter" → Porter-stem tokens (no SQL twin)
    # ES "stop" token filter analog: tokens dropped AFTER lowercasing,
    # BEFORE stemming (ES's default filter order). SQL-reproducible.
    stopwords: tuple = ()
    # Identifier-aware code tokenization (ES word_delimiter_graph
    # analog): BEFORE lowercasing, insert a space at camelCase
    # boundaries — rule 1 'getUser'→'get User', then rule 2 (acronym)
    # 'HTTPServer'→'HTTP Server'; snake_case already splits because '_'
    # is outside token_chars. Rule order is pinned and shared verbatim
    # with the DuckDB twin (sql_tokens_expr), both RE2.
    split_camel: bool = False

    def __post_init__(self):
        # per-instance stem memo (frozen dataclass → set via object)
        object.__setattr__(self, "_stem_cache", {})
        # JSON round-trips deliver a list; pin the declared tuple type
        object.__setattr__(self, "stopwords", tuple(self.stopwords))

    def to_kwargs(self) -> dict:
        """Constructor kwargs for round-tripping this analyzer to worker
        processes. Declared dataclass fields only — ``__dict__`` also holds
        the ``_stem_cache`` memo set in ``__post_init__`` and would raise
        TypeError when splatted back into ``Analyzer(**...)``."""
        import dataclasses

        return {
            f.name: getattr(self, f.name) for f in dataclasses.fields(self)
        }

    @property
    def split_pattern(self) -> str:
        return f"[^{self.token_chars}]+"

    @property
    def token_pattern(self) -> str:
        return f"[{self.token_chars}]+"

    def sql_tokens_expr(self, col: str) -> str:
        """DuckDB expression producing this analyzer's token list for `col`."""
        if self.stem:
            raise ValueError(
                "stemming has no SQL twin — use the Python oracle instead"
            )
        base = col
        if self.split_camel:
            base = (
                f"regexp_replace({base}, "
                f"'{_CAMEL_RE1}', '\\1 \\2', 'g')"
            )
            base = (
                f"regexp_replace({base}, "
                f"'{_CAMEL_RE2}', '\\1 \\2', 'g')"
            )
        inner = f"lower({base})" if self.lowercase else base
        if self.html_strip:
            inner = f"regexp_replace({inner}, '{_HTML_TAG_RE}', ' ', 'g')"
        expr = f"regexp_extract_all({inner}, '{self.token_pattern}')"
        if self.min_token_len > 1 or self.max_token_len:
            hi = self.max_token_len or 100000
            expr = (
                f"list_filter({expr}, t -> length(t) >= {self.min_token_len}"
                f" AND length(t) <= {hi})"
            )
        if self.stopwords:
            stop_list = ", ".join(f"'{w}'" for w in sorted(self.stopwords))
            expr = f"list_filter({expr}, t -> t NOT IN ({stop_list}))"
        return expr

    # ------------------------------------------------------------------
    # Arrow kernels
    # ------------------------------------------------------------------
    def token_lists(self, col: pa.Array | pa.ChunkedArray) -> pa.Array:
        """Text column → list<string> of tokens per row (nulls → empty)."""
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        s = pc.fill_null(col, "")
        if self.split_camel:  # before lowercase (boundaries need case)
            s = pc.replace_substring_regex(s, _CAMEL_RE1, r"\1 \2")
            s = pc.replace_substring_regex(s, _CAMEL_RE2, r"\1 \2")
        if self.html_strip:
            s = pc.replace_substring_regex(s, _HTML_TAG_RE, " ")
        if self.lowercase:
            s = pc.utf8_lower(s)
        toks = pc.split_pattern_regex(s, self.split_pattern)
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        if self.min_token_len > 1:
            keep = pc.and_(
                keep,
                pc.greater_equal(
                    pc.utf8_length(flat), self.min_token_len
                ),
            )
        if self.max_token_len:
            keep = pc.and_(
                keep,
                pc.less_equal(pc.utf8_length(flat), self.max_token_len),
            )
        flat = pc.filter(flat, keep)
        parents = pc.filter(parents, keep)
        if self.stopwords:
            alive = pc.invert(
                pc.is_in(flat, value_set=pa.array(sorted(self.stopwords)))
            )
            flat = pc.filter(flat, alive)
            parents = pc.filter(parents, alive)
        if self.stem == "porter":
            flat = self._stem_array(flat)
        # Rebuild a clean list array from (parent, token): parents are
        # monotonically non-decreasing, so offsets come from a bincount.
        counts = np.bincount(
            parents.to_numpy(zero_copy_only=False), minlength=len(col)
        )
        offsets = np.zeros(len(col) + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        return pa.ListArray.from_arrays(pa.array(offsets), flat)

    def _stem_array(self, flat: pa.Array) -> pa.Array:
        """Stem a flat token array: stem only unique tokens (memoized),
        then scatter back through the inverse index."""
        from datamart_ray.stemmer import porter_stem

        arr = flat.to_numpy(zero_copy_only=False)
        uniq, inverse = np.unique(arr, return_inverse=True)
        cache = self._stem_cache
        stems = np.array(
            [
                cache.get(u) or cache.setdefault(u, porter_stem(u))
                for u in uniq
            ],
            dtype=object,
        )
        return pa.array(stems[inverse], type=pa.string())

    def tokenize(self, text: str) -> list[str]:
        """Single string → token list (query path)."""
        lst = self.token_lists(pa.array([text], type=pa.string()))
        return lst[0].as_py()

    def term_frequencies(
        self, col: pa.Array | pa.ChunkedArray
    ) -> tuple[pa.Table, np.ndarray]:
        """Text column → ((row_idx, term, tf) table, doclen per input row).

        ``row_idx`` is the 0-based index into the input column; callers add
        their docID base. doclen = number of tokens (with repeats) per row.
        """
        lists = self.token_lists(col)
        flat = pc.list_flatten(lists)
        parents = pc.list_parent_indices(lists)
        doclens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        doclens = doclens.astype(np.int64)
        if len(flat) == 0:
            empty = pa.table(
                {
                    "row_idx": pa.array([], type=pa.int64()),
                    "term": pa.array([], type=pa.string()),
                    "tf": pa.array([], type=pa.int64()),
                }
            )
            return empty, doclens
        pairs = pa.table(
            {"row_idx": pc.cast(parents, pa.int64()), "term": flat}
        )
        tf = pairs.group_by(["row_idx", "term"]).aggregate([("term", "count")])
        tf = tf.rename_columns(["row_idx", "term", "tf"])
        return tf, doclens

    def term_positions(
        self, col: pa.Array | pa.ChunkedArray
    ) -> tuple[pa.Table, np.ndarray]:
        """Text column → ((row_idx, term, tf, pos) table, doclen per row) —
        the positional variant of :meth:`term_frequencies` for phrase
        queries. ``pos`` is a binary cell per (row, term): the varbyte
        encoding of the delta-encoded 0-based in-document token positions
        (post-filter indices, identical to the SQL twin's 1-based list
        index minus one). ``tf`` always equals the position count.

        Fully vectorized: one Arrow multi-key sort + numpy group-boundary
        arithmetic + one grouped varbyte pass (no per-group Python)."""
        from datamart_ray.index import codec

        lists = self.token_lists(col)
        flat = pc.list_flatten(lists)
        doclens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        doclens = doclens.astype(np.int64)
        if len(flat) == 0:
            empty = pa.table(
                {
                    "row_idx": pa.array([], type=pa.int64()),
                    "term": pa.array([], type=pa.string()),
                    "tf": pa.array([], type=pa.int64()),
                    "pos": pa.array([], type=pa.binary()),
                }
            )
            return empty, doclens
        parents = pc.list_parent_indices(lists).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        doc_starts = np.zeros(doclens.size + 1, dtype=np.int64)
        np.cumsum(doclens, out=doc_starts[1:])
        posn = np.arange(parents.size, dtype=np.int64) - doc_starts[parents]
        tb = pa.table(
            {
                "row_idx": pa.array(parents),
                "term": flat,
                "posn": pa.array(posn),
            }
        )
        order = pc.sort_indices(
            tb,
            sort_keys=[
                ("row_idx", "ascending"),
                ("term", "ascending"),
                ("posn", "ascending"),
            ],
        )
        tb = tb.take(order)
        r = tb["row_idx"].to_numpy()
        t = tb["term"].to_numpy(zero_copy_only=False)
        p = tb["posn"].to_numpy()
        n = r.size
        if n > 1:
            change = (r[1:] != r[:-1]) | (t[1:] != t[:-1])
            bounds = np.flatnonzero(change) + 1
        else:
            bounds = np.empty(0, dtype=np.int64)
        starts = np.concatenate(([0], bounds))
        group_offsets = np.concatenate(([0], bounds, [n]))
        tf = np.diff(group_offsets)
        deltas = p.copy()
        deltas[1:] -= p[:-1]
        deltas[starts] = p[starts]
        pos_blobs = codec.varbyte_encode_grouped(deltas, group_offsets)
        out = pa.table(
            {
                "row_idx": pa.array(r[starts]),
                "term": pa.array(t[starts], type=pa.string()),
                "tf": pa.array(tf, type=pa.int64()),
                "pos": pos_blobs,
            }
        )
        return out, doclens
