"""PII scrubbing — regex redaction of emails / URLs / IPv4 addresses.

The standard pre-training scrub pass: replace personally-identifying
spans with fixed placeholder tokens and report per-doc match counts.
All patterns are RE2-compatible (no lookahead/backreferences) so the
SAME expressions run in Arrow's `replace_substring_regex` /
`count_substring_regex` (used here) and in DuckDB `regexp_replace(...,
'g')` — both engines are RE2-based with leftmost non-overlapping
semantics, so a SQL twin stays exact when a corpus contains PII. (The
synthetic test corpus contains none — the operator ships with planted
fixtures in pytest instead of a vacuous all-zeros oracle entry.)

Order matters and is pinned: URLs first (an email-shaped substring
inside a URL query string must redact as part of the URL), then
emails, then bare IPv4s.

Shape: stateless vectorized Arrow kernels per batch — compiled-regex
C++ scans, no Python per row, no shuffle, embarrassingly parallel.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# RE2-safe; word chars only at the boundaries we control
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

SCRUB_ORDER: tuple[tuple[str, str, str], ...] = (
    ("n_urls", URL_RE, "[URL]"),
    ("n_emails", EMAIL_RE, "[EMAIL]"),
    ("n_ips", IPV4_RE, "[IP]"),
)


def scrub_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """One batch: count then replace each pattern in pinned order.
    Returns the input schema plus count columns, with `text_col`
    replaced by its scrubbed value."""
    # cast first: a batch whose text values are ALL null arrives as a
    # null-typed column, which fill_null cannot target with a string
    s = pc.fill_null(pc.cast(t[text_col], pa.string()), "")
    counts = {}
    for name, pat, repl in SCRUB_ORDER:
        counts[name] = pc.cast(
            pc.count_substring_regex(s, pat), pa.int64()
        )
        s = pc.replace_substring_regex(s, pat, repl)
    cols = {}
    for c in t.column_names:
        cols[c] = s if c == text_col else t[c]
    for name, arr in counts.items():
        cols[name] = arr
    return pa.table(cols)


def scrub_pii_ds(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """Scrub a (…, text) Dataset; adds n_urls/n_emails/n_ips columns."""
    return ds.map_batches(
        lambda t: scrub_batch(t, text_col), batch_format="pyarrow"
    )


def scrub_pii(sf_dir: str) -> pd.DataFrame:
    """Driver entry: per-doc PII counts + scrubbed length over
    `documents` (zero counts on the synthetic corpus — the semantics
    are exercised by the planted pytest fixtures)."""
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def finish(t: pa.Table) -> pa.Table:
        out = scrub_batch(t)
        return pa.table(
            {
                "doc_id": pc.cast(out["doc_id"], pa.int64()),
                "n_urls": out["n_urls"],
                "n_emails": out["n_emails"],
                "n_ips": out["n_ips"],
                "clean_len": pc.cast(
                    pc.utf8_length(out["text"]), pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(finish, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
