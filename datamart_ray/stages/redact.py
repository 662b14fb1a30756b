"""PII redaction — pattern-based scrubbing of emails / IPs / phones.

A training-data pipeline scrubs personally identifiable information
before packing: the operator is a stateless vectorized `map_batches`
stage (three RE2 kernels per batch — count, then replace — all in
Arrow C++, no Python loop over rows), so at 100 TB it streams with the
read and never shuffles. Patterns are pinned to the RE2 dialect shared
by Arrow and DuckDB, which is what makes the entry oracle-gatable.

The synthetic fixtures contain no real PII, so the driver-gated entry
plants deterministic PII derived from ``doc_id`` IDENTICALLY on both
sides (Ray and the SQL twin) — the redaction kernels then run against
text that genuinely contains emails/IPs/phones (non-vacuous: every row
has ≥1 of each).

Reference analog: the profiler's regex-driven structural typing
(lib_profiler/datamart_profiler/profile_types.py) establishes the
pattern-classification precedent; redaction is its scrubbing
counterpart for pipeline output rather than profiling.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# RE2-compatible (no lookarounds); identical strings are interpolated
# into the DuckDB twin, so the two sides can't drift.
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"

# replacement order is pinned: emails first (an address may embed
# digit runs), then IPs, then phones — the twin applies the same order
_PATTERNS = (
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
)


def redact_batch(text: pa.ChunkedArray | pa.Array) -> dict[str, pa.Array]:
    """Vectorized redaction of one Arrow string column: returns the
    scrubbed text plus per-row match counts per PII class."""
    counts = {
        "n_email": pc.cast(
            pc.count_substring_regex(text, EMAIL_RE), pa.int64()
        ),
        "n_ip": pc.cast(pc.count_substring_regex(text, IPV4_RE), pa.int64()),
        "n_phone": pc.cast(
            pc.count_substring_regex(text, PHONE_RE), pa.int64()
        ),
    }
    red = text
    for pat, repl in _PATTERNS:
        red = pc.replace_substring_regex(red, pattern=pat, replacement=repl)
    return {"redacted": red, **counts}


def redact_dataset(
    ds: rd.Dataset, text_col: str = "text"
) -> rd.Dataset:
    """Generic streaming stage: replace `text_col` with its redacted
    form and append n_email/n_ip/n_phone count columns."""

    def fn(t: pa.Table) -> pa.Table:
        out = redact_batch(t[text_col])
        t = t.drop_columns([text_col]).append_column(text_col, out["redacted"])
        for c in ("n_email", "n_ip", "n_phone"):
            t = t.append_column(c, out[c])
        return t

    return ds.map_batches(fn, batch_format="pyarrow")


# -- driver-gated entry: plant deterministic PII, then redact ----------

_PLANT_SQL_EXPR = (
    "text || ' contact user' || doc_id || '@example.com from 10.0.' || "
    "(doc_id % 256) || '.7 call 555-' || "
    "lpad(((doc_id * 7) % 1000)::VARCHAR, 3, '0') || '-' || "
    "lpad(((doc_id * 13) % 10000)::VARCHAR, 4, '0')"
)


def _plant(t: pa.Table) -> pa.Table:
    did = t["doc_id"].to_pandas()
    planted = (
        t["text"].to_pandas()
        + " contact user" + did.astype(str)
        + "@example.com from 10.0." + (did % 256).astype(str)
        + ".7 call 555-" + (did * 7 % 1000).astype(str).str.zfill(3)
        + "-" + (did * 13 % 10000).astype(str).str.zfill(4)
    )
    return pa.table(
        {"doc_id": t["doc_id"], "text": pa.array(planted, type=pa.string())}
    )


def pii_redaction_stats(sf_dir: str) -> pd.DataFrame:
    """Plant per-row email/IP/phone into `documents.text` (derived from
    doc_id, mirrored exactly by the SQL twin), run the streaming
    redaction stage, and return per-doc counts plus the scrubbed text.
    Every row carries ≥1 of each PII class — the entry is non-vacuous
    by construction."""
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    red = redact_dataset(
        ds.map_batches(_plant, batch_format="pyarrow"), "text"
    )
    out = red.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return out.rename(columns={"text": "redacted"})[
        ["doc_id", "n_email", "n_ip", "n_phone", "redacted"]
    ]


def pii_redaction_sql() -> str:
    email, ip, phone = EMAIL_RE, IPV4_RE, PHONE_RE
    return f"""
        WITH planted AS (
            SELECT doc_id, {_PLANT_SQL_EXPR} AS text FROM documents
        )
        SELECT doc_id,
               len(regexp_extract_all(text, '{email}'))::BIGINT AS n_email,
               len(regexp_extract_all(text, '{ip}'))::BIGINT AS n_ip,
               len(regexp_extract_all(text, '{phone}'))::BIGINT AS n_phone,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(text, '{email}', '<EMAIL>', 'g'),
                       '{ip}', '<IP>', 'g'),
                   '{phone}', '<PHONE>', 'g') AS redacted
        FROM planted
        ORDER BY doc_id
    """
