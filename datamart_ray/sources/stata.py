"""Stata (.dta) and SPSS (.sav) converters (S10/S11 — reference:
lib_materialize/datamart_materialize/stata.py:6-17 chunked
pandas.read_stata → CSV; spss.py:6-16 pyreadstat → CSV; magic-byte
detection lib_core/datamart_core/materialize.py:195-214).

Stata needs no optional dependency — ``pandas.read_stata`` is pure
pandas, and the iterator form streams the file in bounded chunks, each
written as its own parquet part (the reference streams chunks to CSV
the same way). SPSS requires ``pyreadstat`` which this container lacks,
so :func:`convert_spss_to_parquet` is an import-gated honest stub: it
raises with the dependency name rather than pretending.

Like the XLSX reader these are DRIVER-side converters: a .dta/.sav file
is single-node data by construction; the parquet they write then enters
the distributed pipeline like any other table.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

# magic prefixes from the reference's detection chain
# (materialize.py:195-199, 208): XML header for modern dta,
# version-byte tuples for legacy dta, $FL2/$FL3 + EBCDIC for SPSS
STATA_XML_MAGIC = b"<stata_dta>"
STATA_LEGACY_MAGICS = (
    b"\x73\x01\x01\x00", b"\x73\x02\x01\x00",
    b"\x72\x01\x01\x00", b"\x72\x02\x01\x00",
    b"\x71\x01\x01\x01", b"\x71\x02\x01\x01",
)
SPSS_MAGICS = (b"\xc1\xe2\xc3\xc9", b"$FL2", b"$FL3")


def sniff_magic(path: str) -> str | None:
    """'stata' / 'spss' / None from the file's first 16 bytes."""
    with open(path, "rb") as f:
        magic = f.read(16)
    if magic[:11] == STATA_XML_MAGIC or magic[:4] in STATA_LEGACY_MAGICS:
        return "stata"
    if magic[:4] in SPSS_MAGICS:
        return "spss"
    return None


def convert_stata_to_parquet(
    src: str, out_dir: str, chunksize: int = 100_000
) -> str:
    """Stream a .dta file → parquet directory in bounded chunks."""
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    with pd.read_stata(src, iterator=True, chunksize=chunksize) as reader:
        for i, chunk in enumerate(reader):
            pq.write_table(
                pa.Table.from_pandas(chunk, preserve_index=False),
                os.path.join(out_dir, f"data-{i:05d}.parquet"),
            )
            n += 1
    if n == 0:  # zero-row file: still emit the schema
        empty = pd.read_stata(src)
        pq.write_table(
            pa.Table.from_pandas(empty, preserve_index=False),
            os.path.join(out_dir, "data-00000.parquet"),
        )
    return out_dir


def convert_spss_to_parquet(src: str, out_dir: str) -> str:
    """SPSS → parquet via the NATIVE .sav parser (sources/spss.py);
    falls back to pyreadstat only for files the native subset refuses
    (very-long strings), matching the reference's dependency."""
    from datamart_ray.sources import spss

    try:
        return spss.convert_spss_to_parquet(src, out_dir)
    except ValueError as native_err:
        try:
            import pyreadstat  # noqa: F401
        except ImportError:
            # no fallback available: surface the native parser's
            # diagnosis (bad file / unsupported subset), not the
            # missing optional dependency
            raise native_err from None
        df = pd.read_spss(src)
        os.makedirs(out_dir, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            os.path.join(out_dir, "data-00000.parquet"),
        )
        return out_dir
