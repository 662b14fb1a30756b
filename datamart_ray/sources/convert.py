"""Source converters + metadata-sidecar sink (SURVEY.md §2.1).

The reference funnels every input format into CSV
(lib_core/datamart_core/materialize.py:167-263 detection chain; S6-S14);
this engine funnels everything into Parquet — the only format the index
build plans against (row-group offsets → deterministic docIDs).

- :func:`convert_csv_to_parquet` — CSV/TSV → parquet dir via Ray's Arrow
  CSV reader (S1/S12; ``delimiter="\\t"`` covers the TSV detection case).
- :func:`detect_and_convert` — suffix/sniff dispatch (S14 analog).
- :func:`write_with_metadata` — parquet dir + JSON sidecar describing
  schema/rows (the D3M ``datasetDoc.json`` layout analog, S8,
  lib_materialize/datamart_materialize/d3m.py:25-100).
"""

from __future__ import annotations

import json
import os

import ray.data as rd

from datamart_ray.index.manifest import atomic_write_json


def convert_csv_to_parquet(
    src: str | list[str],
    out_dir: str,
    delimiter: str = ",",
    column_types: dict | None = None,
) -> str:
    """Stream CSV/TSV → parquet directory (no driver materialization)."""
    from pyarrow import csv as pacsv

    parse_options = pacsv.ParseOptions(delimiter=delimiter)
    convert_options = (
        pacsv.ConvertOptions(column_types=column_types)
        if column_types
        else None
    )
    ds = rd.read_csv(
        src,
        parse_options=parse_options,
        **({"convert_options": convert_options} if convert_options else {}),
    )
    ds.write_parquet(out_dir)
    return out_dir


def detect_and_convert(src: str, out_dir: str) -> str:
    """Format-detection dispatch (S14): suffix first, then a delimiter
    sniff on the first line; parquet passes through untouched."""
    lower = src.lower()
    if lower.endswith(".parquet"):
        return src
    if lower.endswith(".xlsx"):
        from datamart_ray.sources.xlsx import convert_xlsx_to_parquet

        return convert_xlsx_to_parquet(src, out_dir)
    if lower.endswith(".dta"):
        from datamart_ray.sources.stata import convert_stata_to_parquet

        return convert_stata_to_parquet(src, out_dir)
    if lower.endswith(".sav"):
        from datamart_ray.sources.stata import convert_spss_to_parquet

        return convert_spss_to_parquet(src, out_dir)
    if lower.endswith(".tsv"):
        return convert_csv_to_parquet(src, out_dir, delimiter="\t")
    if lower.endswith(".json") or lower.endswith(".jsonl"):
        ds = rd.read_json(src)
        ds.write_parquet(out_dir)
        return out_dir
    if lower.endswith(".csv"):
        return convert_csv_to_parquet(src, out_dir)
    # suffix unknown: magic-byte sniff first (the reference's detection
    # chain checks stata/spss magics before the CSV dialect sniff,
    # materialize.py:191-214), then the delimiter sniff
    from datamart_ray.sources.stata import (
        convert_spss_to_parquet,
        convert_stata_to_parquet,
        sniff_magic,
    )

    kind = sniff_magic(src)
    if kind == "stata":
        return convert_stata_to_parquet(src, out_dir)
    if kind == "spss":
        return convert_spss_to_parquet(src, out_dir)
    with open(src, "r", errors="replace") as f:
        header = f.readline()
    delimiter = "\t" if header.count("\t") > header.count(",") else ","
    return convert_csv_to_parquet(src, out_dir, delimiter=delimiter)


def write_with_metadata(
    ds: rd.Dataset, out_dir: str, name: str, extra: dict | None = None
) -> str:
    """Parquet dir + ``datasetDoc.json`` sidecar (schema, row count,
    declared name) — the metadata-carrying sink shape of the reference's
    D3M writer."""
    ds = ds.materialize()  # small outputs only; schema+count need a pass
    ds.write_parquet(out_dir)
    schema = ds.schema()
    doc = {
        "about": {"datasetName": name},
        "nb_rows": ds.count(),
        "columns": [
            {"name": n, "type": str(t)}
            for n, t in zip(schema.names, schema.types)
        ],
        **(extra or {}),
    }
    atomic_write_json(os.path.join(out_dir, "datasetDoc.json"), doc)
    return out_dir


# ----------------------------------------------------------------------
# S14 completion: pivoted-temporal-table detection + generic unpivot
# (reference lib_core/datamart_core/materialize.py:237-261)
# ----------------------------------------------------------------------

_DATE_NAME_FORMATS = (
    "%Y-%m-%d", "%Y/%m/%d", "%m/%d/%Y", "%d/%m/%Y",
    "%Y-%m", "%Y%m%d", "%b %Y", "%B %Y", "%Y",
)


def _parse_date_name(name: str):
    """Pragmatic analog of the reference's dateutil parse_date for COLUMN
    NAMES: a fixed, deterministic format list (no locale / fuzzy
    parsing)."""
    from datetime import datetime

    s = name.strip()
    if not s:
        return None
    for fmt in _DATE_NAME_FORMATS:
        try:
            return datetime.strptime(s, fmt)
        except ValueError:
            continue
    try:
        return datetime.fromisoformat(s)
    except ValueError:
        return None


def detect_pivoted_columns(columns: list[str]) -> list[int] | None:
    """The reference's pivoted-table check (materialize.py:243-252): with
    ≥3 columns, if the columns whose NAME does not parse as a date number
    at most max(2, 20% of columns), the table is a wide date-pivot; the
    non-date column indices are the id columns to keep. Returns those
    indices, or None when not pivoted."""
    if len(columns) < 3:
        return None
    non_matches = [
        i for i, name in enumerate(columns)
        if _parse_date_name(name) is None
    ]
    if len(non_matches) <= max(2.0, 0.20 * len(columns)):
        return non_matches
    return None


def unpivot_wide_dates(
    ds: rd.Dataset, columns: list[str], except_indices: list[int]
) -> rd.Dataset:
    """Wide date-pivot → long (date, value) rows — the pivot_table
    converter (lib_materialize/datamart_materialize/pivot.py) as a
    vectorized per-batch melt (no shuffle)."""
    import numpy as np
    import pyarrow as pa

    keep = set(except_indices)
    id_cols = [c for i, c in enumerate(columns) if i in keep]
    date_cols = [c for i, c in enumerate(columns) if i not in keep]

    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        out: dict = {}
        for c in id_cols:
            v = t[c].to_numpy(zero_copy_only=False)
            out[c] = pa.array(np.tile(v, len(date_cols)))
        out["date"] = pa.array(
            np.repeat(np.array(date_cols, dtype=object), n),
            type=pa.string(),
        )
        vals = [
            t[c].to_numpy(zero_copy_only=False) for c in date_cols
        ]
        out["value"] = pa.array(np.concatenate(vals))
        return pa.table(out)

    return ds.map_batches(melt, batch_format="pyarrow")


def detect_and_convert_pivoted(src: str, out_dir: str) -> str:
    """detect_and_convert + the pivot check: converts, inspects the
    header, and melts wide-date tables to long form."""
    path = detect_and_convert(src, os.path.join(out_dir, "raw"))
    import pyarrow.dataset as pads

    columns = pads.dataset(path).schema.names
    non_matches = detect_pivoted_columns(columns)
    if non_matches is None:
        return path
    long_dir = os.path.join(out_dir, "long")
    unpivot_wide_dates(
        rd.read_parquet(path), columns, non_matches
    ).write_parquet(long_dir)
    return long_dir


# ----------------------------------------------------------------------
# S8 completion: D3M datasetDoc colTypes mapping
# (reference lib_materialize/datamart_materialize/d3m.py:14-100)
# ----------------------------------------------------------------------

D3M_STRUCTURAL_TYPE_MAP = {
    "boolean": "boolean",
    "integer": "integer",
    "float": "real",
    "numerical": "real",
    "text": "string",
}

D3M_DEFAULT_VERSION = "4.0.0"


def d3m_metadata(
    dataset_id: str,
    metadata: dict,
    version: str | None = None,
    need_d3mindex: bool = False,
) -> dict:
    """Profiled metadata → D3M datasetDoc dict, with the reference's
    colType precedence: semantic boolean > semantic categorical >
    text+datetime → dateTime > structural map > 'string'."""
    if not version:
        version = D3M_DEFAULT_VERSION
    elif version not in ("3.2.0", "4.0.0"):
        raise ValueError(f"Unknown D3M schema version {version!r}")
    columns = metadata["columns"]
    if need_d3mindex and not any(
        c["name"] == "d3mIndex" for c in columns
    ):
        columns = [
            {
                "name": "d3mIndex",
                "structural_type": "integer",
                "semantic_types": ["id"],
            }
        ] + list(columns)
    d3m_columns = []
    for i, column in enumerate(columns):
        sem = column.get("semantic_types", [])
        if "boolean" in sem:
            col_type = "boolean"
        elif "categorical" in sem:
            col_type = "categorical"
        elif (
            column["structural_type"] == "text" and "date_time" in sem
        ):
            col_type = "dateTime"
        else:
            col_type = D3M_STRUCTURAL_TYPE_MAP.get(
                column["structural_type"], "string"
            )
        role = "index" if column["name"] == "d3mIndex" else "attribute"
        d3m_columns.append(
            {
                "colIndex": i,
                "colName": column["name"],
                "colType": col_type,
                "role": [role],
            }
        )
    doc = {
        "about": {
            "datasetID": dataset_id,
            "datasetName": metadata.get("name", dataset_id),
            "license": metadata.get("license", "unknown"),
            "datasetSchemaVersion": version,
            "redacted": False,
            "datasetVersion": "1.0",
        },
        "dataResources": [
            {
                "resID": "learningData",
                # deviation: a parquet directory, not one CSV — the
                # resumable-output rule (one file per input shard)
                "resPath": "tables/",
                "resType": "table",
                "resFormat": (
                    {"application/parquet": ["parquet"]}
                    if version == "4.0.0"
                    else ["application/parquet"]
                ),
                "isCollection": False,
                "columns": d3m_columns,
            }
        ],
    }
    if "description" in metadata:
        doc["about"]["description"] = metadata["description"]
    if "size" in metadata:
        doc["about"]["approximateSize"] = "%d B" % metadata["size"]
    return doc


def write_d3m_dataset(
    ds: rd.Dataset,
    out_dir: str,
    dataset_id: str,
    profiled_columns: list[dict],
    version: str | None = None,
) -> str:
    """Write the D3M layout: tables/ parquet parts + datasetDoc.json with
    the ported colTypes mapping."""
    ds.write_parquet(os.path.join(out_dir, "tables"))
    doc = d3m_metadata(
        dataset_id, {"columns": profiled_columns}, version=version
    )
    atomic_write_json(os.path.join(out_dir, "datasetDoc.json"), doc)
    return out_dir
