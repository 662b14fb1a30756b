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
    if lower.endswith(".tsv"):
        return convert_csv_to_parquet(src, out_dir, delimiter="\t")
    if lower.endswith(".json") or lower.endswith(".jsonl"):
        ds = rd.read_json(src)
        ds.write_parquet(out_dir)
        return out_dir
    if lower.endswith(".csv"):
        return convert_csv_to_parquet(src, out_dir)
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
