"""String-typed (untyped-input) profiling — the true port of the
reference's structural-type regex vote (M3/M4 + A11's unclean half,
lib_profiler/datamart_profiler/profile_types.py:58-137,140-210):

- every value is classified by an EXCLUSIVE regex chain
  (empty → int → float → WKT point → other point → polygon → free text),
  plus an independent boolean check;
- structural type = first class whose count clears the threshold
  ``max(1, (1-2%) * (num_total - empty))`` (MAX_UNCLEAN tolerance,
  profile_types.py:60,148);
- unclean_values_ratio per structural type (profile_types.py:92-109);
- semantic types: BOOLEAN (bool count ≥ threshold), TEXT vs CATEGORICAL
  for structural text (distinct ≤ 10% of non-empty,
  MAX_CATEGORICAL_RATIO, profile_types.py:63,196-218), ID-by-name for
  integers (profile_types.py:221-229).

Documented deviation: the reference's ``geo_combined`` pattern (unicode
category classes over geocoded names) is omitted — no fixture data and no
geo database in this environment.

The untyped input is DERIVED deterministically from `customer` (casts /
printf / CASE over typed columns), identically in the Ray pipeline and
the DuckDB twin, so the vote runs over byte-identical strings on both
sides. Ray shape: one streaming map_batches pass emitting per-batch count
partials (tiny rows), plus a hash-reduced distinct shuffle — no value
payloads ever reach the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Sum

from datamart_ray.util import ensure_fast_shuffle, round_away

MAX_UNCLEAN = 0.02  # reference profile_types.py:60
MAX_CATEGORICAL_RATIO = 0.10  # reference profile_types.py:63

# anchored RE2 patterns (identical strings passed to Arrow and DuckDB)
RE_INT = r"^[+-]?[0-9]+(\.0*)?$"  # reference profile_types.py:12-16
RE_FLOAT = r"^[+-]?(([0-9]+\.[0-9]*)|(\.[0-9]+))([Ee][0-9]+)?$"
RE_WKT_POINT = (
    r"^POINT ?\(-?[0-9]{1,3}\.[0-9]{1,15}"
    r" -?[0-9]{1,3}\.[0-9]{1,15}\)$"
)
RE_OTHER_POINT = (
    r"^POINT ?\(-?[0-9]{1,3}\.[0-9]{1,15}"
    r", ?-?[0-9]{1,3}\.[0-9]{1,15}\)$"
)
RE_WKT_POLYGON = r"^POLYGON ?\((\([0-9 .]+\), ?)*\([0-9 .]+\)\)$"
BOOL_VALUES = ("0", "1", "true", "false", "y", "n", "yes", "no")

COUNT_FIELDS = (
    "n_total", "n_empty", "n_int", "n_float", "n_point",
    "n_other_point", "n_polygon", "n_text", "n_bool",
)


def _derive_untyped_np(t: pa.Table) -> dict[str, np.ndarray]:
    """The untyped string columns, derived from typed `customer` columns.
    Formats are printf-compatible so the DuckDB twin produces the same
    bytes."""
    keys = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    bal = t["c_acctbal"].to_numpy(zero_copy_only=False).astype(np.float64)
    seg = t["c_mktsegment"].to_numpy(zero_copy_only=False)
    key_s = keys.astype(str).astype(object)
    x = (keys % 360 - 180 + 0.5).astype(np.float64)
    y = (keys % 180 - 90 + 0.25).astype(np.float64)
    return {
        "cust_id": key_s,
        "acctbal_str": np.char.mod("%.2f", bal).astype(object),
        "mixed_int": np.where(keys % 97 == 0, "n/a", key_s),
        "flag": np.where(keys % 2 == 0, "yes", "no").astype(object),
        "location": np.char.add(
            np.char.add(
                np.char.add("POINT (", np.char.mod("%.4f", x)),
                np.char.add(" ", np.char.mod("%.4f", y)),
            ),
            ")",
        ).astype(object),
        "note": np.char.add(
            seg.astype(str), " segment member in good standing"
        ).astype(object),
        "sparse": np.where(keys % 5 == 0, "", key_s),
    }


UNTYPED_COLUMNS = (
    "cust_id", "acctbal_str", "mixed_int", "flag",
    "location", "note", "sparse",
)

# DuckDB expressions producing the same derived strings
UNTYPED_SQL_EXPRS = {
    "cust_id": "CAST(c_custkey AS VARCHAR)",
    "acctbal_str": "printf('%.2f', c_acctbal)",
    "mixed_int": (
        "CASE WHEN c_custkey % 97 = 0 THEN 'n/a'"
        " ELSE CAST(c_custkey AS VARCHAR) END"
    ),
    "flag": "CASE WHEN c_custkey % 2 = 0 THEN 'yes' ELSE 'no' END",
    "location": (
        "printf('POINT (%.4f %.4f)',"
        " (c_custkey % 360 - 180 + 0.5)::DOUBLE,"
        " (c_custkey % 180 - 90 + 0.25)::DOUBLE)"
    ),
    "note": "c_mktsegment || ' segment member in good standing'",
    "sparse": (
        "CASE WHEN c_custkey % 5 = 0 THEN ''"
        " ELSE CAST(c_custkey AS VARCHAR) END"
    ),
}


def _count_batch(arr: pa.Array) -> dict[str, int]:
    """Exclusive regex-chain counts for one string array (vectorized
    Arrow RE2 kernels, mirrors regular_exp_count's if/elif)."""
    s = pc.fill_null(arr, "")
    empty = pc.equal(s, "").to_numpy(zero_copy_only=False)
    live = ~empty

    def m(pattern):
        return (
            pc.match_substring_regex(s, pattern).to_numpy(
                zero_copy_only=False
            )
            & live
        )

    is_int = m(RE_INT)
    rest = live & ~is_int
    is_float = m(RE_FLOAT) & rest
    rest &= ~is_float
    is_point = m(RE_WKT_POINT) & rest
    rest &= ~is_point
    is_other = m(RE_OTHER_POINT) & rest
    rest &= ~is_other
    is_poly = m(RE_WKT_POLYGON) & rest
    rest &= ~is_poly
    n_ws = pc.count_substring_regex(s, r"\s+").to_numpy(
        zero_copy_only=False
    )
    is_text = rest & (n_ws >= 3)
    is_bool = (
        pc.is_in(
            pc.utf8_lower(s), value_set=pa.array(sorted(BOOL_VALUES))
        ).to_numpy(zero_copy_only=False)
        & live
    )
    return {
        "n_total": int(len(s)),
        "n_empty": int(empty.sum()),
        "n_int": int(is_int.sum()),
        "n_float": int(is_float.sum()),
        "n_point": int(is_point.sum()),
        "n_other_point": int(is_other.sum()),
        "n_polygon": int(is_poly.sum()),
        "n_text": int(is_text.sum()),
        "n_bool": int(is_bool.sum()),
    }


def profile_untyped(
    sf_dir: str, manual_annotations: dict | None = None
) -> pd.DataFrame:
    """Structural/semantic typing of the derived untyped columns.
    Output: (column, structural_type, semantic_types, n_distinct,
    missing_ratio, unclean_ratio).

    `manual_annotations` mirrors the reference's user-supplied override
    metadata (lib_profiler core.py:269-281; profile_types.py:150-184):
    ``{"columns": [{"name": ..., "structural_type": ...,
    "semantic_types": [...]}]}``. An annotated column SKIPS the regex
    vote — the manual structural type is taken verbatim, the unclean
    ratio is computed AGAINST that type from the same distributed regex
    counts, and the semantic list is the manual one (with the boolean
    unclean recompute of profile_types.py:168-171). The distributed
    counting passes are identical either way; overrides only change the
    driver-side assembly of the metadata-sized count rows."""
    ensure_fast_shuffle()
    manual = {}
    if manual_annotations:
        manual = {
            c["name"]: c
            for c in manual_annotations.get("columns", [])
        }
    src = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_acctbal", "c_mktsegment"],
    )

    def partials(t: pa.Table) -> pa.Table:
        derived = _derive_untyped_np(t)
        rows = {k: [] for k in ("column", *COUNT_FIELDS)}
        for name in UNTYPED_COLUMNS:
            c = _count_batch(pa.array(derived[name], type=pa.string()))
            rows["column"].append(name)
            for f in COUNT_FIELDS:
                rows[f].append(c[f])
        return pa.table(rows)

    counts = (
        src.map_batches(partials, batch_format="pyarrow")
        .groupby("column")
        .aggregate(*[Sum(f, alias_name=f) for f in COUNT_FIELDS])
        .to_pandas()
        .set_index("column")
    )

    def distinct_rows(t: pa.Table) -> pa.Table:
        derived = _derive_untyped_np(t)
        out_c, out_h = [], []
        for name in UNTYPED_COLUMNS:
            vals = derived[name]
            vals = vals[vals != ""]  # reference: set(e for e in a if e)
            h = np.unique(pd.util.hash_array(vals))
            out_c.append(np.full(h.size, name, dtype=object))
            out_h.append(h.view(np.int64))
        return pa.table(
            {
                "column": pa.array(
                    np.concatenate(out_c), type=pa.string()
                ),
                "h": pa.array(np.concatenate(out_h)),
            }
        )

    duniq = (
        src.map_batches(distinct_rows, batch_format="pyarrow")
        .groupby(["column", "h"])
        .aggregate(Count(alias_name="_n"))
        .groupby("column")
        .aggregate(Count(alias_name="n_distinct"))
        .to_pandas()
        .set_index("column")
    )

    rows = []
    for name in UNTYPED_COLUMNS:
        c = counts.loc[name]
        n = int(c["n_total"])
        empty = int(c["n_empty"])
        n_point_all = int(c["n_point"] + c["n_other_point"])
        th = max(1.0, (1.0 - MAX_UNCLEAN) * (n - empty))
        nd = int(duniq.loc[name, "n_distinct"]) if name in duniq.index else 0
        if name in manual:
            # manual annotation replaces the vote (profile_types.py:
            # 150-152); unclean is computed against the MANUAL type
            stype = manual[name]["structural_type"]
        # structural vote (identify_structural_type)
        elif empty == n:
            stype = "missing"
        elif c["n_int"] >= th:
            stype = "integer"
        elif c["n_int"] + c["n_float"] >= th:
            stype = "float"
        elif (
            c["n_point"] >= th or c["n_other_point"] >= th
        ):
            stype = "point"
        elif c["n_polygon"] >= th:
            stype = "polygon"
        else:
            stype = "text"
        # unclean ratio (unclean_values_ratio)
        unclean = np.nan
        if stype == "integer":
            unclean = (n - empty - c["n_int"]) / n
        elif stype == "float":
            unclean = (n - empty - c["n_int"] - c["n_float"]) / n
        elif stype == "point":
            unclean = (n - empty - c["n_point"]) / n
        elif stype == "polygon":
            unclean = (n - empty - c["n_polygon"]) / n
        if name in manual:
            # semantic types come from the manual list verbatim
            # (profile_types.py:163-165), with the boolean unclean
            # recompute of :168-171
            semantics = list(manual[name].get("semantic_types", []))
            if "boolean" in semantics:
                unclean = (n - empty - c["n_bool"]) / n
        else:
            # semantic types (identify_types, no geo_data)
            semantics = []
            if c["n_bool"] >= th:
                semantics.append("boolean")
                unclean = (n - empty - c["n_bool"]) / n
            if stype == "text":
                if c["n_text"] >= th:
                    semantics.append("free_text")
                elif (
                    nd <= MAX_CATEGORICAL_RATIO * (n - empty)
                    or "boolean" in semantics
                ):
                    semantics.append("categorical")
            elif stype == "integer" and (
                name.lower().startswith(("id", "identifier", "index"))
                or name.lower().endswith(("id", "identifier", "index"))
            ):
                semantics.append("id")
        missing = empty / n if (stype != "missing" and empty > 0) else np.nan
        rows.append(
            {
                "column": name,
                "structural_type": stype,
                "semantic_types": ",".join(sorted(semantics)),
                "n_distinct": nd,
                "missing_ratio": missing,
                "unclean_ratio": unclean,
            }
        )
    out = pd.DataFrame(rows)
    out["n_distinct"] = out["n_distinct"].astype("int64")
    out["missing_ratio"] = round_away(out["missing_ratio"], 4)
    out["unclean_ratio"] = round_away(out["unclean_ratio"], 4)
    return out.sort_values("column").reset_index(drop=True)


def profile_untyped_sql() -> str:
    """DuckDB twin: same derived strings, same exclusive regex chain,
    same vote and ratios."""
    per_col = []
    for name in UNTYPED_COLUMNS:
        expr = UNTYPED_SQL_EXPRS[name]
        per_col.append(
            f"SELECT '{name}' AS \"column\", {expr} AS v FROM customer"
        )
    vals = " UNION ALL ".join(per_col)
    bools = ", ".join(f"'{b}'" for b in sorted(BOOL_VALUES))
    return f"""
        WITH vals AS ({vals}),
        cls AS (
            SELECT "column",
                   (v IS NULL OR v = '') AS is_empty,
                   NOT (v IS NULL OR v = '')
                       AND regexp_full_match(v, '{RE_INT[1:-1]}') AS is_int,
                   NOT (v IS NULL OR v = '')
                       AND NOT regexp_full_match(v, '{RE_INT[1:-1]}')
                       AND regexp_full_match(v, '{RE_FLOAT[1:-1]}')
                       AS is_float,
                   NOT (v IS NULL OR v = '')
                       AND NOT regexp_full_match(v, '{RE_INT[1:-1]}')
                       AND NOT regexp_full_match(v, '{RE_FLOAT[1:-1]}')
                       AND regexp_full_match(v, '{RE_WKT_POINT[1:-1]}')
                       AS is_point,
                   NOT (v IS NULL OR v = '')
                       AND NOT regexp_full_match(v, '{RE_INT[1:-1]}')
                       AND NOT regexp_full_match(v, '{RE_FLOAT[1:-1]}')
                       AND NOT regexp_full_match(v, '{RE_WKT_POINT[1:-1]}')
                       AND regexp_full_match(v, '{RE_OTHER_POINT[1:-1]}')
                       AS is_other_point,
                   NOT (v IS NULL OR v = '')
                       AND NOT regexp_full_match(v, '{RE_INT[1:-1]}')
                       AND NOT regexp_full_match(v, '{RE_FLOAT[1:-1]}')
                       AND NOT regexp_full_match(v, '{RE_WKT_POINT[1:-1]}')
                       AND NOT regexp_full_match(v, '{RE_OTHER_POINT[1:-1]}')
                       AND regexp_full_match(v, '{RE_WKT_POLYGON[1:-1]}')
                       AS is_polygon,
                   NOT (v IS NULL OR v = '')
                       AND lower(v) IN ({bools}) AS is_bool,
                   len(regexp_extract_all(coalesce(v, ''), '\\s+')) >= 3
                       AS has_ws3,
                   v
            FROM vals
        ),
        counts AS (
            SELECT "column",
                   count(*) AS n_total,
                   sum(is_empty::INT) AS n_empty,
                   sum(is_int::INT) AS n_int,
                   sum(is_float::INT) AS n_float,
                   sum(is_point::INT) AS n_point,
                   sum(is_other_point::INT) AS n_other_point,
                   sum(is_polygon::INT) AS n_polygon,
                   sum((NOT is_empty AND NOT is_int AND NOT is_float
                        AND NOT is_point AND NOT is_other_point
                        AND NOT is_polygon AND has_ws3)::INT) AS n_text,
                   sum(is_bool::INT) AS n_bool,
                   count(DISTINCT CASE WHEN NOT is_empty THEN v END)
                       AS n_distinct
            FROM cls GROUP BY 1
        ),
        typed AS (
            SELECT *,
                   greatest(1.0,
                            (1.0 - {MAX_UNCLEAN}) * (n_total - n_empty))
                       AS th,
                   CASE WHEN n_empty = n_total THEN 'missing'
                        WHEN n_int >= greatest(1.0, (1.0 - {MAX_UNCLEAN})
                            * (n_total - n_empty)) THEN 'integer'
                        WHEN n_int + n_float >= greatest(1.0,
                            (1.0 - {MAX_UNCLEAN}) * (n_total - n_empty))
                            THEN 'float'
                        WHEN n_point >= greatest(1.0, (1.0 - {MAX_UNCLEAN})
                            * (n_total - n_empty))
                          OR n_other_point >= greatest(1.0,
                            (1.0 - {MAX_UNCLEAN}) * (n_total - n_empty))
                            THEN 'point'
                        WHEN n_polygon >= greatest(1.0,
                            (1.0 - {MAX_UNCLEAN}) * (n_total - n_empty))
                            THEN 'polygon'
                        ELSE 'text' END AS structural_type
            FROM counts
        )
        SELECT "column",
               structural_type,
               coalesce(array_to_string(list_sort(
                   [s FOR s IN [
                       CASE WHEN n_bool >= th THEN 'boolean' END,
                       CASE WHEN structural_type = 'text'
                                 AND n_text >= th THEN 'free_text' END,
                       CASE WHEN structural_type = 'text'
                                 AND n_text < th
                                 AND (n_distinct <= {MAX_CATEGORICAL_RATIO}
                                      * (n_total - n_empty)
                                      OR n_bool >= th)
                            THEN 'categorical' END,
                       CASE WHEN structural_type = 'integer'
                                 AND (lower("column") LIKE 'id%'
                                      OR lower("column") LIKE '%id'
                                      OR lower("column") LIKE 'identifier%'
                                      OR lower("column") LIKE '%identifier'
                                      OR lower("column") LIKE 'index%'
                                      OR lower("column") LIKE '%index')
                            THEN 'id' END
                   ] IF s IS NOT NULL]), ','), '') AS semantic_types,
               n_distinct,
               ROUND(CASE WHEN structural_type != 'missing' AND n_empty > 0
                          THEN n_empty::DOUBLE / n_total END, 4)
                   AS missing_ratio,
               ROUND(CASE
                   WHEN n_bool >= th
                        THEN (n_total - n_empty - n_bool)::DOUBLE / n_total
                   WHEN structural_type = 'integer'
                        THEN (n_total - n_empty - n_int)::DOUBLE / n_total
                   WHEN structural_type = 'float'
                        THEN (n_total - n_empty - n_int - n_float)::DOUBLE
                             / n_total
                   WHEN structural_type = 'point'
                        THEN (n_total - n_empty - n_point)::DOUBLE / n_total
                   WHEN structural_type = 'polygon'
                        THEN (n_total - n_empty - n_polygon)::DOUBLE
                             / n_total
                   END, 4) AS unclean_ratio
        FROM typed
        ORDER BY "column"
    """
