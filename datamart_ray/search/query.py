"""Query-plan parsing (M11 — the analog of the reference's parse_query,
apiserver/apiserver/search/__init__.py:55-371).

The reference accepts a JSON query document with ``keywords`` (analyzed,
AND semantics via multi_match operator:'and'), ``source``/``types`` keyword
filters (terms filters, search/__init__.py:79-105), and variable
constraints. Our plan mirrors the shapes our engine serves:

    {
      "keywords": "hash join",          # analyzed text, AND by default
      "operator": "and" | "or",          # multi_match operator
      "filters": {"lang": "python"},    # keyword equality (terms filter)
      "size": 50,                        # TOP_K_SIZE default
    }
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

TOP_K_SIZE = 50  # reference: apiserver/apiserver/search/base.py:1
_VALID_OPERATORS = ("and", "or")


class QueryError(ValueError):
    """Malformed query document (the reference's ClientError analog)."""


@dataclass(frozen=True)
class QueryPlan:
    keywords: str
    operator: str = "and"
    filters: dict = field(default_factory=dict)
    size: int = TOP_K_SIZE
    variables: "VariableConstraints | None" = None


@dataclass(frozen=True)
class VariableConstraints:
    """Parsed reference-style variable constraints
    (parse_query_variables, apiserver/apiserver/search/__init__.py:
    163-344):

    - temporal_variable {start?, end?, granularity?} → an epoch-seconds
      window ([0, +inf) defaults; reference defaults the open end to
      utcnow — documented deviation: a deterministic engine has no wall
      clock, so an open end stays +inf) and a resolution filter;
    - geospatial_variable {latitude1/2, longitude1/2} → normalized
      bounding box (lon_min, lon_max, lat_min, lat_max);
    - tabular_variable {columns: [int]} → pivot column indices.
    """

    temporal_window: tuple[float, float] | None = None
    granularity: str | None = None
    bbox: tuple[float, float, float, float] | None = None
    tabular_columns: tuple[int, ...] | None = None


_GRANULARITIES = ("year", "month", "day", "hour", "minute", "second")


def _parse_epoch(value, field_name: str) -> float:
    from datetime import datetime, timezone

    if not isinstance(value, str):
        raise QueryError(f"invalid variable {field_name} date")
    try:
        dt = datetime.fromisoformat(value)
    except ValueError:
        raise QueryError(f"invalid {field_name} date format") from None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.timestamp()


def parse_variables(data) -> VariableConstraints:
    """Validate the reference's `variables` list into constraints."""
    if not data:
        return VariableConstraints()
    if not isinstance(data, list):
        raise QueryError("invalid variables")
    window = None
    granularity = None
    bbox = None
    tabular: list[int] = []
    for variable in data:
        if not isinstance(variable, dict):
            raise QueryError("invalid variable")
        if "type" not in variable:
            raise QueryError("variable is missing property 'type'")
        vtype = variable["type"]
        if vtype == "temporal_variable":
            start = (
                _parse_epoch(variable["start"], "start")
                if "start" in variable
                else 0.0
            )
            end = (
                _parse_epoch(variable["end"], "end")
                if "end" in variable
                else float("inf")
            )
            if start > end:
                raise QueryError("invalid date range (start > end)")
            if "start" in variable or "end" in variable:
                window = (start, end)
            if "granularity" in variable:
                g = variable["granularity"]
                if not isinstance(g, str) or g not in _GRANULARITIES:
                    raise QueryError("invalid temporal granularity")
                granularity = g
        elif vtype == "geospatial_variable":
            need = ("latitude1", "latitude2", "longitude1", "longitude2")
            if not all(k in variable for k in need):
                continue  # reference: incomplete bounds are skipped
            if not all(
                isinstance(variable[k], (int, float)) for k in need
            ):
                raise QueryError("invalid geospatial variable bounds")
            lon1 = min(variable["longitude1"], variable["longitude2"])
            lon2 = max(variable["longitude1"], variable["longitude2"])
            lat1 = min(variable["latitude1"], variable["latitude2"])
            lat2 = max(variable["latitude1"], variable["latitude2"])
            bbox = (float(lon1), float(lon2), float(lat1), float(lat2))
        elif vtype == "tabular_variable":
            for idx in variable.get("columns", ()):
                if not isinstance(idx, int):
                    raise QueryError("invalid tabular variable index")
                tabular.append(idx)
        else:
            raise QueryError(f"unknown variable type {vtype!r}")
    return VariableConstraints(
        temporal_window=window,
        granularity=granularity,
        bbox=bbox,
        tabular_columns=tuple(tabular) if tabular else None,
    )


def parse_query(doc: dict) -> QueryPlan:
    """Validate a query document into a QueryPlan (strict, like the
    reference's parse_query which rejects unknown/invalid fields)."""
    if not isinstance(doc, dict):
        raise QueryError("query must be a JSON object")
    unknown = set(doc) - {
        "keywords", "operator", "filters", "size", "variables",
    }
    if unknown:
        raise QueryError(f"unknown query fields: {sorted(unknown)}")
    keywords = doc.get("keywords", "")
    if isinstance(keywords, list):
        keywords = " ".join(str(k) for k in keywords)
    if not isinstance(keywords, str) or not keywords.strip():
        raise QueryError("'keywords' must be a non-empty string or list")
    operator = doc.get("operator", "and")
    if operator not in _VALID_OPERATORS:
        raise QueryError(f"'operator' must be one of {_VALID_OPERATORS}")
    filters = doc.get("filters", {})
    if not isinstance(filters, dict) or not all(
        isinstance(k, str) and isinstance(v, str) for k, v in filters.items()
    ):
        raise QueryError("'filters' must map column names to string values")
    size = doc.get("size", TOP_K_SIZE)
    if not isinstance(size, int) or size < 0 or size > 10_000:
        raise QueryError("'size' must be an int in [0, 10000]")
    variables = (
        parse_variables(doc["variables"]) if "variables" in doc else None
    )
    return QueryPlan(
        keywords=keywords,
        operator=operator,
        filters=dict(filters),
        size=size,
        variables=variables,
    )


def execute(engine, doc: dict) -> pa.Table:
    """Parse + run against a SearchEngine/DistributedSearchEngine."""
    plan = parse_query(doc)
    return engine.search(
        plan.keywords,
        k=plan.size,
        mode=plan.operator,
        filters=plan.filters or None,
    )
