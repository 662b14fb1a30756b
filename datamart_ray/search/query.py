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


def parse_query(doc: dict) -> QueryPlan:
    """Validate a query document into a QueryPlan (strict, like the
    reference's parse_query which rejects unknown/invalid fields)."""
    if not isinstance(doc, dict):
        raise QueryError("query must be a JSON object")
    unknown = set(doc) - {"keywords", "operator", "filters", "size"}
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
    return QueryPlan(
        keywords=keywords, operator=operator, filters=dict(filters), size=size
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
