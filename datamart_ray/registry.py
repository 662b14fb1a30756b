"""Named-stage registry — the user-extension surface (SURVEY.md §2.10).

The reference loads materializer/writer/converter plugins through
setuptools entry points (lib_materialize/__init__.py:96-127) and
discoverer subclasses (lib_core/datamart_core/discovery.py:36-278). The
Ray-native analog: stages (callables or actor classes) registered by
name, resolved at pipeline-build time; ``IndexConfig`` plays the role of
the declarative IndexSpec (the `elasticsearch.yml` analog).
"""

from __future__ import annotations

from collections.abc import Callable

_STAGES: dict[str, Callable] = {}


def register_stage(name: str, fn: Callable | None = None):
    """Register a stage under `name` (usable as a decorator)."""

    def _put(f: Callable) -> Callable:
        if name in _STAGES and _STAGES[name] is not f:
            raise ValueError(f"stage {name!r} already registered")
        _STAGES[name] = f
        return f

    return _put(fn) if fn is not None else _put


def get_stage(name: str) -> Callable:
    try:
        return _STAGES[name]
    except KeyError:
        raise KeyError(
            f"no stage {name!r}; registered: {sorted(_STAGES)}"
        ) from None


def list_stages() -> list[str]:
    return sorted(_STAGES)


def _register_builtins() -> None:
    from datamart_ray.pipelines import fulltext, relational
    from datamart_ray.pipelines.matching import nearest_point_join
    from datamart_ray.pipelines.profiler import profile_table
    from datamart_ray.stages.dedup import minhash_near_dups, simhash_dup_pairs
    from datamart_ray.stages.similarity import knn_cosine

    for name, fn in {
        **relational.QUERIES,
        **fulltext.QUERIES,
        "profile_table": profile_table,
        "nearest_point_join": nearest_point_join,
        "minhash_near_dups": minhash_near_dups,
        "simhash_dup_pairs": simhash_dup_pairs,
        "knn_cosine": knn_cosine,
    }.items():
        _STAGES.setdefault(name, fn)


_register_builtins()
