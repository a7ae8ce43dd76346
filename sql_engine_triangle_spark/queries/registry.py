"""Central query registry.

Each registered query is the engine-facade form of one operator (or
operator pipeline) from SURVEY.md §2. Registration carries:

- ``fn(spark, sf_dir) -> DataFrame`` — the DataFrame-API construction
  (the engine's native form; Catalyst optimizes it).
- ``oracle`` — equivalent ANSI SQL that DuckDB runs over the same
  Parquet for differential testing (SURVEY.md §5), or ``None`` for
  genuinely non-SQL-expressible ops (sketches with engine-specific
  hash functions, streaming state, stubs) — those get rows-only checks.
- ``tags`` — SURVEY.md §2 operator ids covered (e.g. "A5", "W1").

Column-name discipline: every computed column is aliased identically
in the DataFrame code and the oracle SQL; result ordering is made
deterministic (explicit tie-break keys) wherever a LIMIT exists.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, RegisteredQuery] = {}


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query builder to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = RegisteredQuery(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "")
        )
        return fn

    return deco


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent).
    Imported lazily to avoid circular imports at package init; import
    errors propagate — a broken module must fail loudly, not silently
    shrink the driver contract."""
    from sql_engine_triangle_spark.queries import (  # noqa: F401
        aux_ops,
        core,
        ingest_ops,
        llm_ops,
        streaming_ops,
        tpch_like,
    )


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: q.fn for name, q in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: q.oracle for name, q in _REGISTRY.items() if q.oracle is not None}


def get(name: str) -> RegisteredQuery:
    _ensure_loaded()
    return _REGISTRY[name]


def names() -> list[str]:
    _ensure_loaded()
    return sorted(_REGISTRY)
