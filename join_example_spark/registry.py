"""The declared-query registry — the contract surface of the engine.

Every operator from SURVEY.md §2 is registered here as a
``(spark, sf_dir) -> DataFrame`` callable plus, where DuckDB can express the
same computation, an ANSI-SQL oracle string. ``__spark_entry__.py`` exposes
this registry to the driver.

Determinism conventions (SURVEY.md §5.3, extended):

- Alias every computed column identically on both sides.
- **Decimal-sum bridge**: never emit a raw floating SUM/AVG. Both sides
  compute ``CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE)`` — decimal
  addition is exact and order-independent, so the result is bit-identical
  regardless of partition/summation order, with no rounding-boundary risk.
  AVG is expressed as exact-decimal-sum / COUNT (one IEEE division of
  identical operands on both sides).
- Integral computed outputs are cast to BIGINT on both sides (Spark and
  DuckDB disagree on the natural width of e.g. ``length()``/``floor()``).
- Every LIMIT/top-k sits under a total order (unique-key tiebreak); every
  ``row_number`` tie is broken by a unique column.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # None => rows-only check (R in SURVEY §2)
    note: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


#: name -> spec, in registration order.
REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    note: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a declared query (optionally with its oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, note=note, tags=tags)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: fills REGISTRY) and return it."""
    # Imports are localized so `import join_example_spark` stays cheap.
    from join_example_spark.queries import (  # noqa: F401
        aggregates,
        analytics_ext,
        composite,
        filters,
        functions_scalar,
        joins,
        llm_dedup,
        llm_similarity,
        llm_text,
        multimodal_q,
        scans,
        setops,
        sorts,
        streaming_equiv,
        windows,
    )

    return REGISTRY
