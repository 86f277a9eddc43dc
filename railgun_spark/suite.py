"""Query suite registry — the driver-facing catalog of implemented operators.

Each entry pairs a Spark implementation (``(spark, sf_dir) -> DataFrame``)
with an equivalent ANSI-SQL oracle string for DuckDB, per the driver
contract in ``__spark_entry__.py``. Operator modules register themselves at
import time; ``railgun_spark.suite.REGISTRY`` is the single source of truth.

Cross-engine determinism rules (so value-hashes match):
- Alias every computed column identically in Spark and SQL.
- Raw stored doubles compare exactly; arithmetic-derived floats are wrapped
  in ``round(x, n)`` with the SAME expression shape on both sides.
- Transcendental-function outputs (tile math) are floor()ed far from integer
  boundaries by construction of the derived inputs.
- Shared cross-engine 60-bit hash: Spark ``conv(substr(md5(x),1,15),16,10)``
  equals DuckDB ``('0x' || substr(md5(x),1,15))::UBIGINT`` — the basis for
  exact-dedup, MinHash and fingerprint parity.
- Top-k queries order by (rounded measure, unique key) so rank membership is
  deterministic in both engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator: register a suite query."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Imports are here (not module top) to avoid circular imports.
    from railgun_spark.operators import (  # noqa: F401
        dedup,
        dfl_queries,
        multimodal,
        relational,
        relational2,
        similarity,
        text,
    )
    from railgun_spark.geo import tiles  # noqa: F401
    from railgun_spark.streaming import windows  # noqa: F401

    _LOADED = True
