"""Query/oracle registry.

Every operator key from SURVEY.md §2 registers itself here via the
``@query`` decorator. ``__spark_entry__.py`` re-exports these dicts to the
driver harness, and the test suite iterates them to locally verify each key
against DuckDB before it is ever declared.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; optionally attach a DuckDB oracle SQL.

    Keys with ``oracle`` get the driver's full hash-match check; keys
    without get the weaker rows-only check (reserved for ops DuckDB cannot
    express — SURVEY.md §2 marks which is which).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query key: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registration side-effects run."""
    from engine import (  # noqa: F401
        ann_clustered,
        cdc,
        functions,
        io,
        llm_ext,
        llm_ops,
        pipeline_ext,
        relational,
        relational_ext,
        similarity,
        streaming,
        text_ext,
        tpch_ext,
        udf,
    )
