"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real catalog lives in
``dea05_e2e_kafka_streaming_pipeline_spark/queries/``; this module is a
thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dea05_e2e_kafka_streaming_pipeline_spark import queries as _registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (daily sales by region) on sf0.001."""
    return _registry.queries()["daily_sales_by_region"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for
    non-SQL-expressible operators → driver runs rows-only check)."""
    return _registry.oracles()


def audited_by() -> dict[str, tuple[str, ...]]:
    """For each rows-only (no-oracle) query, the companion queries
    whose green oracle checks pin it (md5-family mirrors, zero-row
    violation audits, hash-matched deterministic twins). The sweep
    embeds these in each rows-only CORRECTNESS record and fails the
    record if a named companion ran without hash-matching."""
    return _registry.audited_by()
