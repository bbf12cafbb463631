"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual engine lives in ``kafkadirect_spark/``; the named queries
and their oracles in ``kafkadirect_spark/plans/``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Yahoo-benchmark shape if present, else the
    pricing-summary aggregate) on /root/testdata/sf0.001."""
    from kafkadirect_spark.plans import QUERIES

    flagship = QUERIES.get("yahoo_pipeline", QUERIES["pricing_summary"])
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from kafkadirect_spark.plans import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL oracle per query (omitted for
    non-SQL-expressible ops → driver records a rows-only check)."""
    from kafkadirect_spark.plans import ORACLE_SQL

    return dict(ORACLE_SQL)
