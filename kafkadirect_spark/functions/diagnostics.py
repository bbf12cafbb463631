"""Scale diagnostics — measure the data properties the repo's scale
machinery exists to survive, so the knobs (salt factors, shard
counts, skew hints) are SIZED from evidence instead of guessed.

Reference analogue: none (SURVEY.md §2 — Kafka Streams sizes state
stores, not shuffles); beyond-parity operations tooling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_report(df: DataFrame, key_col: str, parts: int = 200,
                top_k: int = 5) -> DataFrame:
    """Join/aggregation-key skew diagnosis: per-key count
    distribution (max, p50, p99 as TRUE order statistics), the
    heaviest keys, the share of the single hottest key, and the salt
    factor that would level it across ``parts`` shuffle partitions —
    ``ceil(max_key_rows · parts / total_rows)``, the number of
    sub-keys the hottest key needs so each lands near the average
    partition load (1 = no salting needed).  Run it BEFORE choosing
    between a plain keyed shuffle and the salted two-phase shapes
    (``skew_salted_join`` / ``topk_per_group``).

    Output is tall and typed: ``(stat, key, value)`` — scalar stats
    carry ``key = NULL``; the ``heavy_key`` rows carry the key
    (stringified) and its count, ordered (count DESC, key ASC).

    Scale ledger: ONE exchange over the data (the per-key count
    aggregate, map-side combined).  Everything downstream operates
    on the key-cardinality counts frame: the scalar stats are one
    aggregate row, the quantiles run the register-bounded
    histogram-narrowing selection (``sketch.exact_quantiles`` — no
    sort of the counts frame, which is itself billions of rows for
    high-cardinality keys at 100 TB), and the heavy-key list is a
    TakeOrdered.  Driver state: a handful of scalars.
    """
    if parts < 1:
        raise ValueError("parts must be >= 1")
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    from kafkadirect_spark.functions.sketch import exact_quantiles

    spark = df.sparkSession
    counts = (df.groupBy(F.col(key_col).cast("string").alias("__k"))
              .agg(F.count(F.lit(1)).alias("__cnt"))
              .persist())
    try:
        s = counts.agg(F.sum("__cnt").alias("total"),
                       F.count(F.lit(1)).alias("n_keys"),
                       F.max("__cnt").alias("mx")).collect()[0]
        total, n_keys, mx = int(s["total"]), int(s["n_keys"]), int(s["mx"])
        qs = {r["q_permille"]: int(r["value"]) for r in
              exact_quantiles(counts, "__cnt", [500, 990]).collect()}
        stats = [
            ("total_rows", None, total),
            ("distinct_keys", None, n_keys),
            ("max_key_rows", None, mx),
            ("p50_key_rows", None, qs[500]),
            ("p99_key_rows", None, qs[990]),
            ("top1_share_ppm", None, 1_000_000 * mx // total),
            ("suggested_salt", None, (mx * parts + total - 1) // total),
        ]
        head = spark.createDataFrame(
            stats, "stat string, key string, value long")
        top = (counts
               .orderBy(F.col("__cnt").desc(), F.col("__k").asc())
               .limit(top_k)
               .select(F.lit("heavy_key").alias("stat"),
                       F.col("__k").alias("key"),
                       F.col("__cnt").cast("long").alias("value")))
        # the TakeOrdered top is tiny; materialize it so the report
        # survives the finally-unpersist below
        top_rows = top.collect()
        return head.unionByName(spark.createDataFrame(
            top_rows, "stat string, key string, value long"))
    finally:
        counts.unpersist()


def skew_report_sql(table: str, key_expr: str, parts: int = 200,
                    top_k: int = 5) -> str:
    """DuckDB replay of ``skew_report``.  The quantile rank is the
    same cover as ``exact_quantiles``: ``min v : rank(v) ≥
    ceil(q·n/1000)``; heavy-key order pins NULLS FIRST to match
    Spark's ASC default."""
    return f"""
    WITH c AS (
      SELECT CAST({key_expr} AS VARCHAR) AS k, COUNT(*)::BIGINT AS cnt
      FROM {table} GROUP BY 1),
    s AS (SELECT SUM(cnt)::BIGINT AS total, COUNT(*)::BIGINT AS n_keys,
                 MAX(cnt)::BIGINT AS mx FROM c),
    r AS (SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt) AS rk,
                 COUNT(*) OVER () AS n FROM c),
    q AS (SELECT
      MIN(CASE WHEN rk >= (500 * n + 999) // 1000 THEN cnt END) AS p50,
      MIN(CASE WHEN rk >= (990 * n + 999) // 1000 THEN cnt END) AS p99
      FROM r)
    SELECT * FROM (
      SELECT 'total_rows' AS stat, NULL AS key, total AS value FROM s
      UNION ALL SELECT 'distinct_keys', NULL, n_keys FROM s
      UNION ALL SELECT 'max_key_rows', NULL, mx FROM s
      UNION ALL SELECT 'p50_key_rows', NULL, p50 FROM q
      UNION ALL SELECT 'p99_key_rows', NULL, p99 FROM q
      UNION ALL SELECT 'top1_share_ppm', NULL,
                       1000000 * mx // total FROM s
      UNION ALL SELECT 'suggested_salt', NULL,
                       (mx * {parts} + total - 1) // total FROM s
      UNION ALL SELECT * FROM (
        SELECT 'heavy_key', k, cnt FROM c
        ORDER BY cnt DESC, k ASC NULLS FIRST LIMIT {top_k}))"""
