"""Skew mitigation for hot keys.

The reference shards hot keys only implicitly (partition count); at
100 TB a single hot join/grouping key overwhelms one task.  Two
complementary tools:

- AQE skew-join splitting is ON by default in session.py — it splits
  oversized *shuffle partitions* at runtime, which handles moderately
  skewed sort-merge joins with zero code changes.
- ``salted_join`` below handles the pathological case AQE can't: one
  key so hot its rows exceed a single executor even after splitting —
  the classic replicate-the-small-side salt.  ``salted_agg`` is the
  two-stage aggregation equivalent for high-cardinality-value hot
  groups (only needed for non-algebraic aggregates; sums/counts
  already get map-side partials from Catalyst).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    small_key: str | None = None,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has hot keys: big side gets a random
    salt in [0, salt); small side is replicated ``salt`` times with
    every salt value; the join key becomes (key, salt) so each hot
    key's rows spread over ``salt`` tasks.

    Cost: small side ×salt (bounded — it's the dimension side).  The
    salt column is internal and dropped from the output.

    Restricted to join types where replicating the small side is
    sound: right/full-outer would emit each UNMATCHED small-side row
    once per salt value (×salt duplicates).
    """
    allowed = ("inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "left_anti", "leftanti", "cross")
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {allowed}; {how!r} would duplicate "
            "unmatched small-side rows once per salt value")
    small_key = small_key or key
    b = big.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    if key == small_key:
        joined = b.join(s, on=[key, "__salt"], how=how)
    else:
        joined = b.join(
            s, (F.col(key) == F.col(small_key)) & (b["__salt"] == s["__salt"]),
            how)
    return joined.drop("__salt")


def salted_agg(
    df: DataFrame,
    key: str,
    agg_exprs: list[Column],
    merge_exprs: list[Column],
    salt: int = 16,
) -> DataFrame:
    """Two-stage aggregation for hot groups: stage 1 aggregates
    (key, salt) partials, stage 2 merges partials per key.  Use when
    the per-group state is big (e.g. collect_set on a hot key) —
    algebraic aggregates (sum/count/min/max/avg) don't need this,
    Catalyst's partial aggregation already two-stages them.

    ``agg_exprs`` compute the salted partials; ``merge_exprs`` combine
    partial columns (referenced by their aliases) into the final
    per-key result.
    """
    partial = (
        df.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
        .groupBy(key, "__salt")
        .agg(*agg_exprs)
    )
    return partial.groupBy(key).agg(*merge_exprs)
