"""Bucketed range join — point-in-interval without a nested loop.

Spark's optimizer turns a bare inequality join (``p.v >= i.lo AND
p.v < i.hi``) into a BroadcastNestedLoopJoin when one side is small
and a full cartesian otherwise — both scale-killers when the interval
side outgrows a broadcast: BNLJ evaluates every point against every
interval.  The standard fix (used by every warehouse's range-join
optimization, e.g. the published Databricks range-join binning and
the interval-join strategy in Flink) is to quantize the value domain
into fixed-width buckets:

- each interval ``[lo, hi)`` is exploded to the buckets it overlaps
  (``floor(lo/W) .. floor((hi-1)/W)`` for integer bounds — at most
  ``ceil(span/W) + 1`` rows per interval);
- each point maps to exactly ONE bucket ``floor(v/W)``;
- an ordinary shuffled equi-join on the bucket id meets every point
  with every interval that could contain it, and the exact predicate
  re-checks the containment.

Both sides can be arbitrarily large: the join is hash-partitioned on
bucket ids, never replicated, never nested-loop.  Choose ``W`` near
the median interval span: the interval side's row multiplier stays
~2× while each point meets only the intervals sharing its bucket.
Buckets of a pathologically hot value range are ordinary skewed join
keys — AQE skew splitting and ``operators/skew.py`` apply unchanged.

Reference analogue: none — Kafka Streams joins are key-equality only
(KStreamImplJoin windows time, not value ranges; SURVEY.md §2.3), so
this is beyond-parity machinery for the analytics surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _floor_div(expr_sql: str, w: int) -> Column:
    """Exact integer floor division of a BIGINT SQL expression by w.

    Spark's ``/`` on longs is DOUBLE division — above 2^53 the
    interval-side and point-side bucket ids could round to DIFFERENT
    buckets and silently drop matches.  ``pmod`` makes the numerator
    the exact largest multiple of ``w`` that is <= the value (for any
    sign), and integral ``div`` of an exact multiple equals floor —
    no float touches the bucket id.
    """
    return F.expr(f"(({expr_sql}) - pmod(({expr_sql}), {w})) div ({w})")


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    how: str = "inner",
    max_span_buckets: int = 1_000_000,
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point < hi`` (half-open, integer bounds).

    ``point_col``/``lo_col``/``hi_col`` must be integral (cast money
    to cents first — float bucket boundaries would disagree between
    engines).  Output columns: all point columns, then all interval
    columns (names must not collide).  ``how`` supports ``inner`` and
    ``left`` (unmatched points survive with null interval columns).

    Empty intervals (``hi <= lo``) match nothing, as the half-open
    semantics demand: their bucket explode still emits rows, but the
    exact containment predicate rejects every point.

    ``max_span_buckets`` bounds the per-interval explode: an interval
    covering more buckets than this (e.g. an open-ended sentinel
    ``hi``) raises a clear error at runtime instead of blowing up the
    interval side or tripping Spark's sequence element limit mid-job.
    Widen ``bucket_width`` (or raise the cap) for legitimately huge
    spans.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    if max_span_buckets <= 0:
        raise ValueError("max_span_buckets must be positive")
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported join type {how!r}")
    dup = set(points.columns) & set(intervals.columns)
    if dup:
        raise ValueError(f"column collision between sides: {sorted(dup)}")

    lo, hi = F.col(lo_col).cast("long"), F.col(hi_col).cast("long")
    w = bucket_width
    lo_sql = f"CAST(`{lo_col}` AS BIGINT)"
    last_sql = f"greatest(CAST(`{hi_col}` AS BIGINT), {lo_sql} + 1) - 1"
    first = _floor_div(lo_sql, w)
    last = _floor_div(last_sql, w)
    # runtime explode bound: fail loudly on pathological spans rather
    # than emit span/W rows (or exceed the sequence element limit)
    last_guarded = F.when(last - first < F.lit(max_span_buckets), last) \
        .otherwise(F.raise_error(F.concat(
            F.lit(f"interval spans >= {max_span_buckets} buckets of "
                  f"width {bucket_width}: ["),
            lo.cast("string"), F.lit(", "), hi.cast("string"),
            F.lit(") — widen bucket_width or raise max_span_buckets"))))
    iv = intervals.withColumn(
        "__bucket", F.explode(F.sequence(first, last_guarded)))
    pt = points.withColumn(
        "__bucket", _floor_div(f"CAST(`{point_col}` AS BIGINT)", w))

    contains = (F.col(point_col).cast("long") >= lo) & \
               (F.col(point_col).cast("long") < hi)
    if how == "inner":
        return (pt.join(iv, ["__bucket"], "inner")
                .filter(contains).drop("__bucket"))
    # left: keep every point exactly once when unmatched.  The bucket
    # equi-join can only lose a (point, interval) match if the exact
    # predicate rejects it, so a left join + post-filter needs the
    # predicate INSIDE the join condition to preserve unmatched rows.
    joined = pt.join(
        iv, (pt["__bucket"] == iv["__bucket"]) & contains, "left")
    return joined.select(
        *[pt[c] for c in points.columns],
        *[iv[c] for c in intervals.columns])
