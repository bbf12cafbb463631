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

    Domain: values within ``w`` of Long.MIN (x < -2^63 + w) would
    make the ``x - pmod(x, w)`` numerator wrap silently (Spark long
    arithmetic is non-ANSI by default), yielding a wrong bucket id —
    so that sliver is rejected with a runtime raise_error instead of
    dropping matches.  No real quantized domain (cents, nanos, token
    counts) lives at -2^63; rescale if yours does.
    """
    guarded = (
        f"CASE WHEN ({expr_sql}) >= {LONG_MIN + w} THEN ({expr_sql}) "
        f"ELSE raise_error('range-join bound within {w} of Long.MIN "
        f"— bucket ids would wrap; rescale the domain') END")
    return F.expr(f"(({guarded}) - pmod(({guarded}), {w})) div ({w})")


LONG_MIN = -(1 << 63)


def _check_names(*sides: DataFrame) -> None:
    """Reject reserved ``__``-prefixed input columns (the operators'
    internal working columns — ``__bucket``, ``__lfirst``, … — would
    silently overwrite a same-named user column via withColumn) and
    cross-side collisions."""
    reserved = sorted({c for df in sides for c in df.columns
                       if c.startswith("__")})
    if reserved:
        raise ValueError(
            f"reserved column names (double-underscore prefix): "
            f"{reserved} — rename them before the range join")
    if len(sides) == 2:
        dup = set(sides[0].columns) & set(sides[1].columns)
        if dup:
            raise ValueError(
                f"column collision between sides: {sorted(dup)}")


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
    _check_names(points, intervals)

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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bucket_width: int,
    max_span_buckets: int = 1_000_000,
    how: str = "inner",
    left_key: str | None = None,
) -> DataFrame:
    """Join every left interval to every right interval it OVERLAPS
    (half-open, integer bounds: ``a.lo < b.hi AND b.lo < a.hi``, both
    intervals non-empty) — without a nested loop.

    Same quantization as :func:`point_in_interval_join`, but BOTH
    sides explode to the buckets they cover, so an overlapping pair
    can share several buckets.  Each pair is emitted exactly once by
    pinning the meeting point to one canonical bucket — the max of
    the two intervals' first buckets, which every overlapping pair
    covers on both sides (the later-starting interval's first bucket
    lies inside the other interval's bucket range whenever they
    overlap).  No DISTINCT pass, no dedup shuffle: the canonical-
    bucket predicate filters inside the join.

    Both sides stay hash-partitioned on bucket ids — either may be
    fact-sized; skewed bucket ranges are ordinary skewed join keys
    (AQE / operators/skew.py).  Empty intervals (``hi <= lo``) match
    nothing on either side.  ``max_span_buckets`` bounds each side's
    explode exactly as in :func:`point_in_interval_join`.

    Output: all left columns then all right columns (names must not
    collide, and neither side may use the reserved ``__`` prefix).

    ``how="left"`` keeps every left interval: unmatched ones (empty
    intervals included) survive exactly once with null right columns.
    It requires ``left_key`` — a column UNIQUE per left row — because
    the bucket model explodes each left interval across its covered
    buckets and a pair's canonical emission bucket is data-dependent,
    so "unmatched" can only be decided per left ROW, not per exploded
    bucket row: matched keys are collected by the inner pass and the
    remainder re-enters via an anti-join (one extra key-only shuffle;
    the inner subtree is evaluated twice unless the caller persists
    the inputs — still never a nested loop, never a cartesian).
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    if max_span_buckets <= 0:
        raise ValueError("max_span_buckets must be positive")
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported join type {how!r}")
    if how == "left" and not left_key:
        raise ValueError(
            "how='left' requires left_key (a column unique per left "
            "row) to collapse the exploded unmatched side")
    if how == "left" and left_key not in left.columns:
        raise ValueError(f"left_key {left_key!r} not in left columns")
    _check_names(left, right)

    w = bucket_width

    def explode_side(df, lo_col, hi_col, bucket, first):
        lo = F.col(lo_col).cast("long")
        hi = F.col(hi_col).cast("long")
        lo_sql = f"CAST(`{lo_col}` AS BIGINT)"
        last_sql = f"greatest(CAST(`{hi_col}` AS BIGINT), {lo_sql} + 1) - 1"
        fst = _floor_div(lo_sql, w)
        lst = _floor_div(last_sql, w)
        last_guarded = F.when(lst - fst < F.lit(max_span_buckets), lst) \
            .otherwise(F.raise_error(F.concat(
                F.lit(f"interval spans >= {max_span_buckets} buckets of "
                      f"width {bucket_width}: ["),
                lo.cast("string"), F.lit(", "), hi.cast("string"),
                F.lit(") — widen bucket_width or raise max_span_buckets"))))
        return (df.withColumn(first, fst)
                .withColumn(bucket,
                            F.explode(F.sequence(F.col(first), last_guarded))))

    lhs = explode_side(left, left_lo, left_hi, "__bucket", "__lfirst")
    rhs = explode_side(right, right_lo, right_hi, "__rbucket", "__rfirst")

    a_lo, a_hi = F.col(left_lo).cast("long"), F.col(left_hi).cast("long")
    b_lo, b_hi = F.col(right_lo).cast("long"), F.col(right_hi).cast("long")
    overlaps = (a_lo < b_hi) & (b_lo < a_hi) & (a_lo < a_hi) & (b_lo < b_hi)
    canonical = F.col("__bucket") == F.greatest(F.col("__lfirst"),
                                                F.col("__rfirst"))
    inner = (lhs.join(rhs, F.col("__bucket") == F.col("__rbucket"), "inner")
             .filter(canonical & overlaps)
             .drop("__bucket", "__rbucket", "__lfirst", "__rfirst"))
    if how == "inner":
        return inner
    # left: the inner pass already emitted every matched pair exactly
    # once; left rows whose key never appears in it re-enter with null
    # right columns via an anti-join on the caller's unique key.
    unmatched = left.join(inner.select(left_key), left_key, "left_anti")
    null_right = unmatched.select(
        *left.columns,
        *[F.lit(None).cast(right.schema[c].dataType).alias(c)
          for c in right.columns])
    return inner.unionByName(null_right)


def suggest_bucket_width(intervals: DataFrame, lo_col: str, hi_col: str,
                         quantile: float = 0.5) -> int:
    """Data-driven ``bucket_width``: the given quantile (default
    median) of the interval spans, floored to ≥ 1.  The docstring
    advice "choose W near the median span" as one cheap aggregate —
    ``approx_percentile`` (t-digest, map-side partial, no sort), a
    PLANNING helper whose output feeds the join, not an oracle-gated
    result (engine-internal sketch layouts are fine here, unlike the
    exact-oracle sketch family in functions/sketch.py).

    With W at the median span the interval side's explode multiplier
    stays ~2× (half the intervals cover ≤ 1 bucket boundary) while a
    point meets only the intervals sharing its bucket.  Callers with
    adversarial span distributions (a few huge sentinels) should
    still set ``max_span_buckets`` — the guard raises loudly rather
    than exploding.
    """
    if not 0 < quantile < 1:
        raise ValueError("quantile must be in (0, 1)")
    span = (F.col(hi_col).cast("long") - F.col(lo_col).cast("long"))
    row = intervals.filter(span > 0).agg(
        F.expr(f"approx_percentile({hi_col} - {lo_col}, {quantile})")
        .cast("long").alias("w")).collect()[0]
    return max(int(row["w"] or 1), 1)
