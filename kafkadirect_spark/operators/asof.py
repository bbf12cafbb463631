"""As-of (temporal) join: each left row picks the latest right row at
or before its timestamp (per key) — the point-in-time enrichment every
event pipeline needs (price as of trade time, dimension as of event
time).

The reference has no dedicated as-of operator; its users approximate
one with a KStream->KTable join against the *current* snapshot
(`streams/src/main/java/org/apache/kafka/streams/kstream/KStream.java`
join(KTable) — always latest value, no time axis).  This operator is
the time-correct generalization: the lookup respects the event's own
timestamp, not processing order.

Scale shape: the naive formulation is a range join (equi-key AND
ts-inequality) that Spark executes as an exploding inner join +
per-left-row aggregation.  Instead we use the merge-asof union trick:

  union both sides tagged by origin, hash-shuffle ONCE on the key,
  sort each partition by (ts, side, tiebreak), and carry the last
  non-null right payload forward with an unbounded-preceding window.

One shuffle, one per-partition sort, zero row amplification — the
same plan shape a windowed aggregation gets, so it survives 100 TB
exactly as well as groupBy does.  (A pathologically hot key is a
window-partition skew; pre-salt with operators.skew if one key
exceeds an executor.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TS, _SIDE, _PAY = "__asof_ts", "__asof_side", "__asof_pay"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str | list[str],
    right_on: str | list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    direction: str = "backward",
    strict: bool = False,
    tolerance_s: int | None = None,
    right_order: str | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, enriched with the value
    columns of the closest ``right`` row for the same key —

    - ``backward``: latest right row with ``right_ts <= left_ts``
      (``<`` when ``strict``);
    - ``forward``: earliest right row with ``right_ts >= left_ts``
      (``>`` when ``strict``).

    Unmatched left rows keep null value columns (left-join shape).
    Null timestamps never match: right rows with a null ``right_ts``
    are dropped, left rows with a null ``left_ts`` come out unmatched.
    ``tolerance_s`` voids matches further than that many seconds away.

    ``right_order`` breaks ties among right rows sharing a timestamp
    deterministically (max wins backward, min wins forward); pass a
    unique column whenever the right side can repeat (key, ts) pairs —
    determinism is what makes the result oracle-checkable.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lkeys = [left_on] if isinstance(left_on, str) else list(left_on)
    rkeys = [right_on] if isinstance(right_on, str) else list(right_on)
    if len(lkeys) != len(rkeys):
        raise ValueError("left_on and right_on must have the same length")
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*rkeys, right_ts)]
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"right value columns {sorted(clash)} collide with left "
            "columns; alias them on the right side first")

    order = right_order if right_order is not None else F.lit(0)
    # Left rows need an __ord of the same type as the right side's, or
    # unionByName widens both (int 0 vs a string order column turns the
    # documented numeric tie-break lexicographic).  A typed null keeps
    # the right side's type and is order-irrelevant among left rows.
    if right_order is not None:
        l_order = F.lit(None).cast(right.schema[right_order].dataType)
    else:
        l_order = F.lit(0)
    pay = F.struct(*[F.col(c) for c in value_cols],
                   F.col(right_ts).alias(_TS + "_r"))
    ikeys = [f"__asof_k{i}" for i in range(len(lkeys))]
    # Right rows sort *before* left rows at an equal timestamp so an
    # inclusive backward match sees them; strict mode flips that.
    r_side, l_side = (1, 0) if strict else (0, 1)
    r = right.select(
        *[F.col(k).alias(ik) for k, ik in zip(rkeys, ikeys)],
        F.col(right_ts).cast("timestamp").alias(_TS),
        F.lit(r_side).alias(_SIDE),
        (order if isinstance(order, Column) else F.col(order)).alias("__ord"),
        pay.alias(_PAY),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns],
    ).filter(F.col(_TS).isNotNull())  # null-ts right rows can match nothing
    l = left.select(
        *[F.col(k).alias(ik) for k, ik in zip(lkeys, ikeys)],
        F.col(left_ts).cast("timestamp").alias(_TS),
        F.lit(l_side).alias(_SIDE),
        l_order.alias("__ord"),
        F.lit(None).cast(r.schema[_PAY].dataType).alias(_PAY),
        *[F.col(c) for c in left.columns],
    )
    u = r.select(*l.columns).unionByName(l)

    ts_o, side_o, ord_o = F.col(_TS), F.col(_SIDE), F.col("__ord")
    if direction == "backward":
        # asc nulls-first: a null-ts left row precedes every right row
        # and so carries a null payload (unmatched).
        w_order = [ts_o.asc(), side_o.asc(), ord_o.asc()]
    else:  # forward: scan from the future backwards
        # desc_nulls_first keeps null-ts left rows ahead of all right
        # rows in scan order — unmatched, same contract as backward.
        w_order = [ts_o.desc_nulls_first(), side_o.asc(), ord_o.desc()]
    w = (Window.partitionBy(*ikeys).orderBy(*w_order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = F.last(_PAY, ignorenulls=True).over(w)

    out = u.withColumn(_PAY, carried).filter(F.col(_SIDE) == l_side)
    if tolerance_s is not None:
        gap = F.abs(F.col(_TS).cast("double")
                    - F.col(_PAY)[_TS + "_r"].cast("double"))
        out = out.withColumn(
            _PAY, F.when(gap <= F.lit(float(tolerance_s)), F.col(_PAY)))
    return out.select(
        *left.columns,
        *[F.col(_PAY)[c].alias(c) for c in value_cols])
