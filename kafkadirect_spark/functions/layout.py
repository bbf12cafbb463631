"""Data-layout clustering — Z-order (Morton) multi-dimensional
locality.

A 100 TB table is pruned at the SCAN: parquet row-group/file min-max
statistics skip data the predicate excludes — but min-max pruning on
column B is worthless when the table is laid out by column A (every
file spans B's whole domain).  Z-ordering interleaves the bits of
several quantized dimensions into one integer clustering key so that
range-partitioning + sorting by it gives every file a SMALL bounding
box in every participating dimension — the standard warehouse layout
optimization (published as Databricks Delta OPTIMIZE ZORDER BY, the
same Morton-curve technique every spatial index uses; public
knowledge).

Everything here is pure integer bit arithmetic in Catalyst
expressions (replayable in DuckDB — the zorder_events oracle builds
the identical ``| (((x >> i) & 1) << k)`` chain), and the clustering
write is ``repartitionByRange(z) + sortWithinPartitions(z)`` — one
range exchange, the same cost as any sorted write.

Reference analogue: none — Kafka Streams has no storage-layout
surface at all (topics are append logs; SURVEY.md §2.1); this is
beyond-parity machinery for the parquet/warehouse side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_dim(expr_sql: str, lo: int, hi: int, bits: int) -> Column:
    """Map an integer SQL expression into ``[0, 2^bits)`` by linear
    scaling of ``[lo, hi)`` — values outside clamp to the edge cells
    (same convention as the histogram sketch).  Integer-exact end to
    end: the input clamps BEFORE the scaled division (so far-out
    values cannot overflow the product, which the range check bounds
    below 2^63), and ``DIV`` of the non-negative product is floor —
    no double division anywhere (the quantized cell feeds the Z-index
    bit-for-bit and must match the DuckDB replay above 2^53 too)."""
    if hi <= lo:
        raise ValueError("hi must be > lo")
    if (hi - lo) * (1 << bits) >= 2 ** 63:
        raise ValueError("(hi-lo)*2^bits overflows int64")
    cells = 1 << bits
    x = f"LEAST(GREATEST(CAST(({expr_sql}) AS BIGINT), {lo}), {hi - 1})"
    return F.expr(
        f"CAST((({x}) - {lo}) * {cells} DIV {hi - lo} AS BIGINT)")


def quantize_dim_sql(expr_sql: str, lo: int, hi: int, bits: int) -> str:
    """DuckDB replay of ``quantize_dim`` (kept adjacent so the cell
    arithmetic cannot drift from the oracle — including the overflow
    guard: a domain the engine side rejects must fail here too, at
    construction, not at DuckDB runtime)."""
    if hi <= lo:
        raise ValueError("hi must be > lo")
    if (hi - lo) * (1 << bits) >= 2 ** 63:
        raise ValueError("(hi-lo)*2^bits overflows int64")
    cells = 1 << bits
    x = f"LEAST(GREATEST(CAST(({expr_sql}) AS BIGINT), {lo}), {hi - 1})"
    return f"((({x}) - {lo}) * {cells} // {hi - lo})"


def zorder_index(cols: list[Column | str], bits: int = 8) -> Column:
    """Morton interleave of ``len(cols)`` dimensions, each an integer
    column already quantized to ``[0, 2^bits)`` (see ``quantize_dim``;
    out-of-range values are clamped here too, so the index is total).
    Bit ``i`` of dimension ``j`` lands at position ``i·n + j`` —
    neighbors on the curve are neighbors in every dimension.  Pure
    long bit arithmetic: ``n_cols · bits ≤ 62`` enforced."""
    n = len(cols)
    if n == 0:
        raise ValueError("need at least one column")
    if n * bits > 62:
        raise ValueError("n_cols * bits must be <= 62")
    z = F.lit(0).cast("long")
    top = (1 << bits) - 1
    for j, c in enumerate(cols):
        col = (F.col(c) if isinstance(c, str) else c).cast("long")
        col = F.least(F.greatest(col, F.lit(0)), F.lit(top))
        for i in range(bits):
            bit = F.shiftright(col, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def zorder_sql(exprs: list[str], bits: int = 8) -> str:
    """The DuckDB replay of ``zorder_index`` over SQL expressions
    (each already integer; clamped identically) — kept beside the
    engine code so the bit layout can never drift from the oracle."""
    n = len(exprs)
    top = (1 << bits) - 1
    terms = []
    for j, e in enumerate(exprs):
        clamped = f"LEAST(GREATEST(CAST(({e}) AS BIGINT), 0), {top})"
        for i in range(bits):
            terms.append(f"((({clamped} >> {i}) & 1) << {i * n + j})")
    return "(" + " | ".join(terms) + ")"


def cluster_by_zorder(df: DataFrame, quantized_cols: list[str],
                      bits: int = 8, partitions: int = 64) -> DataFrame:
    """Re-layout ``df`` for multi-dimensional scan pruning: range-
    partition + sort by the Z-index of the given (pre-quantized)
    columns, then drop the index.  Writing the result gives every
    file a small bounding box in EVERY participating dimension, so
    min-max pruning works for predicates on any of them — verified by
    ``tests/test_layout.py``'s bounding-box-volume comparison.  One
    range exchange (sampled boundaries, the standard sorted-write
    cost); downstream writers call ``.write`` on the result as-is."""
    z = zorder_index(quantized_cols, bits)
    return (df.withColumn("__z", z)
            .repartitionByRange(partitions, "__z")
            .sortWithinPartitions("__z")
            .drop("__z"))
