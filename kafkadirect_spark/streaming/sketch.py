"""Streaming windowed distinct-count — HyperLogLog registers as the
window-fold state.

Exact windowed COUNT(DISTINCT) in streaming needs per-key state
proportional to the number of distinct values seen (Spark refuses
``dropDuplicates`` + windowed count in one query for this reason).
The sketch caps state at ``m = 2^p`` small integers per open window
regardless of stream volume, and its register-min fold is commutative
— record order across microbatch chunks cannot change the result
(the ordering caveat of streaming/window_fold.py does not apply).

Built on ``streaming_windowed_aggregate`` (tumbling/hopping, grace →
watermark, exactly-once final emission per closed window), with the
arithmetic shared with ``functions/sketch.py`` so a streaming window's
``est_distinct`` equals the batch ``hll_distinct`` over the same rows
bit-for-bit (golden-tested in tests/test_sketch.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafkadirect_spark.functions import sketch
from kafkadirect_spark.streaming.window_fold import streaming_windowed_aggregate


def _stringify(stream_df: DataFrame, value_col: str) -> DataFrame:
    """Cast the value to STRING before it crosses into pandas (round
    13): a NULL anywhere in an Arrow batch turns a long column into
    float64, and ``str(5.0) != "5"`` silently breaks the portable-hash
    parity with the batch path (regression-pinned in
    tests/test_sketch.py).  Casting JVM-side makes the Python-side
    ``str(v)`` a no-op on Spark's own canonical rendering for every
    input type; nulls stay null."""
    return stream_df.withColumn(value_col,
                                F.col(value_col).cast("string"))


def windowed_distinct_hll(
    stream_df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    size: str,
    advance: str | None = None,
    grace: str = "0 seconds",
    p: int = sketch.P_DEFAULT,
) -> DataFrame:
    """Append-mode streaming DataFrame ``(*key_cols, window_start,
    window_end, est_distinct, nonzero_buckets)`` — the approximate
    number of distinct ``value_col`` values per window, final-on-close.
    Null values are skipped (engine-wide null-key contract)."""

    def aggregator(regs: dict, row: dict) -> dict:
        v = row[value_col]
        if v is not None:
            b, bl = sketch.py_bucket_bitlen(v, p)
            k = str(b)  # JSON state: string keys
            if k not in regs or bl < regs[k]:
                regs[k] = bl
        return regs

    def finisher(regs: dict) -> dict:
        est = sketch.py_estimate({int(k): v for k, v in regs.items()}, p)
        return {"est_distinct": est["est_distinct"],
                "nonzero_buckets": est["nonzero_buckets"]}

    return streaming_windowed_aggregate(
        _stringify(stream_df, value_col), key_cols, ts_col, size,
        initializer=dict, aggregator=aggregator, finisher=finisher,
        agg_fields="est_distinct long, nonzero_buckets long",
        advance=advance, grace=grace)


def windowed_heavy_hitters(
    stream_df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    size: str,
    capacity: int = 64,
    k: int = 10,
    advance: str | None = None,
    grace: str = "0 seconds",
) -> DataFrame:
    """Approximate per-window top-k frequent values via the
    space-saving algorithm (Metwally et al. 2005 — public): at most
    ``capacity`` counters per open window, independent of stream
    volume.  Any value with true frequency > N/capacity is guaranteed
    present; each reported count overestimates by at most its
    ``max_err`` companion (inherited from the counter it evicted).

    Emits one row per closed window with parallel arrays
    ``top_values / top_counts / top_errs`` ranked by (count desc,
    value asc).  Eviction is deterministic: the minimum (count, value)
    counter is replaced; records fold in event-time order (the
    window-fold contract), so goldens are stable.

    Contrast with ``streaming/topk.py`` (exact per-window top-k
    through a full windowed count): that path's state is O(distinct
    values per window); this one is O(capacity) — the 100 TB knob.
    """

    def aggregator(state: dict, row: dict) -> dict:
        v = row[value_col]
        if v is None:
            return state
        v = str(v)
        c = state.setdefault("c", {})
        if v in c:
            c[v][0] += 1
        elif len(c) < capacity:
            c[v] = [1, 0]
        else:
            ev = min(c.items(), key=lambda kv: (kv[1][0], kv[0]))
            cnt = ev[1][0]
            del c[ev[0]]
            c[v] = [cnt + 1, cnt]
        return state

    def finisher(state: dict) -> dict:
        c = state.get("c", {})
        top = sorted(c.items(), key=lambda kv: (-kv[1][0], kv[0]))[:k]
        return {"top_values": [v for v, _ in top],
                "top_counts": [n for _, (n, _e) in top],
                "top_errs": [e for _, (_n, e) in top]}

    return streaming_windowed_aggregate(
        _stringify(stream_df, value_col), key_cols, ts_col, size,
        initializer=dict, aggregator=aggregator, finisher=finisher,
        agg_fields=("top_values array<string>, top_counts array<long>, "
                    "top_errs array<long>"),
        advance=advance, grace=grace)


def windowed_quantiles_hist(
    stream_df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    size: str,
    lo: int,
    hi: int,
    bins: int = 1000,
    qs_permille: tuple[int, ...] = (500, 990),
    advance: str | None = None,
    grace: str = "0 seconds",
) -> DataFrame:
    """Per-window quantile estimates from the equi-width histogram
    fold: state is at most ``bins`` integer counters per open window,
    the fold (bin increment) is commutative, and each closed window's
    estimates equal the batch ``hist_quantiles`` over exactly its rows
    (shared arithmetic via the sketch module's Python mirror).  Emits
    ``(*key_cols, window_start, window_end, q_permille_i, est_i...)``
    as one column pair per requested quantile."""

    def aggregator(counts: dict, row: dict) -> dict:
        v = row[value_col]
        if v is not None:
            b = str(sketch.py_hist_bin(int(v), lo, hi, bins))
            counts[b] = counts.get(b, 0) + 1
        return counts

    def finisher(counts: dict) -> dict:
        ests = sketch.py_hist_quantiles(
            {int(k): v for k, v in counts.items()}, list(qs_permille),
            lo, hi, bins)
        return {f"est_p{q}": ests[q] for q in qs_permille}

    fields = ", ".join(f"est_p{q} long" for q in qs_permille)
    return streaming_windowed_aggregate(
        stream_df, key_cols, ts_col, size,
        initializer=dict, aggregator=aggregator, finisher=finisher,
        agg_fields=fields, advance=advance, grace=grace)
