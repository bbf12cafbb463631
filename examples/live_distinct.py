"""Live distinct-user dashboard demo — the streaming form of the
batch HLL sketch: per event type, the tumbling-window distinct-user
ESTIMATE (exact-integer HLL registers folded in watermarked window
state) emits the moment the watermark closes each window
(streaming/sketch.py windowed_distinct_hll).

The rate source stands in as the event feed (broker-free): a
synthetic traffic mix where each type draws user ids from a pool
whose size differs per type, so the per-window estimates visibly
separate.  The same topology runs against
``sources/kafka.py:read_stream`` with a broker.

Reading the numbers: this is the RAW integer estimator (the
oracle-exact path — see functions/sketch.py's module docstring), so
near-empty sketches read ≈ 0.72·m instead of the true tiny count;
`sketch.hll_estimate_corrected` applies the classic LinearCounting
correction when a float path is acceptable.  The
view/click/purchase separation — and the exactly-once window close —
is what this demo shows.

Run:  python examples/live_distinct.py [seconds]   (default 45)
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from kafkadirect_spark import get_spark
from kafkadirect_spark.streaming.sketch import windowed_distinct_hll


def main(seconds: str = "45") -> None:
    spark = get_spark("live-distinct-demo")
    # views come from a 500-user pool, clicks from 50, purchases
    # from 5 — three clearly separated distinct-count levels
    src = (spark.readStream.format("rate")
           .option("rowsPerSecond", "200").load()
           .select(
               F.when(F.col("value") % 10 < 6, "view")
               .when(F.col("value") % 10 < 9, "click")
               .otherwise("purchase").alias("event_type"),
               F.when(F.col("value") % 10 < 6,
                      F.col("value") % 500)
               .when(F.col("value") % 10 < 9, F.col("value") % 50)
               .otherwise(F.col("value") % 5).alias("user_id"),
               F.col("timestamp").alias("ts")))
    counts = windowed_distinct_hll(src, key_cols=["event_type"],
                                   ts_col="ts", value_col="user_id",
                                   size="5 seconds", p=8)
    q = (counts.writeStream.outputMode("append").format("console")
         .option("truncate", "false").start())
    limit = float(seconds)
    if limit > 0:
        q.awaitTermination(limit)
        q.stop()
    else:
        q.awaitTermination()


if __name__ == "__main__":
    main(*sys.argv[1:])
