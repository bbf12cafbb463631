"""The Yahoo streaming benchmark shape, in actual streaming mode —
perf/YahooBenchmark.java:266-295: filter(view) → project → join the
campaigns dim → windowed count per campaign, over an unbounded source.

Uses the rate source as the ad-event generator (broker-free); the same
topology runs against sources/kafka.py:read_stream with a real broker.

Run:  python examples/yahoo_streaming.py [seconds]   (default 30; 0 = run
until ctrl-c)
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from kafkadirect_spark import Stream, Table, get_spark
from kafkadirect_spark.core import Windows


def main(seconds: str = "30") -> None:
    spark = get_spark("yahoo-streaming-demo")
    # rate source → synthetic ad events (user_id, event_type, ts)
    events = Stream(
        spark.readStream.format("rate").option("rowsPerSecond", "1000").load()
        .select(
            (F.col("value") % 100).alias("user_id"),
            F.when(F.col("value") % 3 == 0, "view").otherwise("click")
             .alias("event_type"),
            F.col("timestamp").alias("ts"),
        ),
        key="user_id", ts="ts",
    )
    campaigns = Table(
        spark.range(100).select(
            F.col("id").alias("c_custkey"),
            F.concat(F.lit("campaign-"), (F.col("id") % 7)).alias("campaign"),
        ),
        key="c_custkey",
    )
    agg = (
        events.filter(F.col("event_type") == "view")
        .select("user_id", "ts")
        .join_table(campaigns, on=F.col("user_id") == F.col("c_custkey"))
        .group_by("campaign")
        .windowed_by(Windows.tumbling("10 seconds", grace="5 seconds"))
        .count(name="views")
    )
    q = (agg.select(F.col("window.start").alias("w"), "campaign", "views")
         .writeStream.outputMode("update").format("console")
         .option("truncate", "false").start())
    limit = float(seconds)
    if limit > 0:
        q.awaitTermination(limit)
        q.stop()
    else:
        q.awaitTermination()


if __name__ == "__main__":
    main(*sys.argv[1:])
