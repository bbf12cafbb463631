"""Live metric level-shift watch — the streaming CUSUM demo
(streaming/cusum.py): per metric key, values fold through Page's
two-sided statistic in event-time order and an alarm row appears the
moment the cumulative deviation from the warmup-median baseline
crosses the threshold — long before any single sample looks unusual.

The rate source stands in as the metric feed (broker-free): two
synthetic gauges where ``latency_ms`` steps from ~20 to ~26 halfway
through the run (a 30% creep no single-point threshold would flag)
while ``queue_depth`` stays level.  The same topology runs against
``sources/kafka.py:read_stream`` with a broker.

Run:  python examples/metric_watch.py [seconds]   (default 45)
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from kafkadirect_spark import get_spark
from kafkadirect_spark.streaming.cusum import streaming_cusum_alerts


def main(seconds: str = "45") -> None:
    spark = get_spark("metric-watch-demo")
    half = int(seconds) // 2
    # two interleaved gauges at 50 rows/s each; latency creeps +6
    # after the halfway mark, queue depth wobbles around 5 forever
    src = (spark.readStream.format("rate")
           .option("rowsPerSecond", "100").load()
           .select(
               F.when(F.col("value") % 2 == 0, "latency_ms")
               .otherwise("queue_depth").alias("metric"),
               F.col("timestamp").alias("ts"),
               F.when(
                   F.col("value") % 2 == 0,
                   20.0 + (F.col("value") % 7).cast("double")
                   + F.when((F.col("value") / 100).cast("long")
                            >= half, 6.0).otherwise(0.0))
               .otherwise(5.0 + (F.col("value") % 3).cast("double"))
               .alias("value")))
    alarms = streaming_cusum_alerts(src, "metric", "ts", "value",
                                    h_milli=60_000, warmup=50)
    q = (alarms.writeStream.outputMode("append")
         .format("console").option("truncate", "false").start())
    q.awaitTermination(int(seconds))
    q.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
