"""Live rate-anomaly alerting demo — the streaming sibling of the
batch diagnostics: per event type, tumbling-window counts score
against the type's OWN recent median the moment the watermark closes
each window (streaming/anomaly.py).

The rate source stands in as the event feed (broker-free): a
synthetic traffic mix where the ``error`` type bursts every fourth
10-second stretch, so alert rows appear once enough history has
closed.  The same topology runs against
``sources/kafka.py:read_stream`` with a broker.

Run:  python examples/rate_alerts.py [seconds]   (default 45)
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from kafkadirect_spark import get_spark
from kafkadirect_spark.streaming.anomaly import streaming_rate_alerts


def main(seconds: str = "45") -> None:
    spark = get_spark("rate-alerts-demo")
    # steady view/click traffic; errors burst 10x in every fourth
    # 10-second stretch (value DIV 1000 cycles once per 10 s at
    # 100 rows/s)
    src = (spark.readStream.format("rate")
           .option("rowsPerSecond", "100").load()
           .select(
               F.when(F.col("value") % 10 < 4, "view")
               .when(F.col("value") % 10 < 8, "click")
               .when((F.col("value") / 1000).cast("long") % 4 == 3,
                     "error")
               .when(F.col("value") % 10 == 8, "error")
               .otherwise("purchase").alias("event_type"),
               F.col("timestamp").alias("ts")))
    alerts = streaming_rate_alerts(src, "event_type", "ts",
                                   window="5 seconds", history=6,
                                   min_history=2,
                                   threshold_permille=400)
    q = (alerts.writeStream.outputMode("append").format("console")
         .option("truncate", "false").start())
    limit = float(seconds)
    if limit > 0:
        q.awaitTermination(limit)
        q.stop()
    else:
        q.awaitTermination()


if __name__ == "__main__":
    main(*sys.argv[1:])
