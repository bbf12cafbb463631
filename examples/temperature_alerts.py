"""TemperatureDemo.java, PySpark-native — the reference's IoT example
(streams/examples/.../temperature/TemperatureDemo.java:36-47): per
5-second tumbling window, the MAX temperature per sensor; windows
whose max exceeds the 20° threshold are emitted as alerts.

The reference reads topic ``iot-temperature`` and writes
``iot-temperature-max``; here the rate source stands in as the sensor
feed (broker-free) and the console sink as the alert topic — the same
topology runs against ``sources/kafka.py:read_stream`` with a broker.

Run:  python examples/temperature_alerts.py [seconds]   (default 30)
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from kafkadirect_spark import Stream, get_spark
from kafkadirect_spark.core import Windows

THRESHOLD = 20
WINDOW = "5 seconds"


def main(seconds: str = "30") -> None:
    spark = get_spark("temperature-demo")
    # rate source → synthetic sensor readings (sensor_id, temp, ts);
    # temps sweep 0..29 so ~1/3 of window maxima cross the threshold
    readings = Stream(
        spark.readStream.format("rate").option("rowsPerSecond", "100").load()
        .select(
            (F.col("value") % 5).alias("sensor_id"),
            (F.col("value") % 30).cast("int").alias("temp"),
            F.col("timestamp").alias("ts"),
        ),
        key="sensor_id", ts="ts",
    )
    window_max = (
        readings.group_by_key()
        .windowed_by(Windows.tumbling(WINDOW, grace="2 seconds"))
        .reduce(F.max("temp"), name="max_temp")
    )
    alerts = (window_max.filter(F.col("max_temp") > THRESHOLD)
              .select(F.col("window.start").alias("w"),
                      "sensor_id", "max_temp"))
    q = (alerts.writeStream.outputMode("update").format("console")
         .option("truncate", "false").start())
    limit = float(seconds)
    if limit > 0:
        q.awaitTermination(limit)
        q.stop()
    else:
        q.awaitTermination()


if __name__ == "__main__":
    main(*sys.argv[1:])
