"""Metric-monitoring suite demo — the four questions an SRE/quant
asks of a per-group metric stream, each answered by a dedicated
integer-exact operator (functions/timeseries.py, functions/behavior
siblings), all group-partitioned-window shapes that hold at 100 TB:

- is it TRENDING?        theil_sen_milli   (robust median slope)
- did its LEVEL SHIFT?   cusum_changepoint_milli (Page's statistic,
                         first-alarm localization)
- is it PERIODIC?        acf_milli         (rank-lag autocorrelation)
- what IS the cycle?     seasonal_profile_milli (per-phase profile +
                         seasonal strength)
- what's its true mean under irregular sampling?  twap_milli (LOCF
                         time-weighted average)

No reference analogue (SURVEY.md §2 — the reference has no
sequential-statistics surface); this demos the beyond-parity
monitoring machinery.

Run:  python examples/metric_monitoring.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")

from kafkadirect_spark import get_spark
from kafkadirect_spark.functions import timeseries
from kafkadirect_spark.sources.batch import load_table


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("metric-monitoring-demo")
    ev = load_table(spark, sf_dir, "events")

    print("== robust trend (Theil–Sen median slope, micro/s) ==")
    timeseries.theil_sen_milli(ev, "event_type", "ts", "value",
                               order_break_col="event_id") \
        .orderBy("event_type").show()

    print("== level-shift localization (two-sided CUSUM) ==")
    timeseries.cusum_changepoint_milli(
        ev, "event_type", "ts", "value", h_milli=50_000,
        order_break_col="event_id").orderBy("event_type").show()

    print("== periodicity (rank-lag autocorrelation, milli) ==")
    timeseries.acf_milli(ev, "event_type", "ts", "value",
                         lags=(1, 2, 4, 8),
                         order_break_col="event_id") \
        .orderBy("event_type", "lag").show(10)

    print("== seasonal profile + strength (period 5) ==")
    timeseries.seasonal_profile_milli(
        ev, "event_type", "ts", "value", period=5,
        order_break_col="event_id") \
        .orderBy("event_type", "phase").show(10)

    print("== time-weighted average (LOCF, January window) ==")
    timeseries.twap_milli(ev, "event_type", "ts", "value",
                          "2024-01-01", "2024-01-31",
                          order_break_col="event_id") \
        .orderBy("event_type").show()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
