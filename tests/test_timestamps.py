"""TimestampExtractor policies — Fail / LogAndSkip / UsePartitionTime /
Wallclock golden tests (processor/*.java, extraction at
RecordQueue.java:178)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from kafkadirect_spark.core import Stream
from kafkadirect_spark.functions.timestamps import with_timestamp_policy

SCHEMA = "event_id long, ts timestamp, v string"


def t(s):
    return datetime.fromisoformat(f"2024-01-01 {s}")


@pytest.fixture()
def events(spark):
    return spark.createDataFrame([
        (0, t("10:00:00"), "a"),
        (1, None, "b"),                         # invalid: missing
        (2, t("10:02:00"), "c"),
        (3, datetime(1960, 1, 1), "d"),         # invalid: pre-epoch
        (4, t("10:04:00"), "e"),
    ], SCHEMA)


def test_policy_skip_drops_invalid(events):
    out = with_timestamp_policy(events, "ts", on_invalid="skip")
    assert [r.event_id for r in out.orderBy("event_id").collect()] == [0, 2, 4]


def test_policy_fail_raises_on_invalid(events):
    out = with_timestamp_policy(events, "ts", on_invalid="fail")
    with pytest.raises(Exception, match="invalid timestamp"):
        out.collect()
    # a clean frame passes through untouched
    clean = events.filter(F.col("event_id").isin(0, 2, 4))
    assert with_timestamp_policy(clean, "ts", on_invalid="fail").count() == 3


def test_policy_previous_substitutes_stream_time(events):
    out = with_timestamp_policy(events, "ts", on_invalid="previous",
                                order_by="event_id")
    got = {r.event_id: r.ts for r in out.collect()}
    assert got[1] == t("10:00:00")   # filled from event 0
    assert got[3] == t("10:02:00")   # filled from event 2
    assert got[4] == t("10:04:00")   # valid rows untouched


def test_policy_previous_raises_without_prior(spark):
    df = spark.createDataFrame([(0, None, "a")], SCHEMA)
    out = with_timestamp_policy(df, "ts", on_invalid="previous",
                                order_by="event_id")
    with pytest.raises(Exception, match="no prior valid timestamp"):
        out.collect()


def test_policy_previous_partitioned(spark):
    """Per-partition stream time: the fill never crosses partitions
    (UsePartitionTimeOnInvalidTimestamp is per task/partition)."""
    df = spark.createDataFrame([
        (0, "p0", t("10:00:00")), (1, "p0", None),
        (2, "p1", t("11:00:00")), (3, "p1", None),
    ], "event_id long, part string, ts timestamp")
    out = with_timestamp_policy(df, "ts", on_invalid="previous",
                                order_by="event_id", partition_by="part")
    got = {r.event_id: r.ts for r in out.collect()}
    assert got[1] == t("10:00:00") and got[3] == t("11:00:00")


def test_policy_wallclock_replaces_all(events):
    out = with_timestamp_policy(events, "ts", on_invalid="wallclock")
    rows = out.collect()
    assert all(r.ts is not None and r.ts.year >= 2025 for r in rows)
    assert len(rows) == 5


def test_policy_unknown_rejected(events):
    with pytest.raises(ValueError, match="on_invalid"):
        with_timestamp_policy(events, "ts", on_invalid="nope")


def test_stream_method_surface(events):
    s = Stream(events, ts="ts").with_timestamp_policy(on_invalid="skip")
    assert s.df.count() == 3
    with pytest.raises(ValueError, match="event-time"):
        Stream(events).with_timestamp_policy(on_invalid="skip")
