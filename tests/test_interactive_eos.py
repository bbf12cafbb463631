"""Interactive queries (queryable state) and exactly-once delivery to
an idempotent sink — SURVEY.md §2.6 rows 'interactive queries' and
'exactly-once' (KafkaStreams.java:1064; StreamsConfig.java:262)."""

import shutil
import tempfile
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from kafkadirect_spark.core import Stream
from kafkadirect_spark.sources.stream import stream_from_dir
from kafkadirect_spark.streaming import interactive

KV = "key string, value int, ts timestamp"


def t(s):
    return datetime.fromisoformat(f"2024-01-01 {s}")


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="kds-iq-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write(spark, path, rows, n):
    spark.createDataFrame(rows, KV).coalesce(1).write.mode(
        "overwrite").parquet(f"{path}/in/b{n}")


def test_interactive_query_snapshot_updates(spark, tmpdir):
    _write(spark, tmpdir, [("a", 1, t("00:00:00")), ("b", 1, t("00:00:01"))], 0)
    src = stream_from_dir(spark, f"{tmpdir}/in/*", KV, key="key", ts="ts")
    counts = Stream(src.df, key="key", ts="ts").group_by_key().count(name="n")
    view = interactive.materialize(counts, "store_counts",
                                   checkpoint=f"{tmpdir}/ck",
                                   key_cols=["key"])
    try:
        view.query.processAllAvailable()
        assert {(r.key, r.n) for r in view.snapshot().collect()} == {("a", 1), ("b", 1)}
        _write(spark, tmpdir, [("a", 1, t("00:00:02"))], 1)
        view.query.processAllAvailable()
        # the store serves the CURRENT value per key — superseded
        # upserts are reduced away (ReadOnlyKeyValueStore.get contract)
        assert [r.n for r in view.get("key", "a")] == [2]
        assert {(r.key, r.n) for r in view.snapshot().collect()} == {("a", 2), ("b", 1)}
    finally:
        view.stop()


def test_interactive_get_quote_bearing_key(spark, tmpdir):
    """Point lookup is parameterized (no SQL-text interpolation): keys
    containing quotes must neither break nor escape the filter."""
    evil = "a'; DROP TABLE x --"
    _write(spark, tmpdir, [(evil, 1, t("00:00:00")),
                           ("b", 5, t("00:00:01"))], 0)
    src = stream_from_dir(spark, f"{tmpdir}/in/*", KV, key="key", ts="ts")
    counts = Stream(src.df, key="key", ts="ts").group_by_key().count(name="n")
    view = interactive.materialize(counts, "store_quoted",
                                   checkpoint=f"{tmpdir}/ckq",
                                   key_cols=["key"])
    try:
        view.query.processAllAvailable()
        assert [(r.key, r.n) for r in view.get("key", evil)] == [(evil, 1)]
        assert view.get("key", "nope") == []
    finally:
        view.stop()


def test_exactly_once_file_sink_across_restart(spark, tmpdir):
    """Checkpoint + idempotent file sink = end-to-end exactly-once:
    reprocessing after a stop/restart must not duplicate records."""
    _write(spark, tmpdir, [("a", 1, t("00:00:00")), ("b", 2, t("00:00:01"))], 0)

    def start():
        src = stream_from_dir(spark, f"{tmpdir}/in/*", KV, key="key", ts="ts")
        return (src.df.writeStream.format("parquet")
                .option("path", f"{tmpdir}/out")
                .option("checkpointLocation", f"{tmpdir}/ck")
                .outputMode("append").start())

    q = start()
    q.processAllAvailable()
    q.stop()
    _write(spark, tmpdir, [("c", 3, t("00:00:02"))], 1)
    q2 = start()  # restart from checkpoint
    q2.processAllAvailable()
    q2.stop()
    out = spark.read.parquet(f"{tmpdir}/out")
    got = sorted((r.key, r.value) for r in out.collect())
    assert got == [("a", 1), ("b", 2), ("c", 3)]  # no dups, no loss
