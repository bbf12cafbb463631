"""PipeDriver (TopologyTestDriver analogue) — golden sequences piped
batch-by-batch, outputs read synchronously."""

from datetime import datetime

from pyspark.sql import functions as F

from kafkadirect_spark.core import Stream, Windows
from kafkadirect_spark.testing import PipeDriver

KV = "key string, value int, ts timestamp"


def t(s):
    return datetime.fromisoformat(f"2024-01-01 {s}")


def test_pipe_running_count(spark):
    with PipeDriver(
        spark, KV,
        topology=lambda s: s.group_by_key().count(name="n"),
        key="key", ts="ts",
    ) as d:
        d.pipe([("a", 1, t("00:00:00")), ("b", 1, t("00:00:01"))])
        first = {(r.key, r.n) for r in d.read_output()}
        assert first == {("a", 1), ("b", 1)}
        d.pipe([("a", 1, t("00:00:02"))])
        second = {(r.key, r.n) for r in d.read_output()}
        assert second == {("a", 2)}  # update mode: only the changed key


def test_pipe_suppressed_window_emits_on_close(spark):
    with PipeDriver(
        spark, KV,
        topology=lambda s: (
            s.group_by_key()
            .windowed_by(Windows.tumbling("1 minute", grace="30 seconds"))
            .count(name="n")),
        key="key", ts="ts",
        output_mode="append",  # untilWindowCloses
    ) as d:
        d.pipe([("a", 1, t("10:00:10")), ("a", 1, t("10:00:40"))])
        assert d.read_output() == []          # window still open
        d.pipe([("a", 1, t("10:05:00"))])     # watermark passes the end
        out = [(r.key, r.n) for r in d.read_output()]
        assert out == [("a", 2)]


def test_pipe_session_window_merge_across_batches(spark):
    """Session merges across microbatches, emitted finally at close
    (streaming session aggregation supports append mode only —
    Spark's equivalent of suppression being mandatory here)."""
    with PipeDriver(
        spark, KV,
        topology=lambda s: (
            s.group_by_key()
            .windowed_by(Windows.session("10 minutes", grace="1 minute"))
            .count(name="n")
            .select(F.col("key"), F.col("window.start").alias("ws"), "n")),
        key="key", ts="ts",
        output_mode="append",
    ) as d:
        d.pipe([("a", 1, t("09:00:00"))])
        d.pipe([("a", 1, t("09:05:00"))])   # within gap → merges
        assert d.read_output() == []        # session still open
        d.pipe([("a", 1, t("10:00:00"))])   # far → new session; closes first
        first = [(r.ws.time().isoformat(), r.n) for r in d.read_output()]
        assert first == [("09:00:00", 2)]   # merged session, emitted once
        d.pipe([("a", 1, t("11:00:00"))])   # closes the second session
        second = [(r.ws.time().isoformat(), r.n) for r in d.read_output()]
        assert second == [("10:00:00", 1)]


def test_late_record_beyond_grace_is_dropped(spark):
    """Late-data drop — KStreamWindowAggregate.java:131-151: a record
    arriving after its window closed (stream time ≥ end + grace) is
    dropped, not re-opened.  Spark: the watermark already emitted the
    final append row; the late record must not produce another."""
    with PipeDriver(
        spark, KV,
        topology=lambda s: (
            s.group_by_key()
            .windowed_by(Windows.tumbling("1 minute", grace="30 seconds"))
            .count(name="n")),
        key="key", ts="ts",
        output_mode="append",
    ) as d:
        d.pipe([("a", 1, t("10:00:10"))])
        d.pipe([("a", 1, t("10:05:00"))])   # closes the 10:00 window
        closed = [(r.key, r.n) for r in d.read_output()]
        assert closed == [("a", 1)]
        # a record for the already-closed window, far beyond grace
        d.pipe([("a", 1, t("10:00:20"))])
        d.pipe([("a", 1, t("10:10:00"))])   # push stream time further
        late_out = [(r.key, r.window.start.time().isoformat(), r.n)
                    for r in d.read_output()]
        # no re-emission for the 10:00 window — the late record was dropped
        assert all(ws != "10:00:00" for _, ws, _ in late_out), late_out


def test_pipe_hopping_window_late_within_grace_then_close(spark):
    """Hopping windows under grace — KStreamWindowAggregate.java:96-153
    with TimeWindows.advanceBy: a late (out-of-order) record that is
    still inside grace counts toward EVERY slide window covering it;
    both windows emit their final count once the watermark passes their
    end."""
    with PipeDriver(
        spark, KV,
        topology=lambda s: (
            s.group_by_key()
            .windowed_by(Windows.hopping("1 minute", "30 seconds",
                                         grace="1 minute"))
            .count(name="n")
            .select(F.col("key"), F.col("window.start").alias("ws"), "n")),
        key="key", ts="ts",
        output_mode="append",
    ) as d:
        d.pipe([("a", 1, t("10:00:10"))])
        assert d.read_output() == []                 # all windows open
        # out-of-order but ahead of the watermark (10:00:10 - 1m grace)
        d.pipe([("a", 1, t("10:00:05"))])
        assert d.read_output() == []
        d.pipe([("a", 1, t("10:02:00"))])            # watermark → 10:01:00
        out = sorted((r.ws.time().isoformat(), r.n) for r in d.read_output())
        # both covering slides [09:59:30, 10:00:30) and [10:00:00, 10:01:00)
        # closed with the late record included
        assert out == [("09:59:30", 2), ("10:00:00", 2)]


def test_pipe_session_late_within_grace_merges(spark):
    """Session merge with a late record inside grace —
    KStreamSessionWindowAggregate.java:94-141: the out-of-order record
    extends the open session (no new session, no re-emission); a record
    beyond grace after the session closed is dropped."""
    with PipeDriver(
        spark, KV,
        topology=lambda s: (
            s.group_by_key()
            .windowed_by(Windows.session("10 minutes", grace="5 minutes"))
            .count(name="n")
            .select(F.col("key"), F.col("window.start").alias("ws"), "n")),
        key="key", ts="ts",
        output_mode="append",
    ) as d:
        d.pipe([("a", 1, t("09:00:00"))])
        d.pipe([("a", 1, t("09:05:00"))])
        # late but >= watermark (09:05:00 - 5m = 09:00:00) → merges
        d.pipe([("a", 1, t("09:02:00"))])
        assert d.read_output() == []                 # session still open
        d.pipe([("a", 1, t("10:00:00"))])            # watermark → 09:55:00
        out = [(r.ws.time().isoformat(), r.n) for r in d.read_output()]
        assert out == [("09:00:00", 3)]              # one merged session
        # beyond grace: session already closed — must not re-emit
        d.pipe([("a", 1, t("09:03:00"))])
        d.pipe([("a", 1, t("11:00:00"))])            # push stream time
        late = [(r.ws.time().isoformat(), r.n) for r in d.read_output()]
        assert all(ws != "09:00:00" for ws, _ in late), late


def test_pipe_streaming_deduplicate_within_watermark(spark):
    """EventDeduplication (kafka/streams examples windowed-store
    Transformer): duplicate ids inside the remembering window are
    dropped across microbatches; after the watermark expires the id's
    state, the same id passes again."""
    with PipeDriver(
        spark, KV,
        topology=lambda s: s.deduplicate("key", within="1 minute"),
        key="key", ts="ts",
        output_mode="append",
    ) as d:
        d.pipe([("a", 1, t("10:00:00")), ("a", 2, t("10:00:10"))])
        first = [(r.key, r.value) for r in d.read_output()]
        assert first == [("a", 1)]           # in-batch duplicate dropped
        d.pipe([("a", 3, t("10:00:30"))])    # still remembered
        assert d.read_output() == []
        d.pipe([("b", 1, t("10:05:00"))])    # watermark → 10:04; 'a' expires
        d.pipe([("a", 4, t("10:05:30"))])    # same id, new epoch → passes
        later = {(r.key, r.value) for r in d.read_output()}
        assert ("a", 4) in later and ("b", 1) in later


def test_pipe_streaming_curation_gate(spark):
    """The stateless curation gates (quality filter + deterministic
    split assignment) run unchanged on a stream — per-row hash
    decisions need no state, so streamed output must equal the batch
    run over the same rows (batch/streaming parity)."""
    from kafkadirect_spark.functions import curation

    schema = "doc_id long, text string"
    frac = {"train": 0.6, "val": 0.2, "test": 0.2}

    def gate(df):
        return curation.split_assign(
            df.filter(F.length("text") >= 15), "doc_id", frac
        ).select("doc_id", "split")

    b1 = [(i, f"document body number {i} with enough text") for i in range(8)]
    b2 = [(8, "short"),                      # dropped by the gate
          (9, "another sufficiently long document body here")]
    with PipeDriver(spark, schema, topology=lambda s: gate(s.df),
                    output_mode="append") as d:
        d.pipe(b1)
        d.pipe(b2)
        streamed = {(r.doc_id, r.split) for r in d.all_output()}
    batch = {(r.doc_id, r.split) for r in
             gate(spark.createDataFrame(b1 + b2, schema)).collect()}
    assert streamed == batch
    assert not any(i == 8 for i, _ in streamed)
