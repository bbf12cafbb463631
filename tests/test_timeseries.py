"""Time-series similarity search goldens (functions/timeseries.py):
PAA segment means, exact-quantile SAX symbolization, bucketed
candidate pairs with exact distance verification."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kafkadirect_spark.functions import timeseries

T0, T1 = "2024-01-01", "2024-01-31"


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")


def test_paa_hand_checked(spark):
    # 3 segments over a 30-day window (10 days each); user 1 has two
    # events in seg 0 (mean of 100c and 201c -> 150c truncating) and
    # one in seg 2; seg 1 empty -> 0
    rows = [
        (1, dt.datetime(2024, 1, 2), 1, "x", 1.00, "{}"),
        (2, dt.datetime(2024, 1, 9), 1, "x", 2.01, "{}"),
        (3, dt.datetime(2024, 1, 25), 1, "x", 5.00, "{}"),
        (4, dt.datetime(2024, 1, 15), 2, "x", 3.00, "{}"),
        # outside the window: dropped
        (5, dt.datetime(2024, 2, 5), 2, "x", 9.00, "{}"),
    ]
    out = {r.user_id: list(r.paa) for r in timeseries.paa_profiles(
        _events(spark, rows), "user_id", "ts", "value",
        T0, T1, n_segments=3).collect()}
    assert out[1] == [(100 + 201) // 2, 0, 500]
    assert out[2] == [0, 300, 0]


def test_sax_words_and_pairs_hand_checked(spark):
    paa = spark.createDataFrame(
        [(1, [100, 900, 500]), (2, [110, 950, 480]),
         (3, [900, 100, 500])],
        "user_id long, paa array<long>")
    words = timeseries.sax_words(paa, "user_id", [200, 600])
    w = {r.user_id: r.sax_word for r in words.collect()}
    # symbol = #breakpoints <= v: 100->0, 900->2, 500->1
    assert w == {1: "021", 2: "021", 3: "201"}
    pairs = timeseries.sax_candidate_pairs(words, "user_id").collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert (p.user_a, p.user_b, p.sax_word) == (1, 2, "021")
    assert p.dist2 == 10 * 10 + 50 * 50 + 20 * 20
    with pytest.raises(ValueError, match="ascending"):
        timeseries.sax_words(paa, "user_id", [600, 200])


def test_pipeline_matches_python_model(spark):
    """Full pipeline vs an independent python replication on the real
    events table — PAA truncating means, exact-rank breakpoints,
    symbolization, bucket pairs, exact distances."""
    import math

    from kafkadirect_spark.sources.batch import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")
    words, pairs, bks = timeseries.sax_pipeline(
        ev, "user_id", "ts", "value", T0, T1, n_segments=6,
        permilles=(500,))
    got_w = {r.user_id: (list(r.paa), r.sax_word)
             for r in words.collect()}
    got_p = sorted((r.user_a, r.user_b, r.dist2)
                   for r in pairs.collect())

    rows = ev.select("user_id", "ts", "value").collect()
    t0 = dt.datetime.fromisoformat(T0)
    t1 = dt.datetime.fromisoformat(T1)
    span = int((t1 - t0).total_seconds())
    acc: dict = {}
    for r in rows:
        if r.ts is None or r.value is None or not (t0 <= r.ts < t1):
            continue
        off = int(r.ts.timestamp()) - int(t0.timestamp())
        seg = min(max(off * 6 // span, 0), 5)
        cents = math.floor(r.value * 100)
        s, n = acc.get((r.user_id, seg), (0, 0))
        acc[(r.user_id, seg)] = (s + cents, n + 1)
    users = sorted({u for u, _ in acc})
    paa = {u: [acc.get((u, s), (0, 1))[0] // acc.get((u, s), (0, 1))[1]
               for s in range(6)] for u in users}
    means = sorted(m for v in paa.values() for m in v)
    rank = (500 * len(means) + 999) // 1000  # exact_quantiles rank
    want_bk = means[rank - 1]
    assert bks == [want_bk]
    want_w = {u: "".join(str(int(m >= 0 and want_bk <= m))
                         for m in v) for u, v in paa.items()}
    assert {u: w for u, (_, w) in got_w.items()} == want_w
    assert {u: p for u, (p, _) in got_w.items()} == paa
    want_p = []
    by_word: dict = {}
    for u, w in want_w.items():
        by_word.setdefault(w, []).append(u)
    for w, us in by_word.items():
        for i, a in enumerate(sorted(us)):
            for b in sorted(us)[i + 1:]:
                want_p.append((a, b, sum(
                    (x - y) ** 2 for x, y in zip(paa[a], paa[b]))))
    assert got_p == sorted(want_p)
    assert got_p, "binary alphabet over 6 segments must collide"


def test_sax_join_is_word_keyed(spark):
    """The candidate join must key on the word — no cartesian."""
    paa = spark.createDataFrame(
        [(i, [i * 10, 500]) for i in range(20)],
        "user_id long, paa array<long>")
    words = timeseries.sax_words(paa, "user_id", [95])
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        timeseries.sax_candidate_pairs(words, "user_id") \
            .explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sax_pairs_oracle_matches_engine(spark):
    """The DuckDB replay (sax_pairs_oracle_sql) is bit-identical to
    the engine pipeline on the real events table — PAA means,
    exact-rank breakpoints, words, distances all replayed."""
    import duckdb

    from kafkadirect_spark.sources.batch import load_table

    sf = "/root/testdata/sf0.01"
    ev = load_table(spark, sf, "events")
    _, pairs, _ = timeseries.sax_pipeline(
        ev, "user_id", "ts", "value", T0, T1, n_segments=6,
        permilles=(500,))
    eng = sorted(tuple(r) for r in pairs.collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * EXCLUDE (ts), "
        "CAST(ts AS TIMESTAMP) AS ts FROM "
        f"read_parquet('{sf}/events.parquet')")
    got = sorted(con.sql(timeseries.sax_pairs_oracle_sql(
        T0, T1, n_segments=6, permilles=(500,))).fetchall())
    assert got == eng and eng


def test_sax_max_bucket_cap(spark):
    """The hot-bucket guard drops oversized words before the join —
    engine and oracle agree with the cap on."""
    import duckdb

    from kafkadirect_spark.sources.batch import load_table

    paa = spark.createDataFrame(
        [(i, [100 if i < 5 else 900, 500]) for i in range(7)],
        "user_id long, paa array<long>")
    words = timeseries.sax_words(paa, "user_id", [500])
    # users 0-4 share word '01' (bucket of 5); 5-6 share '11'
    capped = timeseries.sax_candidate_pairs(words, "user_id",
                                            max_bucket=2).collect()
    assert {(r.user_a, r.user_b) for r in capped} == {(5, 6)}
    uncapped = timeseries.sax_candidate_pairs(words, "user_id").collect()
    assert len(uncapped) == 10 + 1

    # oracle mirrors the cap on the real table
    sf = "/root/testdata/sf0.01"
    ev = load_table(spark, sf, "events")
    _, pairs, _ = timeseries.sax_pipeline(
        ev, "user_id", "ts", "value", T0, T1, n_segments=6,
        permilles=(500,), max_bucket=4)
    eng = sorted(tuple(r) for r in pairs.collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * EXCLUDE (ts), "
        "CAST(ts AS TIMESTAMP) AS ts FROM "
        f"read_parquet('{sf}/events.parquet')")
    got = sorted(con.sql(timeseries.sax_pairs_oracle_sql(
        T0, T1, n_segments=6, permilles=(500,),
        max_bucket=4)).fetchall())
    assert got == eng


def test_sax_nearest_hand_checked(spark):
    pairs = spark.createDataFrame(
        [(1, 2, "w", 10), (1, 3, "w", 5), (2, 3, "w", 7)],
        "user_a long, user_b long, sax_word string, dist2 long")
    out = sorted((r.user_id, r.rank, r.neighbor_id, r.dist2)
                 for r in timeseries.sax_nearest(pairs, k=2).collect())
    assert out == [
        (1, 1, 3, 5), (1, 2, 2, 10),
        (2, 1, 3, 7), (2, 2, 1, 10),
        (3, 1, 1, 5), (3, 2, 2, 7),
    ]
    with pytest.raises(ValueError, match="k must"):
        timeseries.sax_nearest(pairs, k=0)


def test_sax_words_rejects_multi_digit_symbols(spark):
    """ADVICE r10: >= 10 symbols would concatenate multi-digit symbol
    strings into ambiguous words ([1,11] vs [11,1] both '111') —
    rejected in the engine and the oracle generator alike."""
    paa = spark.createDataFrame([(1, [5, 5])],
                                "user_id long, paa array<long>")
    with pytest.raises(ValueError, match="ambiguous"):
        timeseries.sax_words(paa, "user_id", list(range(10)))
    with pytest.raises(ValueError, match="ambiguous"):
        timeseries.sax_pairs_oracle_sql(
            T0, T1, permilles=tuple(range(1, 11)))
    # 9 breakpoints (10 symbols 0-9) remain legal; value 5 sits
    # above breakpoints {0..5} -> symbol 6
    out = timeseries.sax_words(paa, "user_id",
                               list(range(9))).collect()
    assert out[0].sax_word == "66"


def test_sax_oracle_colliding_ranks_and_iso_timestamps(spark):
    """ADVICE r10's two oracle corners: (a) permilles whose exact
    ranks collide at tiny n must still emit one breakpoint each (the
    engine's exact_quantiles does); (b) t0/t1 may be full ISO
    timestamps, not only date-only strings."""
    import duckdb

    rows = [
        # seed ts inside a sub-day window so ISO timestamps matter
        (i, dt.datetime(2024, 1, 1, 6, 0, 0)
         + dt.timedelta(minutes=37 * i % (12 * 60)),
         i % 5, "x", float(i % 7) + 0.25, "{}")
        for i in range(40)
    ]
    ev = _events(spark, rows)
    t0, t1 = "2024-01-01T06:00:00", "2024-01-01T18:00:00"
    # 3 segments x 5 users = 15 means; permilles 100 & 150 both rank
    # ceil(q*15/1000) in {2, 3} — close ranks, and at even smaller n
    # they collide outright; verify engine == oracle regardless
    permilles = (100, 150, 500, 900)
    _, pairs, bks = timeseries.sax_pipeline(
        ev, "user_id", "ts", "value", t0, t1, n_segments=3,
        permilles=permilles)
    assert len(bks) == len(permilles)
    eng = sorted(tuple(r) for r in pairs.collect())
    con = duckdb.connect()
    pdf = ev.toPandas()
    con.register("events", pdf)
    got = sorted(con.sql(timeseries.sax_pairs_oracle_sql(
        t0, t1, n_segments=3, permilles=permilles)).fetchall())
    assert got == eng

    # outright collision: n tiny enough that two permilles share one
    # exact rank — engine emits a duplicate breakpoint, oracle must too
    few = _events(spark, rows[:4])
    _, pairs2, bks2 = timeseries.sax_pipeline(
        few, "user_id", "ts", "value", t0, t1, n_segments=2,
        permilles=(100, 200, 900))
    assert len(bks2) == 3  # one per permille even when values repeat
    eng2 = sorted(tuple(r) for r in pairs2.collect())
    con2 = duckdb.connect()
    con2.register("events", few.toPandas())
    got2 = sorted(con2.sql(timeseries.sax_pairs_oracle_sql(
        t0, t1, n_segments=2, permilles=(100, 200, 900))).fetchall())
    assert got2 == eng2


def test_sax_nearest_brute_force_end_to_end(spark):
    """VERDICT r10 item 6: pin the k-NN tie-break (dist2 ASC,
    neighbor_id ASC) END-TO-END — words → bucketed pairs →
    sax_nearest — against a brute-force python oracle over a small
    user population with deliberate distance ties."""
    import itertools

    # 60 users, 4-dim PAA, values engineered so many pairs tie on
    # dist2 (values from a tiny alphabet) and several share words
    rows = [(u, [(u * 7 + i * 3) % 5 * 100 for i in range(4)])
            for u in range(60)]
    paa = spark.createDataFrame(rows, "user_id long, paa array<long>")
    words = timeseries.sax_words(paa, "user_id", [150, 350])
    pairs = timeseries.sax_candidate_pairs(words, "user_id")
    k = 3
    got = sorted((r.user_id, r.rank, r.neighbor_id, r.dist2)
                 for r in timeseries.sax_nearest(pairs, k=k).collect())

    # brute-force oracle: same bucketing rule in python, exact
    # distances, (dist2, neighbor_id) ascending, top-k per user
    def word(vec):
        return "".join(str(sum(1 for b in (150, 350) if b <= v))
                       for v in vec)

    vecs = dict(rows)
    cand: dict[int, list] = {u: [] for u in vecs}
    for a, b in itertools.combinations(sorted(vecs), 2):
        if word(vecs[a]) == word(vecs[b]):
            d2 = sum((x - y) ** 2 for x, y in zip(vecs[a], vecs[b]))
            cand[a].append((d2, b))
            cand[b].append((d2, a))
    want = []
    for u, lst in cand.items():
        for rank, (d2, nb) in enumerate(sorted(lst)[:k], start=1):
            want.append((u, rank, nb, d2))
    assert got == sorted(want) and got  # non-empty by construction
    # ties exist by construction — make sure the pin is exercised
    assert any(
        a[0] == b[0] and a[3] == b[3]
        for a, b in zip(got, got[1:]))


def test_sax_nearest_oracle_matches_engine(spark):
    """sax_nearest over the real events pipeline == the DuckDB
    replay (pairs oracle + symmetrize + exact-tie-break rank) — the
    k-NN surface is registration-ready."""
    import duckdb

    from kafkadirect_spark.sources.batch import load_table

    sf = "/root/testdata/sf0.01"
    ev = load_table(spark, sf, "events")
    _, pairs, _ = timeseries.sax_pipeline(
        ev, "user_id", "ts", "value", T0, T1, n_segments=6,
        permilles=(500,), max_bucket=64)
    eng = sorted(tuple(r) for r in
                 timeseries.sax_nearest(pairs, k=3).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * EXCLUDE (ts), "
        "CAST(ts AS TIMESTAMP) AS ts FROM "
        f"read_parquet('{sf}/events.parquet')")
    got = sorted(con.sql(timeseries.sax_nearest_oracle_sql(
        T0, T1, k=3, n_segments=6, permilles=(500,),
        max_bucket=64)).fetchall())
    assert got == eng and eng


# ---------------------------------------------------------------------------
# theil_sen_milli (round 13): integerized robust trend per group.


def test_theil_sen_hand_checked(spark):
    # group "up": points (t, v) = (0,1.0) (10,2.0) (20,4.0):
    # slopes milli/s floor(1000*dv_milli/dt): (1000*1000)//10=100000,
    # (3000*1000)//20=150000, (2000*1000)//10=200000 ->
    # median 150000.  group "down": a negative NON-divisible slope
    # pins the truncate-toward-zero convention both engines share
    # (Spark DIV == DuckDB BIGINT //; a floor would give -428572).
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), 1, "up", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 0, 0, 10), 1, "up", 2.0, "{}"),
        (3, dt.datetime(2024, 1, 1, 0, 0, 20), 1, "up", 4.0, "{}"),
        (4, dt.datetime(2024, 1, 1, 0, 0, 0), 2, "down", 4.0, "{}"),
        (5, dt.datetime(2024, 1, 1, 0, 0, 7), 2, "down", 1.0, "{}"),
        # one usable point + one same-second twin: no positive-dt pair
        (6, dt.datetime(2024, 1, 1, 0, 0, 0), 3, "flat", 1.0, "{}"),
        (7, dt.datetime(2024, 1, 1, 0, 0, 0), 3, "flat", 9.0, "{}"),
    ]
    out = {r.event_type: (r.n_points, r.n_pairs, r.slope_micro)
           for r in timeseries.theil_sen_milli(
               _events(spark, rows), "event_type", "ts",
               "value").collect()}
    assert out["up"] == (3, 3, 150000)
    # -3000*1000/7 = -428571.43 -> truncates to -428571 in BOTH engines
    assert out["down"] == (2, 1, -428571)
    assert out["flat"] == (2, 0, None)
    with pytest.raises(ValueError, match="max_points"):
        timeseries.theil_sen_milli(_events(spark, rows), "event_type",
                                   "ts", "value", max_points=1)


def test_theil_sen_robust_to_outlier(spark):
    # 9 points on an exact +1.0/s line plus one absurd outlier: the
    # median slope stays exactly 1_000_000 micro-units/s
    rows = [(i, dt.datetime(2024, 1, 1, 0, 0, i), 1, "x",
             float(i), "{}") for i in range(9)]
    rows.append((99, dt.datetime(2024, 1, 1, 0, 1, 0), 1, "x",
                 -5000.0, "{}"))
    out = timeseries.theil_sen_milli(
        _events(spark, rows), "event_type", "ts", "value").collect()[0]
    assert out.slope_micro == 1_000_000 and out.n_points == 10


def test_theil_sen_oracle_matches_engine(spark):
    """Engine == DuckDB on the real events per event_type (and per
    user for a 200-user slice) — point truncation order, floor
    slopes, lower-median rank replay exactly."""
    import duckdb

    from kafkadirect_spark.sources.batch import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    eng = sorted(tuple(r) for r in timeseries.theil_sen_milli(
        ev, "event_type", "ts", "value",
        order_break_col="event_id").collect())
    got = sorted(con.sql(timeseries.theil_sen_oracle_sql(
        "event_type", order_break_col="event_id")).fetchall())
    assert got == eng and len(eng) >= 3
    assert any(r[3] is not None for r in eng)
    eng_u = sorted(tuple(r) for r in timeseries.theil_sen_milli(
        ev.filter(F.col("user_id") < 200), "user_id", "ts", "value",
        max_points=16, order_break_col="event_id").collect())
    con.execute("CREATE VIEW ev_slice AS SELECT * FROM events "
                "WHERE user_id < 200")
    got_u = sorted(con.sql(timeseries.theil_sen_oracle_sql(
        "user_id", max_points=16, table="ev_slice",
        order_break_col="event_id")).fetchall())
    assert got_u == eng_u and len(eng_u) >= 10


def test_theil_sen_plan_is_bounded(spark):
    """The pair join is a group-key equi hash join (no cartesian
    product); every window is group-partitioned."""
    import contextlib
    import io
    import re

    rows = [(i, dt.datetime(2024, 1, 1, 0, 0, i), 1, "x",
             float(i), "{}") for i in range(5)]
    out = timeseries.theil_sen_milli(_events(spark, rows),
                                     "event_type", "ts", "value")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    for spec in re.findall(r"windowspecdefinition\([^)]*\)", plan):
        assert "g#" in spec, f"unpartitioned window: {spec}"


# ---------------------------------------------------------------------------
# cusum_changepoint_milli (round 14): sequential level-shift
# localization per group (Page 1954), prefix-sum closed form.


def test_cusum_hand_checked(spark):
    # group "shift": values 1.0 x4 then 3.0 x3 -> v_milli 1000/3000,
    # lower median of [1000 x4, 3000 x3] = 1000 -> devs 0,0,0,0,
    # 2000,2000,2000; P = 0,0,0,0,2000,4000,6000; S+ = P (min prefix
    # incl. empty = 0); S- = 0 everywhere.  h=3000: first alarm at
    # the 6th point (S+ = 4000).
    rows = [(i, dt.datetime(2024, 1, 1, 0, 0, i), 1, "shift",
             1.0 if i < 4 else 3.0, "{}") for i in range(7)]
    out = {r.event_type: r for r in timeseries.cusum_changepoint_milli(
        _events(spark, rows), "event_type", "ts", "value",
        h_milli=3000, order_break_col="event_id").collect()}
    r = out["shift"]
    assert (r.n_points, r.ref_milli) == (7, 1000)
    assert (r.max_cusum_pos, r.max_cusum_neg) == (6000, 0)
    assert r.changepoint_ts == dt.datetime(2024, 1, 1, 0, 0, 5)
    assert r.direction == "up"
    # downward shift mirrors through S-
    rows_d = [(i, dt.datetime(2024, 1, 1, 0, 0, i), 1, "drop",
               5.0 if i < 4 else 2.0, "{}") for i in range(7)]
    r2 = timeseries.cusum_changepoint_milli(
        _events(spark, rows_d), "event_type", "ts", "value",
        h_milli=3000, order_break_col="event_id").collect()[0]
    assert r2.direction == "down" and r2.max_cusum_neg == 9000
    assert r2.changepoint_ts == dt.datetime(2024, 1, 1, 0, 0, 5)
    # no alarm below threshold: NULL changepoint / direction
    r3 = timeseries.cusum_changepoint_milli(
        _events(spark, rows), "event_type", "ts", "value",
        h_milli=999_999, order_break_col="event_id").collect()[0]
    assert r3.changepoint_ts is None and r3.direction is None
    assert r3.max_cusum_pos == 6000        # stats still reported
    with pytest.raises(ValueError, match="h_milli"):
        timeseries.cusum_changepoint_milli(
            _events(spark, rows), "event_type", "ts", "value",
            h_milli=0)


def test_cusum_median_reference_is_robust(spark):
    # steady 2.0 with ONE absurd spike: the median reference stays
    # 2000, the spike inflates S+ for exactly one step and decays —
    # no alarm at h above the single-step excursion, while a MEAN
    # reference would have drifted every deviation.
    rows = [(i, dt.datetime(2024, 1, 1, 0, 0, i), 1, "x",
             2.0, "{}") for i in range(9)]
    rows[4] = (4, dt.datetime(2024, 1, 1, 0, 0, 4), 1, "x", 500.0, "{}")
    r = timeseries.cusum_changepoint_milli(
        _events(spark, rows), "event_type", "ts", "value",
        h_milli=600_000, order_break_col="event_id").collect()[0]
    assert r.ref_milli == 2000
    assert r.max_cusum_pos == 498_000      # the one-step excursion
    assert r.changepoint_ts is None        # h above it: no alarm
    # and a genuine PERSISTENT shift at the same h does alarm even
    # though every individual deviation is far below the spike (the
    # shifted tail stays the MINORITY so the median reference holds
    # at the pre-shift level)
    rows2 = [(i, dt.datetime(2024, 1, 1, 0, 0, i), 1, "x",
              2.0 if i < 20 else 72.0, "{}") for i in range(30)]
    r2 = timeseries.cusum_changepoint_milli(
        _events(spark, rows2), "event_type", "ts", "value",
        h_milli=600_000, order_break_col="event_id").collect()[0]
    assert r2.direction == "up" and r2.changepoint_ts is not None


def test_cusum_oracle_matches_engine(spark):
    """Engine == DuckDB on the real events per event_type (and per
    user for a 200-user slice) — median reference, prefix-sum CUSUM,
    first-alarm localization and the up/down tie rule replay
    exactly.  Registration candidate for r15."""
    import duckdb

    from kafkadirect_spark.sources.batch import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    eng = sorted(tuple(r) for r in timeseries.cusum_changepoint_milli(
        ev, "event_type", "ts", "value", h_milli=50_000,
        order_break_col="event_id").collect())
    got = sorted(con.sql(timeseries.cusum_changepoint_oracle_sql(
        "event_type", h_milli=50_000,
        order_break_col="event_id")).fetchall())
    assert got == eng and len(eng) == 5
    assert any(r[5] is not None for r in eng)     # real alarms fire
    eng_u = sorted(tuple(r) for r in timeseries.cusum_changepoint_milli(
        ev.filter(F.col("user_id") < 200), "user_id", "ts", "value",
        h_milli=20_000, order_break_col="event_id").collect())
    con.execute("CREATE VIEW ev_slice AS SELECT * FROM events "
                "WHERE user_id < 200")
    got_u = sorted(con.sql(timeseries.cusum_changepoint_oracle_sql(
        "user_id", h_milli=20_000, table="ev_slice",
        order_break_col="event_id")).fetchall())
    assert got_u == eng_u and len(eng_u) >= 10


def _py_cusum(points, h):
    """Independent sequential model: the TEXTBOOK recursive CUSUM
    (not the prefix-sum closed form the engine uses)."""
    pts = sorted(points)                    # (t, v_milli, brk)
    vals = sorted(v for _, v, _ in pts)
    ref = vals[(len(vals) + 1) // 2 - 1]
    sp = sn = maxp = maxn = 0
    cut = None
    for i, (t, v, _) in enumerate(pts):
        sp = max(0, sp + (v - ref))
        sn = max(0, sn - (v - ref))
        maxp, maxn = max(maxp, sp), max(maxn, sn)
        if cut is None and (sp > h or sn > h):
            cut = (t, "up" if sp >= sn else "down")
    return (len(pts), ref, maxp, maxn,
            cut[0] if cut else None, cut[1] if cut else None)


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.tuples(st.integers(0, 50),            # second offset
              st.integers(-40, 40),          # value (integral -> the
                                             # milli quantization is
                                             # exact on both sides)
              st.sampled_from(["a", "b"])),  # group
    min_size=1, max_size=40))
def test_cusum_matches_python_model(spark, rows):
    """The distributed prefix-sum closed form == the textbook
    sequential recursion, on arbitrary integer series."""
    data = [(i, dt.datetime(2024, 1, 1, 0, 0, 0)
             + dt.timedelta(seconds=s), 1, g, float(v), "{}")
            for i, (s, v, g) in enumerate(rows)]
    h = 5000
    got = {r.event_type:
           (r.n_points, r.ref_milli, r.max_cusum_pos, r.max_cusum_neg,
            r.changepoint_ts, r.direction)
           for r in timeseries.cusum_changepoint_milli(
               _events(spark, data), "event_type", "ts", "value",
               h_milli=h, order_break_col="event_id").collect()}
    for g in {g for _, _, g in rows}:
        pts = [(dt.datetime(2024, 1, 1, 0, 0, 0)
                + dt.timedelta(seconds=s), v * 1000, i)
               for i, (s, v, gg) in enumerate(rows) if gg == g]
        assert got[g] == _py_cusum(pts, h), g


def test_cusum_plan_is_bounded(spark):
    """Every window is group-partitioned; the reference join is a
    group-key hash join (no cartesian product)."""
    import contextlib
    import io
    import re

    rows = [(i, dt.datetime(2024, 1, 1, 0, 0, i), 1, "x",
             float(i), "{}") for i in range(5)]
    out = timeseries.cusum_changepoint_milli(
        _events(spark, rows), "event_type", "ts", "value",
        h_milli=1000)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for spec in re.findall(r"windowspecdefinition\([^)]*\)", plan):
        assert "g#" in spec, f"unpartitioned window: {spec}"


# ---------------------------------------------------------------------------
# twap_milli (round 14): LOCF time-weighted average over a window.


def test_twap_hand_checked(spark):
    # group "x" over [00:00, 00:10): samples at t=0 (v=1.0, holds
    # 4 s), t=4 (v=3.0, holds 2 s), t=6 (v=5.0, holds to end: 4 s)
    # -> twap = (1000*4 + 3000*2 + 5000*4) // 10 = 3000
    rows = [(1, dt.datetime(2024, 1, 1, 0, 0, 0), 1, "x", 1.0, "{}"),
            (2, dt.datetime(2024, 1, 1, 0, 0, 4), 1, "x", 3.0, "{}"),
            (3, dt.datetime(2024, 1, 1, 0, 0, 6), 1, "x", 5.0, "{}"),
            # out-of-window sample must be excluded
            (4, dt.datetime(2024, 1, 1, 0, 0, 20), 1, "x", 9.9, "{}")]
    out = timeseries.twap_milli(
        _events(spark, rows), "event_type", "ts", "value",
        "2024-01-01 00:00:00", "2024-01-01 00:00:10",
        order_break_col="event_id").collect()[0]
    assert (out.n_samples, out.covered_s, out.twap_milli) == (3, 10, 3000)
    # burst robustness: 5 rapid same-second samples of 100.0 inside a
    # window otherwise held at 1.0 barely move TWAP (row mean would
    # read ~67): samples t=0 v=1.0 then five at t=8 (first four hold
    # 0 s, the last holds 2 s) -> (1000*8 + 100000*2) // 10 = 20800
    rows2 = [(1, dt.datetime(2024, 1, 1, 0, 0, 0), 1, "y", 1.0, "{}")]
    rows2 += [(2 + j, dt.datetime(2024, 1, 1, 0, 0, 8), 1, "y",
               100.0, "{}") for j in range(5)]
    out2 = timeseries.twap_milli(
        _events(spark, rows2), "event_type", "ts", "value",
        "2024-01-01 00:00:00", "2024-01-01 00:00:10",
        order_break_col="event_id").collect()[0]
    assert out2.twap_milli == 20800 and out2.n_samples == 6
    with pytest.raises(ValueError, match="t1 must"):
        timeseries.twap_milli(_events(spark, rows), "event_type",
                              "ts", "value", "2024-01-02",
                              "2024-01-01")


def test_twap_oracle_matches_engine(spark):
    """Engine == DuckDB on the real events per event_type and per
    200-user slice — LOCF lead, whole-second holds, truncating
    weighted mean.  Registration candidate for r15."""
    import duckdb

    from kafkadirect_spark.sources.batch import load_table

    sf = "/root/testdata/sf0.001"
    T0, T1 = "2024-01-01", "2024-01-31"
    ev = load_table(spark, sf, "events")
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    eng = sorted(tuple(r) for r in timeseries.twap_milli(
        ev, "event_type", "ts", "value", T0, T1,
        order_break_col="event_id").collect())
    got = sorted(con.sql(timeseries.twap_oracle_sql(
        T0, T1, "event_type", order_break_col="event_id")).fetchall())
    assert got == eng and len(eng) == 5
    eng_u = sorted(tuple(r) for r in timeseries.twap_milli(
        ev.filter(F.col("user_id") < 200), "user_id", "ts", "value",
        T0, T1, order_break_col="event_id").collect())
    con.execute("CREATE VIEW ev_slice AS SELECT * FROM events "
                "WHERE user_id < 200")
    got_u = sorted(con.sql(timeseries.twap_oracle_sql(
        T0, T1, "user_id", table="ev_slice",
        order_break_col="event_id")).fetchall())
    assert got_u == eng_u and len(eng_u) >= 10


def test_twap_plan_is_bounded(spark):
    """One group-partitioned lead window + one aggregate — no global
    window, no cartesian."""
    import contextlib
    import io
    import re

    rows = [(i, dt.datetime(2024, 1, 1, 0, 0, i), 1, "x",
             float(i), "{}") for i in range(5)]
    out = timeseries.twap_milli(_events(spark, rows), "event_type",
                                "ts", "value", "2024-01-01",
                                "2024-01-02")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    for spec in re.findall(r"windowspecdefinition\([^)]*\)", plan):
        assert "g#" in spec, f"unpartitioned window: {spec}"


# ---------------------------------------------------------------------------
# acf_milli (round 15): per-group rank-lag autocorrelation.


def test_acf_hand_checked(spark):
    # alternating 0/1 series, n=4: n-scaled devs are ∓2000, so
    # den = 4·2000², num(1) = 3 pairs of opposite sign → -750
    # (the classical biased estimator divides by the FULL-series
    # den, so finite alternation reads -750, not -1000), and
    # num(2) = 2 same-sign pairs → +500
    rows = [(i, dt.datetime(2024, 1, 1, 0, 0, i), 1, "x",
             float(i % 2), "{}") for i in range(4)]
    out = {(r.event_type, r.lag): r for r in timeseries.acf_milli(
        _events(spark, rows), "event_type", "ts", "value",
        lags=(1, 2), order_break_col="event_id").collect()}
    assert out[("x", 1)].acf_milli == -750
    assert out[("x", 1)].n_pairs == 3
    assert out[("x", 2)].acf_milli == 500
    assert out[("x", 2)].n_pairs == 2
    assert out[("x", 1)].n_points == 4
    # a constant group has zero variance: excluded, not divided by 0
    const = [(10 + i, dt.datetime(2024, 1, 1, 0, 1, i), 1, "c",
              7.0, "{}") for i in range(5)]
    got = timeseries.acf_milli(
        _events(spark, rows + const), "event_type", "ts", "value",
        lags=(1,), order_break_col="event_id").collect()
    assert {r.event_type for r in got} == {"x"}
    # lags >= the group's point count emit nothing
    assert timeseries.acf_milli(
        _events(spark, rows), "event_type", "ts", "value",
        lags=(9,), order_break_col="event_id").count() == 0
    with pytest.raises(ValueError, match="lags"):
        timeseries.acf_milli(_events(spark, rows), "event_type",
                             "ts", "value", lags=(0,))
    with pytest.raises(ValueError, match="max_points"):
        timeseries.acf_milli(_events(spark, rows), "event_type",
                             "ts", "value", max_points=1)


def test_acf_periodicity_detection(spark):
    """The design claim: a clean period-5 cycle spikes positive at
    lag 5 and reads negative at the half-period offsets."""
    cyc = [0.0, 10.0, 20.0, 10.0, 0.0]
    rows = [(i, dt.datetime(2024, 1, 1, 0, 0, 0)
             + dt.timedelta(seconds=i), 1, "p", cyc[i % 5], "{}")
            for i in range(40)]
    out = {r.lag: r.acf_milli for r in timeseries.acf_milli(
        _events(spark, rows), "event_type", "ts", "value",
        lags=(1, 2, 3, 5), order_break_col="event_id").collect()}
    assert out[5] > 800                      # the cycle echoes
    # (the classical biased estimator keeps the full-series den,
    # so 8 clean cycles over 40 points read ~0.875, not 1.0)
    assert out[5] > out[1] > out[2]          # and dominates
    assert out[2] < 0 and out[3] < 0         # anti-phase offsets


def _py_acf(vals, lags):
    """Independent model: exact integer replay of the n-scaled
    estimator with the sign/magnitude split."""
    n, s = len(vals), sum(vals)
    d = [n * v - s for v in vals]
    den = sum(x * x for x in d)
    out = {}
    for L in lags:
        pairs = [(d[i], d[i + L]) for i in range(n - L)] if L < n else []
        if not pairs or den == 0:
            continue
        num = sum(a * b for a, b in pairs)
        sign = -1 if num < 0 else 1
        out[L] = (len(pairs), sign * (1000 * abs(num) // den))
    return out


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.tuples(st.integers(0, 50),            # second offset
              st.integers(-40, 40),          # integral value
              st.sampled_from(["a", "b"])),  # group
    min_size=1, max_size=40))
def test_acf_matches_python_model(spark, rows):
    data = [(i, dt.datetime(2024, 1, 1, 0, 0, 0)
             + dt.timedelta(seconds=s), 1, g, float(v), "{}")
            for i, (s, v, g) in enumerate(rows)]
    lags = (1, 2, 7)
    got = {(r.event_type, r.lag):
           (r.n_points, r.n_pairs, r.acf_milli)
           for r in timeseries.acf_milli(
               _events(spark, data), "event_type", "ts", "value",
               lags=lags, order_break_col="event_id").collect()}
    want = {}
    for g in {g for _, _, g in rows}:
        pts = sorted(
            (dt.datetime(2024, 1, 1, 0, 0, 0)
             + dt.timedelta(seconds=s), v * 1000, i)
            for i, (s, v, gg) in enumerate(rows) if gg == g)
        vals = [v for _, v, _ in pts]
        for L, (np_, am) in _py_acf(vals, lags).items():
            want[(g, L)] = (len(vals), np_, am)
    assert got == want


def test_acf_oracle_matches_engine(spark):
    """Engine == DuckDB on the real events per event_type and per
    200-user slice.  Registration candidate for r16."""
    import duckdb

    from kafkadirect_spark.sources.batch import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    eng = sorted(tuple(r) for r in timeseries.acf_milli(
        ev, "event_type", "ts", "value",
        order_break_col="event_id").collect())
    got = sorted(con.sql(timeseries.acf_oracle_sql(
        "event_type", order_break_col="event_id")).fetchall())
    assert got == eng and len(eng) == 20      # 5 types × 4 lags
    eng_u = sorted(tuple(r) for r in timeseries.acf_milli(
        ev.filter(F.col("user_id") < 200), "user_id", "ts", "value",
        lags=(1, 3), max_points=64,
        order_break_col="event_id").collect())
    con.execute("CREATE VIEW ev_slice AS SELECT * FROM events "
                "WHERE user_id < 200")
    got_u = sorted(con.sql(timeseries.acf_oracle_sql(
        "user_id", lags=(1, 3), max_points=64, table="ev_slice",
        order_break_col="event_id")).fetchall())
    assert got_u == eng_u and len(eng_u) >= 10


def test_acf_plan_is_bounded(spark):
    """Every window is group-partitioned, joins are group-keyed (no
    cartesian product), and the whole estimator pays ONE corpus
    exchange — the rank window's; the stats/den/num aggregates and
    the final join all reuse its partitioning."""
    import contextlib
    import io
    import re

    rows = [(i, dt.datetime(2024, 1, 1, 0, 0, i), 1, "x",
             float(i % 3), "{}") for i in range(8)]
    out = timeseries.acf_milli(_events(spark, rows), "event_type",
                               "ts", "value", lags=(1, 2))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    for spec in re.findall(r"windowspecdefinition\([^)]*\)", plan):
        assert "g#" in spec, f"unpartitioned window: {spec}"
    n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_ex <= 1, f"{n_ex} exchanges:\n{plan[:2000]}"


# ---------------------------------------------------------------------------
# seasonal_profile_milli (round 15): classical additive decomposition
# + seasonal strength.


def test_seasonal_profile_hand_checked(spark):
    # clean period-3 cycle [10, 20, 30] milli × 4: interior trend is
    # (10+20+30) DIV 3 = 20 everywhere, so detrended is exactly the
    # phase offset (-10 / 0 / +10), medians center to themselves
    # (adj = 0), remainder is all-zero -> strength 1000
    cyc = [0.010, 0.020, 0.030]
    rows = [(i, dt.datetime(2024, 1, 1, 0, 0, i), 1, "x",
             cyc[i % 3], "{}") for i in range(12)]
    out = {r.phase: r for r in timeseries.seasonal_profile_milli(
        _events(spark, rows), "event_type", "ts", "value", period=3,
        order_break_col="event_id").collect()}
    # trend rows are rn 2..11 -> phase 1 sees 4 obs, phases 0/2 see 3
    assert (out[0].n_obs, out[0].seasonal_milli) == (3, -10)
    assert (out[1].n_obs, out[1].seasonal_milli) == (4, 0)
    assert (out[2].n_obs, out[2].seasonal_milli) == (3, 10)
    assert all(r.strength_milli == 1000 for r in out.values())
    # a pure ramp has NO seasonality: detrended is constant 0 ->
    # zero variance -> the group is excluded (strength undefined)
    ramp = [(i, dt.datetime(2024, 1, 1, 0, 1, i), 1, "r",
             float(i), "{}") for i in range(12)]
    got = timeseries.seasonal_profile_milli(
        _events(spark, rows + ramp), "event_type", "ts", "value",
        period=3, order_break_col="event_id")
    assert {r.event_type for r in got.collect()} == {"x"}
    with pytest.raises(ValueError, match="odd"):
        timeseries.seasonal_profile_milli(
            _events(spark, rows), "event_type", "ts", "value",
            period=4)
    with pytest.raises(ValueError, match="max_points"):
        timeseries.seasonal_profile_milli(
            _events(spark, rows), "event_type", "ts", "value",
            period=5, max_points=3)


def test_seasonal_profile_noisy_cycle_scores_high(spark):
    """The design claim: a cycle buried under a linear trend still
    profiles correctly (the MA removes the ramp) and scores a high
    strength, while shuffled values score near zero."""
    import random

    cyc = [0, 40, 80, 40, 0]
    vals = [i * 0.003 + cyc[i % 5] / 1000 for i in range(60)]
    shuf = vals[:]
    random.Random(5).shuffle(shuf)
    rows = [(i, dt.datetime(2024, 1, 1, 0, 0, 0)
             + dt.timedelta(seconds=i), 1, "cyc", vals[i], "{}")
            for i in range(60)]
    rows += [(100 + i, dt.datetime(2024, 1, 1, 0, 0, 0)
              + dt.timedelta(seconds=i), 1, "rnd", shuf[i], "{}")
             for i in range(60)]
    out = {(r.event_type, r.phase): r
           for r in timeseries.seasonal_profile_milli(
               _events(spark, rows), "event_type", "ts", "value",
               period=5, order_break_col="event_id").collect()}
    cyc_strength = out[("cyc", 0)].strength_milli
    rnd_strength = out[("rnd", 0)].strength_milli
    assert cyc_strength > 900 > rnd_strength
    # the profile recovers the cycle's shape ordering
    s = {ph: out[("cyc", ph)].seasonal_milli for ph in range(5)}
    assert s[2] > s[1] > s[0] and s[2] > s[3] > s[4]


def _py_seasonal(vals, period):
    """Independent model: exact integer replay (python // floors, so
    negative truncating divisions are spelled out — this is the
    negative-division parity re-pin)."""
    def trunc_div(a, b):
        return a // b if a >= 0 else -((-a) // b)

    n, h = len(vals), (period - 1) // 2
    tr = [(i, vals[i] - trunc_div(sum(vals[i - h:i + h + 1]), period))
          for i in range(n) if i - h >= 0 and i + h < n]
    if not tr:
        return {}
    from collections import defaultdict
    by = defaultdict(list)
    for i, d in tr:
        by[i % period].append((d, i))
    sk, m = {}, {}
    for ph, lst in by.items():
        lst.sort()
        m[ph] = len(lst)
        sk[ph] = lst[(len(lst) + 1) // 2 - 1][0]
    c = trunc_div(sum(sk.values()), len(sk))
    s = {ph: v - c for ph, v in sk.items()}
    ds = [d for _, d in tr]
    rs = [d - s[i % period] for i, d in tr]
    mg = len(tr)
    vd = mg * sum(d * d for d in ds) - sum(ds) ** 2
    vr = mg * sum(r * r for r in rs) - sum(rs) ** 2
    if vd <= 0:
        return {}
    st = max(0, 1000 - (1000 * vr) // vd)
    return {ph: (m[ph], s[ph], st) for ph in sk}


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.tuples(st.integers(0, 50),            # second offset
              st.integers(-40, 40),          # integral value
              st.sampled_from(["a", "b"])),  # group
    min_size=1, max_size=40))
def test_seasonal_profile_matches_python_model(spark, rows):
    data = [(i, dt.datetime(2024, 1, 1, 0, 0, 0)
             + dt.timedelta(seconds=s), 1, g, float(v), "{}")
            for i, (s, v, g) in enumerate(rows)]
    got = {(r.event_type, r.phase):
           (r.n_obs, r.seasonal_milli, r.strength_milli)
           for r in timeseries.seasonal_profile_milli(
               _events(spark, data), "event_type", "ts", "value",
               period=3, order_break_col="event_id").collect()}
    want = {}
    for g in {g for _, _, g in rows}:
        pts = sorted(
            (dt.datetime(2024, 1, 1, 0, 0, 0)
             + dt.timedelta(seconds=s), v * 1000, i)
            for i, (s, v, gg) in enumerate(rows) if gg == g)
        for ph, t in _py_seasonal([v for _, v, _ in pts], 3).items():
            want[(g, ph)] = t
    assert got == want


def test_seasonal_profile_oracle_matches_engine(spark):
    """Engine == DuckDB on the real events per event_type and per
    200-user slice.  Registration candidate for r16."""
    import duckdb

    from kafkadirect_spark.sources.batch import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    eng = sorted(tuple(r) for r in timeseries.seasonal_profile_milli(
        ev, "event_type", "ts", "value", period=5,
        order_break_col="event_id").collect())
    got = sorted(con.sql(timeseries.seasonal_profile_oracle_sql(
        "event_type", period=5,
        order_break_col="event_id")).fetchall())
    assert got == eng and len(eng) == 25      # 5 types × 5 phases
    eng_u = sorted(tuple(r) for r in timeseries.seasonal_profile_milli(
        ev.filter(F.col("user_id") < 200), "user_id", "ts", "value",
        period=3, max_points=64,
        order_break_col="event_id").collect())
    con.execute("CREATE VIEW ev_slice2 AS SELECT * FROM events "
                "WHERE user_id < 200")
    got_u = sorted(con.sql(timeseries.seasonal_profile_oracle_sql(
        "user_id", period=3, max_points=64, table="ev_slice2",
        order_break_col="event_id")).fetchall())
    assert got_u == eng_u and len(eng_u) >= 10


def test_seasonal_profile_plan_is_bounded(spark):
    """Every window is group-partitioned (the (g, phase) specs
    co-locate on g) and the whole decomposition pays ONE corpus
    exchange — no join, no groupBy, no collect."""
    import contextlib
    import io
    import re

    rows = [(i, dt.datetime(2024, 1, 1, 0, 0, i), 1, "x",
             float(i % 3), "{}") for i in range(9)]
    out = timeseries.seasonal_profile_milli(
        _events(spark, rows), "event_type", "ts", "value", period=3)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    for spec in re.findall(r"windowspecdefinition\([^)]*\)", plan):
        assert "g#" in spec, f"unpartitioned window: {spec}"
    n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_ex <= 1, f"{n_ex} exchanges:\n{plan[:2000]}"
