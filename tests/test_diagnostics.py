"""Skew diagnostics (functions/diagnostics.py)."""

import duckdb
import pandas as pd
import pytest

from kafkadirect_spark.functions import diagnostics


def _skewed(spark):
    # 'hot' 60 rows, 'warm' 30, eight cold keys 1-2 rows each
    rows = [(i, "hot") for i in range(60)]
    rows += [(i, "warm") for i in range(60, 90)]
    rows += [(90 + i, f"c{i % 8}") for i in range(12)]
    return spark.createDataFrame(rows, "id long, k string")


def test_skew_report_values(spark):
    out = {(r.stat, r.key): r.value for r in
           diagnostics.skew_report(_skewed(spark), "k", parts=10,
                                   top_k=3).collect()}
    assert out[("total_rows", None)] == 102
    assert out[("distinct_keys", None)] == 10
    assert out[("max_key_rows", None)] == 60
    # counts sorted: [1,1,1,1,2,2,2,2,30,60]; ceil-rank cover:
    # p50 -> rank 5 -> 2; p99 -> rank 10 -> 60
    assert out[("p50_key_rows", None)] == 2
    assert out[("p99_key_rows", None)] == 60
    assert out[("top1_share_ppm", None)] == 1_000_000 * 60 // 102
    # hot key needs ceil(60*10/102) = 6 sub-keys to level out
    assert out[("suggested_salt", None)] == 6
    assert out[("heavy_key", "hot")] == 60
    assert out[("heavy_key", "warm")] == 30
    assert len([k for k in out if k[0] == "heavy_key"]) == 3


def test_skew_report_uniform_needs_no_salt(spark):
    df = spark.createDataFrame([(i, f"k{i % 8}") for i in range(80)],
                               "id long, k string")
    out = {r.stat: r.value for r in
           diagnostics.skew_report(df, "k", parts=8).collect()
           if r.key is None}
    assert out["suggested_salt"] == 1
    assert out["max_key_rows"] == out["p50_key_rows"] == 10


def test_skew_report_oracle_parity_and_guards(spark):
    df = _skewed(spark)
    got = sorted(tuple(r) for r in
                 diagnostics.skew_report(df, "k", parts=10,
                                         top_k=4).collect())
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = sorted(tuple(r) for r in con.sql(
        diagnostics.skew_report_sql("t", "k", parts=10,
                                    top_k=4)).fetchall())
    assert got == want
    with pytest.raises(ValueError):
        diagnostics.skew_report(df, "k", parts=0)
    with pytest.raises(ValueError):
        diagnostics.skew_report(df, "k", top_k=0)


def test_skew_report_null_key_counted(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (4, None)],
        "id long, k string")
    out = diagnostics.skew_report(df, "k", parts=4, top_k=2).collect()
    stats = {r.stat: r.value for r in out if r.key is None
             and r.stat != "heavy_key"}
    heavy = [(r.key, r.value) for r in out if r.stat == "heavy_key"]
    assert stats["distinct_keys"] == 2
    assert stats["max_key_rows"] == 3
    # NULL is a real key and may appear in the heavy list
    assert (None, 3) in heavy


def test_mad_outliers_model(spark):
    # group 'a': values 1..9 plus a 1000 spike; med=5 (ceil-rank of
    # 10 values -> rank 5), abs devs sorted: [0,1,1,2,2,3,3,4,4,995]
    # -> MAD=2; flag |v-5| > 6 -> only the spike.
    # group 'b': all equal -> MAD 0 -> any deviation flags.
    rows = [(i, "a", v) for i, v in enumerate(
        [1, 2, 3, 4, 5, 6, 7, 8, 9, 1000])]
    rows += [(100 + i, "b", 7) for i in range(5)] + [(200, "b", 8)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    out = diagnostics.mad_outliers(df, "g", "v", k=3).collect()
    got = {(r.g, r.id): (r.med, r.abs_dev, r.mad) for r in out}
    assert got == {("a", 9): (5, 995, 2), ("b", 200): (7, 1, 0)}


def test_mad_outliers_sigma_blindspot(spark):
    # the case the mean/sigma rule misses: one huge spike inflates
    # sigma so a second, smaller-but-real outlier hides under 3-sigma;
    # MAD flags both
    vals = [10] * 40 + [11] * 40 + [9] * 18 + [500, 100_000]
    df = spark.createDataFrame([(i, "g", v) for i, v in enumerate(vals)],
                               "id long, g string, v long")
    import statistics
    mu, sd = statistics.mean(vals), statistics.pstdev(vals)
    sigma_flags = {i for i, v in enumerate(vals) if abs(v - mu) > 3 * sd}
    mad_flags = {r.id for r in
                 diagnostics.mad_outliers(df, "g", "v", k=3).collect()}
    assert {len(vals) - 2, len(vals) - 1} <= mad_flags  # MAD gets both
    assert len(vals) - 2 not in sigma_flags  # sigma hides the 500


def test_mad_outliers_oracle_parity(spark):
    import random
    rng = random.Random(7)
    rows = [(i, rng.choice("xy"), rng.randrange(-50, 50) ** 3)
            for i in range(300)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    got = sorted(tuple(r) for r in
                 diagnostics.mad_outliers(df, "g", "v", k=3)
                 .select("id", "g", "v", "med", "abs_dev", "mad")
                 .collect())
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["id", "g", "v"]))
    want = sorted(tuple(r) for r in con.sql(
        diagnostics.mad_outliers_sql("t", "id", "g", "v", "v",
                                     k=3)).fetchall())
    assert got == want
    with pytest.raises(ValueError):
        diagnostics.mad_outliers(df, "g", "v", k=0)


def test_empty_inputs_fail_or_degrade_cleanly(spark):
    from kafkadirect_spark.functions import sketch

    empty = spark.createDataFrame([], "id long, k string, v long")
    with pytest.raises(ValueError, match="no rows"):
        diagnostics.skew_report(empty, "k")
    # bucketize on empty/all-null input: no cuts -> bucket 0 for any
    # (nonexistent) non-null value; no crash
    assert sketch.bucketize_by_quantiles(empty, "v", 4).count() == 0
    nulls = spark.createDataFrame([(1, None)], "id long, v long")
    out = sketch.bucketize_by_quantiles(nulls, "v", 4).collect()
    assert out[0].bucket is None


def test_embedding_profile_flags_defects(spark):
    rows = [(1, [3.0, 4.0]),        # norm 5.0 -> 5000
            (2, [0.0, 0.0]),        # zero vector
            (3, None),              # null vector
            (4, [1.0, 0.0, 0.0])]   # ragged dim
    df = spark.createDataFrame(rows, "id long, v array<double>")
    out = diagnostics.embedding_profile(df, "v").collect()[0]
    assert (out.n_vectors, out.null_vectors) == (4, 1)
    assert (out.dim_min, out.dim_max) == (2, 3)
    assert out.zero_vectors == 1
    # norms: [5000, 0, 1000]; ceil-rank p50 -> rank 2 -> 1000
    assert out.norm_p50 == 1000
    assert out.norm_p99 == 5000
    # oracle parity incl. the empty-array and null edge
    import duckdb
    import pandas as pd
    con = duckdb.connect()
    con.register("e", pd.DataFrame(
        {"id": [1, 2, 3, 4],
         "v": [[3.0, 4.0], [0.0, 0.0], None, [1.0, 0.0, 0.0]]}))
    want = con.sql(diagnostics.embedding_profile_sql("e", "v")).fetchall()
    assert [tuple(out)] == [tuple(r) for r in want]


def test_join_cardinality_exact_vs_actual_join(spark):
    a = spark.createDataFrame(
        [(1, "k1"), (2, "k1"), (3, "k2"), (4, None), (5, "only_a")],
        "id long, k string")
    b = spark.createDataFrame(
        [(10, "k1"), (11, "k1"), (12, "k1"), (13, "k2"), (14, None),
         (15, "only_b")],
        "id long, k string")
    out = diagnostics.join_cardinality(a, b, "k", "k").collect()[0]
    actual = a.join(b.withColumnRenamed("id", "id2"), "k").count()
    assert out.join_rows == actual == 2 * 3 + 1 * 1
    assert (out.rows_a, out.rows_b) == (4, 5)      # nulls excluded
    assert (out.distinct_keys_a, out.distinct_keys_b) == (3, 3)
    assert out.shared_keys == 2
    assert out.amplification_ppm == 1_000_000 * 7 // 5
    # oracle parity
    con = duckdb.connect()
    con.register("ta", a.toPandas())
    con.register("tb", b.toPandas())
    want = con.sql(diagnostics.join_cardinality_sql(
        "ta", "k", "tb", "k")).fetchall()
    assert [tuple(out)] == [tuple(r) for r in want]


def test_join_cardinality_disjoint_and_empty(spark):
    a = spark.createDataFrame([(1, "x")], "id long, k string")
    b = spark.createDataFrame([(2, "y")], "id long, k string")
    out = diagnostics.join_cardinality(a, b, "k", "k").collect()[0]
    assert (out.shared_keys, out.join_rows, out.amplification_ppm) \
        == (0, 0, 0)
    empty = spark.createDataFrame([], "id long, k string")
    out = diagnostics.join_cardinality(a, empty, "k", "k").collect()[0]
    assert (out.rows_b, out.join_rows) == (0, 0)


def test_histogram_drift_hand_computed(spark):
    from kafkadirect_spark.functions import diagnostics

    # A: 4 values in bin 0, 4 in bin 5; B: 2 in bin 0, 6 in bin 5
    a = spark.createDataFrame([(0,)] * 4 + [(55,)] * 4, "v long")
    b = spark.createDataFrame([(1,)] * 2 + [(59,)] * 6, "v long")
    out = {r.bin: (r.c_a, r.c_b, r.drift_ppm) for r in
           diagnostics.histogram_drift(a, b, "v", lo=0, hi=100,
                                       bins=10).collect()}
    # |4·8 − 2·8|·1e6 // 64 = 250000 ; |4·8 − 6·8|·1e6 // 64 = 250000
    assert out == {0: (4, 2, 250_000), 5: (4, 6, 250_000)}
    # TVD in ppm = Σ/2 = 250000 — the two distributions differ by 25%


def test_histogram_drift_one_sided_bins_and_clamp(spark):
    from kafkadirect_spark.functions import diagnostics

    a = spark.createDataFrame([(5,), (999,)], "v long")   # 999 clamps to bin 9
    b = spark.createDataFrame([(5,)], "v long")
    out = {r.bin: (r.c_a, r.c_b, r.drift_ppm) for r in
           diagnostics.histogram_drift(a, b, "v", lo=0, hi=100,
                                       bins=10).collect()}
    # bin 0: |1·1 − 1·2|·1e6 // 2 = 500000 ; bin 9 absent from B entirely
    assert out == {0: (1, 1, 500_000), 9: (1, 0, 500_000)}


def test_histogram_drift_identical_slices_are_zero(spark):
    from kafkadirect_spark.functions import diagnostics

    a = spark.createDataFrame([(i % 40,) for i in range(100)], "v long")
    out = diagnostics.histogram_drift(a, a, "v", lo=0, hi=100, bins=10)
    assert {r.drift_ppm for r in out.collect()} == {0}


def test_histogram_drift_rejects_empty_side(spark):
    import pytest as _pytest

    from kafkadirect_spark.functions import diagnostics

    a = spark.createDataFrame([(1,)], "v long")
    empty = a.filter("v < 0")
    with _pytest.raises(ValueError, match="at least one"):
        diagnostics.histogram_drift(a, empty, "v", lo=0, hi=100, bins=10)
