"""Warehouse/pipeline analytics beyond the reference surface, round 5
batch 4 — sketches and deterministic ordering primitives, oracle-paired.

The reference engine has neither approximate aggregation nor a global
ordering primitive (Kafka Streams state is exact and per-partition;
SURVEY.md §2.4).  These are the operations a 100 TB training-data
warehouse adds on top: cardinality sketches whose registers merge
without re-reading data, and hash-deterministic global
shuffles/samples that are stable under re-runs and data growth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafkadirect_spark.functions import sketch
from kafkadirect_spark.plans.queries import query
from kafkadirect_spark.sources.batch import load_table


@query(
    "distinct_orders_hll",
    oracle=sketch.oracle_sql("lineitem", "l_orderkey"),
)
def distinct_orders_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct-order count over lineitem via the
    deterministic HyperLogLog sketch (functions/sketch.py): p=10 →
    1024 integer registers, portable md5 hashing, pure-integer
    estimator — an APPROXIMATE algorithm with an EXACT cross-engine
    oracle (DuckDB replays registers and estimate bit-for-bit).

    Scale: the only exchange carries ≤ m rows per task (map-side
    partial register-min); sketches from disjoint partitions merge
    with ``sketch.hll_merge`` without touching raw data again —
    the 100 TB distinct-count primitive, vs COUNT(DISTINCT)'s full
    shuffle of every key."""
    li = load_table(spark, sf_dir, "lineitem")
    return sketch.hll_distinct(li, "l_orderkey")


_H = ("(('0x' || substr(md5('{seed}' || doc_id::VARCHAR), 1, 14))::BIGINT"
      " % 2147483647)")


@query(
    "global_shuffle",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, {_H.format(seed='shuffle')} AS h FROM documents)
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY h % 1024, h, doc_id)
                AS BIGINT) AS pos
    FROM h
    """,
)
def global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-shuffle positions
    (functions/curation.py shuffle_positions): contiguous pos ∈ [1, N]
    in salted-hash order with NO single-reducer global sort — shards
    rank locally, shard counts (≤1024 rows, bounded by construction)
    become broadcast offsets.  The oracle replays the induced total
    order as one ROW_NUMBER."""
    from kafkadirect_spark.functions import curation

    docs = load_table(spark, sf_dir, "documents")
    return curation.shuffle_positions(docs, "doc_id", seed="shuffle")


@query(
    "sample_exact_count",
    oracle=f"""
    SELECT doc_id FROM documents
    ORDER BY {_H.format(seed='sample')}, doc_id
    LIMIT 200
    """,
)
def sample_exact_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-200 uniform document sample, rerun-stable
    (functions/curation.py sample_exact_n): the 200 smallest rows in
    salted-hash order, planned as distributed TakeOrdered (per-task
    heaps of n) — exact size without sampleByFraction variance or a
    global sort."""
    from kafkadirect_spark.functions import curation

    docs = load_table(spark, sf_dir, "documents")
    return curation.sample_exact_n(docs, "doc_id", 200, seed="sample")


_TOK_SQL = ("list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), "
            "x -> x <> '')")


@query(
    "term_relevance_topk",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOK_SQL}) AS t FROM documents),
    tf AS (
      SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok GROUP BY doc_id, t),
    dfreq AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY t),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.t,
             CAST(1000000::BIGINT * tf.tf * n.n // dfreq.df AS BIGINT)
               AS score_ppm
      FROM tf JOIN dfreq USING (t) CROSS JOIN n),
    ranked AS (
      SELECT doc_id, t AS term, score_ppm,
             CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                  ORDER BY score_ppm DESC, t ASC) AS BIGINT) AS rk
      FROM scored)
    SELECT doc_id, term, score_ppm, rk FROM ranked WHERE rk <= 3
    """,
)
def term_relevance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 distinguishing terms per document by the exact integer
    tf·idf ratio (functions/curation.py term_relevance) — keyword
    extraction with a hash-exact cross-engine score (linear idf in
    BIGINT ppm; log-idf drifts across libm builds)."""
    from kafkadirect_spark.functions import curation

    docs = load_table(spark, sf_dir, "documents")
    return curation.term_relevance(docs, "doc_id", "text", k=3)


_KM_DIST = """
  SELECT q.vec_id, s.cid,
         CAST(list_sum(list_transform(generate_series(1, 64),
              i -> (q.qv[i] - s.cv[i]) * (q.qv[i] - s.cv[i])))
              AS BIGINT) AS d
  FROM q CROSS JOIN {cents} s
"""


@query(
    "kmeans_clusters",
    oracle=f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               v -> CAST(floor(CAST(v AS DOUBLE) * 10000) AS BIGINT)) AS qv
      FROM embeddings),
    seed AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, qv AS cv
      FROM q ORDER BY vec_id LIMIT 4),
    d1 AS ({_KM_DIST.format(cents='seed')}),
    a1 AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM d1) WHERE rn = 1),
    pos AS (SELECT unnest(generate_series(1, 64)) AS p),
    u1 AS (
      SELECT a.cid, p.p, CAST(SUM(q.qv[p.p]) // COUNT(*) AS BIGINT) AS v
      FROM a1 a JOIN q USING (vec_id) CROSS JOIN pos p
      GROUP BY a.cid, p.p),
    c1 AS (
      SELECT s.cid,
             CASE WHEN COUNT(u.v) = 0 THEN ANY_VALUE(s.cv)
                  ELSE list(u.v ORDER BY u.p) END AS cv
      FROM seed s LEFT JOIN u1 u ON u.cid = s.cid
      GROUP BY s.cid),
    d2 AS ({_KM_DIST.format(cents='c1')})
    SELECT vec_id, cid AS cluster_id, d AS dist_sq FROM (
      SELECT vec_id, cid, d,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
      FROM d2) WHERE rn = 1
    """,
)
def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed integer-exact Lloyd's k-means (k=4, 2 iterations)
    over globally-quantized embeddings — an ITERATIVE algorithm with a
    bit-exact SQL oracle (functions/similarity.py kmeans_quantized):
    quantize → literal-centroid argmin → integer centroid means →
    reassign, every step replayed unrolled in DuckDB.  Assignment is a
    zero-shuffle projection; the per-iteration update collects exactly
    k·dim rows (bounded by construction)."""
    from kafkadirect_spark.functions import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.kmeans_quantized(emb, "vec_id", "embedding",
                                       k=4, iters=2)


_CMS_B = ("((('0x' || substr(md5('cms{i}:' || e.t), 1, 14))::BIGINT"
          " % 2147483647) % 1024)")


@query(
    "heavy_hitters_cms",
    oracle=f"""
    WITH tok AS (SELECT unnest({_TOK_SQL}) AS t FROM documents),
    reg AS ({sketch.cms_oracle_registers_sql("SELECT t FROM tok")}),
    exact AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS exact_cnt
      FROM tok GROUP BY t ORDER BY exact_cnt DESC, t LIMIT 20)
    SELECT e.t AS term, e.exact_cnt,
           CAST(LEAST(r0.cnt, r1.cnt, r2.cnt) AS BIGINT) AS cms_est,
           CAST(LEAST(r0.cnt, r1.cnt, r2.cnt) - e.exact_cnt AS BIGINT)
             AS over_est
    FROM exact e
    JOIN reg r0 ON r0.row = 0 AND r0.bucket = {_CMS_B.format(i=0)}
    JOIN reg r1 ON r1.row = 1 AND r1.bucket = {_CMS_B.format(i=1)}
    JOIN reg r2 ON r2.row = 2 AND r2.bucket = {_CMS_B.format(i=2)}
    """,
)
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency estimation for the corpus's heavy hitters:
    registers over every token occurrence (exactly d·w = 3072 rows —
    mergeable by addition, broadcastable), probed with the exact
    top-20 terms so the one-sided error is visible in the output
    (``over_est ≥ 0`` always; functions/sketch.py cms_sketch).
    Approximate counting with an exact cross-engine oracle."""
    from pyspark.sql import functions as F

    from kafkadirect_spark.functions import sketch, text
    from kafkadirect_spark.functions.dedup import _persist

    docs = load_table(spark, sf_dir, "documents")
    toks = _persist(docs.select(
        F.explode(text.tokens("text")).alias("t")))
    reg = sketch.cms_sketch(toks, "t")
    exact = (toks.groupBy("t")
             .agg(F.count(F.lit(1)).alias("exact_cnt"))
             .orderBy(F.col("exact_cnt").desc(), F.col("t").asc())
             .limit(20))
    return (sketch.cms_lookup(reg, exact, "t")
            .select(F.col("t").alias("term"), "exact_cnt", "cms_est",
                    (F.col("cms_est") - F.col("exact_cnt"))
                    .cast("long").alias("over_est")))


@query(
    "event_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, MIN(v.t1) AS t1, MIN(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts >= v.t1
        AND e.ts <= v.t1 + INTERVAL 7 DAY
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= c.t2
        AND e.ts <= c.t1 + INTERVAL 7 DAY
      GROUP BY e.user_id)
    SELECT v.user_id, v.t1, c.t2, p.t3,
           CAST(CASE WHEN p.t3 IS NOT NULL THEN 3
                     WHEN c.t2 IS NOT NULL THEN 2
                     ELSE 1 END AS BIGINT) AS stage
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase within 7 days
    of the first view: per user, the earliest timestamp of each stage
    reached IN ORDER (a click before the first view doesn't count).
    Kafka Streams cannot express this without a custom processor; here
    it is three min-aggregations chained by user-keyed hash joins —
    no window over event history, no per-user sort, skew-free at any
    scale."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    v = (ev.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts").alias("t1")))
    c = (ev.filter(F.col("event_type") == "click").join(v, "user_id")
         .filter((F.col("ts") >= F.col("t1"))
                 & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 7 DAYS")))
         .groupBy("user_id")
         .agg(F.min("t1").alias("t1"), F.min("ts").alias("t2")))
    p = (ev.filter(F.col("event_type") == "purchase")
         .join(c, "user_id")
         .filter((F.col("ts") >= F.col("t2"))
                 & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 7 DAYS")))
         .groupBy("user_id").agg(F.min("ts").alias("t3")))
    return (v.join(c.select("user_id", "t2"), "user_id", "left")
            .join(p, "user_id", "left")
            .select("user_id", "t1", "t2", "t3",
                    F.when(F.col("t3").isNotNull(), 3)
                    .when(F.col("t2").isNotNull(), 2)
                    .otherwise(1).cast("long").alias("stage")))


@query(
    "retention_cohorts",
    oracle="""
    WITH f AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cw
      FROM events GROUP BY user_id),
    a AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events)
    SELECT f.cw AS cohort_week,
           CAST(date_diff('day', f.cw, a.w) // 7 AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM f JOIN a USING (user_id)
    GROUP BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-activity week,
    counted in every later week they return — the cohort triangle
    every growth dashboard starts from.  Two user-keyed aggregations
    and one join; the distinct (user, week) pre-aggregation bounds the
    final COUNT DISTINCT's input."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    f = (ev.groupBy("user_id")
         .agg(F.date_trunc("week", F.min("ts")).alias("cw")))
    a = (ev.select("user_id", F.date_trunc("week", "ts").alias("w"))
         .distinct())
    return (f.join(a, "user_id")
            .groupBy(F.col("cw").alias("cohort_week"),
                     F.expr("CAST(datediff(w, cw) DIV 7 AS LONG)")
                     .alias("week_offset"))
            .agg(F.count_distinct("user_id").cast("long").alias("n_users")))


@query(
    "value_quantiles_hist",
    oracle="""
    WITH v AS (
      SELECT CAST(floor(value * 1000) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL),
    b AS (
      SELECT LEAST(GREATEST((x - 0) * 1000 // 1000000, 0), 999) AS bin
      FROM v),
    reg AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS cnt FROM b GROUP BY bin),
    c AS (
      SELECT bin, cnt,
             CAST(SUM(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum,
             CAST(SUM(cnt) OVER () AS BIGINT) AS n
      FROM reg)
    SELECT CAST(q AS BIGINT) AS q_permille,
           CAST(0 + MIN(CASE WHEN cum >= (q * n + 999) // 1000
                             THEN bin END) * 1000000 // 1000
                AS BIGINT) AS est_value
    FROM c CROSS JOIN (SELECT unnest([250, 500, 900, 990]) AS q) qs
    GROUP BY q
    """,
)
def value_quantiles_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles of the event value distribution via the mergeable
    equi-width histogram sketch (functions/sketch.py hist_registers):
    values quantized to integer milli-units (one deterministic float
    multiply), 1000 bins over [0, 1000) units, p25/p50/p90/p99
    estimated as first-covering-bin lower edges — integer arithmetic
    end to end, one-bin-width error by construction.  Unlike Spark's
    approx_percentile (engine-internal layout, not replayable), the
    registers AND the estimates are bit-exact in DuckDB.  The sketch
    completes the family: HLL (distinct), CMS (frequency), histogram
    (quantiles) — all bounded-register, all merge without re-reading
    data."""
    from pyspark.sql import functions as F

    from kafkadirect_spark.functions import sketch

    ev = load_table(spark, sf_dir, "events")
    v = (ev.filter(F.col("value").isNotNull())
         .select(F.floor(F.col("value") * 1000).cast("long")
                 .alias("v_milli")))
    reg = sketch.hist_registers(v, "v_milli", lo=0, hi=1_000_000,
                                bins=1000)
    return sketch.hist_quantiles(reg, [250, 500, 900, 990],
                                 lo=0, hi=1_000_000, bins=1000)


@query(
    "value_quantiles_by_type",
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(floor(value * 1000) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL),
    b AS (
      SELECT event_type,
             LEAST(GREATEST((x - 0) * 1000 // 1000000, 0), 999) AS bin
      FROM v),
    reg AS (
      SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM b GROUP BY event_type, bin),
    c AS (
      SELECT event_type, bin, cnt,
             CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin)
                  AS BIGINT) AS cum,
             CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM reg)
    SELECT event_type, CAST(q AS BIGINT) AS q_permille,
           CAST(0 + MIN(CASE WHEN cum >= (q * n + 999) // 1000
                             THEN bin END) * 1000000 // 1000
                AS BIGINT) AS est_value
    FROM c CROSS JOIN (SELECT unnest([500, 990]) AS q) qs
    GROUP BY event_type, q
    """,
)
def value_quantiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type p50/p99 via the GROUPED histogram sketch
    (functions/sketch.py hist_registers_grouped): register frames
    partition on the group, so quantile extraction parallelizes across
    groups with no unpartitioned window anywhere — grouped SLA/latency
    dashboards from a mergeable sketch, integer-exact cross-engine."""
    from pyspark.sql import functions as F

    from kafkadirect_spark.functions import sketch

    ev = load_table(spark, sf_dir, "events")
    v = (ev.filter(F.col("value").isNotNull())
         .select("event_type",
                 F.floor(F.col("value") * 1000).cast("long")
                 .alias("v_milli")))
    reg = sketch.hist_registers_grouped(v, ["event_type"], "v_milli",
                                        lo=0, hi=1_000_000, bins=1000)
    return sketch.hist_quantiles_grouped(reg, ["event_type"], [500, 990],
                                         lo=0, hi=1_000_000, bins=1000)


_KMV_H = "('0x' || substr(md5(t), 1, 12))::BIGINT"


@query(
    "vocab_overlap_kmv",
    oracle=f"""
    WITH ta AS (
      SELECT DISTINCT {_KMV_H} AS h FROM (
        SELECT unnest({_TOK_SQL}) AS t FROM documents WHERE lang = 'en')),
    tb AS (
      SELECT DISTINCT {_KMV_H} AS h FROM (
        SELECT unnest({_TOK_SQL}) AS t FROM documents WHERE lang <> 'en')),
    sa AS (SELECT h FROM ta ORDER BY h LIMIT 256),
    sb AS (SELECT h FROM tb ORDER BY h LIMIT 256),
    mu AS (SELECT h FROM (SELECT h FROM sa UNION SELECT h FROM sb)
           ORDER BY h LIMIT 256),
    bth AS (SELECT mu.h FROM mu JOIN sa USING (h) JOIN sb USING (h)),
    ea AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, MAX(h) AS hk FROM sa),
    eb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, MAX(h) AS hk FROM sb)
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM mu) AS m,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM bth) AS n_both,
      CAST(1000 * (SELECT COUNT(*) FROM bth)
           // (SELECT COUNT(*) FROM mu) AS BIGINT) AS jaccard_permille,
      (SELECT CAST(CASE WHEN n < 256 THEN n
                        ELSE {255 * (1 << 48)} // hk END AS BIGINT)
       FROM ea) AS est_distinct_en,
      (SELECT CAST(CASE WHEN n < 256 THEN n
                        ELSE {255 * (1 << 48)} // hk END AS BIGINT)
       FROM eb) AS est_distinct_other
    """,
)
def vocab_overlap_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary overlap between English and non-English documents via
    KMV sketches (functions/sketch.py kmv_sketch): per-set distinct
    estimates AND an unbiased Jaccard estimate from the union-minima
    sample — the set-INTERSECTION capability HLL lacks.  Each sketch
    is k=256 rows (TakeOrdered over hash-distinct vocab, per-partition
    heaps); everything downstream operates on ≤256-row frames.
    Integer arithmetic end to end — an approximate set-similarity
    estimator with an exact cross-engine oracle."""
    from pyspark.sql import functions as F

    from kafkadirect_spark.functions import sketch, text
    from kafkadirect_spark.functions.dedup import _persist

    docs = _persist(load_table(spark, sf_dir, "documents")
                    .select("lang", F.explode(text.tokens("text"))
                            .alias("t")))
    a = sketch.kmv_sketch(docs.filter(F.col("lang") == "en"), "t")
    b = sketch.kmv_sketch(docs.filter(F.col("lang") != "en"), "t")
    jac = sketch.kmv_jaccard(a, b)
    ea = (sketch.kmv_est_distinct(a)
          .select(F.col("est_distinct").alias("est_distinct_en")))
    eb = (sketch.kmv_est_distinct(b)
          .select(F.col("est_distinct").alias("est_distinct_other")))
    return jac.join(ea).join(eb)


@query(
    "user_moving_avg",
    oracle="""
    WITH v AS (
      SELECT user_id, ts, event_id,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL),
    w AS (
      SELECT user_id, event_id, cents,
             CAST(SUM(cents) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id
                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS s,
             CAST(COUNT(*) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id
                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS c
      FROM v)
    SELECT user_id, event_id, cents,
           CAST(s // c AS BIGINT) AS avg_cents_4
    FROM w
    """,
)
def user_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user moving average over the last 4 events (ROWS frame) —
    the trailing-window smoothing every monitoring dashboard computes,
    inexpressible in the reference's merged-window model.  Value is
    quantized to integer cents FIRST (one deterministic float op), so
    the windowed SUM and the floor-divided average are hash-exact
    across engines — a float running mean would drift in the last ulp.
    The window partitions on high-cardinality user_id: one shuffle,
    skew-free."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-3, Window.currentRow))
    v = (ev.filter(F.col("value").isNotNull())
         .select("user_id", "event_id", "ts",
                 F.floor(F.col("value") * 100).cast("long").alias("cents")))
    return (v.withColumn("__s", F.sum("cents").over(w))
            .withColumn("__c", F.count(F.lit(1)).over(w))
            .select("user_id", "event_id", "cents",
                    F.expr("CAST(__s DIV __c AS LONG)").alias("avg_cents_4")))
