"""Corpus QA / operations audit — the "is this ingest safe to train
on, and how do I shuffle it" checklist, composed from the
diagnostics toolkit:

  1. exact column profile            (nulls, distinct collapse)
  2. snapshot diff vs the previous ingest (which partitions moved)
  3. vocabulary drift between slices (token distribution shift)
  3b. numeric value drift            (exact per-bin |p_a − p_b| in
                                      ppm between ingest halves)
  4. shuffle-key skew report         (salt factor, heavy keys)
  5. robust value outliers           (median/MAD, 50% breakdown)
  6. equi-depth value deciles        (stratification cells)
  7. ranked retrieval spot-check     (BM25: where does a probe
                                      string live in this corpus?)

Every step is register-sized after one scan/exchange — this is the
report a 100 TB pipeline can afford to run on every increment.

Run:  python examples/corpus_qa.py [sf_dir]
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from kafkadirect_spark import get_spark
from kafkadirect_spark.functions import curation, diagnostics, sketch
from kafkadirect_spark.sources.batch import load_table


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark("corpus-qa")
    docs = load_table(spark, sf_dir, "documents")
    ev = load_table(spark, sf_dir, "events")

    # 1: profile
    prof = {r.col_name: (r.n_null, r.n_distinct) for r in
            curation.profile_columns(
                docs, ["doc_id", "lang", "source", "text"]).collect()}
    print("profile:      " + ", ".join(
        f"{c} null={v[0]} distinct={v[1]}" for c, v in sorted(prof.items())))

    # 2: snapshot diff — the previous ingest stands in as the corpus
    # minus one source plus a targeted correction
    cols = ["doc_id", "lang", "text"]
    prev = curation.partition_fingerprint(
        docs.filter(F.col("source") != "src0"), cols, by=["source"])
    cur = curation.partition_fingerprint(
        docs.withColumn("lang", F.when(F.col("doc_id") % 311 == 0,
                                       "und").otherwise(F.col("lang"))),
        cols, by=["source"])
    diff = curation.fingerprint_diff(prev, cur, ["source"]).collect()
    by_status: dict = {}
    for r in diff:
        by_status.setdefault(r.status, []).append(r.source)
    print("snapshot:     " + "; ".join(
        f"{k}={sorted(v)}" for k, v in sorted(by_status.items())))

    # 3: vocabulary drift between the two largest language slices
    drift = curation.vocab_drift(docs, "text", "lang", "en", "de",
                                 k=3).collect()
    print("vocab drift:  " + ", ".join(
        f"{r.term} ({r.rate_a_ppm}ppm vs {r.rate_b_ppm}ppm)"
        for r in drift))

    # 3b: numeric drift — did the value distribution move between the
    # first and second half of the ingest window?  Exact integer ppm;
    # the total-variation distance is Σ drift_ppm / 2.
    v = F.floor(F.col("value") * 1000).cast("long").alias("v")
    half = F.to_date(F.col("ts")) < F.lit("2024-01-16").cast("date")
    vd = diagnostics.histogram_drift(
        ev.filter(half).select(v), ev.filter(~half).select(v),
        "v", lo=0, hi=1_000_000, bins=100)
    tvd_ppm = vd.agg(F.sum("drift_ppm")).collect()[0][0] // 2
    print(f"value drift:  TVD {tvd_ppm / 10_000:.2f}% between ingest "
          f"halves ({vd.count()} active bins)")

    # 4: shuffle-key skew — would a join keyed on event_type need salt?
    skew = {(r.stat, r.key): r.value for r in
            diagnostics.skew_report(ev, "event_type", parts=64,
                                    top_k=2).collect()}
    print(f"skew:         {skew[('distinct_keys', None)]} keys, "
          f"top1 {skew[('top1_share_ppm', None)] / 10_000:.1f}%, "
          f"suggested salt {skew[('suggested_salt', None)]}")

    # 5: robust outliers on the value column (integer cents)
    base = ev.select("event_id", "event_type",
                     F.floor(F.col("value") * 100).cast("long")
                     .alias("cents"))
    mad = diagnostics.mad_outliers(base, "event_type", "cents", k=3)
    print(f"MAD outliers: {mad.count()} rows beyond 3 MAD")

    # 6: equi-depth deciles of the same column — stratification cells
    cells = (sketch.bucketize_by_quantiles(
        base.filter(F.col("cents").isNotNull()), "cents", 10)
        .groupBy("bucket").count().orderBy("bucket").collect())
    print("deciles:      " + " ".join(
        f"{r.bucket}:{r['count']}" for r in cells))

    # 7: BM25 probe — where does this phrase's vocabulary live?
    hits = curation.bm25_rank(docs, "doc_id", "text",
                              ["dup", "window", "merge"], k=3).collect()
    print("bm25 probe:   " + ", ".join(
        f"doc {r.doc_id} (score {r.score})" for r in hits))

    # 8: sub-document duplication under content-defined chunking —
    # the cross-doc copy measure fixed-width spans understate after
    # any edit (CDC boundaries resynchronize); one chunk-hash
    # exchange + one doc aggregate
    from kafkadirect_spark.functions import dedup
    cdc = dedup.cdc_dup_stats(docs, "text", "doc_id")
    heavy = cdc.filter(F.col("dup_ratio_milli") >= 500).count()
    agg = cdc.agg(F.sum("dup_tokens").alias("d"),
                  F.sum("n_tokens").alias("t")).first()
    print(f"cdc dup:      {100.0 * agg.d / agg.t:.1f}% of tokens sit "
          f"in cross-doc chunks; {heavy} docs are >=50% duplicated")


if __name__ == "__main__":
    main(*sys.argv[1:])
