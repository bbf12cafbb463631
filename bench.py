"""Benchmark harness — PySpark equivalents of the reference's
SimpleBenchmark suites (BASELINE.md mapping table), run at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].

The FINAL stdout line is ONE compact timings-only JSON object:
  {"metric": "reference_suites_wall_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "extras": {...},
   "extras_wall_sec": N, "sf": "..."}
sized a few hundred bytes regardless of suite count, so it always
fits inside the driver's stdout tail-capture window.  The per-suite
plan-shape fingerprints (which grew past that window in round 5 and
left BENCH_r05 unparsed) are written to BENCH_PLANS.json next to
this file instead of being inlined.

Each suite materializes fully through the noop sink (no driver
collect, no column-pruning shortcuts), mirroring SimpleBenchmark's
consume-everything measurement loop
(streams/src/test/java/org/apache/kafka/streams/perf/SimpleBenchmark.java:167-209).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _cdc_dup_stats_suite(spark, sf_dir):
    from kafkadirect_spark.functions import dedup
    from kafkadirect_spark.sources.batch import load_table
    return dedup.cdc_dup_stats(
        load_table(spark, sf_dir, "documents"), "text", "doc_id")


def _sax_pairs_suite(spark, sf_dir):
    from kafkadirect_spark.functions import timeseries
    from kafkadirect_spark.sources.batch import load_table
    _, pairs, _ = timeseries.sax_pipeline(
        load_table(spark, sf_dir, "events"), "user_id", "ts", "value",
        "2024-01-01", "2024-01-31", n_segments=6, permilles=(500,),
        max_bucket=64)
    return pairs


def _sample_weighted_suite(spark, sf_dir):
    from kafkadirect_spark.functions import curation, text
    from kafkadirect_spark.sources.batch import load_table
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select("doc_id",
                        text.bpe_token_count("text").cast("long")
                        .alias("w"))
    return curation.sample_weighted_n(sized, "doc_id", "w", 1000)


def _ivf_pq_suite(spark, sf_dir):
    from pyspark.sql import functions as F

    from kafkadirect_spark.functions import similarity
    from kafkadirect_spark.sources.batch import load_table
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 3)
    return similarity.ivf_pq_topk(emb, "vec_id", "embedding", probes,
                                  n=3, centroid_stride=25, nprobe=4,
                                  m=4, k=4, iters=2)


def _ivf_pq_rerank_suite(spark, sf_dir):
    from pyspark.sql import functions as F

    from kafkadirect_spark.functions import similarity
    from kafkadirect_spark.sources.batch import load_table
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 3)
    return similarity.ivf_pq_rerank(emb, "vec_id", "embedding",
                                    probes, n=3, refine=4,
                                    centroid_stride=25, nprobe=4,
                                    m=4, k=4, iters=2)


def _sample_weighted_group_suite(spark, sf_dir):
    from kafkadirect_spark.functions import curation, text
    from kafkadirect_spark.sources.batch import load_table
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select("lang", "doc_id",
                        text.bpe_token_count("text").cast("long")
                        .alias("w"))
    return curation.sample_weighted_n_per_group(sized, "lang",
                                                "doc_id", "w", 200)


def _contamination_report_suite(spark, sf_dir):
    from pyspark.sql import functions as F

    from kafkadirect_spark.functions import curation
    from kafkadirect_spark.sources.batch import load_table
    docs = load_table(spark, sf_dir, "documents")
    return curation.contamination_report(
        docs.filter(F.col("doc_id") % 10 != 0),
        docs.filter(F.col("doc_id") % 10 == 0), "text", "doc_id")


def _theil_sen_suite(spark, sf_dir):
    # robust per-user trend: capped pair join + group windows
    from kafkadirect_spark.functions import timeseries
    from kafkadirect_spark.sources.batch import load_table
    ev = load_table(spark, sf_dir, "events")
    return timeseries.theil_sen_milli(ev, "user_id", "ts", "value",
                                      max_points=16,
                                      order_break_col="event_id")


def _cusum_suite(spark, sf_dir):
    # r15 candidate: per-user sequential changepoint — prefix-sum
    # CUSUM closed form, group-partitioned windows only
    from kafkadirect_spark.functions import timeseries
    from kafkadirect_spark.sources.batch import load_table
    ev = load_table(spark, sf_dir, "events")
    return timeseries.cusum_changepoint_milli(
        ev, "user_id", "ts", "value", h_milli=20_000,
        order_break_col="event_id")


def _acf_suite(spark, sf_dir):
    # r16 candidate (round 15): per-user rank-lag autocorrelation —
    # one corpus exchange, pure window aggregates, DECIMAL(38,0)
    # accumulation
    from kafkadirect_spark.functions import timeseries
    from kafkadirect_spark.sources.batch import load_table
    ev = load_table(spark, sf_dir, "events")
    return timeseries.acf_milli(ev, "user_id", "ts", "value",
                                lags=(1, 2, 4, 8), max_points=512,
                                order_break_col="event_id")


def _seasonal_profile_suite(spark, sf_dir):
    # r16 candidate (round 15): classical decomposition + seasonal
    # strength — one corpus exchange, pure window aggregates
    from kafkadirect_spark.functions import timeseries
    from kafkadirect_spark.sources.batch import load_table
    ev = load_table(spark, sf_dir, "events")
    return timeseries.seasonal_profile_milli(
        ev, "user_id", "ts", "value", period=5, max_points=512,
        order_break_col="event_id")


def _mmr_suite(spark, sf_dir):
    # r15 candidate: diversified top-k — quantize scan + one-row
    # probe broadcast + TakeOrdered pool + bounded driver greedy.
    # Like consumeproduce, the measured work happens inside fn (the
    # pool collect + greedy); the returned frame is the k-row result,
    # so its fingerprint pins a LocalTableScan shape.
    from kafkadirect_spark.functions import retrieval
    from kafkadirect_spark.sources.batch import load_table
    emb = load_table(spark, sf_dir, "embeddings")
    return retrieval.mmr_diversify_topk(emb, "vec_id", "embedding",
                                        probe_id=7, n=20, k=5)


def _twap_suite(spark, sf_dir):
    # r15 candidate: LOCF time-weighted mean — one group-partitioned
    # lead window + one map-side-combined aggregate
    from kafkadirect_spark.functions import timeseries
    from kafkadirect_spark.sources.batch import load_table
    ev = load_table(spark, sf_dir, "events")
    return timeseries.twap_milli(ev, "user_id", "ts", "value",
                                 "2024-01-01", "2024-01-31",
                                 order_break_col="event_id")


def _attribution_suite(spark, sf_dir):
    # last-touch credit: one user-partitioned window + |types|-row agg
    from kafkadirect_spark.functions import behavior
    from kafkadirect_spark.sources.batch import load_table
    ev = load_table(spark, sf_dir, "events")
    return behavior.attribution_last_touch(
        ev, "user_id", "ts", "event_type", "purchase",
        within_seconds=3600 * 24, order_break_col="event_id")


def _contamination_spans_suite(spark, sf_dir):
    from pyspark.sql import functions as F

    from kafkadirect_spark.functions import curation
    from kafkadirect_spark.sources.batch import load_table
    docs = load_table(spark, sf_dir, "documents")
    return curation.contamination_spans(
        docs.filter(F.col("doc_id") % 10 != 0),
        docs.filter(F.col("doc_id") % 10 == 0), "text", "doc_id")


def _media_audio_features_suite(spark, sf_dir):
    # the r14 media_audio_features candidate: executor-side WAV-PCM16
    # synthesis -> real decode -> integer features, zero shuffles
    from kafkadirect_spark.functions import multimodal
    from kafkadirect_spark.sources.batch import load_table
    ids = load_table(spark, sf_dir, "documents").select("doc_id")
    return multimodal.synth_features(ids, "doc_id", kind="wav")


def _basket_pairs_suite(spark, sf_dir):
    # r15 candidate: order/part co-occurrence pairs — basket-keyed
    # equi self-join bounded by basket size, one pair-count exchange
    from kafkadirect_spark.functions import basket
    from kafkadirect_spark.sources.batch import load_table
    li = load_table(spark, sf_dir, "lineitem")
    return basket.basket_pairs_topk(li, "l_orderkey", "l_partkey",
                                    k=20, min_support=2)


def _pii_scrub_suite(spark, sf_dir):
    # r15 candidate: JVM-side regex redaction + integer Luhn fold
    # over synthesized injections — row-local, zero shuffles
    from kafkadirect_spark.functions import privacy
    from kafkadirect_spark.sources.batch import load_table
    ids = load_table(spark, sf_dir, "documents").select("doc_id")
    return privacy.pii_scrub(
        privacy.synth_pii_text(ids, "doc_id"), "text", "doc_id")


def _media_video_features_suite(spark, sf_dir):
    # the r15 media_video_features candidate: executor-side YUV4MPEG2
    # synthesis -> real decode -> integer features incl. scene-cut
    # localization, zero shuffles
    from kafkadirect_spark.functions import multimodal
    from kafkadirect_spark.sources.batch import load_table
    ids = load_table(spark, sf_dir, "documents").select("doc_id")
    return multimodal.synth_features(ids, "doc_id", kind="y4m")


def _media_image_features_suite(spark, sf_dir):
    # the registered media_image_features shape: executor-side BMP
    # synthesis -> real decode -> integer features FUSED in one
    # Python stage (r16), zero shuffles
    from kafkadirect_spark.functions import multimodal
    from kafkadirect_spark.sources.batch import load_table
    ids = load_table(spark, sf_dir, "documents").select("doc_id")
    return multimodal.synth_features(ids, "doc_id", kind="bmp")


def _media_gif_features_suite(spark, sf_dir):
    # round 15: executor-side GIF synthesis -> sub-block LZW decode
    # -> palette expansion -> integer features, zero shuffles
    from kafkadirect_spark.functions import multimodal
    from kafkadirect_spark.sources.batch import load_table
    ids = load_table(spark, sf_dir, "documents").select("doc_id")
    return multimodal.synth_features(ids, "doc_id", kind="gif")


def _media_png_features_suite(spark, sf_dir):
    # the r16 media_png_features candidate (round 15): executor-side
    # PNG synthesis (filter cycles id % 5) -> CRC-verified chunk walk
    # -> zlib inflate -> all-five-filter unfilter -> integer
    # features, zero shuffles
    from kafkadirect_spark.functions import multimodal
    from kafkadirect_spark.sources.batch import load_table
    ids = load_table(spark, sf_dir, "documents").select("doc_id")
    return multimodal.synth_features(ids, "doc_id", kind="png")


def _wordpiece_suite(spark, sf_dir):
    from kafkadirect_spark.functions import wordpiece
    from kafkadirect_spark.sources.batch import load_table
    docs = load_table(spark, sf_dir, "documents")
    merges = wordpiece.learn_wordpiece(docs, "text", n_merges=12,
                                       min_count=2,
                                       max_word_types=4096)
    enc = wordpiece.wordpiece_encode(docs, "doc_id", "text", merges,
                                     min_count=2, max_word_types=4096)
    return enc.select("doc_id", "n_pieces")


def _edit_verify_suite(spark, sf_dir):
    # MinHash-LSH candidates, not simhash: on this synthetic corpus
    # the 32-bit simhash band join collides ~20% of ALL doc pairs
    # (2.4M at sf0.1 — 78 s of Levenshtein), while LSH yields a
    # selective candidate set (255 at sf0.1, 1.5 s verify).  The
    # verification stage's plan is what this row pins; candidate
    # QUALITY deciding verification cost is exactly the operator's
    # documented cost envelope (candidates × max_chars²).
    from kafkadirect_spark.functions import dedup
    from kafkadirect_spark.sources.batch import load_table
    docs = load_table(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(docs, "text", "doc_id")
    cand = dedup.lsh_candidate_pairs(sigs, "doc_id")
    return dedup.edit_verify_pairs(docs, cand, "text", "doc_id",
                                   max_dist_milli=500, max_chars=256)


def _vocab_coverage_suite(spark, sf_dir):
    from kafkadirect_spark.functions import curation
    from kafkadirect_spark.sources.batch import load_table
    return curation.vocab_coverage(
        load_table(spark, sf_dir, "documents"), "text",
        ks=(100, 1000, 10000, 100000))


def _exactsubstr_suite(spark, sf_dir):
    from kafkadirect_spark.functions import dedup
    from kafkadirect_spark.sources.batch import load_table
    return dedup.exactsubstr_report(
        load_table(spark, sf_dir, "documents"), "text", "doc_id")


def _exactsubstr_incr_suite(spark, sf_dir):
    # the ingest shape: every-20th doc is the new batch, the rest the
    # accepted index (the incremental_lsh split) — pins the
    # distinct-hash index exchange + semi/anti membership plan
    from pyspark.sql import functions as F

    from kafkadirect_spark.functions import dedup
    from kafkadirect_spark.sources.batch import load_table
    docs = load_table(spark, sf_dir, "documents")
    return dedup.exactsubstr_incremental(
        docs.filter(F.col("doc_id") % 20 == 0),
        docs.filter(F.col("doc_id") % 20 != 0), "text", "doc_id")


def _kmv_slice_matrix_suite(spark, sf_dir):
    from kafkadirect_spark.functions import sketch
    from kafkadirect_spark.sources.batch import load_table
    return sketch.kmv_group_jaccard(
        load_table(spark, sf_dir, "documents"), "source", "text")


def _weighted_quantiles_suite(spark, sf_dir):
    from pyspark.sql import functions as F

    from kafkadirect_spark.functions import sketch
    from kafkadirect_spark.functions.text import token_count
    from kafkadirect_spark.sources.batch import load_table
    docs = load_table(spark, sf_dir, "documents")
    return sketch.weighted_quantiles(
        docs, F.col("n_chars"), token_count("text"),
        [100, 500, 900, 990])


def _weighted_quantiles_grouped_suite(spark, sf_dir):
    from pyspark.sql import functions as F

    from kafkadirect_spark.functions import sketch
    from kafkadirect_spark.functions.text import token_count
    from kafkadirect_spark.sources.batch import load_table
    docs = load_table(spark, sf_dir, "documents")
    return sketch.weighted_quantiles_grouped(
        docs, "lang", F.col("n_chars"), token_count("text"),
        [250, 500, 990])


def _phash_pairs_suite(spark, sf_dir):
    # synth rasters executor-side -> real PNM decode -> aHash ->
    # band-bucket Hamming pairs: the whole multimodal near-dup path
    from kafkadirect_spark.functions import multimodal
    from kafkadirect_spark.sources.batch import load_table
    ids = load_table(spark, sf_dir, "documents").select("doc_id")
    hashes = multimodal.synth_phash(ids, "doc_id", kind="pnm")
    return multimodal.phash_pairs(hashes, "doc_id", max_hamming=1)


def _local_clustering_suite(spark, sf_dir):
    from kafkadirect_spark.functions import dedup
    from kafkadirect_spark.functions.graph import local_clustering
    from kafkadirect_spark.sources.batch import load_table
    docs = load_table(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(docs, "text", "doc_id")
    return local_clustering(dedup.lsh_candidate_pairs(sigs, "doc_id"))


def _waterfill_suite(spark, sf_dir):
    from pyspark.sql import functions as F

    from kafkadirect_spark.functions import curation
    from kafkadirect_spark.sources.batch import load_table
    totals = (load_table(spark, sf_dir, "documents")
              .groupBy("lang")
              .agg(F.sum("n_chars").cast("long").alias("avail")))
    return curation.token_waterfill(totals, "lang", "avail",
                                    budget=10_000_000)


def _triangle_suite(spark, sf_dir):
    # edge source = the selective MinHash-LSH candidates (255 pairs at
    # sf0.1), NOT the simhash band graph (2.4M edges on this
    # synthetic corpus — the same candidate-quality choice as
    # _edit_verify_suite); the fingerprint pins the orientation +
    # wedge + closure plan shape
    from kafkadirect_spark.functions import dedup
    from kafkadirect_spark.functions.graph import triangle_stats
    from kafkadirect_spark.sources.batch import load_table
    docs = load_table(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(docs, "text", "doc_id")
    return triangle_stats(dedup.lsh_candidate_pairs(sigs, "doc_id"))


def _funnel_suite(spark, sf_dir):
    from kafkadirect_spark.functions import behavior
    from kafkadirect_spark.sources.batch import load_table
    return behavior.funnel_steps(
        load_table(spark, sf_dir, "events"), "user_id", "ts",
        "event_type", ["signup", "view", "click", "purchase"])


def _path_topk_suite(spark, sf_dir):
    from kafkadirect_spark.functions import behavior
    from kafkadirect_spark.sources.batch import load_table
    return behavior.path_topk(
        load_table(spark, sf_dir, "events"), "user_id", "ts",
        "event_type", n=3, k=10, order_break_col="event_id")


def _hybrid_rrf_suite(spark, sf_dir):
    from kafkadirect_spark.functions import retrieval
    from kafkadirect_spark.sources.batch import load_table
    return retrieval.hybrid_rank_rrf(
        load_table(spark, sf_dir, "documents"),
        load_table(spark, sf_dir, "embeddings"),
        ["data", "model", "learning"], probe_id=7)


def build_suites() -> tuple[dict, dict]:
    """The (reference suites, extra suites) tables — shared between
    ``main`` and tools/bench_one.py so a single suite can be re-measured
    in isolation with exactly the bench's own callables."""
    from kafkadirect_spark.plans import QUERIES
    # r11/r12: suite queries RETIRED from the registry (near-duplicate
    # consolidation) whose suite plans are fingerprint-pinned — call
    # the surviving functions directly so the measured plans stay
    # byte-identical
    from kafkadirect_spark.plans.analytics_queries import (
        distinct_orders_hll as _distinct_orders_hll_q,
        interval_overlap_join as _interval_overlap_join_q,
        value_decile_buckets as _value_decile_buckets_q,
    )
    from kafkadirect_spark.plans.llm_queries import (
        bpe_chunks as _bpe_chunks_q,
        dedup_containment as _dedup_containment_q,
    )
    from kafkadirect_spark.plans.queries import stream_count as _stream_count_q
    from kafkadirect_spark.sources.batch import load_table

    # Suite → query shape (BASELINE.md "BENCH mapping" table).
    def consume(spark, sf):
        return load_table(spark, sf, "lineitem")

    import tempfile

    out_dir = tempfile.mkdtemp(prefix="kds-bench-")

    def consumeproduce(spark, sf):
        # scan → rewrite (SimpleBenchmark consumeproduce); the write IS
        # the measurement, so return a trivial frame for the noop sink.
        load_table(spark, sf, "lineitem").write.mode("overwrite").parquet(
            f"{out_dir}/lineitem_copy")
        return spark.range(1)

    # The BASELINE.md-mapped reference suites — the 2× gate compares
    # THESE against the driver-measured baseline, so the headline
    # `value` is their sum alone.
    suites: dict[str, callable] = {
        "consume": consume,
        "consumeproduce": consumeproduce,
        "streamprocess": QUERIES["filter_project"],
        "streamcount": _stream_count_q,
        "streamcountwindowed": QUERIES["windowed_count_tumbling"],
        "streamtablejoin": QUERIES["join_stream_table"],
        "streamstreamjoin": QUERIES["join_interval_inner"],
        "tabletablejoin": QUERIES["join_table_table"],
        "yahoo": QUERIES["yahoo_pipeline"],
    }
    # Beyond-parity pipeline suites, timed and reported separately —
    # they have no reference-suite counterpart to compare against.
    extra_suites: dict[str, callable] = {
        "pricing_summary": QUERIES["pricing_summary"],
        "dedup_minhash_lsh": QUERIES["dedup_minhash_lsh"],
        "similarity_topk": QUERIES["similarity_topk"],
        # r10: the exact-broadcast variant was retired from the
        # registry; the Bloom variant carries the decontamination
        # suite (new key — plan_diff reports the swap honestly)
        "decontaminate_bloom": QUERIES["decontaminate_bloom"],
        "corpus_curation": QUERIES["corpus_curation"],
        # relational shapes (TPC-H Q3/Q10-like, rollup) — recorded so a
        # plan change (lost broadcast, global sort) trips the per-suite
        # plan-count diff, not just the wall clock
        "shipping_priority": QUERIES["shipping_priority"],
        "returned_item_report": QUERIES["returned_item_report"],
        "revenue_rollup": QUERIES["revenue_rollup"],
        # round-5 shapes: bilateral star join (Q7), fact self-agg +
        # top-k (Q21), outer-join histogram (Q13), inverted-index
        # importance scores, pure chunk explode
        "volume_shipping": QUERIES["volume_shipping"],
        "lonely_returns": QUERIES["lonely_returns"],
        # Q12 shape: the one fact⋈fact order-key join in the suite —
        # the only extras entry whose correct 100 TB plan is a
        # shuffle join on both sides, so its plan counts pin that
        # shape against an accidental broadcast-dependence
        "late_shipment_priority": QUERIES["late_shipment_priority"],
        "customer_order_distribution": QUERIES["customer_order_distribution"],
        "importance_weights": QUERIES["importance_weights"],
        "doc_chunks": QUERIES["doc_chunks"],
        # batch-4: the sketch family and the iterative k-means — the
        # sketches' wall clock is the proof their bounded-register
        # design works (register exchange, not a data exchange);
        # k-means times the full quantize → 2×(assign, update) loop
        "distinct_orders_hll": _distinct_orders_hll_q,
        "heavy_hitters_cms": QUERIES["heavy_hitters_cms"],
        "kmeans_clusters": QUERIES["kmeans_clusters"],
        "global_shuffle": QUERIES["global_shuffle"],
        # round-6 shapes: SemDeDup cluster-then-prune, the bucketed
        # range join (pin: equi-join on buckets, never a nested loop),
        # cumulative merged HLL (register-space day expansion), and
        # the integer z-score outlier scan
        "semdedup_prune": QUERIES["semdedup_prune"],
        "range_bucket_join": QUERIES["range_bucket_join"],
        "rolling_distinct_hll": QUERIES["rolling_distinct_hll"],
        # round-8 shape: the interval×interval overlap join (same
        # no-nested-loop pin as range_bucket_join, both sides exploded)
        "interval_overlap_join": _interval_overlap_join_q,
        # lossless prefix-filtered Jaccard (the uncapped exact path)
        "dedup_jaccard_prefix": QUERIES["dedup_jaccard_prefix"],
        # late-r8 shapes: directed containment (inverted-index pair
        # agg), incremental new-batch-vs-index LSH (band-keyed join,
        # corpus quadrant excluded), and the integer unigram-surprisal
        # scorer (occurrence collapse → vocab join → doc agg)
        "dedup_containment": _dedup_containment_q,
        "dedup_incremental_lsh": QUERIES["dedup_incremental_lsh"],
        "doc_surprisal": QUERIES["doc_surprisal"],
        # iterative graph shape: 2 unrolled PageRank rounds — one
        # join + one exchange each — over the purchase graph
        "supplier_pagerank": QUERIES["supplier_pagerank"],
        # final-r8 shapes: the Gopher rule scan (two explode→agg gram
        # paths rejoined on doc id) and the held-out bigram LM with
        # backoff (bigram-table joins + one data-sized doc agg)
        "quality_gopher": QUERIES["quality_gopher"],
        "surprisal_bigram": QUERIES["surprisal_bigram"],
        # exact global token-budget prefix: the plan pin is the
        # distributed-enumerate shape (per-shard window + broadcast
        # offset table), never a single-reducer global sort
        "token_budget_select": QUERIES["token_budget_select"],
        # product quantization: per-subspace integer k-means training
        # (one scan per iteration for all subspaces) + code projection
        "embedding_pq_codes": QUERIES["embedding_pq_codes"],
        # BPE training: the wall clock is dominated by the single
        # corpus-scale word-count pass — merge learning runs on the
        # Heaps-law-bounded type table and is corpus-size-independent
        "bpe_merges": QUERIES["bpe_merges"],
        # retrieval + corpus QA: both are one-scan + small-exchange
        # shapes (filter-before-explode / vocabulary-keyed partials) —
        # their plan fingerprints pin that no corpus-sized shuffle
        # sneaks in
        "bm25_search": QUERIES["bm25_search"],
        "vocab_drift": QUERIES["vocab_drift"],
        # struct-extremum resample + per-segment selection cuts: both
        # pin "no window, no per-group sort" shapes
        "value_ohlc_daily": QUERIES["value_ohlc_daily"],
        "value_decile_by_type": QUERIES["value_decile_by_type"],
        # r9: the remaining recent registered shapes, added so EVERY
        # measured family has a fingerprint row and plan_diff covers
        # the full bench (VERDICT r8 item 6).  One representative per
        # plan shape:
        # - bpe_chunks: the mapInPandas encode + row-local slice pass
        #   (distinct from bpe_merges' training shape)
        # retired from the registry r13 (chunking-shape consolidation);
        # the suite plan stays fingerprint-pinned via the direct call
        "bpe_chunks": _bpe_chunks_q,
        # - collocations_topk: PMI over the bigram/unigram tables with
        #   the one-row total broadcast
        "collocations_topk": QUERIES["collocations_topk"],
        # - dedup_keep_longest: the full LSH → connected components →
        #   struct-max representative chain
        "dedup_keep_longest": QUERIES["dedup_keep_longest"],
        # - dedup_containment_anti (new r9): capped inverted-index
        #   intersection + one left-anti hash join
        "dedup_containment_anti": QUERIES["dedup_containment_anti"],
        # - diagnostics family: one-pass skew report, MAD outliers via
        #   exact-median narrowing, per-partition fingerprint diff,
        #   column/embedding profilers, exact join-cardinality pre-check
        "events_skew_report": QUERIES["events_skew_report"],
        "value_outliers_mad": QUERIES["value_outliers_mad"],
        "partition_diff": QUERIES["partition_diff"],
        "embedding_profile": QUERIES["embedding_profile"],
        "join_explosion_check": QUERIES["join_explosion_check"],
        # - equi-depth bucketize: global + grouped narrowing variants
        "value_decile_buckets": _value_decile_buckets_q,
        "exact_quantiles_by_type": QUERIES["exact_quantiles_by_type"],
        # - nb_langid (new r9): trained NB classifier — one exploded
        #   train exchange + pivoted vocab join + one doc agg
        "nb_langid": QUERIES["nb_langid"],
        # - value_drift_by_slice (new r9): exact numeric drift — one
        #   register exchange per slice + a bins-sized outer join
        "value_drift_by_slice": QUERIES["value_drift_by_slice"],
        # r10: the winnowing family (fingerprint explode + capped
        #   inverted-index pair join) gets fingerprint rows now that
        #   the staged winnow_fps form made it bench-able (the
        #   single-expression form re-hashed every gram per window);
        #   unigram_chunk is the new tokenizer family's train+encode+
        #   chunk pipeline; cdc_dup_stats is the content-defined
        #   chunking dedup (row-local chunking + one chunk-hash
        #   exchange) — registered r11, benched from its landing round
        "doc_winnow": QUERIES["doc_winnow"],
        "winnow_overlap_pairs": QUERIES["winnow_overlap_pairs"],
        "unigram_chunk": QUERIES["unigram_chunk"],
        "cdc_dup_stats": _cdc_dup_stats_suite,
        # sax_pairs: PAA exchange + exact-quantile narrowing + the
        # capped word-bucket self-join (registered r11, benched from
        # its landing round)
        "sax_pairs": _sax_pairs_suite,
        # r11 library-level operators, benched from their landing
        # round: edit verification (simhash candidates + two
        # candidate-sized joins + row-local Levenshtein capped at 256
        # chars — the cap is the O(n·m) cost envelope) and the
        # join-free count-of-counts coverage curve
        "dedup_edit_verify": _edit_verify_suite,
        "vocab_coverage": _vocab_coverage_suite,
        # wordpiece: third tokenizer family — scored-merge training on
        # the bounded type table + the longest-match mapInPandas encode
        "wordpiece_pieces": _wordpiece_suite,
        # IVFADC composite: coarse-quantizer shortlist + literal-map
        # ADC scoring over the shared PQ codes
        "similarity_ivf_pq": _ivf_pq_suite,
        # integer systematic weighted sampling (two-phase shard
        # prefix sums + one bounded broadcast)
        "sample_weighted": _sample_weighted_suite,
        # r12 library-level operators, benched from their landing
        # round: IVFADC+R (the ivf_pq plan + one shortlist-sized
        # refinement join and window), the stratified weighted
        # sampler (per-(group, shard) partitioned prefix sums), and
        # the exact per-eval-doc contamination audit (corpus streams
        # through broadcast semi-join, nothing corpus-sized shuffles)
        "similarity_ivf_pq_rerank": _ivf_pq_rerank_suite,
        "sample_weighted_group": _sample_weighted_group_suite,
        "contamination_report": _contamination_report_suite,
        # r13 additions: span-level leakage (same broadcast semi-join,
        # plus doc-partitioned island windows) and the registered BMP
        # round-trip feature pass (mapInPandas, zero shuffles)
        "contamination_spans": _contamination_spans_suite,
        "media_image_features": _media_image_features_suite,
        "media_png_features": _media_png_features_suite,
        "media_gif_features": _media_gif_features_suite,
        "media_audio_features": _media_audio_features_suite,
        # r14 addition: the registered-surface-ready y4m video
        # round-trip (mapInPandas, zero shuffles)
        "media_video_features": _media_video_features_suite,
        # r14 addition: redaction + Luhn over synthesized injections
        "pii_scrub": _pii_scrub_suite,
        # r14 addition: market-basket pair mining over lineitem
        "basket_pairs": _basket_pairs_suite,
        # late-r12 library-level operators: alignment-free ExactSubstr
        # dedup (one gram-hash exchange + doc-partitioned island
        # windows + row-local HOF rebuild), the KMV corpus-slice
        # Jaccard matrix (one (slice, hash) distinct + salted min-k +
        # a |slices|-bounded broadcast pair join), and hybrid BM25 ∪
        # cosine RRF (two bounded retrievals, ≤ 2·topn-row fusion)
        "dedup_exactsubstr": _exactsubstr_suite,
        "dedup_exactsubstr_incr": _exactsubstr_incr_suite,
        "kmv_slice_matrix": _kmv_slice_matrix_suite,
        "hybrid_rrf": _hybrid_rrf_suite,
        # behavioral analytics over events: the funnel's filtered-agg
        # cascade (one narrow user exchange per step, zero windows)
        # and the path miner's single user-partitioned lead window +
        # TakeOrdered
        "funnel_steps": _funnel_suite,
        "path_topk": _path_topk_suite,
        "attribution_last_touch": _attribution_suite,
        "theil_sen": _theil_sen_suite,
        # r14 addition: sequential changepoint over per-user series
        "cusum_changepoint": _cusum_suite,
        "acf": _acf_suite,
        "seasonal_profile": _seasonal_profile_suite,
        # r14 addition: LOCF time-weighted average over the window
        "twap": _twap_suite,
        # r14 addition: MMR diversified retrieval over int8 dots
        "mmr_diversify": _mmr_suite,
        # exact triangle census over the LSH candidate graph:
        # (degree, id)-oriented wedge join + semi-join closure
        "graph_triangles": _triangle_suite,
        # per-node closure: the same orientation plus the 3-role
        # explode + one node-count exchange
        "graph_local_clustering": _local_clustering_suite,
        # max-min fair budget allocation: one corpus agg + windows
        # over the |strata|-row totals frame
        "token_waterfill": _waterfill_suite,
        # perceptual image near-dup over real rasters (aHash + band
        # buckets; one (band, byte) exchange, never all-pairs)
        "media_phash_pairs": _phash_pairs_suite,
        # token-weighted order statistics: the histogram-narrowing
        # recursion with weight mass (register-sized exchanges only)
        "weighted_quantiles": _weighted_quantiles_suite,
        # ... and its per-language grouped twin (broadcast range
        # table per round, groups converge independently)
        "weighted_quantiles_grouped": _weighted_quantiles_grouped_suite,
    }
    return suites, extra_suites


def main() -> None:
    from kafkadirect_spark.session import get_spark
    from kafkadirect_spark.sources.batch import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("kafkadirect-bench")
    spark.sparkContext.setLogLevel("ERROR")

    suites, extra_suites = build_suites()

    # JVM/codegen warmup outside the measured window (SimpleBenchmark
    # also measures steady state, not first-query JIT).
    load_table(spark, sf_dir, "lineitem").count()

    def plan_stats(df) -> dict[str, int]:
        """Stable plan-shape fingerprint per suite: if a timing moves
        but these don't, the movement is machine noise, not a plan
        regression — and vice versa.  Captures the public
        ``df.explain("formatted")`` output (it prints driver-side, so
        redirect_stdout sees it) instead of reaching into the private
        ``_jvm.PythonSQLUtils`` API, which breaks under Spark Connect."""
        import contextlib
        import io
        import re
        from collections import Counter

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        c = Counter(re.findall(r"\(\d+\) (\w+)", buf.getvalue()))
        return {
            "shuffles": c.get("Exchange", 0),
            "broadcasts": c.get("BroadcastExchange", 0),
            "scans": c.get("Scan", 0),
            "joins": sum(v for k, v in c.items() if k.endswith("Join")),
            "sorts": c.get("Sort", 0),
        }

    def run(fns: dict[str, callable], reps: int,
            plans: dict[str, dict]) -> dict[str, float]:
        from kafkadirect_spark.functions.dedup import release_caches

        out: dict[str, float] = {}
        for name, fn in fns.items():
            best = float("inf")
            for i in range(reps):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
                if i == 0 and name != "consumeproduce":
                    # consumeproduce's work happens in fn itself (the
                    # rewrite is the measurement); its returned frame
                    # is a placeholder with no plan worth printing.
                    plans[name] = plan_stats(df)
                # free pipeline-cached intermediates between runs so
                # suites are measured cold-cache and blocks don't pile
                # up across the session
                release_caches()
            out[name] = round(best, 3)
        return out

    # Best-of-N: SimpleBenchmark measures steady state, and single-run
    # noise on a shared machine is ~2× for the shuffle-heavy extras —
    # best-of-3 everywhere so single-suite blips (r5's streamtablejoin
    # 0.36→0.56 with an identical plan) stop looking like regressions.
    plans: dict[str, dict] = {}
    timings = run(suites, 3, plans)
    extras = run(extra_suites, 3, plans)

    # Plan fingerprints go to a sidecar artifact, NOT the stdout line:
    # inlining them pushed round 5's single output line past the
    # driver's tail-capture window and left BENCH_r05 unparsed.
    # Before overwriting, diff against the previous run's fingerprints
    # so plan drift is SELF-reporting in the summary line: a timing
    # that moved with an unchanged fingerprint is machine noise; a
    # changed fingerprint names the suite to re-audit.
    here = os.path.dirname(os.path.abspath(__file__))
    plans_path = os.path.join(here, "BENCH_PLANS.json")
    plan_diff = {"changed": 0, "unchanged": 0, "new": 0}
    try:
        with open(plans_path) as fh:
            prev = json.load(fh)
        prev_plans = prev.get("plans", {}) if prev.get("sf") == sf_dir else {}
    except (OSError, ValueError):
        prev_plans = {}
    changed_names = []
    for name, stats in plans.items():
        if name not in prev_plans:
            plan_diff["new"] += 1
        elif prev_plans[name] != stats:
            plan_diff["changed"] += 1
            changed_names.append(name)
        else:
            plan_diff["unchanged"] += 1
    # name at most 5 changed suites (bounded — the 8 kB guard below
    # protects the stdout contract; full detail stays in the sidecar)
    if changed_names:
        plan_diff["changed_names"] = sorted(changed_names)[:5]
    with open(plans_path, "w") as fh:
        json.dump({"sf": sf_dir, "plans": plans}, fh, indent=1, sort_keys=True)

    # Output contract (re-learned the hard way in r12): the driver
    # captures only the LAST ~2000 chars of bench stdout, and the
    # extras map (70+ suites) outgrew that window — BENCH_r12.json's
    # tail starts mid-extras and the nine headline suite numbers were
    # truncated away (VERDICT r12 item 3).  Fix: the fat per-suite
    # detail prints FIRST, and the FINAL stdout line is a compact
    # headline JSON (metric / value / the nine reference suites /
    # plan-diff counts) guaranteed to fit the tail window whole.
    detail = json.dumps({
        "metric": "bench_extras_detail",
        "extras": extras,
        "plan_diff": plan_diff,
        "sf": sf_dir,
    }, separators=(",", ":"))
    print(detail)
    line = json.dumps({
        "metric": "reference_suites_wall_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "extras_wall_sec": round(sum(extras.values()), 3),
        "n_extras": len(extras),
        "plan_diff": {k: v for k, v in plan_diff.items()
                      if k != "changed_names"},
        "sf": sf_dir,
    }, separators=(",", ":"))
    # Hard guard on the output contract: the FINAL line must survive
    # the driver's ~2000-char tail capture with room for the detail
    # line's own tail above it.  Fail LOUDLY instead of shipping a
    # truncated headline (the silent r5/r12 failure modes).
    if len(line) >= 1800:  # not an assert: must survive python -O
        raise RuntimeError(
            f"bench headline line grew to {len(line)} bytes — trim it, "
            "the driver's 2000-char tail window will truncate it")
    print(line)


if __name__ == "__main__":
    main()
