"""End-to-end training-data pipeline over the documents corpus —
the workload this engine exists for at 100 TB:

  0. ingest validation (exact column profile)
  1. quality filter   (text stats: length + stopword ratio)
  2. label-coherence check (TRAINED Naive Bayes classifier — learned
     from the labeled seed half via nb_model, applied with the
     stateless nb_score_rows path that also runs on streams: if the
     trained classifier cannot beat the prior on held-out docs, the
     lang labels carry no textual signal — exactly what this
     synthetic corpus shows, so the FILTER stays the heuristic)
     + language filter (lang-ID heuristic)
     + unigram-surprisal gate (integer CCNet-style LM filter)
  3. exact dedup      (content-hash keeper over the normalized form)
  4. near-dup removal (MinHash-LSH candidates → exact Jaccard verify
                       → drop the higher doc_id of each confirmed pair)
     + containment survivors (drop docs subsumed INSIDE longer ones —
       the asymmetric overlap Jaccard's union term drowns)
  5. benchmark decontamination (broadcast 8-gram overlap vs eval slice)
     + DSIR domain targeting with a sketch-derived score cutoff
     + α=0.5 temperature rebalance of head sources
  6. train/val/test split (deterministic hash-keyed)
     + BPE tokenizer trained on the train split; every document
       re-counted in LEARNED tokens (not a regex guess)
  7. sequence packing (1024-token budgets in hash shards)
     + deterministic global shuffle order for the packed train set
  8. emit the clean corpus + a survivorship + sketch report
     (HLL source cardinality, histogram length quantiles)

Every stage is a DataFrame transform: one scan, the dedup shuffles are
bounded by the inverted index / band buckets, never |docs|².

Run:  python examples/training_pipeline.py [sf_dir]
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from kafkadirect_spark import get_spark
from kafkadirect_spark.functions import curation, dedup, text
from kafkadirect_spark.sources.batch import load_table


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark("training-pipeline-demo")
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 0: ingest validation — exact per-column profile before anything
    # trusts this drop (nulls where none belong, distinct collapse,
    # truncated strings all show here first)
    profile = {r.col_name: (r.n_null, r.n_distinct) for r in
               curation.profile_columns(
                   docs, ["doc_id", "lang", "source", "text"]).collect()}

    # 1-2: quality + language gate (pure column expressions, one scan).
    # Each stage below checkpoints its survivor set before handing it
    # on: several stages derive a statistics table FROM the survivors
    # and join it BACK (surprisal LM, dedup keepers, DSIR cutoff,
    # temperature thresholds), so the logical plan DOUBLES per stage —
    # ten stages of un-truncated lineage is a 2^10-leaf tree that hangs
    # the analyzer long before any task runs.  localCheckpoint()
    # truncates lineage (persist() alone would not); at 100 TB the same
    # boundaries are parquet checkpoints between pipeline increments.
    # label-coherence check: train a REAL classifier on the labeled
    # seed half (fastText-style NB, integer-exact; nb_score_rows is
    # the same stateless path a streaming ingest would use — the
    # JSON-serializable model trains once, versions, and ships to
    # every scoring job).  Held-out agreement at or below the majority
    # prior means the labels carry no textual signal — on THIS
    # synthetic corpus that is exactly the case, a data-quality fact
    # a real pipeline wants surfaced before trusting the labels; the
    # language FILTER therefore stays the content-based heuristic.
    held_out = docs.filter(F.col("doc_id") % 2 == 1)
    nb = curation.nb_model(docs.filter(F.col("doc_id") % 2 == 0),
                           "text", "lang")
    pred = curation.nb_score_rows(held_out, nb, "doc_id", "text")
    agree = (pred.join(held_out, "doc_id")
             .filter(F.col("pred_label") == F.col("lang")).count())
    n_held = held_out.count()

    toks = text.tokens("text")
    survivors = (
        docs.withColumn("n_tokens", F.size(toks))
        .withColumn("lang_pred", text.lang_guess(toks))
        .filter((F.col("n_tokens") >= 10) & (F.col("lang_pred") == "en"))
        .drop("n_tokens", "lang_pred")
    ).localCheckpoint()
    n1 = survivors.count()

    # 2b: unigram-surprisal gate — drop gibberish scoring > 14 bits
    # per token under the corpus's own unigram LM (integer-exact, the
    # CCNet-style perplexity filter)
    sup = curation.surprisal_scores(survivors, "doc_id", "text")
    survivors = (survivors.join(sup, "doc_id")
                 .filter(F.col("surprisal_bits") <= 14 * F.col("n_tokens"))
                 .drop("n_tokens", "surprisal_bits")).localCheckpoint()
    n1b = survivors.count()

    # 2c: Gopher repetition/quality rules — the integerized Rae et
    # al. composite filter (word-count/mean-length bounds, dup-gram
    # caps, stopword floor); signals are one explode→agg pass
    gq = curation.gopher_quality(survivors, "doc_id", "text")
    survivors = (survivors.join(
        gq.filter(F.col("pass_gopher")).select("doc_id"), "doc_id")
    ).localCheckpoint()
    n1c = survivors.count()

    # 3: exact dedup over the CANONICAL text form — normalize first so
    # case/whitespace/typography variants hash together
    normed = survivors.withColumn("__norm", text.normalize_text("text"))
    keepers = dedup.exact_dedup(normed, "__norm", "doc_id") \
        .select(F.col("keeper").alias("doc_id"))
    survivors = survivors.join(keepers, "doc_id").localCheckpoint()
    n2 = survivors.count()

    # 4: near-dup removal — LSH candidates, exact-Jaccard confirm ≥0.8,
    # connected-components clustering, keep each cluster's min id
    # (transitive-safe: a~b~c keeps exactly one document)
    sigs = dedup.minhash_signatures(survivors, "text", "doc_id")
    cands = dedup.lsh_candidate_pairs(sigs, "doc_id")
    # exact Jaccard computed only for the candidates (work bounded by
    # the candidate set, not the corpus)
    confirmed = dedup.jaccard_verify(survivors, cands, "text", "doc_id",
                                     threshold=0.8)
    clusters = dedup.dedup_cluster_assign(survivors, confirmed, "doc_id")
    clean = (survivors.join(clusters, "doc_id")
             .filter(F.col("doc_id") == F.col("cluster")).drop("cluster")
             ).localCheckpoint()
    n3 = clean.count()

    # 4b: span-level dedup (C4 recipe) — strip copied 8-word spans
    # from otherwise-unique survivors, rebuilding their text
    spans = dedup.span_dedup(clean, "text", "doc_id")
    clean = (clean.drop("text")
             .join(spans.withColumnRenamed("text_dedup", "text"), "doc_id")
             ).localCheckpoint()
    n3b = clean.count()

    # 4c: containment survivors — drop documents still subsumed INSIDE
    # a longer one at ≥60% shingle containment (quotes, syndicated
    # paragraphs: the asymmetric case Jaccard's union term drowns);
    # same capped inverted index as the pair table + one anti join
    clean = dedup.containment_pairs(
        clean, "text", "doc_id", n=3, threshold=0.6,
        how="anti").localCheckpoint()
    n3c = clean.count()

    # 5: decontamination against a held-out eval slice (ids ≡ 0 mod 10
    # stand in for the benchmark set); the eval shingles broadcast
    eval_slice = docs.filter(F.col("doc_id") % 10 == 0)
    flags = curation.decontaminate(clean, eval_slice, "text", "doc_id", n=8)
    clean = (clean.join(flags.filter(~F.col("contaminated")), "doc_id")
             .drop("contaminated")).localCheckpoint()
    n4 = clean.count()

    # 5b: DSIR-style domain targeting — score every survivor against
    # the English subset as the target domain (hashed bigram features,
    # broadcast frequency table), then drop the bottom ~20% by score.
    # The cutoff comes from the HISTOGRAM SKETCH of the score
    # distribution (p20 of bounded integer registers) — a global
    # "top 80%" via sort-the-corpus would be a single-reducer killer.
    from kafkadirect_spark.functions import sketch
    scores = curation.importance_scores(
        clean, "doc_id", "text", target=F.col("lang") == "en")
    sreg = sketch.hist_registers(scores, "score", lo=0, hi=10_000_000,
                                 bins=1000)
    cut = sketch.hist_quantiles(sreg, [200], 0, 10_000_000,
                                1000).collect()[0].est_value
    clean = (clean.join(scores, "doc_id")
             .filter(F.col("score") >= cut).drop("score")).localCheckpoint()
    n4b = clean.count()

    # 5c: temperature rebalance (α=0.5) — head sources downsampled to
    # sqrt-smoothed shares so they stop drowning the tail; broadcast
    # thresholds, the corpus is never shuffled
    clean = curation.temperature_mix(clean, "source", "doc_id").localCheckpoint()
    n4c = clean.count()

    # 6-7: LEAKAGE-SAFE split — keyed on the near-dup CLUSTER id over
    # the broad LSH candidate pairs (wider than the >=0.8 dedup
    # threshold), so nothing LSH-similar to a train doc reaches
    # val/test — then pack the train split into 1024-token sequences
    # (8 hash shards; one Exchange)
    split = clean.join(
        curation.cluster_safe_split(
            clean, "doc_id", cands,
            {"train": 0.9, "val": 0.05, "test": 0.05}).select(
                "doc_id", "split"), "doc_id")

    # 6a: train the REAL tokenizer on the train split (never val/test
    # — vocabulary is a model artifact, learning it on held-out text
    # is leakage) and account every document in learned-BPE tokens:
    # word-type counting is the only corpus-scale pass, the merge
    # loop runs on the bounded type table, encode is one mapInPandas
    from kafkadirect_spark.functions import bpe
    train = split.filter(F.col("split") == "train").localCheckpoint()
    merges = bpe.learn_bpe(train, "text", n_merges=32,
                           min_count=2, max_word_types=1 << 16)
    train = train.join(
        bpe.bpe_encode(train, "doc_id", "text", merges)
        .select("doc_id", F.col("n_bpe").alias("bpe")), "doc_id")

    # 6b: exact token budget — cap the train split at 4k BPE tokens
    # as the maximal hash-order prefix (reproducible, never a rate
    # guess); the global prefix sum is per-shard windows + broadcast
    # offsets, no single-reducer sort
    budgeted = curation.select_token_budget(
        train, "doc_id", F.col("bpe"), budget=4_000)
    train = train.join(budgeted.select("doc_id"), "doc_id")
    n_budget = budgeted.count()

    packed = curation.pack_sequences(train, "doc_id", "bpe",
                                     budget=1024, n_shards=8)
    n5 = packed.count()
    n_seqs = packed.select("shard", "seq_id").distinct().count()

    # 7b: deterministic training order — every packed doc gets a
    # contiguous global shuffle position (rerun- and layout-stable)
    order = curation.shuffle_positions(packed, "doc_id", seed="epoch0")

    # 8b: corpus report from the sketch family — distinct sources via
    # HLL, token heavy hitters via CMS, doc-length quantiles via the
    # histogram; registers are bounded, mergeable, and cheap enough to
    # run on every pipeline increment
    regs = {r.bucket: r.min_bitlen
            for r in sketch.hll_registers(clean, "source").collect()}
    n_sources = round(sketch.hll_estimate_corrected(regs))
    lens = clean.select(F.length("text").cast("long").alias("n"))
    hist = sketch.hist_registers(lens, "n", lo=0, hi=20_000, bins=200)
    quants = {r.q_permille: r.est_value
              for r in sketch.hist_quantiles(
                  hist, [500, 990], 0, 20_000, 200).collect()}

    print(f"corpus:        {n0}  profile: " + ", ".join(
        f"{c} null={v[0]} distinct={v[1]}" for c, v in sorted(profile.items())))
    print(f"label check:   NB held-out agreement {agree}/{n_held} "
          "(at/below prior -> lang labels carry no textual signal "
          "here; filtering on content heuristic instead)")
    print(f"quality+lang:  {n1}  (-{n0 - n1})")
    print(f"surprisal:     {n1b}  (-{n1 - n1b})")
    print(f"gopher rules:  {n1c}  (-{n1b - n1c})")
    print(f"exact dedup:   {n2}  (-{n1c - n2})")
    print(f"near-dup:      {n3}  (-{n2 - n3})")
    print(f"span dedup:    {n3b}  (-{n3 - n3b})")
    print(f"containment:   {n3c}  (-{n3b - n3c})")
    print(f"decontam:      {n4}  (-{n3c - n4})")
    print(f"DSIR select:   {n4b}  (-{n4 - n4b})")
    print(f"temp rebal:    {n4c}  (-{n4b - n4c})")
    print(f"tokenizer:     {merges.count()} BPE merges learned on the "
          "train split")
    print(f"train packed:  {n5} docs into {n_seqs} sequences "
          f"(token budget kept {n_budget}); "
          f"shuffle order rows: {order.count()}")
    # per-split content fingerprints — the data-versioning record a
    # real pipeline persists next to each increment
    fps = {r.split: (r.n_rows, r.fingerprint)
           for r in curation.partition_fingerprint(
               split, ["doc_id", "source"], by=["split"]).collect()}
    print("fingerprints:  " + ", ".join(
        f"{k}={v[1]} ({v[0]} rows)" for k, v in sorted(fps.items())))
    print(f"report: ~{n_sources} distinct sources "
          f"(p50 len {quants[500]}, p99 len {quants[990]})")
    # 8c: emit layout — Z-order the clean corpus on (source, length)
    # cells so parquet min-max pruning works for downstream scans
    # filtering on EITHER dimension (one range exchange, sorted write)
    from kafkadirect_spark.functions import layout
    q_src = layout.quantize_dim("pmod(xxhash64(source), 256)", 0, 256, 8)
    q_len = layout.quantize_dim("length(text)", 0, 20_000, 8)
    laid = layout.cluster_by_zorder(
        clean.withColumn("__qs", q_src).withColumn("__ql", q_len),
        ["__qs", "__ql"], bits=8, partitions=8).drop("__qs", "__ql")
    print(f"z-layout:      {laid.rdd.getNumPartitions()} range "
          "partitions, both dims bounded per file")

    clean.select("doc_id", "source", F.substring("text", 1, 60).alias("text")) \
        .show(5, truncate=False)


if __name__ == "__main__":
    main(*sys.argv[1:])
