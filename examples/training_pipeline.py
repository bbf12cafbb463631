"""End-to-end training-data pipeline over the documents corpus —
the workload this engine exists for at 100 TB:

  1. quality filter   (text stats: length + stopword ratio)
  2. language filter  (lang-ID heuristic)
  3. exact dedup      (content-hash keeper)
  4. near-dup removal (MinHash-LSH candidates → exact Jaccard verify
                       → drop the higher doc_id of each confirmed pair)
  5. emit the clean corpus + a survivorship report

Every stage is a DataFrame transform: one scan, the dedup shuffles are
bounded by the inverted index / band buckets, never |docs|².

Run:  python examples/training_pipeline.py [sf_dir]
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from kafkadirect_spark import get_spark
from kafkadirect_spark.functions import dedup, text
from kafkadirect_spark.sources.batch import load_table


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark("training-pipeline-demo")
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1-2: quality + language gate (pure column expressions, one scan)
    toks = text.tokens("text")
    survivors = (
        docs.withColumn("n_tokens", F.size(toks))
        .withColumn("lang_pred", text.lang_guess(toks))
        .filter((F.col("n_tokens") >= 10) & (F.col("lang_pred") == "en"))
        .drop("n_tokens", "lang_pred")
    )
    n1 = survivors.count()

    # 3: exact dedup — keep the lowest doc_id per content hash
    keepers = dedup.exact_dedup(survivors, "text", "doc_id") \
        .select(F.col("keeper").alias("doc_id"))
    survivors = survivors.join(keepers, "doc_id")
    n2 = survivors.count()

    # 4: near-dup removal — LSH candidates, exact-Jaccard confirm ≥0.8,
    # connected-components clustering, keep each cluster's min id
    # (transitive-safe: a~b~c keeps exactly one document)
    sigs = dedup.minhash_signatures(survivors, "text", "doc_id")
    cands = dedup.lsh_candidate_pairs(sigs, "doc_id")
    confirmed = (
        dedup.ngram_jaccard_pairs(survivors, "text", "doc_id",
                                  threshold=0.8, max_doc_freq=50)
        .join(cands, ["id_a", "id_b"])          # candidates ∩ verified
    )
    clusters = dedup.dedup_cluster_assign(survivors, confirmed, "doc_id")
    clean = (survivors.join(clusters, "doc_id")
             .filter(F.col("doc_id") == F.col("cluster")).drop("cluster"))
    n3 = clean.count()

    print(f"corpus:        {n0}")
    print(f"quality+lang:  {n1}  (-{n0 - n1})")
    print(f"exact dedup:   {n2}  (-{n1 - n2})")
    print(f"near-dup:      {n3}  (-{n2 - n3})")
    clean.select("doc_id", "source", F.substring("text", 1, 60).alias("text")) \
        .show(5, truncate=False)


if __name__ == "__main__":
    main(*sys.argv[1:])
