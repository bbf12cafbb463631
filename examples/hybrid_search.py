"""Hybrid retrieval demo — keyword BM25 and embedding cosine answer
independently, reciprocal-rank fusion merges them (the standard RAG
retrieval shape), then the dup-candidate graph is profiled with the
triangle census to decide whether collapsing clusters is safe.

No reference analogue (SURVEY.md §2 — the reference has no document
or retrieval model); this demos the beyond-parity retrieval + graph
surfaces together.

Run:  python examples/hybrid_search.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")

from kafkadirect_spark import get_spark
from kafkadirect_spark.functions import dedup, retrieval
from kafkadirect_spark.functions.graph import triangle_stats
from kafkadirect_spark.sources.batch import load_table


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("hybrid-search-demo")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    print("== hybrid top-10: BM25('data model learning') ∪ "
          "cosine(probe=doc 7), RRF c=60 ==")
    retrieval.hybrid_rank_rrf(
        docs, emb, ["data", "model", "learning"], probe_id=7).show()

    print("== candidate-graph triangle census (simhash, Hamming ≤ 3):"
          " high clustering = copy-cliques, safe to collapse ==")
    pairs = dedup.simhash_pairs(docs, "text", "doc_id",
                                bits=32, max_hamming=3, n_bands=4)
    triangle_stats(pairs.select("id_a", "id_b")).show()


if __name__ == "__main__":
    main(*sys.argv[1:])
