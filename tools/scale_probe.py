"""Scale probe — measure how the heavy operators grow with corpus
size, reproducibly.

Replicates the documents corpus 1x/4x/16x by unioning id-shifted
copies (distinct doc_ids per replica, same text distribution — note
this also replicates every duplicate relationship, so candidate
counts grow faster than organic corpora; see SCALE.md for the
interpretation caveats), then times each probed operator through the
noop sink.

Prints one JSON line per (operator, replication):
  {"op": "...", "repl": N, "docs": M, "sec": T}

Usage:  python tools/scale_probe.py [sf_dir] [max_repl]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main(sf_dir: str = "/root/testdata/sf0.1", max_repl: int = 16) -> None:
    from kafkadirect_spark.functions import curation, dedup
    from kafkadirect_spark.functions.dedup import release_caches
    from kafkadirect_spark.session import get_spark
    from kafkadirect_spark.sources.batch import load_table

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, sf_dir, "documents")
    n_base = base.count()

    def replicate(k: int):
        df = base
        for i in range(1, k):
            df = df.unionByName(
                base.withColumn("doc_id",
                                F.col("doc_id") + F.lit(i * 10_000_000)))
        return df

    def probe_minhash(docs):
        sigs = dedup.minhash_signatures(docs, "text", "doc_id")
        return dedup.lsh_candidate_pairs(sigs, "doc_id")

    def probe_span_dedup(docs):
        return dedup.span_dedup(docs, "text", "doc_id")

    def probe_decontaminate(docs):
        ev = base.filter(F.col("doc_id") % 10 == 0)  # fixed eval set
        return curation.decontaminate(docs, ev, "text", "doc_id", n=8)

    probes = {"minhash_lsh": probe_minhash,
              "span_dedup": probe_span_dedup,
              "decontaminate": probe_decontaminate}

    repl = 1
    while repl <= max_repl:
        docs = replicate(repl).persist()
        n = docs.count()
        for op, fn in probes.items():
            t0 = time.perf_counter()
            fn(docs).write.format("noop").mode("overwrite").save()
            sec = round(time.perf_counter() - t0, 2)
            release_caches()
            print(json.dumps({"op": op, "repl": repl, "docs": n,
                              "sec": sec}), flush=True)
        docs.unpersist()
        repl *= 4
    spark.stop()


if __name__ == "__main__":
    args = sys.argv[1:]
    main(args[0] if args else "/root/testdata/sf0.1",
         int(args[1]) if len(args) > 1 else 16)
