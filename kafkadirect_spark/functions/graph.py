"""Graph centrality for corpus curation — integer-exact PageRank.

Web-scale training pipelines rank crawl hosts by link-graph centrality
(the CommonCrawl-derived corpora gate on harmonic/PageRank priors —
public technique, e.g. the Common Crawl host-level ranking datasets).
This is the distributed-iteration shape Spark expresses naturally:
contribution join on src → groupBy dst, once per iteration — the same
unrolled-loop design as ``similarity.kmeans_quantized``.

All arithmetic is integer so the oracle replays bit-for-bit: ranks are
scaled by ``scale`` (default 1e9 ≙ rank 1.0), every per-edge
contribution is ``(damping_pct · (rank DIV out_degree)) DIV 100`` in
exact BIGINT ops, and the per-node sum accumulates in decimal(38,0)
(addition only — exact) before the teleport term is added.  No libm,
no float division anywhere.

Reference analogue: none (Kafka Streams has no graph surface,
SURVEY.md §2) — beyond-parity curation machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_scaled(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 2,
    damping_pct: int = 85,
    scale: int = 10 ** 9,
) -> DataFrame:
    """Scaled-integer PageRank over a directed edge list (one row per
    distinct edge; callers dedup multi-edges or accept them as
    weights).  Returns (node, rank) with rank ≈ pagerank · ``scale``.

    Semantics: ``r₀ = scale`` for every node appearing as src or dst;
    each iteration, node v receives
    ``(100−d)·scale DIV 100  +  Σ_{u→v} (d · (r_u DIV deg⁺(u))) DIV 100``.
    Dangling-node mass (nodes with no out-edges) is dropped, not
    redistributed — the standard simplification for quality-prior use,
    stated here because it changes absolute values (not the ranking of
    well-connected nodes).

    Integer-overflow domain (documented, not silent): per-edge
    contributions are < ``scale``, so the decimal(38,0) accumulation
    is exact for any in-degree a real graph has; the final rank must
    fit BIGINT, which holds while ``n_nodes · scale < 2^63`` (at the
    default scale: up to ~9e9 nodes).

    Scale ledger (per iteration): one broadcast-or-shuffle join of the
    rank table onto edges keyed src, one exchange keyed dst with
    map-side partial sums (hub in-degree skew is absorbed by partial
    aggregation, the same argument as every groupBy here); the rank
    table is nodes-sized, never edges-sized.  Plan depth grows
    linearly with ``iters`` — callers running deep iteration should
    localCheckpoint every few rounds (the connected-components loop's
    pattern, functions/dedup.py:_cc_loop).
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if not (0 < damping_pct < 100):
        raise ValueError("damping_pct must be in (0, 100)")
    e = edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"))
    nodes = (e.select(F.col("__src").alias("node"))
             .unionByName(e.select(F.col("__dst").alias("node")))
             .distinct())
    deg = e.groupBy("__src").agg(F.count(F.lit(1)).alias("__deg"))
    teleport = ((100 - damping_pct) * scale) // 100
    ranks = nodes.withColumn("rank", F.lit(scale).cast("long"))
    for _ in range(iters):
        contrib = (
            e.join(deg, "__src")
            .join(ranks.withColumnRenamed("node", "__src"), "__src")
            .select(
                F.col("__dst").alias("node"),
                F.expr(f"CAST({damping_pct} AS BIGINT)"
                       " * (rank DIV __deg) DIV 100")
                .cast("decimal(38,0)").alias("__c"),
            )
        )
        sums = contrib.groupBy("node").agg(F.sum("__c").alias("__s"))
        ranks = (
            nodes.join(sums, "node", "left")
            .select(
                "node",
                (F.lit(teleport).cast("decimal(38,0)")
                 + F.coalesce(F.col("__s"), F.lit(0).cast("decimal(38,0)")))
                .cast("long").alias("rank"),
            )
        )
    return ranks
