"""Hybrid retrieval: lexical BM25 ∪ embedding cosine, fused with
reciprocal-rank fusion (RRF, Cormack & Clarke 2009 SIGIR) — the
standard RAG-retrieval shape (a keyword index and a vector index
answer independently; ranks fuse, scores never mix).

Integer-exact by construction: each system contributes
``scale DIV (c + rank)`` (truncating division, the classic RRF
1/(c+rank) in fixed point), so the fused score is a BIGINT that both
engines reproduce bit-for-bit; only RANKS cross the fusion boundary —
the BM25 decimals and the cosine floats stay inside their systems.
Cross-engine caveat (ADVICE r12): the semantic arm's RANKS come from
float64 cosine ordering (numpy matmul engine-side vs DuckDB
``list_cosine_similarity`` in the oracle), so the post-rank integer
arithmetic is exact GIVEN equal ranks — near-tied cosines could in
principle order differently across engines; the parity guarantee is
therefore "integer-exact downstream of float-agreeing ranks", not
float-free end to end like this module's integer-only siblings.

Reference analogue: none (SURVEY.md §2 — the reference has no
document or retrieval model); beyond-parity machinery composing
``curation.bm25_rank`` (lexical) with ``similarity.cosine_topk_blas``
(semantic) over aligned id spaces (embeddings derived 1:1 from
documents, as in any embedding-indexed corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafkadirect_spark.functions.curation import bm25_rank, bm25_rank_sql
from kafkadirect_spark.functions.similarity import cosine_topk_blas

RRF_C = 60  # the Cormack & Clarke constant


def hybrid_rank_rrf(docs: DataFrame, emb: DataFrame,
                    query_terms: list[str], probe_id: int,
                    doc_id_col: str = "doc_id", text_col: str = "text",
                    emb_id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    k: int = 10, topn: int = 20, c: int = RRF_C,
                    scale: int = 1_000_000) -> DataFrame:
    """Top-``k`` documents for a (term query, probe embedding) pair by
    reciprocal-rank fusion of the BM25 top-``topn`` and the exact
    cosine top-``topn`` of the probe: ``rrf_score = Σ_systems
    scale DIV (c + rank)``, a document absent from a system's top-n
    contributing nothing there (its rank column reports 0).

    Returns ``(doc_id_col, rrf_score, rank_lex, rank_sem)`` ordered by
    (rrf_score desc, id) — scalar BIGINTs only, driver-oracle ready.

    Scale shape: both arms are already bounded retrievals (BM25's
    match-bounded exchange + TakeOrdered; the BLAS matmul scan with a
    1-row probe matrix broadcast).  Fusion touches ≤ 2·topn rows: the
    lexical rank window runs over the ≤ topn-row BM25 result (bounded
    by construction — the ``_GLOBAL_WINDOW_OK`` shape), the two rank
    lists union and group on the id, and the final top-k is a
    TakeOrdered.  Nothing corpus-sized crosses the fusion.
    """
    from pyspark.sql import Window

    if k < 1 or topn < 1:
        raise ValueError("k and topn must be >= 1")
    if c < 1:
        raise ValueError("c must be >= 1")
    lex = bm25_rank(docs, doc_id_col, text_col, query_terms, k=topn)
    # ≤ topn rows by construction (bm25_rank ends in LIMIT topn)
    wl = Window.orderBy(F.col("score").desc(), F.col(doc_id_col).asc())
    lex_r = lex.select(F.col(doc_id_col),
                       F.row_number().over(wl).alias("rank_lex"))
    probes = emb.filter(F.col(emb_id_col) == probe_id)
    if probes.limit(1).count() == 0:
        # probe id absent -> the semantic arm is empty, fusion
        # degrades to pure BM25 (1-row bounded action, not a scan)
        sem_r = emb.sparkSession.createDataFrame(
            [], f"{doc_id_col} long, rank_sem int")
    else:
        sem_r = (cosine_topk_blas(emb, emb_id_col, vec_col, k=topn,
                                  probes=probes)
                 .select(F.col("neighbor_id").alias(doc_id_col),
                         F.col("rank").alias("rank_sem")))

    def pts(rank_col: str):
        return F.expr(f"CAST({scale} DIV ({c} + {rank_col}) AS LONG)")

    zero = F.lit(0).cast("int")
    contrib = (lex_r.select(F.col(doc_id_col), pts("rank_lex").alias("__p"),
                            F.col("rank_lex"), zero.alias("rank_sem"))
               .unionByName(
                   sem_r.select(F.col(doc_id_col), pts("rank_sem").alias("__p"),
                                zero.alias("rank_lex"), F.col("rank_sem"))))
    fused = (contrib.groupBy(doc_id_col)
             .agg(F.sum("__p").cast("long").alias("rrf_score"),
                  F.max("rank_lex").cast("long").alias("rank_lex"),
                  F.max("rank_sem").cast("long").alias("rank_sem")))
    return (fused.orderBy(F.col("rrf_score").desc(),
                          F.col(doc_id_col).asc())
            .limit(k))


def hybrid_rank_rrf_oracle_sql(query_terms: list[str], probe_id: int,
                               k: int = 10, topn: int = 20,
                               c: int = RRF_C,
                               scale: int = 1_000_000,
                               id_col: str = "doc_id") -> str:
    """DuckDB replay of ``hybrid_rank_rrf`` over the ``documents`` and
    ``embeddings`` views: the BM25 arm IS ``bm25_rank_sql`` (composed
    verbatim as a CTE), the cosine arm ranks
    ``list_cosine_similarity`` against the probe row, and the fusion
    replays the truncating fixed-point sum exactly."""
    bm25 = bm25_rank_sql(query_terms, k=topn, id_col=id_col)
    return f"""
    WITH lex AS ({bm25}),
    lexr AS (
      SELECT {id_col},
             row_number() OVER (ORDER BY score DESC, {id_col})
               AS rank_lex
      FROM lex),
    v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    p AS (SELECT e FROM v WHERE vec_id = {probe_id}),
    semr AS (
      SELECT {id_col}, rank_sem FROM (
        SELECT b.vec_id AS {id_col},
               row_number() OVER (
                 ORDER BY list_cosine_similarity(p.e, b.e) DESC,
                          b.vec_id) AS rank_sem
        FROM v b, p WHERE b.vec_id <> {probe_id})
      WHERE rank_sem <= {topn}),
    contrib AS (
      SELECT {id_col}, {scale} // ({c} + rank_lex) AS p,
             rank_lex, 0 AS rank_sem
      FROM lexr
      UNION ALL
      SELECT {id_col}, {scale} // ({c} + rank_sem), 0, rank_sem
      FROM semr)
    SELECT {id_col}, SUM(p)::BIGINT AS rrf_score,
           MAX(rank_lex)::BIGINT AS rank_lex,
           MAX(rank_sem)::BIGINT AS rank_sem
    FROM contrib GROUP BY {id_col}
    ORDER BY rrf_score DESC, {id_col} LIMIT {k}
    """
