"""Hybrid BM25+cosine reciprocal-rank fusion (functions/retrieval.py).

The fusion math is integer-exact, so the tests pin exact scores:
scale DIV (c + rank) with the textbook c=60, scale=1e6.
"""
from __future__ import annotations

import pytest

from kafkadirect_spark.functions import retrieval

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.createDataFrame(
        [(0, "apple banana cherry"),          # lex hit
         (1, "apple apple apple banana"),     # strongest lex hit
         (2, "durian elderberry fig"),        # no lex terms
         (3, "apple nothing else")],          # weak lex hit
        "doc_id long, text string")


def _emb(spark):
    # vec 2 is the probe; vec 1 is nearly parallel to it (top sem AND
    # top lex -> the overlap row), vec 0 orthogonal, vec 3 opposite.
    return spark.createDataFrame(
        [(0, [0.0, 1.0]), (1, [1.0, 0.05]), (2, [1.0, 0.0]),
         (3, [-1.0, 0.0])],
        "vec_id long, embedding array<float>")


def test_hybrid_rrf_hand_checked(spark):
    out = {r.doc_id: (r.rrf_score, r.rank_lex, r.rank_sem)
           for r in retrieval.hybrid_rank_rrf(
               _docs(spark), _emb(spark), ["apple", "banana"],
               probe_id=2, k=4, topn=3).collect()}
    # lex ranks: doc1 (tf apple=3 + banana) > doc0 > doc3
    # sem ranks vs probe [1,0]: vec1 > vec0 > vec3
    s = 1_000_000
    assert out[1] == (s // 61 + s // 61, 1, 1)      # both systems, rank 1
    assert out[0] == (s // 62 + s // 62, 2, 2)
    assert out[3] == (s // 63 + s // 63, 3, 3)
    assert 2 not in out                             # in neither top-3
    with pytest.raises(ValueError, match="k and topn"):
        retrieval.hybrid_rank_rrf(_docs(spark), _emb(spark),
                                  ["apple"], 2, k=0)
    with pytest.raises(ValueError, match="c must"):
        retrieval.hybrid_rank_rrf(_docs(spark), _emb(spark),
                                  ["apple"], 2, c=0)


def test_hybrid_rrf_single_system_rows(spark):
    """A doc in only one system's top-n scores only that system's
    contribution and reports 0 for the other rank; a probe id absent
    from the embeddings degrades to pure BM25."""
    out = {r.doc_id: (r.rrf_score, r.rank_lex, r.rank_sem)
           for r in retrieval.hybrid_rank_rrf(
               _docs(spark), _emb(spark), ["durian"],
               probe_id=2, k=4, topn=2).collect()}
    s = 1_000_000
    assert out[2] == (s // 61, 1, 0)        # lex only
    assert out[1] == (s // 61, 0, 1)        # sem only
    assert out[0] == (s // 62, 0, 2)
    pure = {r.doc_id: (r.rrf_score, r.rank_lex, r.rank_sem)
            for r in retrieval.hybrid_rank_rrf(
                _docs(spark), _emb(spark), ["durian"],
                probe_id=99, k=4, topn=2).collect()}
    assert pure == {2: (s // 61, 1, 0)}


def test_hybrid_rrf_oracle_matches_engine(spark):
    """Engine == DuckDB on the real documents+embeddings tables: the
    composed bm25_rank_sql arm, the list_cosine_similarity arm, and
    the fixed-point fusion replay end-to-end."""
    import duckdb

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    terms = ["data", "model", "learning"]
    eng = [tuple(r) for r in retrieval.hybrid_rank_rrf(
        docs, emb, terms, probe_id=7).collect()]
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{SF}/embeddings.parquet')")
    got = con.sql(retrieval.hybrid_rank_rrf_oracle_sql(
        terms, probe_id=7)).fetchall()
    assert got == eng and len(eng) == 10
    assert any(r[2] > 0 for r in eng) and any(r[3] > 0 for r in eng)


def test_hybrid_rrf_plan_is_bounded(spark):
    """No cartesian product anywhere; the only window sorts the
    ≤ topn-row BM25 result (bounded by construction — LIMIT before
    the window feeds it)."""
    import contextlib
    import io

    out = retrieval.hybrid_rank_rrf(_docs(spark), _emb(spark),
                                    ["apple"], probe_id=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan   # top-k, never a global sort


# ---------------------------------------------------------------------------
# mmr_diversify_topk (round 14): diversified top-k via exact integer
# MMR over the int8-quantized grid.


def test_mmr_hand_checked_defers_near_duplicate(spark):
    # Quantization is per-vector max-abs (direction-only), so the
    # vectors are chosen binary-exact on the quantized grid:
    # probe [2,1] -> [127,63]; a=[2,1] -> [127,63] (rel 20098);
    # b=[2,31/32] -> [127,61] (rel 19972, near-dup of a);
    # c=[1,2] -> [63,127] (rel 16002, diverse).  At lam=300 the
    # diversity term dominates: rank 1 = a, then c beats the
    # near-duplicate b (ms 16002 vs 19972), b last with its maxsim
    # against a.
    from kafkadirect_spark.functions import retrieval

    emb = spark.createDataFrame(
        [(0, [2.0, 1.0]), (1, [2.0, 1.0]), (2, [2.0, 0.96875]),
         (3, [1.0, 2.0])],
        "vec_id long, embedding array<double>")
    out = [(r.rank, r.vec_id, r.rel_dot, r.maxsim_dot)
           for r in retrieval.mmr_diversify_topk(
               emb, "vec_id", "embedding", probe_id=0, n=3, k=3,
               lam_milli=300).collect()]
    assert out[0] == (1, 1, 20098, 0)
    assert out[1] == (2, 3, 16002, 16002)
    assert out[2] == (3, 2, 19972, 19972)
    import pytest as _pt
    with _pt.raises(ValueError, match="1 <= k <= n"):
        retrieval.mmr_diversify_topk(emb, "vec_id", "embedding", 0,
                                     n=2, k=3)
    with _pt.raises(ValueError, match="lam_milli"):
        retrieval.mmr_diversify_topk(emb, "vec_id", "embedding", 0,
                                     lam_milli=1001)
    with _pt.raises(ValueError, match="<= 64"):
        retrieval.mmr_diversify_topk(emb, "vec_id", "embedding", 0,
                                     n=100)


def test_mmr_lambda_1000_is_pure_relevance(spark):
    """lam=1000 zeroes the diversity term: pick order must equal the
    quantized-relevance top-k order."""
    from kafkadirect_spark.functions import retrieval
    from kafkadirect_spark.sources.batch import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    mmr = [(r.rank, r.vec_id, r.rel_dot)
           for r in retrieval.mmr_diversify_topk(
               emb, "vec_id", "embedding", probe_id=7, n=10, k=10,
               lam_milli=1000).collect()]
    rels = sorted(((rel, vid) for _, vid, rel in mmr),
                  key=lambda t: (-t[0], t[1]))
    assert [(i + 1, v, r) for i, (r, v) in enumerate(rels)] == mmr


def test_mmr_oracle_matches_engine(spark):
    """Engine (quantize → broadcast-probe dots → TakeOrdered pool →
    driver greedy) == the DuckDB recursive-CTE replay on the real
    embeddings, at two lambdas.  Registration candidate for r15."""
    import duckdb

    from kafkadirect_spark.functions import retrieval
    from kafkadirect_spark.sources.batch import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf}/embeddings.parquet')")
    for lam in (700, 300):
        eng = sorted(tuple(r) for r in retrieval.mmr_diversify_topk(
            emb, "vec_id", "embedding", probe_id=7, n=20, k=5,
            lam_milli=lam).collect())
        got = sorted(con.sql(retrieval.mmr_oracle_sql(
            7, n=20, k=5, lam_milli=lam)).fetchall())
        assert got == eng and len(eng) == 5, lam
    # diversification is REAL on this corpus: at lam=700 some later
    # pick has nonzero maxsim (a near-duplicate was deferred)
    eng = retrieval.mmr_diversify_topk(
        emb, "vec_id", "embedding", probe_id=7, n=20, k=5,
        lam_milli=700).collect()
    assert any(r.maxsim_dot > 0 for r in eng)
