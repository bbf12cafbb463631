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
