"""Tokenizer-consumer operator goldens (functions/tokeval.py):
sliding-window context assembly and the tokenizer-quality report,
shared by both tokenizer families."""

import pytest
from pyspark.sql import functions as F

from kafkadirect_spark.functions import bpe, tokeval, unigram


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def _enc(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, tokens array<string>, n long")


def test_windowed_chunks_hand_checked(spark):
    enc = _enc(spark, [(0, list("abcdefg"), 7), (1, ["x"], 1),
                       (2, [], 0)])
    out = {(r.doc_id, r.chunk_idx): (r.start, r.n_tokens,
                                     list(r.tokens))
           for r in tokeval.windowed_chunks(
               enc, "doc_id", "tokens", budget=4, stride=2).collect()}
    # doc 0: starts 0,2,4 (1 + ceil((7-4)/2) = 3 windows); every token
    # covered; the tail window is short and KEPT
    assert out[(0, 0)] == (0, 4, ["a", "b", "c", "d"])
    assert out[(0, 1)] == (2, 4, ["c", "d", "e", "f"])
    assert out[(0, 2)] == (4, 3, ["e", "f", "g"])
    # doc 1 shorter than budget: exactly one window
    assert out[(1, 0)] == (0, 1, ["x"])
    # empty doc emits nothing
    assert not [k for k in out if k[0] == 2]


def test_windowed_chunks_default_stride_matches_disjoint_chunkers(spark):
    """stride == budget degenerates to the disjoint layout — pinned
    against BOTH families' chunkers on a real trained model."""
    texts = ["lower lowest newer newest lowest",
             "low new wide wider widest",
             "the widest of the wide low low"]
    df = _docs(spark, texts)

    merges = bpe.learn_bpe(df, "text", 5, min_count=1)
    enc_b = bpe.bpe_encode(df, "doc_id", "text", merges)
    want_b = sorted((r.doc_id, r.chunk_idx, r.n_tokens, tuple(r.bpe))
                    for r in bpe.bpe_chunk(df, "doc_id", "text", merges,
                                           budget=3).collect())
    got_b = sorted((r.doc_id, r.chunk_idx, r.n_tokens, tuple(r.tokens))
                   for r in tokeval.windowed_chunks(
                       enc_b, "doc_id", "bpe", budget=3).collect())
    assert got_b == want_b

    model = unigram.learn_unigram(df, "text", vocab_size=8, rounds=2,
                                  min_count=1)
    enc_u = unigram.unigram_encode(df, "doc_id", "text", model)
    want_u = sorted((r.doc_id, r.chunk_idx, r.n_pieces, tuple(r.pieces))
                    for r in unigram.unigram_chunk(
                        df, "doc_id", "text", model, budget=3).collect())
    got_u = sorted((r.doc_id, r.chunk_idx, r.n_tokens, tuple(r.tokens))
                   for r in tokeval.windowed_chunks(
                       enc_u, "doc_id", "pieces", budget=3).collect())
    assert got_u == want_u


def test_windowed_chunks_covers_every_token_position(spark):
    # property over a spread of lengths: union of [start, start+n)
    # covers [0, n) for every doc, and consecutive windows overlap by
    # exactly budget - stride (except the tail)
    enc = _enc(spark, [(i, [f"t{j}" for j in range(i)], i)
                       for i in range(1, 40)])
    rows = tokeval.windowed_chunks(enc, "doc_id", "tokens",
                                   budget=8, stride=3).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.start, r.n_tokens))
    for doc_id, wins in by_doc.items():
        covered = set()
        for start, n in wins:
            covered |= set(range(start, start + n))
        assert covered == set(range(doc_id)), doc_id


def test_windowed_chunks_guards(spark):
    enc = _enc(spark, [(0, ["a"], 1)])
    with pytest.raises(ValueError, match="budget"):
        tokeval.windowed_chunks(enc, "doc_id", "tokens", budget=0)
    with pytest.raises(ValueError, match="stride"):
        tokeval.windowed_chunks(enc, "doc_id", "tokens", budget=4,
                                stride=5)
    with pytest.raises(ValueError, match="stride"):
        tokeval.windowed_chunks(enc, "doc_id", "tokens", budget=4,
                                stride=0)


def test_tokenizer_eval_hand_checked(spark):
    docs = spark.createDataFrame(
        [(0, "aa bb cc dd", "en"), (1, "aa bb", "en"),
         (2, "zz yy xx", "de")],
        "doc_id long, text string, lang string")
    # fake encode: en docs segment 1:1 plus one single-char piece;
    # de doc segments into 6 single chars
    enc = _enc(spark, [
        (0, ["aa", "bb", "cc", "dd"], 4),
        (1, ["aa", "b", "b"], 3),
        (2, ["z", "z", "y", "y", "x", "x"], 6),
    ])
    out = {r.slice: r.asDict() for r in tokeval.tokenizer_eval(
        docs, enc, "doc_id", "text", "tokens", by="lang").collect()}
    en, de = out["en"], out["de"]
    assert (en["n_docs"], en["n_words"], en["n_tokens"]) == (2, 6, 7)
    # 7 tokens / 6 words -> 1166 milli; 2 single-char tokens of 7
    assert en["fertility_milli"] == 1000 * 7 // 6
    assert en["singleton_ratio_milli"] == 1000 * 2 // 7
    # chars: "aabbccdd"=8 + "aabb"=4 -> 12 over 7 tokens
    assert en["n_chars"] == 12
    assert en["chars_per_token_milli"] == 1000 * 12 // 7
    # de: full char fallback -> fertility 2000, singleton 1000
    assert (de["fertility_milli"], de["singleton_ratio_milli"]) == \
        (2000, 1000)
    # global (by=None) aggregates everything into one row
    g = tokeval.tokenizer_eval(docs, enc, "doc_id", "text",
                               "tokens").collect()
    assert len(g) == 1 and g[0].slice == "ALL" and g[0].n_docs == 3


def test_tokenizer_eval_on_trained_unigram(spark):
    """End-to-end over a real trained model: the char-fallback rate
    is 0 on the training corpus (every train word segments from the
    inventory; single chars may appear but only where chosen), and
    fertility >= 1000 by construction."""
    texts = ["lower lowest newer newest lowest",
             "low new wide wider widest"]
    df = _docs(spark, texts).withColumn("lang", F.lit("en"))
    model = unigram.learn_unigram(df, "text", vocab_size=8, rounds=2,
                                  min_count=1)
    enc = unigram.unigram_encode(df, "doc_id", "text", model)
    row = tokeval.tokenizer_eval(df, enc, "doc_id", "text", "pieces",
                                 by="lang").collect()[0]
    assert row.n_docs == 2 and row.n_words == 10
    assert row.fertility_milli >= 1000
    # round-trip conservation: total piece chars == total word chars
    assert row.n_chars >= row.n_tokens  # every piece >= 1 char


def test_windowed_chunks_plan_is_row_local(spark):
    """The assembler must compile to pure map-side work — no
    Exchange, no window function, no join."""
    enc = _enc(spark, [(0, list("abcdef"), 6)])
    txt_df = tokeval.windowed_chunks(enc, "doc_id", "tokens",
                                     budget=4, stride=2)
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        txt_df.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "Window" not in plan
    assert "Join" not in plan


def test_windowed_chunks_works_on_streams(spark, tmp_path):
    """windowed_chunks is pure row-local column work, so it applies
    unchanged to a Structured Streaming encode (streamed == batch)."""
    import os

    enc = _enc(spark, [(i, [f"t{j}" for j in range(i)], i)
                       for i in range(1, 12)])
    expect = sorted((r.doc_id, r.chunk_idx, r.start, r.n_tokens,
                     tuple(r.tokens))
                    for r in tokeval.windowed_chunks(
                        enc, "doc_id", "tokens", budget=4,
                        stride=2).collect())

    src = os.path.join(str(tmp_path), "src")
    enc.repartition(3).write.parquet(src)
    stream = (spark.readStream
              .schema("doc_id long, tokens array<string>, n long")
              .option("maxFilesPerTrigger", "1").parquet(src))
    out = tokeval.windowed_chunks(stream, "doc_id", "tokens",
                                  budget=4, stride=2)
    assert out.isStreaming
    q = (out.writeStream.format("memory").queryName("win_stream")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        got = sorted((r.doc_id, r.chunk_idx, r.start, r.n_tokens,
                      tuple(r.tokens))
                     for r in spark.sql(
                         "SELECT * FROM win_stream").collect())
    finally:
        q.stop()
    assert got == expect


# --- property pin: window layout vs an independent python model -----

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=10, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.integers(min_value=0, max_value=25), min_size=1,
                max_size=6),
       st.integers(min_value=1, max_value=9),
       st.integers(min_value=1, max_value=9))
def test_windowed_chunks_matches_python_model(spark, lengths, budget,
                                              stride):
    if stride > budget:
        stride = budget
    enc = _enc(spark, [(i, [f"t{j}" for j in range(n)], n)
                       for i, n in enumerate(lengths)])
    got = sorted((r.doc_id, r.chunk_idx, r.start, r.n_tokens,
                  tuple(r.tokens))
                 for r in tokeval.windowed_chunks(
                     enc, "doc_id", "tokens", budget=budget,
                     stride=stride).collect())
    want = []
    for i, n in enumerate(lengths):
        toks = [f"t{j}" for j in range(n)]
        if n == 0:
            continue
        n_win = 1 + -(-max(n - budget, 0) // stride)
        for w in range(n_win):
            start = w * stride
            arr = toks[start:start + budget]
            want.append((i, w, start, len(arr), tuple(arr)))
    assert got == sorted(want)


def test_windows_oracle_matches_engine_on_documents(spark):
    """The DuckDB replay (windows_oracle_sql) is bit-identical to
    windowed_chunks over the plain token surface of the real
    documents table — the operator is registration-ready."""
    import hashlib

    import duckdb

    from kafkadirect_spark.functions import text
    from kafkadirect_spark.sources.batch import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    enc = docs.select("doc_id", text.tokens("text").alias("tokens"))
    eng = sorted(
        (r.doc_id, r.chunk_idx, r.start, r.n_tokens,
         hashlib.md5(",".join(r.tokens).encode()).hexdigest())
        for r in tokeval.windowed_chunks(
            enc, "doc_id", "tokens", budget=32, stride=24).collect())
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    got = sorted(con.sql(
        tokeval.windows_oracle_sql(budget=32, stride=24)).fetchall())
    assert got == eng


def test_unigram_eval_oracle_matches_engine(spark):
    """The DuckDB replay of tokenizer_eval over the TRAINED unigram
    encode (unigram_eval_oracle_sql — reuses the Viterbi-CTE
    machinery) is bit-identical to the engine on the real documents
    table: the r11 registration shape is ready."""
    import duckdb

    from kafkadirect_spark.sources.batch import load_table

    sf = "/root/testdata/sf0.01"
    docs = load_table(spark, sf, "documents")
    params = dict(vocab_size=16, rounds=2, max_piece_len=4,
                  min_count=2, max_word_types=4096, seed_factor=4)
    model = unigram.learn_unigram(docs, "text", **params)
    enc = unigram.unigram_encode(docs, "doc_id", "text", model)
    eng = sorted(tuple(r) for r in tokeval.tokenizer_eval(
        docs, enc, "doc_id", "text", "pieces", by="lang").collect())
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    got = sorted(con.sql(tokeval.unigram_eval_oracle_sql(
        by="lang", **params)).fetchall())
    assert got == eng
