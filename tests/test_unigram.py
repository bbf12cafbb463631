"""Unigram-LM tokenizer goldens (functions/unigram.py): the trainer
pinned against an independent python replication of the hard-EM spec,
Viterbi determinism, encode round-trip/OOV behavior, and the
streaming-applicability contract."""

import re

import pytest
from pyspark.sql import functions as F

from kafkadirect_spark.functions import unigram


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


# --- independent python model of the same spec -----------------------------

def _flog2(n):
    return n.bit_length() - 1


def _py_viterbi(word, bits, max_len, oov):
    """Recursive-with-memo formulation (vs the module's iterative DP):
    min (bits, n_pieces); ties keep the shortest last piece."""
    from functools import lru_cache

    @lru_cache(maxsize=None)
    def best(i):
        if i == 0:
            return (0, 0, ())
        out = None
        for j in range(i - 1, max(-1, i - max_len - 1), -1):
            piece = word[j:i]
            c = bits.get(piece)
            if c is None:
                if i - j != 1:
                    continue
                c = oov
            sub = best(j)
            cand = (sub[0] + c, sub[1] + 1, sub[2] + (piece,))
            if out is None or cand[:2] < out[:2]:
                out = cand
        return out

    return best(len(word))[2]


def _py_learn(texts, vocab_size, rounds, max_len, min_count,
              seed_factor):
    tok_re = re.compile("[^a-z0-9]+")
    wt = {}
    for t in texts:
        for w in tok_re.split(t.lower()):
            if w:
                wt[w] = wt.get(w, 0) + 1
    wt = {w: n for w, n in wt.items() if n >= min_count}

    seeds = {}
    for w, n in wt.items():
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + max_len) + 1):
                p = w[i:j]
                seeds[p] = seeds.get(p, 0) + n
    ranked = sorted(seeds.items(), key=lambda kv: (-kv[1], kv[0]))
    inv = dict(ranked[:seed_factor * vocab_size])
    chars = {p for p in seeds if len(p) == 1}
    for ch in chars:
        inv.setdefault(ch, seeds[ch])

    counts = inv
    for _ in range(rounds):
        total = sum(counts.values())
        tb = _flog2(total)
        bits = {p: tb - _flog2(c) for p, c in counts.items()}
        new = {}
        for w, n in wt.items():
            for p in _py_viterbi(w, bits, max_len, tb + 1):
                new[p] = new.get(p, 0) + n
        ranked = sorted(new.items(), key=lambda kv: (-kv[1], kv[0]))
        kept = dict(ranked[:vocab_size])
        for ch in chars:
            kept.setdefault(ch, max(new.get(ch, 0), 1))
        counts = kept
    total = sum(counts.values())
    tb = _flog2(total)
    return {p: (c, tb - _flog2(c)) for p, c in counts.items()}


TEXTS = [
    "lower lowest newer newest lowest",
    "low new wide wider widest",
    "the widest of the wide low low",
    "newer lower wider the the",
]


def test_learn_unigram_matches_python_model(spark):
    df = _docs(spark, TEXTS)
    got = {r.piece: (r.cnt, r.bits) for r in
           unigram.learn_unigram(df, "text", vocab_size=8, rounds=2,
                                 max_piece_len=6, min_count=1,
                                 seed_factor=4).collect()}
    want = _py_learn(TEXTS, 8, 2, 6, 1, 4)
    assert got == want


def test_learned_pieces_beat_chars(spark):
    # 'ab' repeats heavily: the survivor inventory must contain a
    # multi-char piece covering it, and encoding must USE it
    df = _docs(spark, ["ababab ababab ababab", "ababab cd"])
    model = unigram.learn_unigram(df, "text", vocab_size=4, rounds=2,
                                  min_count=1)
    pieces = {r.piece for r in model.collect()}
    assert any(len(p) > 1 and set(p) <= {"a", "b"} for p in pieces)
    enc = unigram.unigram_encode(df, "doc_id", "text", model).collect()
    by_id = {r.doc_id: list(r.pieces) for r in enc}
    assert all(len(p) > 1 for p in by_id[0])  # no char-level fallback


def test_encode_round_trips_and_handles_oov(spark):
    train = _docs(spark, TEXTS)
    model = unigram.learn_unigram(train, "text", vocab_size=8,
                                  rounds=2, min_count=1)
    # score a frame containing words and CHARACTERS never trained on
    score = _docs(spark, ["lowest zz unseen q7", "", "   "])
    out = {r.doc_id: (list(r.pieces), r.n_pieces) for r in
           unigram.unigram_encode(score, "doc_id", "text",
                                  model).collect()}
    toks = [w for w in re.split("[^a-z0-9]+", "lowest zz unseen q7")
            if w]
    assert "".join(out[0][0]) == "".join(toks)  # lossless round-trip
    assert out[0][1] == len(out[0][0])
    assert out[1] == ([], 0) and out[2] == ([], 0)


def test_viterbi_tie_break_is_deterministic():
    # two segmentations of 'abcd' cost the same bits with the same
    # piece count: ('ab','cd') vs ('a','bcd')? give equal costs and
    # pin the longest-last-piece rule
    bits = {"ab": 5, "cd": 5, "a": 5, "bcd": 5, "b": 9, "c": 9, "d": 9}
    got = unigram.viterbi_segment("abcd", bits, 3, 99)
    # both candidates are (10 bits, 2 pieces); the j = i-1 ... scan
    # finds the SHORTEST last piece first and strict < keeps it
    assert got == ("ab", "cd")
    assert sum(bits[p] for p in got) == 10


def test_learn_unigram_guards(spark):
    df = _docs(spark, ["a b"])
    with pytest.raises(ValueError, match="vocab_size"):
        unigram.learn_unigram(df, "text", vocab_size=0)
    with pytest.raises(ValueError, match="rounds"):
        unigram.learn_unigram(df, "text", vocab_size=4, rounds=0)
    with pytest.raises(ValueError, match="MAX_INVENTORY"):
        unigram.learn_unigram(df, "text", vocab_size=10_000_000)


def test_unigram_chunk_reconcatenates_to_encoding(spark):
    df = _docs(spark, TEXTS)
    model = unigram.learn_unigram(df, "text", vocab_size=8,
                                  rounds=2, min_count=1)
    enc = {r.doc_id: list(r.pieces) for r in
           unigram.unigram_encode(df, "doc_id", "text", model).collect()}
    chunks = sorted((r.chunk_idx, list(r.pieces)) for r in
                    unigram.unigram_chunk(df, "doc_id", "text", model,
                                          budget=3)
                    .filter(F.col("doc_id") == 0).collect())
    glued = [p for _, arr in chunks for p in arr]
    assert glued == enc[0]
    assert all(len(arr) <= 3 for _, arr in chunks)
    with pytest.raises(ValueError, match="budget"):
        unigram.unigram_chunk(df, "doc_id", "text", model, budget=0)


def test_unigram_encode_works_on_streams(spark, tmp_path):
    """unigram_encode is a stateless mapInPandas transform, so the
    trained tokenizer applies unchanged to a Structured Streaming
    ingest (streamed == batch) — same contract as bpe_encode."""
    import os

    batch_df = _docs(spark, TEXTS)
    model = unigram.learn_unigram(batch_df, "text", vocab_size=8,
                                  rounds=2, min_count=1)
    expect = {r.doc_id: (list(r.pieces), r.n_pieces) for r in
              unigram.unigram_encode(batch_df, "doc_id", "text",
                                     model).collect()}

    src = os.path.join(str(tmp_path), "src")
    batch_df.repartition(2).write.parquet(src)
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", "1").parquet(src))
    out = unigram.unigram_encode(stream, "doc_id", "text", model)
    assert out.isStreaming
    q = (out.writeStream.format("memory").queryName("uni_stream")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        got = {r.doc_id: (list(r.pieces), r.n_pieces) for r in
               spark.sql("SELECT * FROM uni_stream").collect()}
    finally:
        q.stop()
    assert got == expect


def test_oracle_sql_matches_engine_on_synthetic(spark):
    """The DuckDB oracle generators (recursive-CTE Viterbi with the
    per-word DP table carried as a struct list) replay learn_unigram
    AND unigram_chunk bit-for-bit — training rounds, pruning,
    char-floor, encode-time OOV, chunk slicing."""
    import hashlib

    import duckdb
    import pandas as pd

    texts = TEXTS + ["newer lower wider the the zz9 unseen"]
    df = _docs(spark, texts)
    params = dict(vocab_size=8, rounds=2, max_piece_len=4,
                  min_count=1, max_word_types=1 << 16, seed_factor=4)
    model = unigram.learn_unigram(df, "text", **params)
    eng = sorted((r.piece, r.cnt, r.bits) for r in model.collect())

    con = duckdb.connect()
    con.register("documents",
                 pd.DataFrame({"doc_id": range(len(texts)),
                               "text": texts}))
    assert sorted(con.sql(
        unigram.vocab_oracle_sql(**params)).fetchall()) == eng

    ch = unigram.unigram_chunk(df, "doc_id", "text", model, budget=5)
    eng_ch = sorted(
        (r.doc_id, r.chunk_idx, r.n_pieces,
         hashlib.md5(",".join(r.pieces).encode()).hexdigest())
        for r in ch.collect())
    assert sorted(con.sql(
        unigram.chunk_oracle_sql(budget=5, **params)
    ).fetchall()) == eng_ch


# --- property pin: the Viterbi-SQL oracle vs the engine -------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_word = st.text(alphabet="abc12", min_size=1, max_size=7)


@settings(max_examples=5, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.lists(_word, min_size=1, max_size=6),
                min_size=2, max_size=5),
       st.integers(min_value=2, max_value=10),
       st.integers(min_value=2, max_value=5))
def test_oracle_property_random_corpora(spark, docs_words, vocab_size,
                                        max_piece_len):
    """The recursive-CTE Viterbi oracle is bit-identical to the
    engine on RANDOM corpora / vocab sizes / piece lengths — not just
    the hand-built fixture.  Covers repeated words, numeral chars,
    single-word docs, vocab saturation, and chunk-boundary ties."""
    import hashlib

    import duckdb
    import pandas as pd

    texts = [" ".join(ws) for ws in docs_words]
    df = _docs(spark, texts)
    params = dict(vocab_size=vocab_size, rounds=2,
                  max_piece_len=max_piece_len, min_count=1,
                  max_word_types=1 << 16, seed_factor=4)
    model = unigram.learn_unigram(df, "text", **params)
    eng = sorted((r.piece, r.cnt, r.bits) for r in model.collect())

    con = duckdb.connect()
    con.register("documents",
                 pd.DataFrame({"doc_id": range(len(texts)),
                               "text": texts}))
    assert sorted(con.sql(
        unigram.vocab_oracle_sql(**params)).fetchall()) == eng

    eng_ch = sorted(
        (r.doc_id, r.chunk_idx, r.n_pieces,
         hashlib.md5(",".join(r.pieces).encode()).hexdigest())
        for r in unigram.unigram_chunk(df, "doc_id", "text", model,
                                       budget=3).collect())
    assert sorted(con.sql(
        unigram.chunk_oracle_sql(budget=3, **params)
    ).fetchall()) == eng_ch
