"""Golden tests for corpus-curation operators (functions/curation.py):
deterministic splits, stratified sampling, decontamination, sequence
packing, per-group top-k."""

import pytest
from pyspark.sql import functions as F

from kafkadirect_spark.functions import curation


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"doc number {i} " + ("alpha beta gamma " * (i % 5 + 1)))
            for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_split_assign_partitions_everything_once(docs):
    out = curation.split_assign(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 200
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > counts.get("val", 0)
    # deterministic: a second run assigns identical splits
    again = curation.split_assign(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.collect() == again.collect()


def test_split_assign_rejects_excess_fractions(docs):
    with pytest.raises(ValueError):
        curation.split_assign(docs, "doc_id", {"a": 0.9, "b": 0.2})


def test_split_disjoint_from_sample_hash(docs):
    """Different salts ⇒ independent decisions: the sampled set is not
    a prefix/suffix of any split."""
    split = curation.split_assign(docs, "doc_id", {"train": 0.5, "rest": 0.5})
    sampled = curation.stratified_sample(
        docs.withColumn("s", F.lit("x")), "s", {"x": 0.5}, "doc_id")
    train_ids = {r["doc_id"] for r in
                 split.filter("split = 'train'").collect()}
    sample_ids = {r["doc_id"] for r in sampled.collect()}
    assert train_ids != sample_ids  # overlap but not identical


def test_stratified_sample_rates(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = curation.stratified_sample(
        df, "lang", {"en": 0.5, "de": 0.1}, "doc_id")
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert 400 <= counts["en"] <= 600       # ~500 of 1000
    assert 60 <= counts["de"] <= 140        # ~100 of 1000
    # default rate 0 drops unknown strata entirely
    extra = spark.createDataFrame([(9999, "fr")], "doc_id long, lang string")
    out2 = curation.stratified_sample(
        df.union(extra), "lang", {"en": 0.5, "de": 0.1}, "doc_id")
    assert out2.filter("lang = 'fr'").count() == 0


def test_decontaminate_flags_ngram_overlap(spark):
    base = "one two three four five six seven eight nine ten"
    train = spark.createDataFrame(
        [(1, base + " extra tail words here"),        # shares an 8-gram
         (2, "totally different content with no overlapping phrases at all"),
         (3, "short doc")],                           # < 8 tokens: clean
        "doc_id long, text string")
    eval_df = spark.createDataFrame(
        [(100, "prefix words then " + base)], "doc_id long, text string")
    out = {r["doc_id"]: r["contaminated"]
           for r in curation.decontaminate(train, eval_df, "text", "doc_id",
                                           n=8).collect()}
    assert out == {1: True, 2: False, 3: False}


def test_pack_sequences_budget_boundaries(spark):
    # one shard so the packing order is the id order
    df = spark.createDataFrame(
        [(1, 400), (2, 400), (3, 400), (4, 1500), (5, 10)],
        "doc_id long, n long")
    out = curation.pack_sequences(df, "doc_id", "n", budget=1000, n_shards=1)
    rows = {r["doc_id"]: (r["shard"], r["seq_id"], r["n_tokens"])
            for r in out.collect()}
    seqs = {i: rows[i][1] for i in rows}
    # docs 1,2 fill seq 0 (800); doc 3 crosses 1000 -> starts at cum 800
    assert seqs[1] == seqs[2] == 0
    assert seqs[3] == 0  # starts at 800 < 1000 (greedy: may overflow budget)
    assert seqs[4] == 1  # starts at cum 1200 -> 1200//1000
    assert seqs[5] == 2  # starts at 2700 -> 2
    assert all(r[2] > 0 for r in rows.values())


def test_pack_sequences_shards_are_stable(spark):
    df = spark.createDataFrame([(i, 100) for i in range(50)],
                               "doc_id long, n long")
    a = curation.pack_sequences(df, "doc_id", "n", budget=500, n_shards=4)
    b = curation.pack_sequences(df, "doc_id", "n", budget=500, n_shards=4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    assert a.select("shard").distinct().count() <= 4


def test_topk_per_group(spark):
    df = spark.createDataFrame(
        [("a", i, float(i % 7)) for i in range(20)]
        + [("b", 100 + i, float(i)) for i in range(3)],
        "grp string, id long, score double")
    out = curation.topk_per_group(df, "grp", "score", k=2, tiebreak_col="id")
    got = [(r["grp"], r["id"], r["rank"]) for r in
           out.orderBy("grp", "rank").collect()]
    # group a: score 6.0 at ids 6 and 13 -> tiebreak keeps 6 then 13
    assert got == [("a", 6, 1), ("a", 13, 2), ("b", 102, 1), ("b", 101, 2)]


def test_topk_per_group_salted_matches_single_window(spark):
    """The two-phase salted plan is an optimization, not a semantics
    change: for any salt fan-out it returns exactly the single-window
    answer (a global top-k row is a top-k row of its sub-partition)."""
    import random

    rng = random.Random(7)
    rows = [(rng.choice(["en", "unknown"]), i, float(rng.randrange(50)))
            for i in range(400)]
    df = spark.createDataFrame(rows, "grp string, id long, score double")
    baseline = sorted(
        (r["grp"], r["id"], r["rank"]) for r in curation.topk_per_group(
            df, "grp", "score", k=7, tiebreak_col="id",
            salt_parts=1).collect())
    for s in (2, 8, 32):
        got = sorted(
            (r["grp"], r["id"], r["rank"]) for r in curation.topk_per_group(
                df, "grp", "score", k=7, tiebreak_col="id",
                salt_parts=s).collect())
        assert got == baseline, f"salt_parts={s}"


def test_vocab_stats(spark):
    df = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "apple cherry")],
        "doc_id long, text string")
    out = {r["token"]: (r["tf"], r["df"]) for r in
           curation.vocab_stats(df, "text", "doc_id").collect()}
    assert out == {"apple": (3, 2), "banana": (1, 1), "cherry": (1, 1)}
    top1 = curation.vocab_stats(df, "text", "doc_id", top_k=1).collect()
    assert [(r["token"], r["tf"]) for r in top1] == [("apple", 3)]


def test_boilerplate_ratio(spark):
    span = " ".join(f"w{i}" for i in range(10))        # one shared 10-gram
    df = spark.createDataFrame(
        [(1, span + " unique one extra"),
         (2, span + " other tail entirely"),
         (3, span + " third copy here"),
         (4, "completely different words " + " ".join(f"x{i}" for i in range(10))),
         (5, "short doc")],                            # <10 tokens: absent
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           curation.boilerplate_ratio(df, "text", "doc_id",
                                      n=10, max_doc_freq=2).collect()}
    assert 5 not in out
    # docs 1-3 share exactly the w0..w9 gram (df=3 > 2): 1 boiler gram each
    for d in (1, 2, 3):
        assert out[d]["n_boiler"] == 1
        assert out[d]["boiler_ratio"] == pytest.approx(1 / out[d]["n_grams"])
    assert out[4]["n_boiler"] == 0 and out[4]["boiler_ratio"] == 0.0


def test_upsample_fractional_copies(spark):
    df = spark.createDataFrame(
        [(i, "hi" if i < 100 else "lo") for i in range(200)],
        "doc_id long, src string")
    out = curation.upsample(df, "src", {"hi": 2.5, "lo": 0.25}, "doc_id")
    rows = [(r["doc_id"], r["src"], r["epoch"]) for r in out.collect()]
    hi = [r for r in rows if r[1] == "hi"]
    lo = [r for r in rows if r[1] == "lo"]
    # every hi doc appears in epochs 0 and 1; ~50% get epoch 2
    assert sum(1 for r in hi if r[2] in (0, 1)) == 200
    n_third = sum(1 for r in hi if r[2] == 2)
    assert 30 <= n_third <= 70
    # lo docs appear at most once (epoch 0), ~25%
    assert all(r[2] == 0 for r in lo)
    assert 10 <= len(lo) <= 40
    # weight 1.0 default: exactly one copy each
    plain = curation.upsample(df, "src", {}, "doc_id")
    assert plain.count() == 200 and plain.filter("epoch != 0").count() == 0
    # deterministic across runs
    again = curation.upsample(df, "src", {"hi": 2.5, "lo": 0.25}, "doc_id")
    assert sorted(rows) == sorted(
        (r["doc_id"], r["src"], r["epoch"]) for r in again.collect())


def test_corpus_stats(spark):
    df = spark.createDataFrame(
        [("a", i) for i in [10, 20, 30, 40, 100]] + [("b", 7)],
        "src string, sz long")
    out = {r["src"]: r for r in
           curation.corpus_stats(df, "src", "sz").collect()}
    a = out["a"]
    assert (a["n_docs"], a["total_size"], a["avg_size_milli"]) == (5, 200, 40000)
    # discrete percentiles are actual data values
    assert a["p50_size"] == 30 and a["p90_size"] == 100 and a["p99_size"] == 100
    b = out["b"]
    assert (b["n_docs"], b["p50_size"]) == (1, 7)


def test_redact_pii(spark):
    from kafkadirect_spark.functions import text as T
    df = spark.createDataFrame(
        [(1, "mail bob.smith@example.com or call 555-1234 now"),
         (2, "ssn 123-45-6789 stays hidden"),
         (3, "no sensitive content here"),
         (4, "two mails a@b.co and c.d@e.org plus 987 6543")],
        "doc_id long, text string")
    out = {r["doc_id"]: (r["red"], r["n"]) for r in df.select(
        "doc_id", T.redact_pii("text").alias("red"),
        T.pii_count("text").alias("n")).collect()}
    assert out[1] == ("mail <EMAIL> or call <PHONE> now", 2)
    assert out[2] == ("ssn <SSN> stays hidden", 1)
    assert out[3] == ("no sensitive content here", 0)
    assert out[4] == ("two mails <EMAIL> and <EMAIL> plus <PHONE>", 3)


def test_chunk_documents_windows_and_tail(spark):
    """Chunk boundaries: stride = chunk−overlap, tail chunk short,
    short doc → one chunk, empty doc → none."""
    rows = [
        (1, " ".join(f"w{i}" for i in range(10))),   # 10 toks
        (2, "a b c"),                                 # 3 toks < chunk
        (3, ""),                                      # 0 toks
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = curation.chunk_documents(df, "doc_id", "text",
                                   chunk_tokens=4, overlap=2)
    got = {(r["doc_id"], r["chunk_id"]): r["chunk_len"]
           for r in out.collect()}
    # doc 1: 1 + ceil((10-4)/2) = 4 chunks at starts 0,2,4,6 — the
    # would-be start-8 window is fully inside the start-6 chunk and
    # must NOT be emitted
    assert {k: v for k, v in got.items() if k[0] == 1} == {
        (1, 0): 4, (1, 1): 4, (1, 2): 4, (1, 3): 4}
    # doc 2: one short chunk
    assert {k: v for k, v in got.items() if k[0] == 2} == {(2, 0): 3}
    # doc 3: no chunks
    assert not [k for k in got if k[0] == 3]


def test_chunk_documents_overlap_reconstructs_text(spark):
    """Consecutive chunks share exactly `overlap` tokens — verified via
    hashes of hand-sliced windows."""
    words = [f"t{i}" for i in range(8)]
    df = spark.createDataFrame([(1, " ".join(words))],
                               "doc_id long, text string")
    out = (curation.chunk_documents(df, "doc_id", "text",
                                    chunk_tokens=4, overlap=1)
           .orderBy("chunk_id").collect())
    import hashlib
    expect = [words[s:s + 4] for s in range(0, 8, 3)]
    assert [r["chunk_hash"] for r in out] == [
        hashlib.md5(" ".join(c).encode()).hexdigest() for c in expect]


def test_chunk_documents_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        curation.chunk_documents(df, "doc_id", "text",
                                 chunk_tokens=4, overlap=4)


def test_importance_scores_prefers_target_like_docs(spark):
    """Docs sharing bigrams with the target subset outscore docs whose
    bigrams only occur off-target; the score matches the hand-computed
    integer ratio sum."""
    rows = [
        (1, "the quick fox", True),     # target
        (2, "the quick dog", False),    # shares 'the quick' with target
        (3, "lazy grey cat", False),    # no target bigrams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    out = {r["doc_id"]: r["score"]
           for r in curation.importance_scores(
               df, "doc_id", "text", target=F.col("tgt")).collect()}
    # bigram dfs: 'the quick' df_c=2 df_t=1; 'quick fox' 1/1;
    # 'quick dog' 1/0; 'lazy grey' 1/0; 'grey cat' 1/0
    assert out[1] == 1_000_000 // 2 + 1_000_000          # own doc counts
    assert out[2] == 1_000_000 // 2
    assert out[3] == 0
    assert out[1] > out[2] > out[3]


def test_shuffle_positions_is_a_permutation(docs):
    out = curation.shuffle_positions(docs, "doc_id", shards=16).collect()
    assert sorted(r.pos for r in out) == list(range(1, len(out) + 1))
    # rerun-stable and seed-sensitive
    again = curation.shuffle_positions(docs, "doc_id", shards=16).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    other = curation.shuffle_positions(docs, "doc_id", seed="x",
                                       shards=16).collect()
    assert sorted(map(tuple, out)) != sorted(map(tuple, other))


def test_shuffle_positions_layout_independent(docs):
    """Positions are a pure function of (seed, id) — repartitioning the
    input cannot move anyone (the property zipWithIndex loses)."""
    a = curation.shuffle_positions(docs, "doc_id", shards=8).collect()
    b = curation.shuffle_positions(docs.repartition(7), "doc_id",
                                   shards=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_sample_exact_n_prefix_property(docs):
    """|sample| is exactly n, rerun-stable, and a larger draw CONTAINS
    every smaller draw (hash order is a fixed total order) — growing a
    sample never resamples what you already processed."""
    s50 = {r.doc_id for r in curation.sample_exact_n(docs, "doc_id", 50).collect()}
    s100 = {r.doc_id for r in curation.sample_exact_n(docs, "doc_id", 100).collect()}
    assert len(s50) == 50 and len(s100) == 100
    assert s50 < s100


def test_term_relevance_idf_monotone(spark):
    """At equal tf, the rarer term outranks the common one; scores
    match the integer formula."""
    rows = [(1, "apple banana"), (2, "banana cherry"), (3, "banana date")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = curation.term_relevance(df, "doc_id", "text", k=2).collect()
    d1 = {r.term: (r.score_ppm, r.rk) for r in out if r.doc_id == 1}
    # apple: tf=1 df=1 → 1e6*3; banana: tf=1 df=3 → 1e6*3//3
    assert d1["apple"] == (3_000_000, 1)
    assert d1["banana"] == (1_000_000, 2)


def test_decontaminate_bloom_supersets_exact(spark):
    """Bloom flags ⊇ exact flags (one-sided error), and on this tiny
    input (no collisions plausible at 2^20 bits) they coincide."""
    base = "one two three four five six seven eight nine ten"
    train = spark.createDataFrame(
        [(1, base + " extra tail words here"),
         (2, "totally different content with no overlapping phrases at all"),
         (3, "short doc")],
        "doc_id long, text string")
    eval_df = spark.createDataFrame(
        [(100, "prefix words then " + base)], "doc_id long, text string")
    exact = {r["doc_id"]: r["contaminated"]
             for r in curation.decontaminate(
                 train, eval_df, "text", "doc_id", n=8).collect()}
    bloom = {r["doc_id"]: r["contaminated"]
             for r in curation.decontaminate_bloom(
                 train, eval_df, "text", "doc_id", n=8).collect()}
    assert set(bloom) == set(exact)
    assert all(bloom[d] or not exact[d] for d in exact)  # superset
    assert bloom == exact  # no FPs at this size


def test_weighted_keep_rates_and_cap(spark):
    """Keep rate tracks the weight (±2% at 10k rows) and weights ≥ 1
    keep everything; decisions are id-deterministic."""
    df = spark.range(0, 10_000).select(F.col("id").alias("doc_id"))
    for w, expect in ((0.3, 0.3), (0.7, 0.7), (1.5, 1.0)):
        kept = curation.weighted_keep(df, "doc_id", F.lit(w)).count()
        assert abs(kept / 10_000 - expect) < 0.02, (w, kept)
    a = curation.weighted_keep(df, "doc_id", F.lit(0.5)).collect()
    b = curation.weighted_keep(df.repartition(7), "doc_id",
                               F.lit(0.5)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_sample_exact_n_per_group(spark):
    """Exact-n per stratum: every group returns min(n, group size)
    rows, membership is layout-invariant and seed-redrawable."""
    from kafkadirect_spark.functions import curation

    rows = [(i, "en" if i % 3 else "de") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = curation.sample_exact_n_per_group(
        df, ["lang"], "doc_id", 10, seed="s1").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    assert len(by_lang["en"]) == 10 and len(by_lang["de"]) == 10
    # groups smaller than n come back whole
    tiny = curation.sample_exact_n_per_group(
        df.filter("doc_id < 4"), ["lang"], "doc_id", 10).collect()
    assert len(tiny) == 4
    # layout-invariant
    out2 = curation.sample_exact_n_per_group(
        df.repartition(13), ["lang"], "doc_id", 10, seed="s1").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    # a different seed redraws
    out3 = curation.sample_exact_n_per_group(
        df, ["lang"], "doc_id", 10, seed="s2").collect()
    assert sorted(map(tuple, out)) != sorted(map(tuple, out3))
    with pytest.raises(ValueError, match="n must be"):
        curation.sample_exact_n_per_group(df, ["lang"], "doc_id", 0)


def test_surprisal_scores_match_python_model(spark):
    import math
    rows = [(1, "the the the cat"), (2, "quasar the"), (3, "the the")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (r.n_tokens, r.surprisal_bits)
           for r in curation.surprisal_scores(df, "doc_id", "text").collect()}
    from collections import Counter
    cnt = Counter(t for _, txt in rows for t in txt.split())
    n = sum(cnt.values())
    model = {}
    for d, txt in rows:
        toks = txt.split()
        bits = sum(int(math.log2(n)) - int(math.log2(cnt[t])) for t in toks)
        model[d] = (len(toks), bits)
    assert out == model
    # the rare-token doc scores strictly higher per token
    per_tok = {d: b / k for d, (k, b) in out.items()}
    assert per_tok[2] > per_tok[1] > per_tok[3]


def test_surprisal_skips_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, ""), (3, "---")], "doc_id long, text string")
    ids = {r.doc_id for r in
           curation.surprisal_scores(df, "doc_id", "text").collect()}
    assert ids == {1}


def test_profile_columns_exact(spark):
    df = spark.createDataFrame(
        [(1, "x", None), (2, "x", 5), (3, None, 5), (3, "yyy", None)],
        "id long, s string, v int")
    out = {r.col_name: (r.n_rows, r.n_null, r.n_distinct, r.max_len)
           for r in curation.profile_columns(df, ["id", "s", "v"]).collect()}
    assert out == {
        "id": (4, 0, 3, 1),
        "s": (4, 1, 2, 3),
        "v": (4, 2, 1, 1),
    }


def test_profile_columns_rejects_empty_list(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        curation.profile_columns(df, [])


def test_temperature_mix_keep_fractions(spark):
    import math
    # head source 10x the tail: keep fraction must be ~sqrt(1/10)
    rows = [(i, "head") for i in range(2000)] + \
           [(10_000 + i, "tail") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = curation.temperature_mix(df, "source", "doc_id").collect()
    kept = {"head": 0, "tail": 0}
    for r in out:
        kept[r.source] += 1
    assert kept["tail"] == 200  # smallest stratum keeps everything
    expect = 2000 * math.sqrt(200 / 2000)
    assert abs(kept["head"] - expect) / expect < 0.15
    # deterministic: same ids survive a re-run
    again = {r.doc_id for r in
             curation.temperature_mix(df, "source", "doc_id").collect()}
    assert again == {r.doc_id for r in out}


def test_normalize_text_canonicalizes_variants(spark):
    from kafkadirect_spark.functions.text import normalize_text
    rows = [
        (1, "Hello   World"),
        (2, "hello world"),
        (3, "hello\tworld\n"),
        (4, "hello world"),
        (5, "HELLO “WORLD”"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dict((r.doc_id, r.norm) for r in
               df.select("doc_id",
                         normalize_text("text").alias("norm")).collect())
    assert out[1] == out[2] == out[3] == out[4] == "hello world"
    assert out[5] == 'hello "world"'


def test_bigram_surprisal_matches_python_model(spark):
    import math
    from collections import Counter
    rows = [(0, "the cat sat on the mat"),
            (1, "the cat ran"),
            (2, "quasar pulsar the cat"),
            (3, "on the mat"),
            (4, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    lm_rows = [r for r in rows if r[0] % 2 == 0]
    lm = df.filter(F.col("doc_id") % 2 == 0)
    out = {r.doc_id: (r.n_bigrams, r.surprisal_bits)
           for r in curation.bigram_surprisal_scores(
               df, "doc_id", "text", lm_df=lm, backoff_bits=4).collect()}

    big = Counter()
    uni = Counter()
    for _, txt in lm_rows:
        w = txt.split()
        uni.update(w)
        big.update(zip(w, w[1:]))
    pre = Counter()
    for (w1, _), c in big.items():
        pre[w1] += c
    n = sum(uni.values())
    model = {}
    for d, txt in rows:
        w = txt.split()
        if len(w) < 2:
            continue
        bits = 0
        for w1, w2 in zip(w, w[1:]):
            if (w1, w2) in big:
                bits += int(math.log2(pre[w1])) - int(math.log2(big[w1, w2]))
            else:
                bits += int(math.log2(n)) - int(math.log2(uni.get(w2, 1))) + 4
        model[d] = (len(w) - 1, bits)
    assert out == model
    # doc 1 contains the LM-unseen bigram (cat, ran): the backoff
    # penalty must have fired (strictly positive bits)
    assert out[1][1] > 0


def test_bigram_surprisal_self_lm_never_backs_off(spark):
    rows = [(1, "a b a b"), (2, "b c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # scoring the corpus under its own LM: every bigram is seen, so
    # bits are bounded by log2(total bigrams) per bigram — far below
    # what any backoff penalty path would produce for these counts
    out = {r.doc_id: r.surprisal_bits
           for r in curation.bigram_surprisal_scores(
               df, "doc_id", "text", backoff_bits=100).collect()}
    assert all(v < 100 for v in out.values())


def test_gopher_quality_signals_and_rules(spark):
    good = ("the cat sat on the mat and then the dog ran to the house "
            "with a ball and they played in the sun for hours until "
            "it was time to go home and eat some food with the family "
            "then sleep well all night long under one warm red roof")
    looping = "the cat " * 40            # dup 2-grams ≫ 20%
    short = "tiny doc"                   # < 50 words
    symbols = " ".join(["x9z7q"] * 60)   # no stopwords, monotone
    rows = [(1, good), (2, looping.strip()), (3, short), (4, symbols)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.asDict()
           for r in curation.gopher_quality(df, "doc_id", "text").collect()}

    assert out[1]["pass_gopher"] is True
    assert out[2]["pass_gopher"] is False
    assert out[2]["dup_2gram_ppm"] > 200_000
    assert out[2]["top_2gram_ppm"] > 200_000
    assert out[3]["pass_gopher"] is False
    assert out[3]["n_words"] < 50
    assert out[4]["pass_gopher"] is False
    assert out[4]["stopword_hits"] < 2

    # exact integer check of one signal against a hand model
    w = good.split()
    grams = list(zip(w, w[1:]))
    total, distinct = len(grams), len(set(grams))
    assert out[1]["dup_2gram_ppm"] == 1_000_000 * (total - distinct) // total
    assert out[1]["mean_word_len_x100"] == \
        100 * sum(len(t) for t in w) // len(w)


def test_gopher_quality_empty_doc_row_present(spark):
    df = spark.createDataFrame([(1, ""), (2, "the a of " * 30)],
                               "doc_id long, text string")
    out = {r.doc_id: r.asDict()
           for r in curation.gopher_quality(df, "doc_id", "text").collect()}
    assert out[1]["n_words"] == 0 and out[1]["pass_gopher"] is False
    assert set(out) == {1, 2}


def test_cluster_safe_split_never_straddles(spark):
    docs = spark.createDataFrame([(i, f"t{i}") for i in range(100)],
                                 "doc_id long, text string")
    # chain 0-1-2 plus pair (10, 11): components {0,1,2}, {10,11}
    pairs = spark.createDataFrame([(0, 1), (1, 2), (10, 11)],
                                  "id_a long, id_b long")
    out = curation.cluster_safe_split(
        docs, "doc_id", pairs, {"train": 0.6, "val": 0.2, "test": 0.2})
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 100
    assert rows[0].cluster == rows[1].cluster == rows[2].cluster == 0
    assert rows[10].cluster == rows[11].cluster == 10
    # the leakage guarantee: same cluster => same split
    assert rows[0].split == rows[1].split == rows[2].split
    assert rows[10].split == rows[11].split
    # singletons are their own cluster and all splits are populated
    assert rows[50].cluster == 50
    assert {r.split for r in rows.values()} == {"train", "val", "test"}


def test_select_token_budget_exact_prefix(spark):
    rows = [(i, "w " * (i % 7 + 1)) for i in range(300)]
    df = spark.createDataFrame([(i, t.strip()) for i, t in rows],
                               "doc_id long, text string")
    from kafkadirect_spark.functions.text import tokens
    budget = 400
    out = curation.select_token_budget(
        df, "doc_id", F.size(tokens("text")), budget=budget).collect()
    assert out, "budget selects something"
    # prefix bound holds for every kept row; total is maximal
    assert max(r.cum_tokens for r in out) <= budget
    # replay the induced order in python and check exact equality
    import hashlib
    def h(i):
        return int(hashlib.md5(f"budget{i}".encode()).hexdigest()[:14],
                   16) % 2147483647
    order = sorted(((h(i) % 1024, h(i), i) for i, _ in rows))
    cum, want = 0, {}
    for _, _, i in order:
        n = i % 7 + 1
        if cum + n > budget:
            break
        cum += n
        want[i] = (n, cum)
    got = {r.doc_id: (r.n_tokens, r.cum_tokens) for r in out}
    assert got == want


def test_select_token_budget_deterministic_and_seeded(spark):
    df = spark.createDataFrame([(i, "a b c") for i in range(200)],
                               "doc_id long, text string")
    a = {r.doc_id for r in curation.select_token_budget(
        df, "doc_id", F.lit(3), budget=150).collect()}
    b = {r.doc_id for r in curation.select_token_budget(
        df, "doc_id", F.lit(3), budget=150).collect()}
    c = {r.doc_id for r in curation.select_token_budget(
        df, "doc_id", F.lit(3), budget=150, seed="other").collect()}
    assert a == b          # reproducible
    assert len(a) == 50    # 150 // 3 — exact, not approximate
    assert a != c          # reseeding redraws the prefix


def test_select_token_budget_rejects_negative(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        curation.select_token_budget(df, "doc_id", F.lit(1), budget=-1)


def test_partition_fingerprint_order_independent(spark):
    rows = [(i, f"t{i % 5}", i % 3) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, t string, g int")
    a = curation.partition_fingerprint(df, ["id", "t"], by=["g"]).collect()
    # reversed row order, different partitioning — identical result
    rev = spark.createDataFrame(list(reversed(rows)),
                                "id long, t string, g int").repartition(7)
    b = curation.partition_fingerprint(rev, ["id", "t"], by=["g"]).collect()
    key = lambda r: r.g  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)


def test_partition_fingerprint_detects_content_change(spark):
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, t string")
    df2 = spark.createDataFrame([(1, "a"), (2, "c")], "id long, t string")
    f1 = curation.partition_fingerprint(df1, ["id", "t"]).collect()[0]
    f2 = curation.partition_fingerprint(df2, ["id", "t"]).collect()[0]
    assert f1.n_rows == f2.n_rows == 2
    assert f1.fingerprint != f2.fingerprint
    # null is distinct from the strings '' and 'null'
    variants = [[(1, None)], [(1, "")], [(1, "null")]]
    prints = set()
    for v in variants:
        d = spark.createDataFrame(v, "id long, t string")
        prints.add(curation.partition_fingerprint(
            d, ["id", "t"]).collect()[0].fingerprint)
    assert len(prints) == 3


def test_partition_fingerprint_rejects_no_cols(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        curation.partition_fingerprint(df, [])


def test_collocations_match_python_model(spark):
    from collections import Counter
    texts = ["the big cat", "the big dog", "big cat runs", "a big cat",
             "the red fish", "red fish swim", "the red fish"] * 3
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = [(r.w1, r.w2, r.pair_count, r.score) for r in
           curation.collocations(df, "doc_id", "text",
                                 min_count=2, k=10).collect()]
    big = Counter()
    for _, t in rows:
        w = t.split()
        big.update(zip(w, w[1:]))
    ca, cb = Counter(), Counter()
    for (a, b), c in big.items():
        ca[a] += c
        cb[b] += c
    n = sum(big.values())
    scored = [(a, b, c, 1_000_000 * c * n // (ca[a] * cb[b]))
              for (a, b), c in big.items() if c >= 2]
    want = sorted(scored, key=lambda r: (-r[3], r[0], r[1]))[:10]
    assert out == want
    # "red fish" (always together) must outrank "the big" (the also
    # precedes red): chance-corrected, not raw frequency
    top_pairs = [(a, b) for a, b, _, _ in out]
    assert top_pairs.index(("red", "fish")) < top_pairs.index(("the", "big"))


def test_collocations_min_count_suppresses_hapax(spark):
    df = spark.createDataFrame(
        [(1, "unique pairing here"), (2, "common word common word")],
        "doc_id long, text string")
    out = curation.collocations(df, "doc_id", "text",
                                min_count=2, k=10).collect()
    assert all(r.pair_count >= 2 for r in out)
    assert ("unique", "pairing") not in {(r.w1, r.w2) for r in out}


def test_pack_bestfit_valid_and_beats_greedy(spark):
    import random
    rng = random.Random(17)
    rows = [(i, rng.randint(50, 900)) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    budget = 1024
    bfd = curation.pack_sequences_bestfit(df, "doc_id", "n",
                                          budget=budget, n_shards=4)
    out = bfd.collect()
    assert len(out) == 400
    # validity: no (shard, seq) exceeds the budget (all docs fit here)
    from collections import defaultdict
    fill = defaultdict(int)
    for r in out:
        fill[(r.shard, r.seq_id)] += r.n_tokens
    assert all(v <= budget for v in fill.values())
    # utilization: BFD uses no more sequences than a whole-doc
    # sequential fill (the no-split baseline — pack_sequences itself
    # SPLITS docs across boundaries, a different contract), and at
    # least the theoretical lower bound ceil(tokens/budget) per shard
    from collections import defaultdict as dd
    by_shard = dd(list)
    for r in out:
        by_shard[r.shard].append((r.doc_id, r.n_tokens))
    n_seq_fill, lower = 0, 0
    for docs in by_shard.values():
        cum = 0
        bins = 0
        for _, n in sorted(docs):
            if bins == 0 or cum + n > budget:
                bins += 1
                cum = n
            else:
                cum += n
        n_seq_fill += bins
        lower += -(-sum(n for _, n in docs) // budget)
    n_bfd = len(fill)
    assert lower <= n_bfd <= n_seq_fill
    # determinism
    again = curation.pack_sequences_bestfit(df, "doc_id", "n",
                                            budget=budget, n_shards=4)
    assert sorted(map(tuple, out)) == sorted(map(tuple, again.collect()))


def test_pack_bestfit_oversized_doc_isolated(spark):
    df = spark.createDataFrame(
        [(1, 5000), (2, 400), (3, 500), (4, 600)], "doc_id long, n long")
    out = {r.doc_id: r for r in curation.pack_sequences_bestfit(
        df, "doc_id", "n", budget=1024, n_shards=1).collect()}
    # the oversized doc owns its sequence; others pack around it
    big_seq = out[1].seq_id
    assert all(r.seq_id != big_seq for i, r in out.items() if i != 1)
    with pytest.raises(ValueError):
        curation.pack_sequences_bestfit(df, "doc_id", "n", budget=0)


def test_temperature_mix_samples_null_stratum(spark):
    rows = [(i, "big") for i in range(400)] \
         + [(i, None) for i in range(400, 440)] \
         + [(i, "small") for i in range(440, 480)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = curation.temperature_mix(df, "source", "doc_id").collect()
    kept = {}
    for r in out:
        kept.setdefault(r.source, 0)
        kept[r.source] += 1
    # the NULL stratum is SAMPLED like any other (it ties the min
    # size, so its keep fraction is ~100%), never silently deleted
    assert kept.get(None, 0) > 30
    assert kept["small"] > 30
    assert kept["big"] < 200  # sqrt(40/400) ≈ 31% of 400


def test_bm25_matches_float_model_ranking(spark):
    import math

    texts = {
        1: "apple banana cherry apple apple",
        2: "apple apple apple apple apple apple apple apple",
        3: "banana cherry durian elderberry fig",
        4: "durian durian banana apple cherry grape",
        5: "grape fig elderberry durian cherry banana apple",
        6: "apple banana",
    }
    df = spark.createDataFrame(list(texts.items()),
                               "doc_id long, text string")
    q = ["apple", "durian"]
    got = curation.bm25_rank(df, "doc_id", "text", q, k=6).collect()
    # independent float BM25 with the same linear-idf surrogate
    n = len(texts)
    toks = {i: t.split() for i, t in texts.items()}
    avgdl = sum(len(v) for v in toks.values()) / n
    dfreq = {t: sum(t in v for v in toks.values()) for t in q}
    k1, b = 1.2, 0.75

    def score(i):
        s = 0.0
        for t in q:
            tf = toks[i].count(t)
            if not tf:
                continue
            idf = n / dfreq[t]
            s += idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(toks[i]) / avgdl))
        return s

    expect = sorted(texts, key=lambda i: (-score(i), i))
    assert [r.doc_id for r in got] == expect
    # integer scores are monotone with the float model here
    int_scores = [r.score for r in got]
    assert int_scores == sorted(int_scores, reverse=True)


def test_bm25_rare_term_outranks_pure_tf(spark):
    rows = [(i, "common common common common") for i in range(20)]
    rows += [(100, "rare common"), (101, "common " * 30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = curation.bm25_rank(df, "doc_id", "text",
                             ["rare", "common"], k=3).collect()
    assert got[0].doc_id == 100  # idf of 'rare' (df=1) dominates


def test_bm25_oracle_parity_and_guards(spark):
    import duckdb
    import pandas as pd

    texts = ["stream table join", "join join join table",
             "window agg stream", "table scan filter join stream"]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    q = ["join", "window"]
    got = [tuple(r) for r in
           curation.bm25_rank(df, "doc_id", "text", q, k=4).collect()]
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}))
    assert con.sql(curation.bm25_rank_sql(q, k=4)).fetchall() == got
    with pytest.raises(ValueError):
        curation.bm25_rank(df, "doc_id", "text", [])
    with pytest.raises(ValueError):
        curation.bm25_rank(df, "doc_id", "text", ["a", "a"])


def test_vocab_drift_model_and_parity(spark):
    import duckdb
    import pandas as pd

    rows = [(1, "alpha beta beta gamma", "a"),
            (2, "alpha alpha beta", "a"),
            (3, "gamma gamma gamma delta", "b"),
            (4, "beta gamma delta delta", "b"),
            (5, "noise words here", "c")]  # slice c must be ignored
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    got = [tuple(r) for r in
           curation.vocab_drift(df, "text", "src", "a", "b",
                                k=10, min_count=1).collect()]
    # independent model
    from collections import Counter
    ca = Counter("alpha beta beta gamma alpha alpha beta".split())
    cb = Counter("gamma gamma gamma delta beta gamma delta delta".split())
    na, nb = sum(ca.values()), sum(cb.values())
    expect = []
    for t in sorted(set(ca) | set(cb)):
        a, b = ca.get(t, 0), cb.get(t, 0)
        ra, rb = 10**6 * a // na, 10**6 * b // nb
        expect.append((t, a, b, ra, rb,
                       (ra - rb) ** 2 // 10**6 * (a + b)))
    expect.sort(key=lambda r: (-r[5], r[0]))
    assert got == expect
    # 'alpha' is a-only, 'gamma'/'delta' b-heavy: both directions rank
    assert {got[0][0], got[1][0]} <= {"alpha", "gamma", "delta"}
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(
        {"doc_id": [r[0] for r in rows],
         "text": [r[1] for r in rows],
         "src": [r[2] for r in rows]}))
    assert con.sql(curation.vocab_drift_sql(
        "src", "a", "b", k=10, min_count=1)).fetchall() == got
    with pytest.raises(ValueError):
        curation.vocab_drift(df, "text", "src", "a", "a")


def test_vocab_drift_min_count_floors_hapaxes(spark):
    df = spark.createDataFrame(
        [(1, "word word word rare", "a"), (2, "word word other", "b")],
        "doc_id long, text string, src string")
    out = curation.vocab_drift(df, "text", "src", "a", "b",
                               k=10, min_count=2).collect()
    assert {r.term for r in out} == {"word"}  # hapaxes floored


def test_fingerprint_diff_statuses_and_null_key(spark):
    old_src = spark.createDataFrame(
        [(1, "a", "p1"), (2, "b", "p1"), (3, "c", "p2"),
         (4, "d", None), (5, "e", "gone")],
        "id long, v string, part string")
    new_src = spark.createDataFrame(
        [(1, "a", "p1"), (2, "b", "p1"),        # p1 unchanged
         (3, "CHANGED", "p2"),                  # p2 changed (same count)
         (4, "d", None), (6, "f", None),        # NULL partition changed
         (7, "g", "fresh")],                    # fresh added
        "id long, v string, part string")
    fp = lambda d: curation.partition_fingerprint(  # noqa: E731
        d, ["id", "v"], by=["part"])
    out = {r.part: r.status for r in
           curation.fingerprint_diff(fp(old_src), fp(new_src),
                                     ["part"]).collect()}
    # NULL partition keys must MATCH each other (eqNullSafe), so the
    # null stratum reads 'changed', never added+removed
    assert out == {"p2": "changed", None: "changed",
                   "gone": "removed", "fresh": "added"}
    full = curation.fingerprint_diff(fp(old_src), fp(new_src),
                                     ["part"], include_unchanged=True)
    assert {r.part: r.status for r in full.collect()}["p1"] == "unchanged"
    with pytest.raises(ValueError):
        curation.fingerprint_diff(fp(old_src), fp(new_src), [])


def test_fingerprint_diff_detects_content_not_count(spark):
    # same row count, one cell different -> 'changed' via fingerprint
    a = spark.createDataFrame([(1, "x", "p"), (2, "y", "p")],
                              "id long, v string, part string")
    b = spark.createDataFrame([(1, "x", "p"), (2, "z", "p")],
                              "id long, v string, part string")
    fp = lambda d: curation.partition_fingerprint(  # noqa: E731
        d, ["id", "v"], by=["part"])
    row = curation.fingerprint_diff(fp(a), fp(b), ["part"]).collect()
    assert len(row) == 1 and row[0].status == "changed"
    assert row[0].n_rows_old == row[0].n_rows_new == 2


def test_bm25_and_drift_reject_sql_hostile_inputs(spark):
    df = spark.createDataFrame([(1, "a b", "x")],
                               "doc_id long, text string, src string")
    # outside the tokenizer alphabet: can never match AND would break
    # the quoted oracle SQL -> rejected at the API edge
    with pytest.raises(ValueError, match="alphabet"):
        curation.bm25_rank(df, "doc_id", "text", ["O'Brien"])
    with pytest.raises(ValueError, match="alphabet"):
        curation.bm25_rank_sql(["Upper"])
    with pytest.raises(ValueError, match="quote"):
        curation.vocab_drift(df, "text", "src", "a'b", "c")
    with pytest.raises(ValueError, match="quote"):
        curation.vocab_drift_sql("src", "a", "b'c")


def test_value_ohlc_daily_model(spark, tmp_path):
    # hand-checkable bars incl. an intra-day tie on ts broken by id
    import datetime as dt
    import os

    rows = [
        (1, dt.datetime(2024, 1, 1, 9), 10, "x", 5.00, "{}"),
        (2, dt.datetime(2024, 1, 1, 12), 10, "x", 1.25, "{}"),
        (3, dt.datetime(2024, 1, 1, 12), 10, "x", 9.75, "{}"),
        (4, dt.datetime(2024, 1, 2, 8), 10, "x", 2.00, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    src = os.path.join(str(tmp_path), "events.parquet")
    df.write.parquet(src)
    from kafkadirect_spark.plans import QUERIES
    out = {r.day: (r.open_cents, r.high_cents, r.low_cents,
                   r.close_cents, r.n, r.sum_cents)
           for r in QUERIES["value_ohlc_daily"](
               spark, str(tmp_path)).collect()}
    # day 1: open=500 (09:00), close=975 (12:00 tie -> higher id 3),
    # high=975, low=125
    assert out["2024-01-01"] == (500, 975, 125, 975, 3, 1600)
    assert out["2024-01-02"] == (200, 200, 200, 200, 1, 200)


# --- Naive Bayes classifier (nb_classify) ---------------------------------

def test_nb_classify_matches_python_model(spark):
    rows = [
        # "english": heavy on the/and; "german": heavy on der/und
        (1, "the cat and the dog", "en"),
        (2, "the house and the tree", "en"),
        (3, "der hund und der baum", "de"),
        (4, "der mann und die frau", "de"),
        # score-only docs (odd semantics here: train == all four)
        (5, "the tree and the frau", None),
        (6, "der baum und die cat", None),
        (7, "zz qq xx", None),          # fully out-of-vocabulary
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    train = df.filter(F.col("lang").isNotNull())
    out = {r.doc_id: (r.pred_label, r.best_bits)
           for r in curation.nb_classify(
               train, df, "doc_id", "text", "lang").collect()}

    # independent python model: same smoothed integer bits
    import re
    from collections import Counter

    def toks(t):
        return [w for w in re.split("[^a-z0-9]+", t.lower()) if w]

    tc, nd = {}, Counter()
    for _, t, lab in rows:
        if lab is None:
            continue
        nd[lab] += 1
        for w in toks(t):
            tc[(lab, w)] = tc.get((lab, w), 0) + 1
    classes = sorted(nd)
    n_tok = {c: sum(v for (cc, _), v in tc.items() if cc == c)
             for c in classes}
    vocab = len({w for (_, w) in tc})
    total = sum(nd.values())

    def fl2(n):
        return n.bit_length() - 1

    for doc_id, t, _ in rows:
        scores = {}
        for c in classes:
            bits = fl2(total) - fl2(nd[c])
            for w in toks(t):
                bits += (fl2(n_tok[c] + vocab)
                         - fl2(tc.get((c, w), 0) + 1))
            scores[c] = bits
        want = min(scores.items(), key=lambda kv: (kv[1], kv[0]))
        assert out[doc_id] == (want[0], want[1]), doc_id
    # sanity on the semantics, not just the replay
    assert out[5][0] == "en" and out[6][0] == "de"
    # all-OOV doc falls back to the prior argmin (tie → 'de' asc)
    assert out[7][0] == "de"


def test_nb_classify_guards(spark):
    df = spark.createDataFrame(
        [(1, "a b", "x"), (2, "c d", "y"), (3, "e f", "z")],
        "doc_id long, text string, lang string")
    with pytest.raises(ValueError, match="max_classes"):
        curation.nb_classify(df, df, "doc_id", "text", "lang",
                             max_classes=2)
    empty = df.filter(F.col("doc_id") < 0)
    with pytest.raises(ValueError, match="no \\(class, token\\)"):
        curation.nb_classify(empty, df, "doc_id", "text", "lang")
    # labels colliding with the pivot/internal namespace are rejected
    evil = spark.createDataFrame(
        [(1, "a b", "__k"), (2, "c d", "ok")],
        "doc_id long, text string, lang string")
    with pytest.raises(ValueError, match="collide"):
        curation.nb_classify(evil, evil, "doc_id", "text", "lang")
    evil2 = spark.createDataFrame(
        [(1, "a b", "doc_id"), (2, "c d", "ok")],
        "doc_id long, text string, lang string")
    with pytest.raises(ValueError, match="collide"):
        curation.nb_classify(evil2, evil2, "doc_id", "text", "lang")


def test_nb_classify_label_hygiene(spark):
    """NULL labels are unlabeled data (filtered, not a crash or a
    class); a label whose train docs all tokenize empty is neither a
    candidate class nor prior mass — engine, oracle and nb_model all
    agree (ADVICE r9: a token-less class scoring prior-only bits
    would win most argmins)."""
    rows = [
        (1, "the cat and the dog", "en"),
        (2, "the house and the tree", "en"),
        (3, "der hund und der baum", "de"),
        (4, "der mann und die frau", "de"),
        (5, "the tree und der cat", None),      # unlabeled, has tokens
        (6, "!!! ... ???", "xx"),               # label, zero tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.doc_id: (r.pred_label, r.best_bits)
           for r in curation.nb_classify(
               df, df, "doc_id", "text", "lang").collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6}
    assert not any(p == "xx" for p, _ in out.values())
    # zero-token doc 6 falls back to the prior argmin over {de, en}
    # only: total_docs = 4, nd = 2 each -> prior bits = 1 for both,
    # tie -> 'de'
    assert out[6] == ("de", 1)
    # the hygiene filters must match the CLEAN run exactly: dropping
    # the NULL-label and token-less rows from train changes nothing
    clean = df.filter(F.col("lang").isin("en", "de"))
    out_clean = {r.doc_id: (r.pred_label, r.best_bits)
                 for r in curation.nb_classify(
                     clean, df, "doc_id", "text", "lang").collect()}
    assert out == out_clean
    # nb_model applies the same rules
    model = curation.nb_model(df, "text", "lang")
    assert sorted(model["classes"]) == ["de", "en"]
    assert model["prior"] == {"de": 1, "en": 1}
    via_model = {r.doc_id: (r.pred_label, r.best_bits) for r in
                 curation.nb_score_rows(df, model, "doc_id",
                                        "text").collect()}
    assert via_model == out


def test_nb_classify_held_out_accuracy(spark):
    # 40 docs per language with disjoint vocabularies + shared noise:
    # a held-out half must classify near-perfectly
    rows = []
    for i in range(40):
        rows.append((i * 2, f"alpha beta gamma noise{i % 7}", "aa"))
        rows.append((i * 2 + 1, f"delta epsilon zeta noise{i % 7}", "bb"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    train = df.filter(F.col("doc_id") % 4 < 2)
    out = curation.nb_classify(train, df, "doc_id", "text", "lang")
    acc = (out.join(df, "doc_id")
           .filter(F.col("pred_label") == F.col("lang")).count())
    assert acc == 80


def test_nb_model_scores_match_nb_classify(spark):
    rows = [(i, f"alpha beta {'gamma ' * (i % 3)}noise{i % 5}",
             "aa" if i % 2 else "bb") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    model = curation.nb_model(df, "text", "lang")
    via_model = {r.doc_id: (r.pred_label, r.best_bits) for r in
                 curation.nb_score_rows(df, model, "doc_id",
                                        "text").collect()}
    via_classify = {r.doc_id: (r.pred_label, r.best_bits) for r in
                    curation.nb_classify(df, df, "doc_id", "text",
                                         "lang").collect()}
    assert via_model == via_classify
    # the model is JSON-round-trippable (persist/version contract)
    import json
    assert curation.nb_score_rows(
        df, json.loads(json.dumps(model)), "doc_id", "text"
    ).collect() == curation.nb_score_rows(
        df, model, "doc_id", "text").collect()


def test_nb_model_vocab_cap_degrades_to_oov(spark):
    df = spark.createDataFrame(
        [(1, "apple apple banana", "aa"), (2, "cherry cherry durian", "bb")],
        "doc_id long, text string, lang string")
    full = curation.nb_model(df, "text", "lang")
    capped = curation.nb_model(df, "text", "lang", max_vocab=2)
    # smoothing support (V) is the trained distribution's, not the cap's
    assert capped["vocab_v"] == full["vocab_v"] == 4
    # only the 2 highest-total tokens survive (ties by token asc)
    kept = {t for c in capped["counts"].values() for t in c}
    assert kept == {"apple", "cherry"}
    # dropped tokens score as OOV — predictions still well-defined
    out = curation.nb_score_rows(df, capped, "doc_id", "text").collect()
    assert {r.doc_id for r in out} == {1, 2}


def test_nb_score_rows_works_on_streams(spark, tmp_path):
    """nb_score_rows is a stateless mapInPandas transform over a
    closure-shipped model, so the batch-trained classifier applies
    unchanged to a Structured Streaming ingest (streamed == batch)."""
    import os

    rows = [(i, f"alpha beta noise{i % 4}" if i % 2 else
             f"delta epsilon noise{i % 4}",
             "aa" if i % 2 else "bb") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    model = curation.nb_model(df, "text", "lang")
    expect = {r.doc_id: (r.pred_label, r.best_bits) for r in
              curation.nb_score_rows(df, model, "doc_id",
                                     "text").collect()}

    src = os.path.join(str(tmp_path), "nb_src")
    df.select("doc_id", "text").repartition(3).write.parquet(src)
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", "1").parquet(src))
    out = curation.nb_score_rows(stream, model, "doc_id", "text")
    assert out.isStreaming
    q = (out.writeStream.format("memory").queryName("nb_stream")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        got = {r.doc_id: (r.pred_label, r.best_bits) for r in
               spark.sql("SELECT * FROM nb_stream").collect()}
    finally:
        q.stop()
    assert got == expect


def test_nb_classify_tolerates_null_and_empty_text(spark):
    train = spark.createDataFrame(
        [(1, "alpha beta", "aa"), (2, "gamma delta", "bb"),
         (3, None, "aa"), (4, "", "bb")],   # null/empty train rows: no tokens
        "doc_id long, text string, lang string")
    score = spark.createDataFrame(
        [(10, "alpha beta"), (11, None), (12, "")],
        "doc_id long, text string")
    out = {r.doc_id: r.pred_label for r in
           curation.nb_classify(train, score, "doc_id", "text",
                                "lang").collect()}
    # every score row gets a prediction; token-less docs fall back to
    # the prior argmin (both classes have 2 docs -> tie -> 'aa' asc)
    assert set(out) == {10, 11, 12}
    assert out[10] == "aa" and out[11] == "aa" and out[12] == "aa"
    # the model/score path agrees on the same inputs
    model = curation.nb_model(train, "text", "lang")
    out2 = {r.doc_id: r.pred_label for r in
            curation.nb_score_rows(score, model, "doc_id",
                                   "text").collect()}
    assert out2 == out


# ---------------------------------------------------------------------------
# vocab_coverage (round 11): coverage curve from the count-of-counts
# table, verified against the naive rank-every-word formulation
# ---------------------------------------------------------------------------


def test_vocab_coverage_hand_checked(spark):
    from kafkadirect_spark.functions import curation

    # counts: the=4, a=3, b=3, c=2, d=1, e=1 -> total 14, vocab 6
    df = spark.createDataFrame(
        [(1, "the the a b"), (2, "the a b c"), (3, "the a b c d e")],
        "doc_id long, text string")
    out = {r.k: (r.covered_tokens, r.total_tokens, r.vocab_words,
                 r.coverage_milli)
           for r in curation.vocab_coverage(
               df, "text", ks=(1, 2, 3, 5, 100)).collect()}
    assert out[1] == (4, 14, 6, 1000 * 4 // 14)
    # k=2 lands mid-tie (a and b both 3): either prefix sums to 7
    assert out[2] == (7, 14, 6, 500)
    assert out[3] == (10, 14, 6, 1000 * 10 // 14)
    assert out[5] == (13, 14, 6, 1000 * 13 // 14)
    # k beyond the vocabulary clamps to full coverage
    assert out[100] == (14, 14, 6, 1000)
    with pytest.raises(ValueError, match="distinct"):
        curation.vocab_coverage(df, "text", ks=(5, 5))
    with pytest.raises(ValueError, match=">= 1"):
        curation.vocab_coverage(df, "text", ks=(0,))
    # empty corpus emits no rows
    empty = spark.createDataFrame([(1, "")], "doc_id long, text string")
    assert curation.vocab_coverage(empty, "text", ks=(3,)).count() == 0


def test_vocab_coverage_oracle_matches_engine(spark):
    """Engine's count-of-counts shortcut == DuckDB's naive
    rank-every-word replay on the real documents table."""
    import duckdb

    from kafkadirect_spark.functions import curation
    from kafkadirect_spark.sources.batch import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    ks = (10, 100, 1000, 100000)
    eng = sorted(tuple(r) for r in curation.vocab_coverage(
        docs, "text", ks=ks).collect())
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    got = sorted(con.sql(
        curation.vocab_coverage_oracle_sql(ks=ks)).fetchall())
    assert got == eng and eng


def test_vocab_coverage_plan_is_bounded(spark):
    """Plan shape: no join of any kind (the ks ride as a literal
    array filter), exactly the word-count exchange plus the bounded
    count-of-counts machinery."""
    import contextlib
    import io

    from kafkadirect_spark.functions import curation

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        curation.vocab_coverage(df, "text").explain("formatted")
    plan = buf.getvalue()
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# sample_weighted_n (round 11): integer-exact systematic weighted draws
# ---------------------------------------------------------------------------


def test_sample_weighted_hand_checked_and_exact_n(spark):
    from kafkadirect_spark.functions import curation

    df = spark.createDataFrame(
        [(i, (i % 7) * 10) for i in range(50)] + [(99, 0)],
        "doc_id long, w long")
    for n in (1, 5, 17, 50):
        out = curation.sample_weighted_n(df, "doc_id", "w", n).collect()
        assert sum(r.picks for r in out) == n  # exactly n draws
        assert all(r.picks >= 1 for r in out)
        assert all(r.doc_id != 99 for r in out)  # zero weight never draws
    # a row heavier than W/n draws multiple times
    heavy = spark.createDataFrame(
        [(1, 1000), (2, 1), (3, 1)], "doc_id long, w long")
    out = {r.doc_id: r.picks for r in curation.sample_weighted_n(
        heavy, "doc_id", "w", 10).collect()}
    assert out[1] >= 9 and sum(out.values()) == 10
    # determinism across layout; seed redraws
    a = sorted(tuple(r) for r in curation.sample_weighted_n(
        df, "doc_id", "w", 7).collect())
    b = sorted(tuple(r) for r in curation.sample_weighted_n(
        df.repartition(7), "doc_id", "w", 7).collect())
    assert a == b
    c = sorted(tuple(r) for r in curation.sample_weighted_n(
        df, "doc_id", "w", 7, seed="other").collect())
    assert a != c
    with pytest.raises(ValueError, match="n must"):
        curation.sample_weighted_n(df, "doc_id", "w", 0)
    with pytest.raises(Exception, match="negative weight"):
        spark.createDataFrame([(1, -5)], "doc_id long, w long") \
            .transform(lambda d: curation.sample_weighted_n(
                d, "doc_id", "w", 1)).collect()
    # all-zero weights: empty result, no division error
    zero = spark.createDataFrame([(1, 0), (2, 0)], "doc_id long, w long")
    assert curation.sample_weighted_n(zero, "doc_id", "w", 3).count() == 0


def test_sample_weighted_matches_model(spark):
    """Engine == python systematic-sampling model over random weights
    (hypothesis): same hash order, prefix sums and ceil arithmetic."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafkadirect_spark.functions import curation
    from kafkadirect_spark.functions.text import HASH_P

    import hashlib

    def phash(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:14], 16) \
            % 2147483647

    @settings(max_examples=8, deadline=None, derandomize=True)
    @given(st.lists(st.integers(min_value=0, max_value=500),
                    min_size=1, max_size=25),
           st.integers(min_value=1, max_value=12))
    def prop(weights, n):
        rows = list(enumerate(weights))
        df = spark.createDataFrame(rows, "doc_id long, w long")
        got = sorted((r.doc_id, r.weight, r.picks)
                     for r in curation.sample_weighted_n(
                         df, "doc_id", "w", n).collect())
        W = sum(weights)
        want = []
        if W > 0:
            order = sorted(
                rows, key=lambda t: ((phash("wsample" + str(t[0]))
                                      % HASH_P) % 1024,
                                     phash("wsample" + str(t[0]))
                                     % HASH_P, t[0]))
            cw = 0
            for i, w in order:
                picks = (-(-(cw + w) * n // W)) - (-(-cw * n // W))
                if picks > 0:
                    want.append((i, w, picks))
                cw += w
            assert sum(p for _, _, p in want) == n
        assert got == sorted(want)

    prop()


def test_sample_weighted_oracle_matches_engine(spark):
    """Engine == DuckDB on real documents with token-count weights —
    the data-mixing shape (sample a token budget by length)."""
    import duckdb

    from kafkadirect_spark.functions import curation, text
    from kafkadirect_spark.sources.batch import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    sized = docs.select("doc_id",
                        text.bpe_token_count("text").cast("long")
                        .alias("w"))
    eng = sorted(tuple(r) for r in curation.sample_weighted_n(
        sized, "doc_id", "w", 100).collect())
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    bpe_sql = ("CAST(len(regexp_extract_all(lower(text),"
               " ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+')) AS BIGINT)")
    got = sorted(con.sql(curation.sample_weighted_oracle_sql(
        100, bpe_sql)).fetchall())
    assert got == eng and eng
    assert sum(p for _, _, p in got) == 100


def test_sample_weighted_per_group_basic(spark):
    df = spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3], (i % 7) * 10) for i in range(60)]
        + [(97, "a", 0), (98, "z", 0), (99, None, 50)],
        "doc_id long, grp string, w long")
    for n in (1, 5, 17):
        out = curation.sample_weighted_n_per_group(
            df, "grp", "doc_id", "w", n).collect()
        per = {}
        for r in out:
            per[r.grp] = per.get(r.grp, 0) + r.picks
        # exactly n in every positive-weight group; zero-weight group
        # "z" and the NULL-group row emit nothing
        assert per == {"a": n, "b": n, "c": n}
        assert all(r.picks >= 1 for r in out)
        assert all(r.doc_id not in (97, 98, 99) for r in out)
    # determinism across layout; seed redraws
    a = sorted(tuple(r) for r in curation.sample_weighted_n_per_group(
        df, "grp", "doc_id", "w", 7).collect())
    b = sorted(tuple(r) for r in curation.sample_weighted_n_per_group(
        df.repartition(7), "grp", "doc_id", "w", 7).collect())
    assert a == b
    c = sorted(tuple(r) for r in curation.sample_weighted_n_per_group(
        df, "grp", "doc_id", "w", 7, seed="other").collect())
    assert a != c
    with pytest.raises(ValueError, match="n must"):
        curation.sample_weighted_n_per_group(df, "grp", "doc_id", "w", 0)
    with pytest.raises(ValueError, match="group_cols"):
        curation.sample_weighted_n_per_group(df, [], "doc_id", "w", 1)
    with pytest.raises(ValueError, match="shards"):
        curation.sample_weighted_n_per_group(df, "grp", "doc_id", "w",
                                             1, shards=0)


def test_sample_weighted_per_group_matches_model(spark):
    """Engine == python per-group systematic-sampling model
    (hypothesis): the global model run independently inside each
    group over the same (shard, hash, id) order."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafkadirect_spark.functions.text import HASH_P

    import hashlib

    def phash(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:14], 16) \
            % 2147483647

    @settings(max_examples=8, deadline=None, derandomize=True)
    @given(st.lists(st.tuples(st.integers(min_value=0, max_value=3),
                              st.integers(min_value=0, max_value=500)),
                    min_size=1, max_size=25),
           st.integers(min_value=1, max_value=12))
    def prop(gw, n):
        rows = [(i, f"g{g}", w) for i, (g, w) in enumerate(gw)]
        df = spark.createDataFrame(rows,
                                   "doc_id long, grp string, w long")
        got = sorted((r.grp, r.doc_id, r.weight, r.picks)
                     for r in curation.sample_weighted_n_per_group(
                         df, "grp", "doc_id", "w", n).collect())
        want = []
        for g in sorted({r[1] for r in rows}):
            grows = [(i, w) for i, gg, w in rows if gg == g]
            W = sum(w for _, w in grows)
            if W == 0:
                continue
            order = sorted(
                grows, key=lambda t: ((phash("wsample" + str(t[0]))
                                       % HASH_P) % 64,
                                      phash("wsample" + str(t[0]))
                                      % HASH_P, t[0]))
            cw = 0
            for i, w in order:
                picks = (-(-(cw + w) * n // W)) - (-(-cw * n // W))
                if picks > 0:
                    want.append((g, i, w, picks))
                cw += w
        assert got == sorted(want)

    prop()


def test_sample_weighted_per_group_oracle_matches_engine(spark):
    """Engine == DuckDB on real documents, token-count weights per
    language — the stratified data-mixing shape (a fixed token budget
    per language)."""
    import duckdb

    from kafkadirect_spark.functions import text
    from kafkadirect_spark.sources.batch import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    sized = docs.select("lang", "doc_id",
                        text.bpe_token_count("text").cast("long")
                        .alias("w"))
    eng = sorted(tuple(r) for r in curation.sample_weighted_n_per_group(
        sized, "lang", "doc_id", "w", 30).collect())
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    bpe_sql = ("CAST(len(regexp_extract_all(lower(text),"
               " ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+')) AS BIGINT)")
    got = sorted(con.sql(curation.sample_weighted_per_group_oracle_sql(
        30, bpe_sql, "lang", group_out="lang")).fetchall())
    assert got == eng and eng
    per = {}
    for g, _, _, p in got:
        per[g] = per.get(g, 0) + p
    assert all(v == 30 for v in per.values()) and len(per) >= 2


def test_sample_weighted_per_group_plan_is_partitioned(spark):
    """No unpartitioned window anywhere: the per-group offset table is
    computed under a group-PARTITIONED window (unlike the global
    sampler's allowlisted ≤shards-row offset window)."""
    import contextlib
    import io

    df = spark.createDataFrame([(1, "a", 3)],
                               "doc_id long, grp string, w long")
    out = curation.sample_weighted_n_per_group(df, "grp", "doc_id",
                                               "w", 2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    import re
    for spec in re.findall(r"windowspecdefinition\([^)]*\)", plan):
        assert "grp" in spec, f"unpartitioned window: {spec}"


def test_contamination_report_hand_checked(spark):
    train = spark.createDataFrame(
        [(0, "a b c d e f g h i j"),       # grams: a..h, b..i, c..j
         (2, "z z z z z z z z")],
        "doc_id long, text string")
    ev = spark.createDataFrame(
        [(1, "a b c d e f g h x y"),        # 3 grams, 1 hit (a..h)
         (3, "too short"),                  # < 8 tokens -> 0 grams
         (5, "z z z z z z z z")],           # 1 gram, 1 hit
        "doc_id long, text string")
    out = {r.doc_id: (r.n_grams, r.n_contaminated,
                      r.contamination_milli)
           for r in curation.contamination_report(
               train, ev, "text", "doc_id", n=8).collect()}
    assert out[1] == (3, 1, 333)
    assert out[3] == (0, 0, 0)
    assert out[5] == (1, 1, 1000)
    with pytest.raises(ValueError, match="n must"):
        curation.contamination_report(train, ev, "text", "doc_id", n=0)


def test_contamination_report_oracle_matches_engine(spark):
    """Engine == DuckDB on the real documents (even half as the
    corpus, odd half as the eval set) — hash-membership replay
    including any 31-bit collisions."""
    import duckdb

    from kafkadirect_spark.sources.batch import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    train = docs.filter(F.col("doc_id") % 2 == 0)
    ev = docs.filter(F.col("doc_id") % 2 == 1)
    eng = sorted(tuple(r) for r in curation.contamination_report(
        train, ev, "text", "doc_id", n=8).collect())
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    got = sorted(con.sql(
        curation.contamination_report_oracle_sql(n=8)).fetchall())
    assert got == eng and eng
    assert any(r[3] > 0 for r in eng)  # real leakage present


def test_contamination_report_corpus_side_never_shuffles(spark):
    """Plan pin (the decontaminate contract, direction reversed): the
    train corpus reaches its semi-join through broadcasts only — no
    SortMergeJoin, no CartesianProduct anywhere; every join is
    broadcast (eval hashes out, bounded hits back)."""
    import contextlib
    import io

    df = spark.createDataFrame(
        [(i, "a b c d e f g h i j") for i in range(6)],
        "doc_id long, text string")
    out = curation.contamination_report(
        df.filter(F.col("doc_id") % 2 == 0),
        df.filter(F.col("doc_id") % 2 == 1), "text", "doc_id")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# token_waterfill (round 12): integer max-min fair budget allocation
# across strata.


def _py_waterfill(items, budget):
    """Independent model: binary-search the common level, then spread
    the integer remainder over the capped strata in rank order."""
    items = sorted(items, key=lambda t: (t[1], t[0]))
    total = sum(a for _, a in items)
    if total <= budget:
        return {g: a for g, a in items}
    lo, hi = 0, max(a for _, a in items)
    while lo < hi:                      # max L: sum(min(a, L)) <= budget
        mid = (lo + hi + 1) // 2
        if sum(min(a, mid) for _, a in items) <= budget:
            lo = mid
        else:
            hi = mid - 1
    leftover = budget - sum(min(a, lo) for _, a in items)
    out = {}
    for g, a in items:
        out[g] = min(a, lo)
        if a > lo and leftover > 0:
            out[g] += 1
            leftover -= 1
    return out


def test_waterfill_hand_checked(spark):
    df = spark.createDataFrame(
        [("a", 1), ("b", 4), ("c", 4), (None, 99)],
        "grp string, avail long")
    out = {r.grp: r.alloc for r in curation.token_waterfill(
        df, "grp", "avail", budget=6).collect()}
    # level 2, remainder 1 -> the first capped stratum (b) gets 3
    assert out == {"a": 1, "b": 3, "c": 2}
    # budget covers everything -> alloc == avail
    out = {r.grp: r.alloc for r in curation.token_waterfill(
        df, "grp", "avail", budget=100).collect()}
    assert out == {"a": 1, "b": 4, "c": 4}
    out = {r.grp: r.alloc for r in curation.token_waterfill(
        df, "grp", "avail", budget=0).collect()}
    assert out == {"a": 0, "b": 0, "c": 0}
    with pytest.raises(ValueError, match="budget"):
        curation.token_waterfill(df, "grp", "avail", budget=-1)
    with pytest.raises(ValueError, match="avail"):
        curation.token_waterfill(
            spark.createDataFrame([("a", -5)], "grp string, avail long"),
            "grp", "avail", budget=3)


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=12, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.integers(min_value=0, max_value=50),
                min_size=1, max_size=8),
       st.integers(min_value=0, max_value=300))
def test_waterfill_matches_python_model(spark, avails, budget):
    """Engine == the independent binary-search model; the allocation
    exhausts min(budget, total) exactly and never exceeds avail."""
    rows = [(f"g{i}", a) for i, a in enumerate(avails)]
    df = spark.createDataFrame(rows, "grp string, avail long")
    got = {r.grp: r.alloc for r in curation.token_waterfill(
        df, "grp", "avail", budget=budget).collect()}
    want = _py_waterfill(rows, budget)
    assert got == want
    assert sum(got.values()) == min(budget, sum(avails))
    assert all(got[g] <= a for g, a in rows)


def test_waterfill_oracle_matches_engine(spark):
    """Engine == DuckDB on per-language n_chars totals of the real
    documents at a budget that forces a genuine cutoff."""
    import duckdb

    SF = "/root/testdata/sf0.001"
    real = spark.read.parquet(f"{SF}/documents.parquet")
    totals = real.groupBy("lang").agg(
        F.sum("n_chars").cast("long").alias("avail"))
    budget = 100_000
    eng = sorted(tuple(r) for r in curation.token_waterfill(
        totals, "lang", "avail", budget=budget).collect())
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    got = sorted(con.sql(curation.token_waterfill_oracle_sql(
        budget, group_col="lang")).fetchall())
    assert got == eng and eng
    assert sum(r[2] for r in eng) == budget       # real cutoff engaged
    assert any(r[2] < r[1] for r in eng)          # some stratum capped


# ---------------------------------------------------------------------------
# contamination_spans (round 13): span-level leakage — longest leaked
# token run per eval doc via positional gram hits + gaps-and-islands.


def test_contamination_spans_hand_checked(spark):
    train = spark.createDataFrame(
        [(0, "a b c d e f g h")], "doc_id long, text string")
    ev = spark.createDataFrame(
        [(1, "x x a b c d e y y a b c d z"),   # runs [2..6] and [9..12]
         (3, "too short"),                      # < n tokens
         (5, "q r s t u v w x"),                # grams, no hits
         (7, None)],                            # NULL text -> all zeros
        "doc_id long, text string")
    out = {r.doc_id: (r.n_tokens, r.n_grams, r.n_leak_spans,
                      r.max_leak_tokens, r.leaked_tokens, r.leak_milli)
           for r in curation.contamination_spans(
               train, ev, "text", "doc_id", n=4).collect()}
    # hits at gram positions {2, 3, 9}: island [2,3] -> 5 tokens
    # (a b c d e), island [9] -> 4 tokens (a b c d)
    assert out[1] == (14, 11, 2, 5, 9, 9000 // 14)
    assert out[3] == (2, 0, 0, 0, 0, 0)
    assert out[5] == (8, 5, 0, 0, 0, 0)
    assert out[7] == (0, 0, 0, 0, 0, 0)   # NULL text, not -1 tokens
    # the oracle agrees on the synthetic table INCLUDING the NULL row
    # (size(NULL) is -1 in Spark with ANSI off; both sides pin 0)
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(0, 'a b c d e f g h'), (1, 'x x a b c d e y y a b c d z'), "
        "(3, 'too short'), (5, 'q r s t u v w x'), "
        "(7, CAST(NULL AS VARCHAR))) t(doc_id, text)")
    got = {r[0]: tuple(r[1:]) for r in con.sql(
        curation.contamination_spans_oracle_sql(n=4)).fetchall()}
    assert got == out
    with pytest.raises(ValueError, match="n must"):
        curation.contamination_spans(train, ev, "text", "doc_id", n=0)


def test_contamination_spans_oracle_matches_engine(spark):
    """Engine == DuckDB on the real documents (even half corpus, odd
    half eval), and span/report consistency: a doc has a leaked span
    iff the gram-set report counts contamination."""
    import duckdb

    from kafkadirect_spark.sources.batch import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    train = docs.filter(F.col("doc_id") % 2 == 0)
    ev = docs.filter(F.col("doc_id") % 2 == 1)
    eng = sorted(tuple(r) for r in curation.contamination_spans(
        train, ev, "text", "doc_id", n=8).collect())
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    got = sorted(con.sql(
        curation.contamination_spans_oracle_sql(n=8)).fetchall())
    assert got == eng and eng
    assert any(r[3] > 0 for r in eng)        # real leaked spans exist
    assert all(r[5] >= r[4] for r in eng)    # Σspans >= max span
    rep = {r.doc_id: r.n_contaminated
           for r in curation.contamination_report(
               train, ev, "text", "doc_id", n=8).collect()}
    assert all((rep[r[0]] > 0) == (r[3] > 0) for r in eng)


def test_contamination_spans_plan_is_bounded(spark):
    """The corpus side reaches its semi-join through broadcasts only
    (no SortMergeJoin, no CartesianProduct) and every window is
    partitioned by the eval doc id."""
    import contextlib
    import io
    import re

    df = spark.createDataFrame(
        [(i, "a b c d e f g h i j") for i in range(6)],
        "doc_id long, text string")
    out = curation.contamination_spans(
        df.filter(F.col("doc_id") % 2 == 0),
        df.filter(F.col("doc_id") % 2 == 1), "text", "doc_id")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    for spec in re.findall(r"windowspecdefinition\([^)]*\)", plan):
        assert "doc_id" in spec, f"unpartitioned window: {spec}"


def _py_contamination_spans(train_texts, ev_texts, n):
    """Independent model: gram-STRING membership (collisions are
    impossible at these sizes), python islands merge."""
    def grams(t):
        w = [x for x in __import__("re").split(r"[^a-z0-9]+",
                                               t.lower()) if x]
        return w, [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]

    tset = set()
    for t in train_texts:
        tset.update(grams(t)[1])
    out = {}
    for i, t in enumerate(ev_texts):
        w, gs = grams(t)
        hits = [p for p, g in enumerate(gs) if g in tset]
        spans = []
        for p in hits:
            if spans and p <= spans[-1][1] + n:
                spans[-1][1] = p
            else:
                spans.append([p, p])
        lens = [e - s + n for s, e in spans]
        leaked = sum(lens)
        out[i] = (len(w), len(gs), len(spans),
                  max(lens, default=0), leaked,
                  1000 * leaked // max(len(w), 1))
    return out


@settings(max_examples=10, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=60),
                min_size=1, max_size=4),
       st.lists(st.text(alphabet="ab ", min_size=0, max_size=60),
                min_size=1, max_size=4),
       st.integers(min_value=2, max_value=3))
def test_contamination_spans_matches_python_model(spark, train_texts,
                                                  ev_texts, n):
    """Engine == an independent python model (gram-string identity)
    on adversarially repetitive two-letter texts: hit positions,
    island merge, span counts/lengths and the truncating milli all
    agree."""
    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train_texts)],
        "doc_id long, text string")
    ev = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ev_texts)],
        "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.n_grams, r.n_leak_spans,
                      r.max_leak_tokens, r.leaked_tokens, r.leak_milli)
           for r in curation.contamination_spans(
               train, ev, "text", "doc_id", n=n).collect()}
    assert got == _py_contamination_spans(train_texts, ev_texts, n)
