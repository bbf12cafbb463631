"""Unigram-LM tokenizer training and application (SentencePiece's
unigram model, Kudo 2018), Spark-first and integer-exact.

The second tokenizer family beside ``functions/bpe.py``: where BPE
greedily merges pairs bottom-up, the unigram model starts from a LARGE
seed piece inventory and iteratively (a) re-segments every word with
the current piece scores, (b) re-counts piece uses from those
segmentations, (c) prunes to the best ``vocab_size`` pieces — the
hard-EM (Viterbi-EM) variant of Kudo's algorithm, which keeps every
quantity an exact integer:

- a piece with use-count ``c`` in a table totalling ``N`` uses costs
  ``floor(log2 N) − floor(log2 c)`` bits (the repo's standard
  ``floor(log2 n) = n.bit_length() − 1`` integerization — no libm,
  deterministic across engines and runs);
- Viterbi picks the segmentation minimizing (total bits, piece count),
  remaining ties broken toward the SHORTEST last piece (the fixed
  j = i−1 … i−max_len scan keeps the first candidate found) — fully
  deterministic;
- pruning keeps the top ``vocab_size`` pieces by (count DESC, piece
  ASC) and ALWAYS retains every single character seen in training, so
  any training word stays segmentable.

Architecture mirrors the BPE trainer's scale split:

1. word-TYPE counting is the only corpus-scale pass
   (``bpe.word_type_counts`` — one map-side-combined exchange, capped
   by a distributed TakeOrdered);
2. seeding explodes each word type's substrings (≤ ``max_piece_len``
   per position) — a type-table-sized explode, never the corpus —
   and caps the inventory at ``seed_factor·vocab_size`` by the same
   deterministic TakeOrdered;
3. each EM round is ONE ``mapInPandas`` segmentation pass over the
   bounded type table (piece scores ship in the task closure — the
   inventory is ≤ seed rows by construction) plus one piece-keyed
   groupBy (inventory-sized exchange);
4. encoding (``unigram_encode``) is one stateless ``mapInPandas``
   pass with a per-task word→segmentation memo — identical contract
   to ``bpe_encode``, so it applies unchanged to streaming frames.
   Characters unseen in training segment as single-char OOV pieces
   (cost = the inventory's max bits + 1 — strictly worse than any
   real piece) — encoding never fails.

Reference analogue: none (SURVEY.md §2 — the reference has no
document model); beyond-parity tokenizer machinery from the public
literature (Kudo 2018, arXiv:1804.10959).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafkadirect_spark.functions import bpe

#: piece inventories are collected per round for the task closure —
#: bounded by seed_factor·vocab_size + |chars|, guarded here.
MAX_INVENTORY = 2_000_000


def _flog2(n: int) -> int:
    return n.bit_length() - 1


def viterbi_segment(word: str, bits: dict, max_len: int,
                    oov_bits: int) -> tuple:
    """Deterministic min-cost segmentation of ``word`` under integer
    piece costs: minimize (total bits, piece count); ties keep the
    SHORTEST last piece (the fixed scan order j = i−1 … i−max_len
    with a strict comparison keeps the first candidate found).
    Single characters absent from ``bits`` cost ``oov_bits`` — every
    word segments."""
    n = len(word)
    # dp[i] = (bits, n_pieces, split_j) for word[:i]
    dp = [None] * (n + 1)
    dp[0] = (0, 0, -1)
    for i in range(1, n + 1):
        best = None
        for j in range(i - 1, max(-1, i - max_len - 1), -1):
            if dp[j] is None:
                continue
            piece = word[j:i]
            c = bits.get(piece)
            if c is None:
                if i - j != 1:
                    continue
                c = oov_bits
            cand = (dp[j][0] + c, dp[j][1] + 1, j)
            if best is None or cand[:2] < best[:2]:
                best = cand
        dp[i] = best
    out = []
    i = n
    while i > 0:
        _, _, j = dp[i]
        out.append(word[j:i])
        i = j
    return tuple(reversed(out))


def _segment_counts(wt: DataFrame, bits: dict, max_len: int,
                    oov_bits: int) -> DataFrame:
    """(piece, cnt): piece use-counts over the TYPE table's Viterbi
    segmentations, each weighted by the word's corpus count — one
    mapInPandas pass (scores in the closure) + one inventory-sized
    groupBy."""
    def gen(batches):
        import pandas as pd
        for pdf in batches:
            pieces, counts = [], []
            for word, n in zip(pdf["word"], pdf["n"]):
                for p in viterbi_segment(str(word), bits, max_len,
                                         oov_bits):
                    pieces.append(p)
                    counts.append(int(n))
            yield pd.DataFrame({"piece": pieces,
                                "cnt": pd.Series(counts, dtype="int64")})

    return (wt.mapInPandas(gen, "piece string, cnt long")
            .groupBy("piece").agg(F.sum("cnt").alias("cnt")))


def learn_unigram(df: DataFrame, text_col: str, vocab_size: int,
                  rounds: int = 2, max_piece_len: int = 8,
                  min_count: int = 2, max_word_types: int = 1 << 16,
                  seed_factor: int = 4) -> DataFrame:
    """Train a unigram-LM piece inventory; returns ``(piece, cnt,
    bits)`` — at most ``vocab_size`` multi-char survivors plus every
    single training character, with integer use-counts and costs.

    See the module docstring for the algorithm and scale ledger; the
    inventory never exceeds ``seed_factor·vocab_size + |chars|``
    (guarded at ``MAX_INVENTORY``) and the corpus is scanned exactly
    once (word-type counting) — EM rounds run over the bounded type
    table."""
    if vocab_size < 1:
        raise ValueError("vocab_size must be >= 1")
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    if max_piece_len < 1:
        raise ValueError("max_piece_len must be >= 1")
    seed_cap = seed_factor * vocab_size
    if seed_cap > MAX_INVENTORY:
        raise ValueError(
            f"seed inventory {seed_cap} exceeds MAX_INVENTORY="
            f"{MAX_INVENTORY}: piece scores ship in task closures")

    wt = bpe.word_type_counts(df, text_col, min_count, max_word_types)
    wt = wt.persist()
    try:
        # seed: all substrings (len ≤ max_piece_len) of every word
        # type, weighted by the word's corpus count — type-table-sized
        # explode, deterministic TakeOrdered cap
        subs = F.expr(
            "flatten(transform(sequence(1, length(word)), "
            f"i -> transform(sequence(i, least(length(word), "
            f"i + {max_piece_len - 1})), "
            "j -> substring(word, i, j - i + 1))))")
        seeded = (wt.select(F.explode(subs).alias("piece"), "n")
                  .groupBy("piece").agg(F.sum("n").alias("cnt")))
        chars = (seeded.filter(F.length("piece") == 1)
                 .select("piece", "cnt"))
        top = (seeded.orderBy(F.col("cnt").desc(), F.col("piece").asc())
               .limit(seed_cap))
        inv = {r["piece"]: int(r["cnt"])
               for r in top.unionByName(chars).distinct().collect()}
        char_set = {p for p in inv if len(p) == 1}

        counts = inv
        for _ in range(rounds):
            total = sum(counts.values())
            tb = _flog2(total)
            bits = {p: tb - _flog2(c) for p, c in counts.items()}
            seg = _segment_counts(wt, bits, max_piece_len, tb + 1)
            new = {r["piece"]: int(r["cnt"])
                   for r in seg.collect()}  # ≤ inventory rows
            # prune: top vocab_size by (cnt DESC, piece ASC); single
            # chars always survive (with their latest counts, floor 1,
            # so costs stay defined even for currently-unused chars)
            ranked = sorted(new.items(), key=lambda kv: (-kv[1], kv[0]))
            kept = dict(ranked[:vocab_size])
            for ch in char_set:
                kept.setdefault(ch, max(new.get(ch, 0), 1))
            counts = kept
    finally:
        wt.unpersist()

    total = sum(counts.values())
    tb = _flog2(total)
    rows = [(p, c, tb - _flog2(c))
            for p, c in sorted(counts.items(),
                               key=lambda kv: (-kv[1], kv[0]))]
    return df.sparkSession.createDataFrame(
        rows, "piece string, cnt long, bits long")


def _model_from(pieces) -> tuple:
    """(bits dict, max_len, oov_bits) from a learn_unigram frame or a
    [(piece, cnt, bits)] list."""
    if isinstance(pieces, DataFrame):
        rows = [(r["piece"], int(r["bits"]))
                for r in pieces.select("piece", "bits").collect()]
    else:
        rows = [(p, int(b)) for p, _, b in pieces]
    bits = dict(rows)
    max_len = max((len(p) for p in bits), default=1)
    oov = max(bits.values(), default=0) + 1
    return bits, max_len, oov


def unigram_chunk(df: DataFrame, id_col: str, text_col: str,
                  pieces, budget: int) -> DataFrame:
    """Split every document into ≤ ``budget``-piece chunks under the
    trained unigram tokenizer — same model-input assembly contract as
    ``bpe.bpe_chunk`` (one encode pass, row-local sequence slicing,
    empty documents emit zero chunks).  Returns
    ``(id_col, chunk_idx, n_pieces, pieces)``."""
    if budget < 1:
        raise ValueError("budget must be >= 1")
    enc = unigram_encode(df, id_col, text_col, pieces)
    n_chunks = F.ceil(F.col("n_pieces") / F.lit(budget)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("long").alias("idx"),
            F.slice(F.col("pieces"), i * budget + 1, budget)
            .alias("arr")))
    return (enc.filter(F.col("n_pieces") > 0)
            .select(F.col(id_col), F.explode(chunks).alias("c"))
            .select(id_col,
                    F.col("c.idx").alias("chunk_idx"),
                    F.size("c.arr").cast("long").alias("n_pieces"),
                    F.col("c.arr").alias("pieces")))


def unigram_encode(df: DataFrame, id_col: str, text_col: str,
                   pieces) -> DataFrame:
    """Encode a text column with a trained piece inventory — one
    stateless ``mapInPandas`` pass (inventory in the task closure,
    per-task word→segmentation memo), same tokenizer surface and
    streaming-applicability contract as ``bpe_encode``.  Returns
    ``(id_col, pieces array<string>, n_pieces long)``."""
    bits, max_len, oov = _model_from(pieces)
    id_field = df.schema[id_col]
    out_schema = (f"{id_field.name} {id_field.dataType.simpleString()}, "
                  "pieces array<string>, n_pieces long")
    cols = df.select(id_col, text_col)

    def gen(batches):
        import re

        import pandas as pd

        tok_re = re.compile("[^a-z0-9]+")
        memo: dict = {}

        def enc(word: str) -> tuple:
            seg = memo.get(word)
            if seg is None:
                seg = viterbi_segment(word, bits, max_len, oov)
                memo[word] = seg
            return seg

        for pdf in batches:
            out_p, out_n = [], []
            for txt in pdf[text_col]:
                if txt is None or isinstance(txt, float):
                    out_p.append([])
                    out_n.append(0)
                    continue
                acc: list = []
                for w in tok_re.split(str(txt).lower()):
                    if w:
                        acc.extend(enc(w))
                out_p.append(acc)
                out_n.append(len(acc))
            yield pd.DataFrame({id_col: pdf[id_col], "pieces": out_p,
                                "n_pieces": pd.Series(out_n,
                                                      dtype="int64")})

    return cols.mapInPandas(gen, out_schema)
