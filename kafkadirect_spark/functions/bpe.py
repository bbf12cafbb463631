"""Byte-pair-encoding tokenizer training and application, Spark-first.

The one tokenizer operation ``text.bpe_token_count`` (a regex proxy)
cannot do: actually LEARN a merge vocabulary from the corpus and
encode text with it — the "train a tokenizer on 100 TB" step of a
training-data pipeline.

Architecture (the classic Sennrich'16 formulation, arranged for
Spark):

1. **Word-type counting is the corpus-scale pass** — one
   explode→groupBy over every token occurrence (map-side combined),
   then a distributed top-``max_word_types`` by (count DESC, word
   ASC).  100 TB of text reduces to a Heaps-law-bounded word-TYPE
   table (~1e7-1e8 rows); capping it by frequency is what every
   production tokenizer trainer does — merges are learned from
   aggregated counts, never from the raw corpus.
2. **Merge learning over the type table**, two regimes (the same
   split as dedup.connected_components):
   - ``mode="driver"`` (default): collect the capped type table
     (bounded by ``max_word_types``, hard-guarded at
     ``MAX_DRIVER_TYPES``) and run the exact greedy loop in plain
     Python — zero Spark jobs per merge.
   - ``mode="distributed"``: the type table never leaves the
     cluster; each merge round is one vocabulary-sized
     explode→groupBy (pair counts), a 1-row TakeOrdered collect
     (the argmax), and a row-local fold rewriting every word's
     symbol array.  O(n_merges) jobs — the price of unbounded
     vocabularies.
   Both regimes are bit-identical (pytest-pinned): pair counts are
   exact integers, ties break (count DESC, lhs ASC, rhs ASC).
3. **Encoding** (``bpe_encode``) applies the learned merges in rank
   order with one ``mapInPandas`` pass — merges broadcast via task
   closure (n_merges rows), per-task word→segmentation memo, so each
   distinct word per task is encoded once.

Pair statistics count every adjacent position (overlapping pairs in
a run like 'aaa' count twice) while application merges left-to-right
non-overlapping — exactly Sennrich's reference algorithm, and
exactly what the DuckDB oracle (``merges_oracle_sql``) replays with
per-round recursive-CTE rewrites.

Reference analogue: none (SURVEY.md §2 — the reference has no
document model); beyond-parity, the tokenizer-training step of an
LLM data pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafkadirect_spark.functions.text import tokens

#: ``mode="driver"`` refuses type tables above this — the greedy loop
#: is O(types · merges); past this, use ``mode="distributed"``.
MAX_DRIVER_TYPES = 5_000_000

_MERGES_SCHEMA = ("merge_rank long, lhs string, rhs string, "
                  "pair_count long")


# ---------------------------------------------------------------------------
# word-type counting (the corpus-scale pass)
# ---------------------------------------------------------------------------

def word_type_counts(df: DataFrame, text_col: str, min_count: int = 2,
                     max_word_types: int = 1 << 16) -> DataFrame:
    """``(word, n)`` — the ``max_word_types`` most frequent token
    types with count ≥ ``min_count``, deterministically capped by
    (n DESC, word ASC).  One shuffle over token occurrences with
    map-side partial counts; the cap is a distributed TakeOrdered
    (every task keeps ≤ ``max_word_types`` rows), never a global
    sort."""
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    if max_word_types < 1:
        raise ValueError("max_word_types must be >= 1")
    return (df.select(F.explode(tokens(text_col)).alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= min_count)
            .orderBy(F.col("n").desc(), F.col("word").asc())
            .limit(max_word_types))


# ---------------------------------------------------------------------------
# the greedy merge step (one Python definition, used by the driver
# regime, bpe_encode, and the tests' independent checks)
# ---------------------------------------------------------------------------

def _py_apply(sym: tuple, lhs: str, rhs: str) -> tuple:
    """Left-to-right non-overlapping rewrite of adjacent
    (lhs, rhs) → lhs+rhs over a symbol tuple."""
    out = []
    i = 0
    n = len(sym)
    while i < n:
        if i + 1 < n and sym[i] == lhs and sym[i + 1] == rhs:
            out.append(lhs + rhs)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def _py_learn(types: list, n_merges: int) -> list:
    """Exact greedy BPE over a ``[(word, count), ...]`` type table:
    per round, count every adjacent symbol pair weighted by word
    count, take the (count DESC, lhs ASC, rhs ASC) argmax, rewrite.
    Returns ``[(rank, lhs, rhs, pair_count), ...]`` — fewer than
    ``n_merges`` rows iff the pair space is exhausted."""
    segs = {w: tuple(w) for w, _ in types}
    merges = []
    for rank in range(1, n_merges + 1):
        pc: dict = {}
        for w, n in types:
            s = segs[w]
            for i in range(len(s) - 1):
                k = (s[i], s[i + 1])
                pc[k] = pc.get(k, 0) + n
        if not pc:
            break
        (lhs, rhs), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, lhs, rhs, int(c)))
        # symbols are contiguous substrings of the word in order, so
        # an adjacent (lhs, rhs) implies lhs+rhs is a substring —
        # skip words that cannot contain the pair
        pat = lhs + rhs
        for w in segs:
            if pat in w:
                segs[w] = _py_apply(segs[w], lhs, rhs)
    return merges


# ---------------------------------------------------------------------------
# the distributed regime's row-local pieces
# ---------------------------------------------------------------------------

#: char-split of a ``word`` column — textually mirrors the oracle's
#: ``list_transform(generate_series(1, length(word)), g -> substr(...))``
_SYMBOLS_EXPR = ("transform(sequence(1, length(word)), "
                 "g -> substring(word, g, 1))")


def _apply_merge(sym_col: str, lhs: str, rhs: str,
                 product: str | None = None) -> Column:
    """Row-local greedy rewrite of a symbol-array column: one
    ``aggregate`` fold with a skip flag (an index consumed as the
    second half of a merge emits nothing) — no UDF, stays in
    codegen.  ``product`` overrides the merged symbol (default
    ``lhs + rhs`` — BPE; WordPiece strips the continuation prefix)."""
    s = F.col(sym_col)
    a, b = F.lit(lhs), F.lit(rhs)
    ab = F.lit(lhs + rhs if product is None else product)

    def step(acc: Column, i: Column) -> Column:
        hit = ((i < F.size(s))
               & (F.element_at(s, i) == a)
               & (F.element_at(s, i + F.lit(1)) == b))
        return (F.when(acc["skip"],
                       F.struct(acc["o"].alias("o"),
                                F.lit(False).alias("skip")))
                .when(hit,
                      F.struct(F.concat(acc["o"], F.array(ab)).alias("o"),
                               F.lit(True).alias("skip")))
                .otherwise(
                    F.struct(F.concat(acc["o"],
                                      F.array(F.element_at(s, i))).alias("o"),
                             F.lit(False).alias("skip"))))

    return F.aggregate(
        F.sequence(F.lit(1), F.size(s)),
        F.struct(F.array().cast("array<string>").alias("o"),
                 F.lit(False).alias("skip")),
        step,
        lambda acc: acc["o"])


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------

def learn_bpe(df: DataFrame, text_col: str, n_merges: int,
              min_count: int = 2, max_word_types: int = 1 << 16,
              mode: str = "driver",
              checkpoint_dir: str | None = None) -> DataFrame:
    """Learn ``n_merges`` BPE merges from a text column.  Returns
    ``(merge_rank, lhs, rhs, pair_count)`` ordered by rank — ≤
    ``n_merges`` rows (early exhaustion emits fewer).  See the
    module docstring for the two regimes; they are bit-identical.

    Fault-tolerance tradeoff (distributed mode): the per-round
    ``localCheckpoint`` stores blocks on executors with TRUNCATED
    lineage, so losing any executor mid-training fails the job
    unrecoverably — acceptable for short runs, a real caveat for a
    long cluster run over a big type table.  Pass ``checkpoint_dir``
    to use reliable ``checkpoint()`` into that path instead (HDFS/
    object-store durable; survives executor loss at the cost of one
    type-table write per round).

    Reliable-checkpoint hygiene (ADVICE r10): each round checkpoints
    into its own ``<checkpoint_dir>/bpe-round-k`` subdirectory and the
    PREVIOUS round's subdirectory is deleted as soon as the new
    checkpoint has materialized (round k's snapshot is self-contained,
    so round k−1's files are dead weight) — a 200-merge run holds at
    most two type-table snapshots on storage, not 200.  All managed
    subdirectories are removed when training finishes.  Side effect:
    ``checkpoint_dir`` routes through the SESSION-GLOBAL
    ``SparkContext.setCheckpointDir``; the previous global setting is
    restored (best-effort) on exit."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    if mode not in ("driver", "distributed"):
        raise ValueError(f"unknown mode {mode!r}")
    spark = df.sparkSession
    wt = word_type_counts(df, text_col, min_count, max_word_types)

    if mode == "driver":
        if max_word_types > MAX_DRIVER_TYPES:
            raise ValueError(
                f"max_word_types={max_word_types} exceeds "
                f"MAX_DRIVER_TYPES={MAX_DRIVER_TYPES} — use "
                "mode='distributed'")
        # bounded by max_word_types (≤ MAX_DRIVER_TYPES) by construction
        types = [(r["word"], int(r["n"])) for r in wt.collect()]
        merges = _py_learn(types, n_merges)
        return spark.createDataFrame(merges, _MERGES_SCHEMA)

    # Checkpoint per round, NOT persist: persist materializes but
    # does not truncate the logical plan, so round k's analyzed tree
    # still nests k _apply_merge folds (each a large struct expression)
    # — analysis/canonicalization cost and driver heap grow O(k²) and
    # an 8 GB driver OOMs near 25 merges.  Checkpointing cuts the
    # lineage to a LogicalRDD each round (the connected_components
    # pattern), making every round's plan one fold — O(n_merges) jobs
    # AND O(1) plan depth, measured to 200+ merges (SCALE.md).
    # localCheckpoint (executor blocks) by default; reliable
    # checkpoint() when checkpoint_dir is set (see docstring).  In
    # the reliable regime every round gets its OWN subdirectory and
    # round k−1's files are deleted once round k has materialized —
    # the eager checkpoint is self-contained, so only the newest
    # snapshot is ever live (ADVICE r10: without this a long run
    # accumulates one type-table snapshot per merge on HDFS unless
    # spark.cleaner.referenceTracking.cleanCheckpoints happens to be
    # enabled).
    sc = spark.sparkContext
    prior_dir = None
    if checkpoint_dir is not None:
        opt = sc._jsc.sc().getCheckpointDir()
        prior_dir = opt.get() if opt.isDefined() else None
    ck = {"round": 0, "live": None}

    def _rmdir(p: str) -> None:
        jpath = spark._jvm.org.apache.hadoop.fs.Path(p)
        fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
        fs.delete(jpath, True)

    def _cut(frame: DataFrame) -> DataFrame:
        if checkpoint_dir is None:
            return frame.localCheckpoint(eager=True)
        ck["round"] += 1
        d = f"{checkpoint_dir.rstrip('/')}/bpe-round-{ck['round']}"
        sc.setCheckpointDir(d)
        out = frame.checkpoint(eager=True)  # reads old files, writes d
        if ck["live"] is not None:
            _rmdir(ck["live"])
        ck["live"] = d
        return out

    try:
        t = _cut(wt.withColumn("s", F.expr(_SYMBOLS_EXPR))
                 .select("word", "n", "s"))
        merges = []
        for rank in range(1, n_merges + 1):
            top = (t.filter(F.size("s") >= 2)
                   .select("n",
                           F.explode(
                               F.sequence(F.lit(1), F.size("s") - 1))
                           .alias("i"),
                           "s")
                   .select("n",
                           F.element_at("s", F.col("i")).alias("lhs"),
                           F.element_at("s", F.col("i") + 1).alias("rhs"))
                   .groupBy("lhs", "rhs")
                   .agg(F.sum("n").alias("c"))
                   .orderBy(F.col("c").desc(), F.col("lhs").asc(),
                            F.col("rhs").asc())
                   .limit(1).collect())  # exactly one row — the argmax
            if not top:
                break
            lhs, rhs, c = top[0]["lhs"], top[0]["rhs"], int(top[0]["c"])
            merges.append((rank, lhs, rhs, c))
            # eager: materialize the rewrite now; in the local regime
            # the previous round's blocks are reclaimed by the
            # ContextCleaner once this rebinding drops the last
            # reference (type-table-sized blocks — ≤ max_word_types
            # rows — so even the transient overlap is register-scale,
            # not data-scale); in the reliable regime _cut deletes
            # the previous round's subdirectory explicitly
            t = _cut(t.withColumn("s", _apply_merge("s", lhs, rhs)))
        # the result is a driver-local merge list — nothing references
        # the final checkpoint either
        return spark.createDataFrame(merges, _MERGES_SCHEMA)
    finally:
        if checkpoint_dir is not None:
            if ck["live"] is not None:
                _rmdir(ck["live"])
            try:  # best-effort: restore the session-global setting
                sc.setCheckpointDir(prior_dir)
            except Exception:
                pass


# ---------------------------------------------------------------------------
# encoding
# ---------------------------------------------------------------------------

def bpe_encode(df: DataFrame, id_col: str, text_col: str,
               merges) -> DataFrame:
    """Encode a text column with a learned merge list — standard BPE
    inference: tokenize (the same ``[^a-z0-9]+`` surface as
    ``text.tokens``), char-split each word, apply every merge in
    rank order.  Returns ``(id_col, bpe array<string>, n_bpe long)``.

    ``merges`` is the ``learn_bpe`` frame or a ``[(lhs, rhs), ...]``
    list in rank order; a frame is collected (≤ n_merges rows,
    bounded by construction) and shipped in the task closure.  One
    ``mapInPandas`` pass, no shuffle; a per-task word→segmentation
    memo encodes each distinct word once per task (memo size is
    bounded by the task's distinct words — the same envelope as any
    per-task dictionary aggregation)."""
    if isinstance(merges, DataFrame):
        rows = merges.select("merge_rank", "lhs", "rhs").collect()
        pairs = [(r["lhs"], r["rhs"])
                 for r in sorted(rows, key=lambda r: r["merge_rank"])]
    else:
        pairs = [(a, b) for a, b in merges]

    id_field = df.schema[id_col]
    out_schema = (f"{id_field.name} {id_field.dataType.simpleString()}, "
                  "bpe array<string>, n_bpe long")
    # widen narrow scans so the Arrow-batched encode runs cluster-wide
    # (a no-op on streaming frames and on scans already as wide as the
    # cluster — the 100 TB case); the per-task word memo still applies
    from kafkadirect_spark.functions.dedup import _widen
    cols = _widen(df.select(id_col, text_col))

    def gen(batches):
        import re

        import pandas as pd

        tok_re = re.compile("[^a-z0-9]+")
        memo: dict = {}

        def enc(word: str) -> tuple:
            seg = memo.get(word)
            if seg is None:
                seg = tuple(word)
                for a, b in pairs:
                    if (a + b) in word:
                        seg = _py_apply(seg, a, b)
                memo[word] = seg
            return seg

        for pdf in batches:
            bpe_col, n_col = [], []
            for txt in pdf[text_col]:
                if txt is None or (isinstance(txt, float)):
                    bpe_col.append([])
                    n_col.append(0)
                    continue
                out: list = []
                for w in tok_re.split(str(txt).lower()):
                    if w:
                        out.extend(enc(w))
                bpe_col.append(out)
                n_col.append(len(out))
            yield pd.DataFrame({id_col: pdf[id_col], "bpe": bpe_col,
                                "n_bpe": pd.Series(n_col, dtype="int64")})

    return cols.mapInPandas(gen, out_schema)


# ---------------------------------------------------------------------------
# DuckDB oracle generators — the merge loop replayed as unrolled
# recursive-CTE rounds (same pattern as graph.pagerank_scaled and the
# PQ training oracles: AS MATERIALIZED everywhere a CTE is referenced
# more than once, or DuckDB's default inlining re-evaluates the chain
# combinatorially)
# ---------------------------------------------------------------------------

_TOK_SQL = ("list_filter(regexp_split_to_array(lower(text), "
            "'[^a-z0-9]+'), x -> x <> '')")


def _rewrite_round(src: str, out: str, best: str, rw: str) -> str:
    """One merge application as a recursive CTE: every word walks its
    symbol array one index per recursion step (skip-by-jumping-2 on a
    hit), completed rows have i = len(s) + 1."""
    return f"""
    {rw} AS (
      SELECT word, n, s, 1 AS i, []::VARCHAR[] AS o FROM {src}
      UNION ALL
      SELECT word, n, s,
        CASE WHEN i < len(s) AND s[i] = (SELECT lhs FROM {best})
                  AND s[i+1] = (SELECT rhs FROM {best})
             THEN i + 2 ELSE i + 1 END,
        CASE WHEN i < len(s) AND s[i] = (SELECT lhs FROM {best})
                  AND s[i+1] = (SELECT rhs FROM {best})
             THEN list_append(o, s[i] || s[i+1])
             ELSE list_append(o, s[i]) END
      FROM {rw} WHERE i <= len(s)),
    {out} AS MATERIALIZED (
      SELECT word, n, o AS s FROM {rw} WHERE i = len(s) + 1)"""


def _pair_round(src: str, pc: str, best: str) -> str:
    return f"""
    {pc} AS MATERIALIZED (
      SELECT s[i] AS lhs, s[i+1] AS rhs, SUM(n)::BIGINT AS c
      FROM (SELECT n, s, unnest(generate_series(1, len(s)-1)) AS i
            FROM {src} WHERE len(s) >= 2)
      GROUP BY 1, 2),
    {best} AS MATERIALIZED (
      SELECT lhs, rhs, c FROM {pc}
      ORDER BY c DESC, lhs ASC, rhs ASC LIMIT 1)"""


def _train_ctes(n_merges: int, min_count: int,
                max_word_types: int) -> str:
    parts = [f"""
    wt AS MATERIALIZED (
      SELECT tok AS word, COUNT(*)::BIGINT AS n
      FROM (SELECT unnest({_TOK_SQL}) AS tok FROM documents)
      GROUP BY 1 HAVING COUNT(*) >= {min_count}
      ORDER BY n DESC, word ASC LIMIT {max_word_types}),
    t0 AS MATERIALIZED (
      SELECT word, n,
             list_transform(generate_series(1, length(word)),
                            g -> substr(word, g, 1)) AS s
      FROM wt)"""]
    for r in range(1, n_merges + 1):
        parts.append(_pair_round(f"t{r - 1}", f"pc{r}", f"best{r}"))
        if r < n_merges:  # the last round only needs its argmax
            parts.append(_rewrite_round(f"t{r - 1}", f"t{r}",
                                        f"best{r}", f"rw{r}"))
    return ",".join(parts)


def merges_oracle_sql(n_merges: int, min_count: int = 2,
                      max_word_types: int = 1 << 16) -> str:
    """DuckDB replay of ``learn_bpe`` over the ``documents`` view."""
    selects = " UNION ALL ".join(
        f"SELECT {r}::BIGINT AS merge_rank, lhs, rhs, "
        f"c AS pair_count FROM best{r}"
        for r in range(1, n_merges + 1))
    return (f"WITH RECURSIVE {_train_ctes(n_merges, min_count, max_word_types)}"
            f" SELECT * FROM ({selects}) ORDER BY merge_rank")


def encode_lengths_oracle_sql(n_merges: int, min_count: int = 2,
                              max_word_types: int = 1 << 16) -> str:
    """DuckDB replay of ``bpe_encode(...).select(id, n_bpe)``: the
    merge selection runs on the CAPPED type table (exactly as
    training), then the learned merges rewrite EVERY corpus word
    type (the u-chain — inference covers words the cap/min_count
    floor excluded from training), and per-doc lengths sum the final
    segmentation sizes over word occurrences."""
    parts = [_train_ctes(n_merges, min_count, max_word_types)]
    # inference chain over all types: n carries the corpus-wide count
    # (unused by the rewrite, kept for CTE-shape reuse)
    parts.append("""
    u0 AS MATERIALIZED (
      SELECT tok AS word, COUNT(*)::BIGINT AS n,
             list_transform(generate_series(1, length(tok)),
                            g -> substr(tok, g, 1)) AS s
      FROM (SELECT unnest(""" + _TOK_SQL + """) AS tok FROM documents)
      GROUP BY 1, tok)""")
    for r in range(1, n_merges + 1):
        # training's last round skipped its rewrite; inference needs
        # every learned merge applied, so rewrite all n_merges rounds
        parts.append(_rewrite_round(f"u{r - 1}", f"u{r}",
                                    f"best{r}", f"urw{r}"))
    ctes = ",".join(parts)
    return f"""WITH RECURSIVE {ctes},
    docw AS (SELECT doc_id, unnest({_TOK_SQL}) AS word FROM documents),
    perdoc AS (
      SELECT doc_id, SUM(len(u{n_merges}.s))::BIGINT AS n_bpe
      FROM docw JOIN u{n_merges} USING (word) GROUP BY 1)
    SELECT d.doc_id, COALESCE(p.n_bpe, 0)::BIGINT AS n_bpe
    FROM documents d LEFT JOIN perdoc p USING (doc_id)"""


def bpe_vocab(df: DataFrame, text_col: str, merges,
              min_count: int = 2,
              max_word_types: int = 1 << 16) -> DataFrame:
    """The vocabulary a merge list induces over a corpus — the
    artifact a tokenizer ships: every base character observed in the
    (capped) word-type table plus every merge product, with the rank
    that introduced it.  ``(token, kind 'char'|'merge', rank)`` —
    rank 0 for base characters, the merge's 1-based rank otherwise.

    One word-type counting pass (the same capped table training
    used) exploded to distinct characters — register-sized output —
    unioned with the ≤ n_merges merge rows."""
    spark = df.sparkSession
    if isinstance(merges, DataFrame):
        rows = sorted(merges.select("merge_rank", "lhs", "rhs").collect(),
                      key=lambda r: r["merge_rank"])
        pairs = [(int(r["merge_rank"]), r["lhs"], r["rhs"]) for r in rows]
    else:
        pairs = [(i + 1, a, b) for i, (a, b) in enumerate(merges)]
    chars = (word_type_counts(df, text_col, min_count, max_word_types)
             .select(F.explode(F.split("word", "")).alias("token"))
             .filter(F.col("token") != "")
             .distinct()
             .select("token", F.lit("char").alias("kind"),
                     F.lit(0).cast("long").alias("rank")))
    merged = spark.createDataFrame(
        [(a + b, "merge", r) for r, a, b in pairs],
        "token string, kind string, rank long")
    return chars.unionByName(merged)


def bpe_chunk(df: DataFrame, id_col: str, text_col: str, merges,
              budget: int) -> DataFrame:
    """Split every document into ≤ ``budget``-token chunks UNDER THE
    LEARNED TOKENIZER — the model-input assembly step where a
    char/word-proxy budget misallocates (a 512-BPE-token window is
    not 512 words).  Token-array chunks, not re-glued text: what a
    training pipeline actually feeds forward.

    One ``bpe_encode`` pass (mapInPandas, per-task memo), then
    row-local slicing — ``ceil(n/budget)`` chunks per document via a
    sequence-transform, exploded.  Empty documents emit zero chunks.
    Returns ``(id_col, chunk_idx, n_tokens, bpe)``.
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    enc = bpe_encode(df, id_col, text_col, merges)
    n_chunks = F.ceil(F.col("n_bpe") / F.lit(budget)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("long").alias("idx"),
            F.slice(F.col("bpe"), i * budget + 1, budget)
            .alias("arr")))
    return (enc.filter(F.col("n_bpe") > 0)
            .select(F.col(id_col), F.explode(chunks).alias("c"))
            .select(id_col,
                    F.col("c.idx").alias("chunk_idx"),
                    F.size("c.arr").cast("long").alias("n_tokens"),
                    F.col("c.arr").alias("bpe")))


def chunk_oracle_sql(n_merges: int, budget: int, min_count: int = 2,
                     max_word_types: int = 1 << 16) -> str:
    """DuckDB replay of ``bpe_chunk(documents)``: the full-type
    rewrite chain (as ``encode_lengths_oracle_sql``), word order
    restored via positional unnest, per-doc sequences flattened in
    order, then 1-based inclusive list slices."""
    parts = [_train_ctes(n_merges, min_count, max_word_types)]
    parts.append("""
    u0 AS MATERIALIZED (
      SELECT tok AS word, COUNT(*)::BIGINT AS n,
             list_transform(generate_series(1, length(tok)),
                            g -> substr(tok, g, 1)) AS s
      FROM (SELECT unnest(""" + _TOK_SQL + """) AS tok FROM documents)
      GROUP BY 1, tok)""")
    for r in range(1, n_merges + 1):
        parts.append(_rewrite_round(f"u{r - 1}", f"u{r}",
                                    f"best{r}", f"urw{r}"))
    ctes = ",".join(parts)
    b = budget
    return f"""WITH RECURSIVE {ctes},
    tokq AS (
      SELECT doc_id, w[i] AS word, i AS ord
      FROM (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i
            FROM (SELECT doc_id, {_TOK_SQL} AS w FROM documents))),
    seqs AS (
      SELECT doc_id, flatten(list(s ORDER BY ord)) AS toks
      FROM tokq JOIN u{n_merges} USING (word) GROUP BY doc_id),
    chunks AS (
      SELECT doc_id, i AS chunk_idx,
             toks[(i * {b} + 1):((i + 1) * {b})] AS bpe
      FROM (SELECT doc_id, toks,
                   unnest(generate_series(
                       0, CAST((len(toks) + {b} - 1) // {b} AS BIGINT)
                          - 1)) AS i
            FROM seqs WHERE len(toks) > 0))
    SELECT doc_id, chunk_idx, len(bpe)::BIGINT AS n_tokens,
           md5(array_to_string(bpe, ',')) AS bpe_md5
    FROM chunks"""
