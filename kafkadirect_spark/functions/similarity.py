"""Similarity search over embedding columns (array<float>).

Two paths, as a 100 TB pipeline needs both:

- **cosine_topk** — exact brute force: cross-join + vectorized dot
  product.  O(n²·d); the correctness baseline and the right answer for
  a broadcast-able probe set (n_query ≪ n_index: broadcast the probes,
  scan the index once — no shuffle at all).
- **ann_lsh_topk** — random-hyperplane LSH: each vector hashes to a
  sign-pattern bucket; candidates share a bucket in ≥1 of the hash
  tables; exact cosine only within buckets.  Shuffle key is
  (table, bucket) — sub-quadratic, skew-bounded by bucket size.

Dot products run through F.aggregate/F.zip_with on the JVM — no
Python in the inner loop.  Cosines are computed in double precision,
sequential-sum order, so DuckDB's list_cosine_similarity (the oracle)
agrees to the last ulp in practice; ranks (not raw floats) are the
query output to keep the correctness hash stable.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kafkadirect_spark.functions.dedup import _persist, _widen

# Hard ceiling on how many vectors the exact BLAS paths will pull to
# the driver as the probe matrix.  The broadcast-matmul design is
# "probe set ≪ index": the probes live in one numpy matrix on every
# executor, so an unbounded default (the whole index) is a driver/
# executor OOM at 100 TB.  Callers with a genuinely larger probe set
# must pass it explicitly AND raise this cap consciously — or use the
# ANN paths / cosine_verify_pairs, which never materialize vectors
# driver-side.
MAX_PROBES = 100_000

# Frozen hyperplanes for the LSH path: N_TABLES tables × N_BITS
# hyperplanes, components in {-1, +1} (signed-projection LSH with
# Rademacher planes — dot products stay exact in double).  Bucket
# count per table is 2^N_BITS: size N_BITS so the expected bucket
# occupancy stays well above k at the target scale (more tables ↑
# recall, more bits ↓ candidate cost).  16×4 measures recall@3 ≈ 0.89
# vs brute force on the sf0.01 embeddings (8×4 gave 0.66); with
# probe_radius=1 multiprobe it reaches 1.0 there.
N_TABLES = 16
N_BITS = 4


def _planes(dim: int) -> list[list[list[int]]]:
    rng = random.Random(7)
    return [
        [[rng.choice((-1, 1)) for _ in range(dim)] for _ in range(N_BITS)]
        for _ in range(N_TABLES)
    ]


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i in double, sequential order (JVM higher-order funcs)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    probes: DataFrame | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors per probe vector (self excluded).

    ``probes`` defaults to the whole index (all-pairs — fine at test
    scale, the oracle baseline).  With an explicit small probe set the
    plan is broadcast(probes) ⋈ index: one index scan, zero shuffle
    before the per-probe top-k.
    Output: (id, neighbor_id, rank) — ranks are hash-stable; ties
    broken by neighbor id.
    """
    index = df.select(F.col(id_col).alias("_nid"), F.col(vec_col).alias("_nvec"))
    probe = (probes or df).select(
        F.col(id_col).alias(id_col), F.col(vec_col).alias("_pvec"))
    if probes is not None:
        probe = F.broadcast(probe)
    pairs = probe.join(index, F.col(id_col) != F.col("_nid"))
    scored = pairs.withColumn("_cos", cosine(F.col("_pvec"), F.col("_nvec")))
    w = Window.partitionBy(id_col).orderBy(F.col("_cos").desc(), F.col("_nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col(id_col), F.col("_nid").alias("neighbor_id"), "rank")
    )


def _probe_matrix(df: DataFrame, probes: DataFrame | None, id_col: str,
                  vec_col: str, max_probes: int):
    """Collect the (bounded) probe set into a normalized numpy matrix.

    The ONLY driver materialization in this module, and it is guarded:
    ``limit(max_probes + 1)`` caps what can ever cross the wire, and a
    probe count above ``max_probes`` raises instead of OOMing the
    driver.  There is deliberately no unbounded default — at 100 TB the
    index never fits a broadcast matrix; use ann_lsh_topk / ivf_topk,
    or cosine_verify_pairs for candidate-restricted exact scoring.
    """
    import numpy as np

    probe_pdf = (
        (probes if probes is not None else df)
        .select(id_col, vec_col)
        .limit(max_probes + 1)
        .toPandas()
    )
    if len(probe_pdf) > max_probes:
        raise ValueError(
            f"probe set exceeds max_probes={max_probes}: the BLAS paths "
            "broadcast the probe matrix to every executor, which does not "
            "scale to an unbounded probe set. Pass an explicit bounded "
            "`probes` frame, raise `max_probes` consciously, or use the "
            "ANN paths (ann_lsh_topk / ivf_topk) or cosine_verify_pairs."
        )
    P = np.stack([np.asarray(v, dtype=np.float64) for v in probe_pdf[vec_col]])
    P /= np.linalg.norm(P, axis=1, keepdims=True)
    return P, probe_pdf[id_col].to_numpy()


def cosine_topk_blas(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    probes: DataFrame | None = None,
    max_probes: int = MAX_PROBES,
) -> DataFrame:
    """Vectorized exact top-k: the probe set is normalized into one
    numpy matrix and broadcast; each Arrow batch of the index computes
    all probe×batch cosines as a single BLAS matmul and emits its
    batch-local top-k per probe; a final per-probe top-k merges.

    Same output contract as cosine_topk (id, neighbor_id, rank; ties
    by neighbor id).  ~100× the per-pair expression path on wide
    batches.  ``probes=None`` scores the whole index against itself
    (the exact all-pairs baseline) but is HARD-CAPPED at ``max_probes``
    vectors — above that the call raises rather than pulling an
    unbounded matrix to the driver.  At 100 TB pass an explicit probe
    set ≪ index: the index is scanned once, nothing shuffles except
    n_probes·k·n_partitions candidate rows.
    """
    import numpy as np
    import pandas as pd
    P, p_ids = _probe_matrix(df, probes, id_col, vec_col, max_probes)
    sc = df.sparkSession.sparkContext
    b_mat, b_ids = sc.broadcast(P), sc.broadcast(p_ids)

    def gen(batches):
        mat, pids = b_mat.value, b_ids.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            X /= np.linalg.norm(X, axis=1, keepdims=True)
            x_ids = pdf[id_col].to_numpy()
            sims = mat @ X.T                      # n_probes × batch
            sims[pids[:, None] == x_ids[None, :]] = -np.inf  # self-exclude
            kk = min(k, sims.shape[1])
            top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = {
                id_col: np.repeat(pids, kk),
                "neighbor_id": x_ids[top].ravel(),
                "_cos": np.take_along_axis(sims, top, axis=1).ravel(),
            }
            out = pd.DataFrame(rows)
            yield out[out["_cos"] > -np.inf]

    # Run the matmul cluster-wide even when the index scan is a single
    # file/partition.
    index = _widen(df.select(id_col, vec_col))
    partial = index.mapInPandas(
        gen, schema=f"{id_col} long, neighbor_id long, _cos double")
    w = Window.partitionBy(id_col).orderBy(F.col("_cos").desc(), F.col("neighbor_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "neighbor_id", "rank")
    )


def cosine_pairs_blas(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    probes: DataFrame | None = None,
    max_probes: int = MAX_PROBES,
) -> DataFrame:
    """Embedding-cosine near-dup: ALL pairs (id_a < id_b) with cosine ≥
    threshold — exact, via the same broadcast-matmul batch plan as
    cosine_topk_blas but emitting every above-threshold hit instead of
    a top-k.  Output bounded by the true near-dup count.  The probe set
    is hard-capped at ``max_probes`` (raises above it — never an
    unbounded driver pull); at scale use cosine_verify_pairs over LSH
    candidate pairs instead, which keeps every vector executor-side.

    Pairs are emitted once, in (id_a < id_b) order — so a custom
    ``probes`` subset finds only pairs whose *lower* id is a probe;
    pass the full bucket membership (not one side) as probes when
    using LSH candidates."""
    import numpy as np
    import pandas as pd

    P, p_ids = _probe_matrix(df, probes, id_col, vec_col, max_probes)
    sc = df.sparkSession.sparkContext
    b_mat, b_ids = sc.broadcast(P), sc.broadcast(p_ids)

    def gen(batches):
        mat, pids = b_mat.value, b_ids.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            X /= np.linalg.norm(X, axis=1, keepdims=True)
            x_ids = pdf[id_col].to_numpy()
            sims = mat @ X.T
            pi, xi = np.where((sims >= threshold) &
                              (pids[:, None] < x_ids[None, :]))
            yield pd.DataFrame({
                "id_a": pids[pi], "id_b": x_ids[xi],
                "cosine": sims[pi, xi],
            })

    index = _widen(df.select(id_col, vec_col))
    return index.mapInPandas(
        gen, schema="id_a long, id_b long, cosine double")


def lsh_candidate_pairs(df: DataFrame, id_col: str, vec_col: str, dim: int,
                        probe_radius: int = 0) -> DataFrame:
    """Distinct candidate id pairs (id_a < id_b) that share ≥ 1 LSH
    bucket (optionally multiprobed): the sub-quadratic candidate
    generator behind embedding near-dup at scale.  Shuffle key is
    (table, bucket); pairs are deduped on cheap int ids before any
    vector rejoins downstream."""
    b = lsh_buckets(df, id_col, vec_col, dim)
    if probe_radius:
        masks = probe_buckets(probe_radius)
        a = b.select(
            "table",
            F.explode(F.array(*[
                F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks
            ])).alias("bucket"),
            F.col(id_col).alias("id_a"),
        )
    else:
        a = b.select("table", "bucket", F.col(id_col).alias("id_a"))
    c = b.select("table", "bucket", F.col(id_col).alias("id_b"))
    return (
        a.join(c, ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def cosine_verify_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
) -> DataFrame:
    """Exact cosine filter over CANDIDATE pairs — the 100 TB near-dup
    verify stage.  ``pairs`` is (id_a, id_b); each side joins its
    vector back (shuffle on the int id, vectors move once), and the
    cosine is a JVM higher-order-function expression — no Python, no
    driver materialization, output (id_a, id_b, cosine ≥ threshold).

    Mirrors the MinHash pipeline's candidate→verify split
    (dedup.jaccard_verify): a sub-quadratic candidate generator (e.g.
    lsh_candidate_pairs) bounds the work; this stage restores exact
    semantics on the surviving pairs."""
    vecs = df.select(F.col(id_col), F.col(vec_col))
    cands = (
        pairs
        .join(vecs.select(F.col(id_col).alias("id_a"),
                          F.col(vec_col).alias("_avec")), "id_a")
        .join(vecs.select(F.col(id_col).alias("id_b"),
                          F.col(vec_col).alias("_bvec")), "id_b")
    )
    return (
        cands.withColumn("cosine", cosine(F.col("_avec"), F.col("_bvec")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def lsh_buckets(df: DataFrame, id_col: str, vec_col: str, dim: int) -> DataFrame:
    """(table, bucket, id, vec) — bucket = sign pattern of N_BITS
    Rademacher projections, packed into an int."""
    planes = _planes(dim)
    rows = []
    for t, table in enumerate(planes):
        bucket = None
        for j, plane in enumerate(table):
            proj = dot(F.col(vec_col),
                       F.array(*[F.lit(float(c)) for c in plane]))
            bit = F.when(proj >= 0, F.lit(2 ** j)).otherwise(F.lit(0))
            bucket = bit if bucket is None else bucket + bit
        rows.append(F.struct(F.lit(t).alias("table"),
                             bucket.cast("int").alias("bucket")))
    return df.select(
        F.col(id_col), F.col(vec_col),
        F.explode(F.array(*rows)).alias("tb"),
    ).select(id_col, vec_col, "tb.table", "tb.bucket")


def probe_buckets(radius: int) -> list[tuple[int, ...]]:
    """Bit-flip masks for multiprobe: all XOR masks of Hamming weight
    ≤ radius over N_BITS (mask 0 = the exact bucket)."""
    from itertools import combinations

    masks = []
    for r in range(radius + 1):
        for bits in combinations(range(N_BITS), r):
            masks.append(sum(1 << j for j in bits))
    return masks


def ann_lsh_topk(df: DataFrame, id_col: str, vec_col: str, dim: int,
                 k: int = 3, probe_radius: int = 0) -> DataFrame:
    """Approximate top-k: exact cosine restricted to bucket-sharing
    candidates.  Recall grows with N_TABLES; cost is Σ bucket²
    instead of n².

    ``probe_radius`` enables multiprobe LSH (Lv et al., VLDB'07): the
    probe side also looks into buckets whose code differs in ≤ radius
    bits, so near-misses on one hyperplane sign still become
    candidates.  Cost grows only on the probe side of the bucket join
    (× Σ C(N_BITS, r)), not in stored state — the standard way to buy
    recall without more tables at 100 TB index scale."""
    b = _persist(lsh_buckets(df, id_col, vec_col, dim))
    if probe_radius:
        masks = probe_buckets(probe_radius)
        a = b.select(
            "table",
            F.explode(F.array(*[
                F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks
            ])).alias("bucket"),
            F.col(id_col).alias("_pid"),
        )
    else:
        a = b.select("table", "bucket", F.col(id_col).alias("_pid"))
    c = b.select("table", "bucket", F.col(id_col).alias("_nid"))
    # dedup on id pairs (cheap ints), then join the vectors back once —
    # distinct over float arrays would shuffle the embeddings N_TABLES×.
    pairs = (
        a.join(c, ["table", "bucket"])
        .filter(F.col("_pid") != F.col("_nid"))
        .select("_pid", "_nid")
        .distinct()
    )
    vecs = df.select(F.col(id_col), F.col(vec_col))
    cands = (
        pairs
        .join(vecs.select(F.col(id_col).alias("_pid"),
                          F.col(vec_col).alias("_pvec")), "_pid")
        .join(vecs.select(F.col(id_col).alias("_nid"),
                          F.col(vec_col).alias("_nvec")), "_nid")
    )
    scored = cands.withColumn("_cos", cosine(F.col("_pvec"), F.col("_nvec")))
    w = Window.partitionBy("_pid").orderBy(F.col("_cos").desc(), F.col("_nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("_pid").alias(id_col), F.col("_nid").alias("neighbor_id"), "rank")
    )


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    centroid_stride: int = 25,
    nprobe: int = 4,
) -> DataFrame:
    """IVF (inverted-file) ANN: a coarse quantizer partitions the
    index — each vector lists under its nearest centroid — and a query
    probes only its ``nprobe`` closest centroids' lists.

    The quantizer here is deterministic (centroids = every
    ``centroid_stride``-th vector by id, no Lloyd rounds) so the DuckDB
    oracle can replay it exactly; swap in trained centroids at scale.

    Plan shape: centroids are broadcast both times they're needed —
    assignment is broadcast-join + map-side-combined ``max_by`` (the
    shuffle carries ONE row per indexed vector, never the n×c cross
    product), probing is per-query top-nprobe over the same broadcast.
    The candidate join then shuffles on centroid id — list sizes, not
    |index|², bound the work, the same skew profile as LSH buckets.
    """
    # Norms are STAGED as columns on each side (r15, guide §4.2 spirit):
    # cosine(a, b) re-evaluates THREE interpreted HOF aggregates per
    # pair (dot + both norms — HOFs sit outside whole-stage codegen);
    # dot/(_vn·_cn) computes the identical float expression (same
    # sequential sums, same sqrt, same multiply — bit-identical, so
    # ranks can't flip) with ONE HOF per pair.  ``_widen`` keeps the
    # per-pair HOF work cluster-wide: the scoring feeds a tiny window
    # exchange that AQE coalesces to one partition, so without the
    # widen the whole n×c scoring ran single-task (measured 3.4 s →
    # 1.0 s at sf0.1 for the assignment pass).
    cent = F.broadcast(
        df.filter(F.col(id_col) % centroid_stride == 0)
        .select(F.col(id_col).alias("_cid"), F.col(vec_col).alias("_cvec"),
                norm(F.col(vec_col)).alias("_cn")))
    vecs = df.select(F.col(id_col), F.col(vec_col))
    # ONE scoring pass over index × broadcast(centroids); rank 1 is the
    # inverted-list assignment, ranks ≤ nprobe are the probe set.  The
    # persisted frame is int-only (id, cid, rank) — the vectors never
    # flow through the ranking shuffle.
    pw = Window.partitionBy(id_col).orderBy(F.col("_ccos").desc(), F.col("_cid"))
    ranked_cent = _persist(
        _widen(vecs).withColumn("_vn", norm(F.col(vec_col)))
        .join(cent)
        .withColumn("_ccos", dot(F.col(vec_col), F.col("_cvec"))
                    / (F.col("_vn") * F.col("_cn")))
        .withColumn("_pr", F.row_number().over(pw))
        .filter(F.col("_pr") <= max(nprobe, 1))
        .select(F.col(id_col), "_cid", "_pr")
    )
    assign = (ranked_cent.filter(F.col("_pr") == 1)
              .select(F.col(id_col).alias("_nid"), "_cid"))
    probes = ranked_cent.select(F.col(id_col).alias("_pid"), "_cid")
    pairs = (
        probes.join(assign, "_cid")
        .filter(F.col("_pid") != F.col("_nid"))
        .select("_pid", "_nid")
    )
    # staged norms again: one HOF aggregate per candidate pair instead
    # of three, float-identical (see the assignment comment above)
    cands = (
        pairs
        .join(vecs.select(F.col(id_col).alias("_pid"),
                          F.col(vec_col).alias("_pvec"),
                          norm(F.col(vec_col)).alias("_pn")), "_pid")
        .join(vecs.select(F.col(id_col).alias("_nid"),
                          F.col(vec_col).alias("_nvec"),
                          norm(F.col(vec_col)).alias("_nn")), "_nid")
    )
    scored = cands.withColumn(
        "_cos", dot(F.col("_pvec"), F.col("_nvec"))
        / (F.col("_pn") * F.col("_nn")))
    w = Window.partitionBy("_pid").orderBy(F.col("_cos").desc(), F.col("_nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("_pid").alias(id_col), F.col("_nid").alias("neighbor_id"),
                "rank")
    )


def quantize_int8(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Symmetric per-vector int8 quantization — the storage-scale
    companion to the ANN paths: max-abs scale per vector, elements
    mapped to ⌊x·127/scale⌋ ∈ [-127, 127].  At 100 TB this is the 4×
    embedding-store shrink every production ANN index applies before
    distance computation; dequantization is q·scale/127.

    Pure codegen array expressions (row-local, no shuffle), STAGED as
    two projections: referencing the ``scale`` expression inside the
    quantize lambda would re-run the array_max scan per ELEMENT
    (codegen CSE does not reach into HOF lambdas — the winnow/CDC
    lesson), O(d²) per row; staging ``scale`` as a column makes it
    O(d) (3.7× at sf0.1's 64-dim vectors).  All arithmetic is forced
    to DOUBLE before the divide so the floor boundary is bit-identical
    across engines (float ULP noise at the 127/scale edge would flip
    the quantized value), which is what makes the SQL oracle exact.
    A zero vector quantizes to zeros.
    """
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    staged = df.select(
        F.col(id_col), x.alias("__x"),
        F.array_max(F.transform(x, F.abs)).alias("scale"))
    q = F.when(F.col("scale") == 0,
               F.transform(F.col("__x"), lambda v: F.lit(0))).otherwise(
        F.transform(F.col("__x"),
                    lambda v: F.floor(v * 127 / F.col("scale"))
                    .cast("int")))
    return staged.select(F.col(id_col), "scale", q.alias("qvec"))


def assign_clusters(df: DataFrame, id_col: str, vec_col: str,
                    k: int = 8) -> DataFrame:
    """SemDeDup-style semantic cluster assignment (Abbas et al.,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication", 2023 — public): partition the corpus by nearest
    centroid in embedding space so near-duplicate detection can run
    WITHIN clusters instead of all-pairs.

    Centroids are the ``k`` vectors with the smallest ids — a
    deterministic seeding (kmeans++ needs RNG state and iterations;
    the downstream dedup only needs a stable space partition, not an
    optimal one).  The k centroid vectors are collected to the driver
    (bounded by construction: k rows, NOT data-sized) and embedded as
    literal arrays, so assignment is a pure per-row projection —
    argmax over k cosine expressions, ZERO shuffles, no join.  At
    100 TB this is the only shape that works: a cross-join against a
    centroid table would shuffle n·k rows for no reason.

    Ties break toward the lower centroid id.  Returns
    (id_col, cluster_id, cluster_rank ≡ 1..k preference order ranks
    are not emitted — just the argmax winner).

    k-scaling note: the literal-expression argmax costs O(k·dim)
    expression ops per row, and — unlike ``kmeans_quantized`` — this
    FLOAT cosine cannot get a bit-identical BLAS fallback (matmul
    reorders the double summation; near-tie assignments would flip
    against the sequential-sum oracle).  For large-k space partition
    use ``kmeans_quantized`` (integer distances are exact under any
    summation order, so its ``assign="blas"`` path stays
    bit-identical) — the SemDeDup pipeline already does.
    """
    rows = (df.select(id_col, vec_col).orderBy(id_col).limit(k).collect())
    cents = [(r[0], [float(x) for x in r[1]]) for r in rows]

    def lit_vec(vals):
        return F.array(*[F.lit(v) for v in vals])

    e = F.col(vec_col)
    # struct(cos, -cid) lexicographic max ≡ (cos desc, cid asc) argmax
    best = F.greatest(*[
        F.struct(cosine(e, lit_vec(v)).alias("c"),
                 F.lit(-cid).cast("long").alias("nid"))
        for cid, v in cents
    ])
    return df.select(
        F.col(id_col),
        (-best["nid"]).cast("long").alias("cluster_id"))


def kmeans_quantized(df: DataFrame, id_col: str, vec_col: str,
                     k: int = 4, iters: int = 2,
                     scale: int = 10_000,
                     keep_qvec: bool = False,
                     assign: str = "auto") -> DataFrame:
    """Distributed Lloyd's k-means over GLOBALLY quantized embeddings —
    iterative clustering whose every step is integer arithmetic, so the
    final assignment is hash-exact across engines (the float version
    cannot be: centroid means are order-of-summation dependent).

    Quantization is one deterministic float op per element
    (``floor(v·scale)`` — a single IEEE multiply, no summation), after
    which distances are integer L2² (``Σ(q−c)²``, fits int64 up to
    ~10^11 rows/cluster at scale=10^4) and centroid updates are
    elementwise ``sum // count`` floor division.  Seeding follows
    ``assign_clusters``: the k smallest ids (deterministic, no RNG).
    An emptied cluster keeps its previous centroid.

    Scale ledger per iteration: assignment never joins and never
    shuffles — the centroids ride to the data, in one of two
    equivalent forms picked by ``assign``:

    - ``"expr"``: literal-centroid argmin expressions (zero Python,
      whole-stage codegen) — Catalyst evaluates O(k·dim) expression
      ops per row, the right trade for small k;
    - ``"blas"``: the centroid matrix goes out as a Spark broadcast
      into a ``mapInPandas`` pass that computes all k distances per
      Arrow batch with one int64 matmul (|q|² − 2q·C + |c|²) and
      argmins vectorized.  The expression path's per-row cost is
      LINEAR IN k (measured: k=128 over 32k rows spends 42 of 43 s
      in assignment), so at SemDeDup-scale k (the paper runs k≈10⁵)
      only the matrix form works — same integer arithmetic, same
      (dist, lowest-cid) tie-break, bit-identical output (equality
      pytest-pinned);
    - ``"auto"`` (default): ``"expr"`` for k ≤ 8 (trivial either way,
      and literals compose into surrounding codegen), ``"blas"``
      above — measured crossover on dim-64 embeddings is below k=8
      (k=32 over 8k rows: 9.5 s expr vs 0.7 s blas).

    The update is one posexplode + groupBy(cluster, pos) whose output
    is exactly k·dim rows — collected to the driver (bounded by
    construction, the MLlib pattern) to become the next iteration's
    centroid state.

    Returns ``(id_col, cluster_id, dist_sq)`` for the final
    assignment (plus the quantized vector as ``qvec`` when
    ``keep_qvec`` — ``semdedup_prune`` reuses it so the within-cluster
    similarity pass needs no join back to the embeddings).  Reference
    analogue: none — Kafka Streams has no iterative compute at all
    (SURVEY.md §2.4); this is the Spark-side primitive SemDeDup-style
    pipelines need above ``assign_clusters``'s fixed seeding.
    """
    mode = ("blas" if k > 8 else "expr") if assign == "auto" else assign
    if mode not in ("expr", "blas"):
        raise ValueError(f"unsupported assign mode {assign!r}")

    q = _persist(df.select(
        F.col(id_col),
        F.transform(F.col(vec_col),
                    lambda v: F.floor(v.cast("double") * scale)
                    .cast("long")).alias("__qv")))

    seed_rows = q.orderBy(id_col).limit(k).collect()
    cents: dict[int, list[int]] = {
        i: list(r["__qv"]) for i, r in enumerate(seed_rows)}

    id_type = dict(q.dtypes)[id_col]

    def blas_assigned(cur_cents: dict[int, list[int]],
                      bc_out: list | None = None) -> DataFrame:
        """(id, __qv, __c, __d) via one broadcast int64 matmul per
        Arrow batch — integer-exact, ties to the lowest cid (sorted
        centroid order + argmin-first-occurrence).  The broadcast
        handle is appended to ``bc_out`` so training iterations can
        release it after their action — at SemDeDup-scale k the
        centroid matrix is ~50 MB and an unreleased copy per
        iteration would pin memory for the application lifetime
        (round-8 self-review finding)."""
        import numpy as np
        import pandas as pd

        cids = sorted(cur_cents)
        bc = q.sparkSession.sparkContext.broadcast(
            (np.array(cids, dtype=np.int64),
             np.array([cur_cents[c] for c in cids], dtype=np.int64)))
        if bc_out is not None:
            bc_out.append(bc)

        def part(batches):
            cid_arr, C = bc.value
            cn2 = np.einsum("ij,ij->i", C, C)
            for pdf in batches:
                if not len(pdf):
                    continue
                Q = np.array(pdf["__qv"].tolist(), dtype=np.int64)
                # |q−c|² = |q|² − 2·q·c + |c|² — every term int64-exact
                d = (np.einsum("ij,ij->i", Q, Q)[:, None]
                     - 2 * (Q @ C.T) + cn2[None, :])
                idx = np.argmin(d, axis=1)
                yield pd.DataFrame({
                    id_col: pdf[id_col],
                    "__qv": pdf["__qv"],
                    "__c": cid_arr[idx],
                    "__d": d[np.arange(len(idx)), idx]})

        return q.mapInPandas(
            part, schema=(f"{id_col} {id_type}, __qv array<bigint>, "
                          "__c bigint, __d bigint"))

    def lit_vec(vals):
        return F.array(*[F.lit(int(x)).cast("long") for x in vals])

    def dist_sq(cv):
        return F.aggregate(
            F.zip_with(F.col("__qv"), lit_vec(cv),
                       lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"), lambda acc, x: acc + x)

    def best_expr():
        # struct(d, cid) lexicographic min ≡ (dist asc, cid asc) argmin
        structs = [
            F.struct(dist_sq(cv).alias("d"),
                     F.lit(cid).cast("long").alias("cid"))
            for cid, cv in sorted(cents.items())]
        # F.least demands ≥2 args; k=1 is a legal degenerate call
        return structs[0] if len(structs) == 1 else F.least(*structs)

    for _ in range(max(0, iters - 1)):
        bcs: list = []
        assigned = (blas_assigned(cents, bcs) if mode == "blas"
                    else q.withColumn("__c", best_expr()["cid"]))
        upd = (assigned
               .select("__c", F.posexplode("__qv").alias("__p", "__x"))
               .groupBy("__c", "__p")
               .agg(F.expr("CAST(SUM(__x) DIV COUNT(*) AS LONG)")
                    .alias("__v"))
               .collect())  # exactly k·dim rows — bounded by construction
        for b in bcs:  # iteration's centroid copy is consumed — release
            b.unpersist(blocking=False)
        new_cents: dict[int, list[int]] = {}
        for r in upd:
            new_cents.setdefault(int(r["__c"]),
                                 [0] * len(cents[0]))[int(r["__p"])] = \
                int(r["__v"])
        cents = {cid: new_cents.get(cid, cv) for cid, cv in cents.items()}

    if mode == "blas":
        fin = blas_assigned(cents)
        extra = [F.col("__qv").alias("qvec")] if keep_qvec else []
        return fin.select(
            F.col(id_col),
            F.col("__c").alias("cluster_id"),
            F.col("__d").alias("dist_sq"),
            *extra)
    best = best_expr()
    extra = [F.col("__qv").alias("qvec")] if keep_qvec else []
    return q.select(
        F.col(id_col),
        best["cid"].alias("cluster_id"),
        best["d"].alias("dist_sq"),
        *extra)


def semdedup_prune(df: DataFrame, id_col: str, vec_col: str,
                   k: int = 4, iters: int = 2, scale: int = 10_000,
                   tau_num: int = 9, tau_den: int = 20,
                   block_rows: int = 2048,
                   assign: str = "auto") -> DataFrame:
    """SemDeDup (Abbas et al. 2023, public): k-means the embedding
    space, then mark as semantic duplicates the vectors that have a
    LOWER-id cluster-mate with cosine ≥ tau (tau = tau_num/tau_den) —
    keep-lowest-id, the paper's cluster-then-prune recipe that replaces
    corpus-wide all-pairs with within-cluster pairs.

    Every comparison is integer-exact on the globally-quantized
    vectors (``kmeans_quantized``'s ``floor(v·scale)`` longs):
    ``cos(a,b) >= tau  ≡  dot > 0  AND
    tau_den²·dot² >= tau_num²·|a|²·|b|²`` — dot and the norms fit
    int64 (≤ dim·(scale·|v|max)² ≈ 6e8 here) but their squared
    products peak ~1e20, above int64.  The prune evaluates the
    comparison in float64 with a relative margin of 1e-6 and
    re-checks every inside-margin pair in arbitrary-precision Python
    ints: float64's error on ~1e20 operands is ~2e4, nine orders
    below the margin, so no pair can be misclassified — the float
    path is a screen, the exact path is the authority (the DuckDB
    oracle runs the same inequality in HUGEINT end-to-end).

    Execution is the paper's own shape: ONE shuffle groups each
    cluster onto an executor, then a vectorized Arrow/BLAS pass
    (``applyInPandas``) computes the within-cluster Gram matrix in
    ``block_rows``-row blocks — memory per task is bounded by
    cluster_rows·dim·8 B plus block_rows·cluster_rows·8 B, the
    SemDeDup working-set model (k is the knob that bounds cluster
    size; the paper runs k≈100k on 5B embeddings for ~10^4-row
    clusters).  A join-based JVM formulation was 3-4× slower at
    sf0.1 (500k pairs through a salted self-join + per-pair
    expression dots) — pairwise dense arithmetic is BLAS's home turf,
    the same trade ``cosine_topk_blas`` measured at ~100×.

    Returns ``(id_col, cluster_id, is_dup)`` for every input row.
    """
    import pandas as pd

    assigned = kmeans_quantized(
        df, id_col, vec_col, k=k, iters=iters, scale=scale,
        keep_qvec=True, assign=assign).drop("dist_sq")
    tn2, td2 = tau_num * tau_num, tau_den * tau_den

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        q = np.array(pdf["qvec"].tolist(), dtype=np.int64)
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")
        q, ids = q[order], ids[order]
        n = len(ids)
        n2 = np.einsum("ij,ij->i", q, q)  # int64-exact row norms²
        n2f = n2.astype(np.float64)
        dup = np.zeros(n, dtype=bool)
        cols = np.arange(n)
        for s in range(0, n, block_rows):
            e = min(s + block_rows, n)
            g = q[s:e] @ q.T  # int64-exact block Gram
            gf = g.astype(np.float64)
            lhs = td2 * gf * gf
            rhs = tn2 * np.outer(n2f[s:e], n2f)
            margin = 1e-6 * np.maximum(lhs, rhs) + 1.0
            lower = cols[None, :] < np.arange(s, e)[:, None]  # j < i only
            pos = (g > 0) & lower
            sure = pos & (lhs >= rhs + margin)
            border = pos & ~sure & (lhs >= rhs - margin)
            for bi, bj in zip(*np.nonzero(border)):
                d = int(g[bi, bj])
                if td2 * d * d >= tn2 * int(n2[s + bi]) * int(n2[bj]):
                    sure[bi, bj] = True
            dup[s:e] |= sure.any(axis=1)
        return pd.DataFrame({
            id_col: ids,
            "cluster_id": pdf["cluster_id"].iloc[0],
            "is_dup": dup,
        })

    out_schema = f"{id_col} long, cluster_id long, is_dup boolean"
    return (assigned.groupBy("cluster_id")
            .applyInPandas(prune, schema=out_schema))


def rademacher_matrix(out_dim: int, in_dim: int, seed: int = 11) -> list[list[int]]:
    """Frozen ±1 projection matrix (Rademacher rows), deterministic in
    ``seed`` — embedded as literals on BOTH the Spark side and the
    DuckDB oracle so the projection replays bit-for-bit."""
    rng = random.Random(seed)
    return [[rng.choice((-1, 1)) for _ in range(in_dim)]
            for _ in range(out_dim)]


def random_project(df: DataFrame, id_col: str, vec_col: str,
                   out_dim: int = 16, seed: int = 11) -> DataFrame:
    """Signed random projection (Achlioptas'01 / Johnson-Lindenstrauss
    with ±1 entries — public): reduce ``vec_col`` to ``out_dim``
    integer components ``y_j = Σ_i sign[j][i] · q_i`` over the int8-
    quantized vector.  The JL lemma preserves pairwise distances to
    1±ε at out_dim = O(log n / ε²); with ±1 entries the arithmetic is
    INTEGER-exact end to end (|y_j| ≤ 127·in_dim — far inside int64),
    so the reduced vectors are cross-engine reproducible, unlike any
    float Gaussian matrix.

    At 100 TB this is the standard pre-ANN shrink: 64-dim float32 →
    16-dim int64 cuts the vector bytes the ANN index shuffles/stores
    ~4× while keeping neighbor ranks (the brute-force / IVF / LSH
    paths all accept the projected column as-is).  Row-local codegen
    (one zip_with dot per output component), zero shuffles, zero UDFs.

    Reference analogue: none (SURVEY.md §2 has no vector surface) —
    beyond-parity machinery beside quantize_int8.

    Returns (id, scale, yvec: array<long>).
    """
    q = quantize_int8(df, id_col, vec_col)
    signs = rademacher_matrix(out_dim, _vec_dim(df, vec_col), seed)
    comps = [
        F.aggregate(
            F.zip_with(F.col("qvec"),
                       F.array(*[F.lit(s) for s in row]),
                       lambda a, b: a.cast("long") * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        for row in signs
    ]
    return q.select(F.col(id_col), F.col("scale"),
                    F.array(*comps).alias("yvec"))


def _vec_dim(df: DataFrame, vec_col: str) -> int:
    """Vector width from the first row — metadata-sized action (one
    row), used only to size the frozen literal matrix."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None:
        raise ValueError("empty input — cannot infer vector dim")
    return row["d"]


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al., "Product Quantization for Nearest
# Neighbor Search", TPAMI 2011 — public): split each embedding into m
# subvectors, k-means each subspace independently, store each vector as m
# small codes.  The memory-bounded ANN compression: a dim-64 float vector
# becomes m=4 bytes, and query scoring needs only the codes plus an m×k
# distance table per probe.  Everything below rides the repo's integer
# k-means (floor(v·scale) quantization, integer L2², floor-division
# centroid means), so codes and ADC scores are hash-exact cross-engine.
# ---------------------------------------------------------------------------


def _pq_subv(j: int, sub: int) -> Column:
    return F.slice(F.col("__qv"), j * sub + 1, sub)


def _pq_assigned(q: DataFrame, id_col: str,
                 cents: dict[int, dict[int, list[int]]],
                 m: int, sub: int, mode: str,
                 bc_out: list | None = None) -> DataFrame:
    """``(id, __qv, __c0..__c{m-1})`` — every subspace's argmin code
    in ONE pass over the quantized frame, by either engine:

    - ``expr``: literal-centroid argmin expressions (whole-stage
      codegen, zero Python) — O(m·k·sub) ≡ O(k·dim) expression ops
      per row, the right trade for small k;
    - ``blas``: the m centroid matrices go out as one Spark broadcast
      into a ``mapInPandas`` pass computing every subspace's distances
      per Arrow batch with int64 matmuls (|q|² − 2·q·C + |c|², each
      term exact) and vectorized argmins — per-row cost amortized by
      BLAS, the only regime that works at PQ-typical k=256.  Sorted
      centroid order + argmin-first-occurrence reproduces the expr
      path's (dist, lowest-cid) tie-break, so the two modes are
      bit-identical (pytest-pinned).
    """
    if mode == "expr":
        def lit_vec(vals):
            return F.array(*[F.lit(int(x)).cast("long") for x in vals])

        def dist_sq(j, cv):
            return F.aggregate(
                F.zip_with(_pq_subv(j, sub), lit_vec(cv),
                           lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("long"), lambda acc, x: acc + x)

        def best(j):
            structs = [
                F.struct(dist_sq(j, cv).alias("d"),
                         F.lit(cid).cast("long").alias("cid"))
                for cid, cv in sorted(cents[j].items())]
            return structs[0] if len(structs) == 1 else F.least(*structs)

        return q.select(
            F.col(id_col), "__qv",
            *[best(j)["cid"].alias(f"__c{j}") for j in range(m)])

    import numpy as np
    import pandas as pd

    id_type = dict(q.dtypes)[id_col]
    mats = []
    for j in range(m):
        cids = sorted(cents[j])
        mats.append((np.array(cids, dtype=np.int64),
                     np.array([cents[j][c] for c in cids],
                              dtype=np.int64)))
    bc = q.sparkSession.sparkContext.broadcast(mats)
    if bc_out is not None:
        bc_out.append(bc)

    def part(batches):
        tabs = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            Q = np.array(pdf["__qv"].tolist(), dtype=np.int64)
            out = {id_col: pdf[id_col], "__qv": pdf["__qv"]}
            for j, (cid_arr, C) in enumerate(tabs):
                Qj = Q[:, j * sub:(j + 1) * sub]
                d = (np.einsum("ij,ij->i", Qj, Qj)[:, None]
                     - 2 * (Qj @ C.T)
                     + np.einsum("ij,ij->i", C, C)[None, :])
                out[f"__c{j}"] = cid_arr[np.argmin(d, axis=1)]
            yield pd.DataFrame(out)

    schema = (f"{id_col} {id_type}, __qv array<bigint>, "
              + ", ".join(f"__c{j} bigint" for j in range(m)))
    return q.mapInPandas(part, schema=schema)


def _pq_train(q: DataFrame, id_col: str, m: int, sub: int, k: int,
              iters: int, mode: str) -> dict[int, dict[int, list[int]]]:
    """Per-subspace integer k-means codebooks over the pre-quantized
    ``__qv`` frame.  Seeding mirrors ``kmeans_quantized``: the k
    smallest ids seed every subspace (one bounded k-row collect total).
    Each refinement iteration is ONE corpus scan: all m subspace
    assignments come from ``_pq_assigned`` (zero joins, zero pre-agg
    shuffles), and the centroid update explodes (subspace, code,
    position) with map-side partial sums — exactly m·k·sub rows
    collected (bounded by construction).  Empty clusters keep their
    previous centroid."""
    seed_rows = q.orderBy(id_col).limit(k).collect()
    if len(seed_rows) < k:
        raise ValueError(f"need at least k={k} rows to seed codebooks")
    cents: dict[int, dict[int, list[int]]] = {
        j: {c: list(seed_rows[c]["__qv"])[j * sub:(j + 1) * sub]
            for c in range(k)}
        for j in range(m)}

    for _ in range(max(0, iters - 1)):
        bcs: list = []
        assigned = _pq_assigned(q, id_col, cents, m, sub, mode, bcs)
        entries = F.array(*[
            F.struct(F.lit(j).alias("j"), F.col(f"__c{j}").alias("c"),
                     _pq_subv(j, sub).alias("sv"))
            for j in range(m)])
        upd = (assigned
               .select(F.explode(entries).alias("e"))
               .select("e.j", "e.c", F.posexplode("e.sv")
                       .alias("p", "x"))
               .groupBy("j", "c", "p")
               .agg(F.expr("CAST(SUM(x) DIV COUNT(*) AS LONG)")
                    .alias("v"))
               .collect())  # ≤ m·k·sub rows — bounded by construction
        for b in bcs:  # iteration's codebook copy is consumed — release
            b.unpersist(blocking=False)
        new: dict[int, dict[int, list[int]]] = {}
        for r in upd:
            new.setdefault(int(r["j"]), {}).setdefault(
                int(r["c"]), [0] * sub)[int(r["p"])] = int(r["v"])
        cents = {j: {c: new.get(j, {}).get(c, cv)
                     for c, cv in cents[j].items()}
                 for j in range(m)}
    return cents


def _pq_quantize(df: DataFrame, id_col: str, vec_col: str,
                 scale: int) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.transform(F.col(vec_col),
                    lambda v: F.floor(v.cast("double") * scale)
                    .cast("long")).alias("__qv"))


def _pq_mode(k: int, assign: str, m: int = 4) -> str:
    # auto: the expr path compiles m·k argmin struct expressions, so
    # the switch is on the PRODUCT, not k alone — measured at sf0.1
    # (2k rows, dim 64, m=4, iters=2): expr 8.3/10.2/18.8 s at
    # k=8/16/32 (linear in m·k, codegen-compile dominated) vs blas
    # 2.6/0.9/0.9 s.  r15 re-measure at m·k=16 (the registered
    # embedding_pq_codes / ivf_pq shape): expr 2.24 s vs blas 0.66 s
    # (pq_encode), 4.7 vs 2.5 s (ivf_pq_topk) — blas wins everywhere
    # above trivial m·k, and its per-row cost is the BLAS matmul vs
    # O(m·k·sub) interpreted ops, so the crossover only moves DOWN at
    # scale.  The two modes are bit-identical (pytest-pinned).
    mode = ("blas" if m * k > 8 else "expr") if assign == "auto" else assign
    if mode not in ("expr", "blas"):
        raise ValueError(f"unsupported assign mode {assign!r}")
    if mode == "expr" and k > 64:
        raise ValueError(
            f"k={k} exceeds the literal-expression regime (64); use "
            "assign='blas' (or 'auto')")
    return mode


def _pq_codes_frame(q: DataFrame, id_col: str,
                    cents: dict[int, dict[int, list[int]]],
                    m: int, sub: int, mode: str) -> DataFrame:
    """(id, codes array<int>) from trained codebooks."""
    a = _pq_assigned(q, id_col, cents, m, sub, mode)
    return a.select(
        F.col(id_col),
        F.array(*[F.col(f"__c{j}").cast("int") for j in range(m)])
        .alias("codes"))


def pq_encode(df: DataFrame, id_col: str, vec_col: str,
              m: int = 4, k: int = 4, iters: int = 2,
              scale: int = 10_000, assign: str = "auto") -> DataFrame:
    """PQ-encode embeddings: ``(id, codes array<int> of length m)``.

    Classic product quantization (Jégou et al. 2011) on the repo's
    integer k-means: quantize once globally (``floor(v·scale)``),
    train an independent k-centroid codebook per dim/m-wide subspace
    (``_pq_train`` — one scan per iteration for ALL subspaces), then
    emit each vector's per-subspace argmin code.  A dim-64 float
    vector compresses to m codes — the 100 TB ANN store: scoring
    needs the codes and an m×k table per probe, never the vectors.

    Integer arithmetic end to end ⇒ codes replay bit-exactly in the
    SQL oracle (the float version cannot: centroid means are
    summation-order dependent).  ``assign`` picks the per-row argmin
    engine — ``expr`` literal expressions (small k, whole-stage
    codegen) or ``blas`` broadcast int64 matmuls per Arrow batch
    (PQ-typical k=256; bit-identical tie-breaks, pytest-pinned);
    ``auto`` switches at m·k > 32 (the expr path compiles m·k argmin
    structs — the product, not k, is the cost).

    Reference analogue: none (SURVEY.md §2 — no vector compute);
    beyond-parity ANN machinery.
    """
    dim = _vec_dim(df, vec_col)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    mode = _pq_mode(k, assign, m)
    q = _persist(_pq_quantize(df, id_col, vec_col, scale))
    cents = _pq_train(q, id_col, m, sub, k, iters, mode)
    return _pq_codes_frame(q, id_col, cents, m, sub, mode)


def pq_topk(df: DataFrame, id_col: str, vec_col: str,
            probes: DataFrame, n: int = 3,
            m: int = 4, k: int = 4, iters: int = 2,
            scale: int = 10_000,
            max_probes: int = 64, assign: str = "auto") -> DataFrame:
    """Asymmetric-distance (ADC) top-``n`` over PQ codes: for each
    probe, score every vector as ``Σ_j T_j[code_j]`` where ``T_j`` is
    the probe's integer distance table to subspace ``j``'s codebook —
    the vectors themselves are never touched at query time, only the
    m-byte codes.  Output ``(id, neighbor_id, rank, adc_dist)``; ties
    break toward the lower neighbor id; the probe itself is excluded.

    The probe set is bounded (``max_probes`` guard, same contract as
    the BLAS paths): each probe's m×k table is computed driver-side
    in exact integer arithmetic and embedded as literal arrays, so
    scoring is a pure row-local projection over the codes frame —
    zero joins before the per-probe top-n window.

    ADC is an approximation of true distance (quantization error);
    the pytest pins exact agreement with a python PQ model (probes
    excluded before ranking, as in cosine_topk, so ranks 1..n are
    contiguous).  Unlike the BLAS paths' 100k probe cap, each probe
    here adds an m×k LITERAL table to the plan — the cap is small.
    """
    dim = _vec_dim(df, vec_col)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    mode = _pq_mode(k, assign, m)
    q = _persist(_pq_quantize(df, id_col, vec_col, scale))
    cents = _pq_train(q, id_col, m, sub, k, iters, mode)
    codes = _pq_codes_frame(q, id_col, cents, m, sub, mode)

    probe_pdf = (probes.select(id_col, vec_col)
                 .limit(max_probes + 1).toPandas())
    if len(probe_pdf) > max_probes:
        raise ValueError(
            f"probe set exceeds max_probes={max_probes}: ADC embeds "
            "one m×k literal table per probe; bound the probe frame")
    import math
    tables = []  # (probe_id, [m][k] int table)
    for _, prow in probe_pdf.iterrows():
        qv = [math.floor(float(v) * scale) for v in prow[vec_col]]
        t = [[sum((qv[j * sub + p] - cv[p]) ** 2 for p in range(sub))
              for _, cv in sorted(cents[j].items())]
             for j in range(m)]
        tables.append((prow[id_col], t))

    def adc(t) -> Column:
        return sum(
            (F.element_at(F.array(*[F.lit(int(x)).cast("long")
                                    for x in t[j]]),
                          F.element_at("codes", j + 1) + 1)
             for j in range(m)),
            start=F.lit(0).cast("long"))

    id_type = dict(df.dtypes)[id_col]
    scored = codes.select(
        F.col(id_col).alias("neighbor_id"),
        F.explode(F.array(*[
            F.struct(F.lit(pid).cast(id_type).alias("pid"),
                     adc(t).alias("d"))
            for pid, t in tables])).alias("e"))
    w = Window.partitionBy("e.pid").orderBy(
        F.col("e.d").asc(), F.col("neighbor_id").asc())
    return (scored
            .filter(F.col("e.pid") != F.col("neighbor_id"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= n)
            .select(F.col("e.pid").alias(id_col), "neighbor_id",
                    "rank", F.col("e.d").alias("adc_dist")))


def ivf_pq_topk(df: DataFrame, id_col: str, vec_col: str,
                probes: DataFrame, n: int = 3,
                centroid_stride: int = 25, nprobe: int = 4,
                m: int = 4, k: int = 4, iters: int = 2,
                scale: int = 10_000,
                max_probes: int = 64, assign: str = "auto") -> DataFrame:
    """IVF-PQ — the production ANN composite (round 11; Jégou et al.
    2011's IVFADC): the IVF coarse quantizer SHORTLISTS (each probe
    scores only the vectors assigned to its ``nprobe`` nearest
    centroids' inverted lists), and ADC over PQ codes SCORES the
    shortlist (the raw vectors are never touched at query time).
    Where ``ivf_topk`` re-reads candidate vectors for exact cosine and
    ``pq_topk`` ADC-scans the WHOLE index per probe, the composite
    pays neither: per probe the work is |probed lists| code rows ×
    m table lookups.

    Output ``(id_col, neighbor_id, rank, adc_dist)`` — ascending ADC
    distance, ties to the lower neighbor id, the probe itself
    excluded.  Coarse centroids are the deterministic every-
    ``centroid_stride``-th vector (replayable; swap trained centroids
    at scale); codebooks/codes are the integer-exact PQ machinery
    shared with ``pq_encode``/``pq_topk``.

    Plan shape at 100 TB: centroids broadcast (assignment shuffles
    ONE (id, cid) row per indexed vector); codes are one bounded
    projection pass; the candidate join shuffles on centroid id
    (list sizes bound the work, the LSH-bucket skew profile); ADC
    tables are driver-computed exact integers embedded as literal
    MAPs keyed by probe id, so scoring is row-local codegen after
    the candidate-codes hash join; one per-probe top-n window over
    candidate-sized input."""
    if n < 1:
        raise ValueError("n must be >= 1")
    if nprobe < 1:
        raise ValueError("nprobe must be >= 1")
    dim = _vec_dim(df, vec_col)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    mode = _pq_mode(k, assign, m)

    # --- IVF coarse structure (the ivf_topk recipe; norms staged and
    # the index scan widened exactly as there — bit-identical floats,
    # one HOF per pair instead of three, scoring cluster-wide) ---
    cent = F.broadcast(
        df.filter(F.col(id_col) % centroid_stride == 0)
        .select(F.col(id_col).alias("_cid"),
                F.col(vec_col).alias("_cvec"),
                norm(F.col(vec_col)).alias("_cn")))
    vecs = df.select(F.col(id_col), F.col(vec_col))
    aw = Window.partitionBy(id_col).orderBy(F.col("_ccos").desc(),
                                            F.col("_cid"))
    staged_cos = (dot(F.col(vec_col), F.col("_cvec"))
                  / (F.col("_vn") * F.col("_cn")))
    assigned = (_widen(vecs).withColumn("_vn", norm(F.col(vec_col)))
                .join(cent)
                .withColumn("_ccos", staged_cos)
                .withColumn("_r", F.row_number().over(aw))
                .filter(F.col("_r") == 1)
                .select(F.col(id_col).alias("_nid"), "_cid"))
    plists = (probes.select(F.col(id_col), F.col(vec_col))
              .withColumn("_vn", norm(F.col(vec_col)))
              .join(cent)
              .withColumn("_ccos", staged_cos)
              .withColumn("_r", F.row_number().over(aw))
              .filter(F.col("_r") <= nprobe)
              .select(F.col(id_col).alias("_pid"), "_cid"))
    cand = (plists.join(assigned, "_cid")
            .filter(F.col("_pid") != F.col("_nid"))
            .select("_pid", "_nid"))

    # --- PQ codes over the index (shared machinery) ---
    q = _persist(_pq_quantize(df, id_col, vec_col, scale))
    cents = _pq_train(q, id_col, m, sub, k, iters, mode)
    codes = _pq_codes_frame(q, id_col, cents, m, sub, mode)

    # --- per-probe exact-integer ADC tables as literal maps ---
    probe_pdf = (probes.select(id_col, vec_col)
                 .limit(max_probes + 1).toPandas())
    if len(probe_pdf) > max_probes:
        raise ValueError(
            f"probe set exceeds max_probes={max_probes}: ADC embeds "
            "one m×k literal table per probe; bound the probe frame")
    import math
    id_type = dict(df.dtypes)[id_col]
    maps = []
    entries: list[list] = [[] for _ in range(m)]
    for _, prow in probe_pdf.iterrows():
        qv = [math.floor(float(v) * scale) for v in prow[vec_col]]
        for j in range(m):
            t = [sum((qv[j * sub + p] - cv[p]) ** 2 for p in range(sub))
                 for _, cv in sorted(cents[j].items())]
            entries[j] += [F.lit(prow[id_col]).cast(id_type),
                           F.array(*[F.lit(int(x)).cast("long")
                                     for x in t])]
    for j in range(m):
        maps.append(F.create_map(*entries[j]))

    joined = cand.join(
        codes.select(F.col(id_col).alias("_nid"), "codes"), "_nid")
    d = sum(
        (F.element_at(F.element_at(maps[j], F.col("_pid")),
                      F.element_at("codes", j + 1) + 1)
         for j in range(m)),
        start=F.lit(0).cast("long"))
    w = Window.partitionBy("_pid").orderBy(F.col("_d").asc(),
                                           F.col("_nid").asc())
    return (joined.withColumn("_d", d)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= n)
            .select(F.col("_pid").alias(id_col),
                    F.col("_nid").alias("neighbor_id"),
                    "rank", F.col("_d").alias("adc_dist")))


def ivf_pq_rerank(df: DataFrame, id_col: str, vec_col: str,
                  probes: DataFrame, n: int = 3, refine: int = 4,
                  centroid_stride: int = 25, nprobe: int = 4,
                  m: int = 4, k: int = 4, iters: int = 2,
                  scale: int = 10_000,
                  max_probes: int = 64,
                  assign: str = "auto") -> DataFrame:
    """IVFADC+R — re-ranked IVF-PQ (round 12; Jégou et al. 2011 §VI's
    refinement stage): ``ivf_pq_topk`` shortlists the top ``n·refine``
    candidates per probe by approximate ADC distance, then ONLY those
    candidates are re-scored with the EXACT squared L2 distance on the
    quantized integer grid (``floor(v·scale)`` per coordinate — the
    same grid the PQ pipeline trains on, so the replay is
    integer-exact) and the top ``n`` by exact distance are kept.
    This recovers most of the recall ADC quantization loses while
    touching raw vectors for only ``n·refine`` candidates per probe —
    never the index.

    Output ``(id_col, neighbor_id, rank, dist2)`` — ascending exact
    quantized squared L2, ties to the lower neighbor id, the probe
    itself excluded (already excluded by the shortlist).

    Plan shape at 100 TB: everything ivf_pq_topk does (broadcast
    centroids, one (id,cid) assignment exchange, candidate hash join
    on list id, row-local ADC, per-probe top-n·refine window), plus:
    ONE hash join of the ≤ max_probes·n·refine-row shortlist against
    the quantized index projection (Spark broadcasts the tiny
    shortlist side), one ≤ max_probes-row broadcast of the probe
    vectors, a row-local zip_with/aggregate fold for the exact
    distance, and one per-probe top-n window over shortlist-sized
    input.  Nothing data-sized is sorted or re-shuffled for the
    refinement.

    Reference analogue: none (SURVEY.md §2 — no vector search);
    beyond-parity ANN machinery completing the IVF family
    (ivf_topk → exact cosine re-read; pq_topk → full-scan ADC;
    ivf_pq_topk → shortlisted ADC; ivf_pq_rerank → shortlisted ADC +
    exact refinement).
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    if refine < 1:
        raise ValueError("refine must be >= 1")
    short = ivf_pq_topk(df, id_col, vec_col, probes, n=n * refine,
                        centroid_stride=centroid_stride, nprobe=nprobe,
                        m=m, k=k, iters=iters, scale=scale,
                        max_probes=max_probes, assign=assign)
    nb = _pq_quantize(df, id_col, vec_col, scale).select(
        F.col(id_col).alias("neighbor_id"), F.col("__qv").alias("__qb"))
    pr = F.broadcast(
        _pq_quantize(probes.select(id_col, vec_col), id_col, vec_col,
                     scale)
        .select(F.col(id_col), F.col("__qv").alias("__qa")))
    j = (short.select(id_col, "neighbor_id")
         .join(nb, "neighbor_id").join(pr, id_col))
    dist2 = F.aggregate(
        F.zip_with("__qa", "__qb", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    w = Window.partitionBy(id_col).orderBy(
        F.col("dist2").asc(), F.col("neighbor_id").asc())
    return (j.withColumn("dist2", dist2)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= n)
            .select(id_col, "neighbor_id", "rank", "dist2"))
