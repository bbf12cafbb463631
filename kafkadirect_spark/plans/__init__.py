from kafkadirect_spark.plans.queries import ORACLE_SQL, QUERIES
from kafkadirect_spark.plans import llm_queries  # noqa: F401  (registers into QUERIES)
from kafkadirect_spark.plans import curation_queries  # noqa: F401  (registers into QUERIES)
from kafkadirect_spark.plans import analytics_queries  # noqa: F401  (registers into QUERIES)

# ---------------------------------------------------------------------------
# Registration-order rotation.
#
# The driver's correctness gate samples the first 50 registered queries, so
# a fixed registration order would leave the same tail permanently outside
# its hard evidence window.  Rotate: queries that have never had a driver
# CORRECTNESS row (the similarity/ANN, curation, winnowing and multimodal
# tail of rounds 1-3) are promoted to the front; the long-green core
# operators move behind them.  Done in place so every importer —
# ``plans.QUERIES``, ``plans.queries.QUERIES``, ``__spark_entry__`` — sees
# the same order.
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# REGISTRATION-BUDGET POLICY (VERDICT r8 item 3, standing).  The driver
# verifies exactly 50 queries per round, so every registered query costs
# a recurring slice of that budget forever: at N registered queries the
# staleness horizon is ceil(N/50)-1 rounds (the tripwire's capacity
# bound), and past N=200 it degrades to 4 — every window 100% mandatory,
# zero slack for re-checking changed queries.  Therefore: (a) net
# registration growth is capped at ~10 queries/round; (b) a new OPERATOR
# lands under pytest goldens first and is registered only if it earns a
# driver-verified claim the existing surface doesn't already make;
# (c) near-duplicate query shapes should be consolidated or retired
# rather than accumulated.
#
# r12 adds the SIX registrations pre-scheduled by the r11 plan (all
# with oracle generators pytest-pinned engine==oracle last round):
# wordpiece_eval (wordpiece.eval_oracle_sql — the third tokenizer
# family driven through the tokeval consumer contract, VERDICT r11
# items 2+5 in one row), dedup_edit_verified
# (dedup.edit_verify_oracle_sql over the registered simhash pairs'
# own oracle SQL), vocab_coverage (curation.vocab_coverage_oracle_sql
# — the deliberately-naive rank-every-word replay), similarity_ivf_pq
# (analytics_queries.ivf_pq_oracle_sql + the test_plans._BNLJ_OK
# entry its IVF centroid broadcast needs), sax_nearest
# (timeseries.sax_nearest_oracle_sql), sample_weighted
# (curation.sample_weighted_oracle_sql) — and RETIRES SIX
# near-duplicate shapes under item c (VERDICT r11 item 3 named three;
# three more fall to the same global-vs-grouped subsumption test),
# each with a carried-claim note at its old registration site:
# similarity_pq_adc (→ similarity_ivf_pq, whose IVFADC composite
# scores the same ADC tables; codes stay checked via
# embedding_pq_codes), text_stats (→ text_quality + corpus_stats),
# windowed_sum_tumbling (→ windowed_count_tumbling +
# windowed_avg_hopping), distinct_orders_hll
# (→ distinct_users_by_type_hll + rolling_distinct_hll),
# sample_exact_count (→ sample_exact_per_group + sample_weighted),
# value_decile_buckets (→ value_decile_by_type).  Every retired
# OPERATOR stays in the library with its pytest goldens; the two
# retired queries that back fingerprint-pinned bench suites
# (distinct_orders_hll, value_decile_buckets) keep their functions,
# unregistered, and bench.py calls them directly.  N = 155
# (155 + 6 − 6); horizon stays 3.
#
# PAYDOWN MATH, recomputed honestly (supersedes the r11 note's
# "retiring to <= 150 becomes legal after r12"): tightening to
# horizon 2 (N <= 150) requires EVERY query outside the window to
# have a row newer than upcoming−2 — i.e. the trailing pools older
# than one round must fit inside the 50-slot window.  With pools at
# ~50/49/48 that is false at r13 (8 r9 + 48 r10 = 56 > 50) and stays
# false while three trailing pools exist.  The only glide path: hold
# N at 151-155 and drain the oldest pool each round (r13: 8 r9-dated
# mandatory + 42 r10 fill → 6 r10 left; r14: 6 r10 + 44 r11 → 5 r11
# left; r15: 5 r11 + 45 r12 → 5 r12 left), then at r16 retire the
# ~5 stragglers to reach N = 150 = two clean pools — at which point
# horizon 2 holds but EVERY window is 100% mandatory forever (zero
# slots for new registrations without re-crossing 151).  Decision
# standing until a verdict overrides it: stay at N ≈ 155 / horizon 3,
# which keeps ~6-17 free slots per round for new oracle-ready
# operators — the slack IS the feature, not debt.
# ---------------------------------------------------------------------------

_PROMOTED = [
    # Round-12 window.  Two admission rules (VERDICT r4, standing):
    # (1) every query whose newest driver CORRECTNESS row would
    #     otherwise fall past the capacity horizon — enforced by
    #     tests/test_plans.py's rotation-staleness sweep;
    # (2) every query whose implementation or oracle CHANGED this
    #     round stays inside the sampled window so the driver, not
    #     just the local checker, re-verifies the new behavior.
    #
    # -- rule 1, mandatory: the r8-dated cohort the r11 tripwire
    #    named verbatim (13 names, minus the two of them retired
    #    this round under policy item c: similarity_pq_adc,
    #    text_stats) --
    "small_quantity_revenue",
    "supplier_pagerank",
    "supplier_part_variety",
    "surprisal_bigram",
    "table_to_stream_count",
    "temperature_mix",
    "text_langid",
    "token_budget_select",
    "top_supplier",
    "volume_shipping",
    "zorder_events",
    # -- new in round 12 (the pre-scheduled registrations; never
    #    driver-verified, so they front).  Rule 2 note: no library
    #    code path of any already-registered query changed this
    #    round — dedup_simhash_pairs' oracle moved to the shared
    #    _SIMHASH_PAIRS_ORACLE variable but its SQL text is
    #    byte-identical (asserted by test_plans'
    #    test_simhash_oracle_shared_text) --
    "dedup_edit_verified",
    "sample_weighted",
    "sax_nearest",
    "similarity_ivf_pq",
    "vocab_coverage",
    "wordpiece_eval",
    # -- fill: the 33 alphabetically-first of the 41 surviving
    #    r9-dated queries (newest driver row r9 — legal outside the
    #    window this round, mandatory at r13; scheduling the oldest
    #    now keeps r13's mandatory front to the 8 leftovers
    #    retention_cohorts..vocab_drift) --
    "asof_enrich",
    "bm25_search",
    "boilerplate_flag",
    "bpe_merges",
    "collocations_topk",
    "corpus_curation",
    "corpus_mix_upsample",
    "decontaminate_bloom",
    "dedup_containment_anti",
    "dedup_embedding_cosine",
    "dedup_keep_longest",
    "doc_fingerprint",
    "embedding_pq_codes",
    "embedding_profile",
    "event_funnel",
    "event_gaps",
    "events_skew_report",
    "forecast_revenue",
    "global_shuffle",
    "heavy_hitters_cms",
    "important_part_stock",
    "join_explosion_check",
    "kmeans_clusters",
    "large_order_customers",
    "late_shipment_priority",
    "length_weighted_sample",
    "local_supplier_volume",
    "multimodal_meta",
    "partition_diff",
    "pii_redaction",
    "priority_returned_orders",
    "promotable_suppliers",
    "range_bucket_join",
]

# No over-subscription this round: the six new registrations all fit
# inside the window alongside the 11 mandatory rotations, and the 33
# fill slots hold r9-dated rotation.  (The tripwire keeps this list
# honest: a name may sit here ONLY while it is registered, has no
# driver row yet, and every window slot is occupied by a mandatory
# rotation or another never-verified query.)
#
# r13 plan (so the next window is predictable): mandatory front = the
# 8 r9-dated leftovers (retention_cohorts, rolling_distinct_hll,
# sample_split, sample_stratified, value_decile_by_type,
# value_ohlc_daily, value_outliers_mad, vocab_drift); candidate
# registrations (landed library-level THIS round per policy item b,
# each with its oracle generator already pytest-pinned
# engine==oracle): a `similarity_ivf_pq_rerank` IVFADC+R query
# (analytics_queries.ivf_pq_rerank_oracle_sql — needs its own
# test_plans._BNLJ_OK entry, same rationale as similarity_ivf_pq), a
# `sample_weighted_group` stratified-mixing query
# (curation.sample_weighted_per_group_oracle_sql), a
# `contamination_report` eval-leakage audit
# (curation.contamination_report_oracle_sql), and the two REAL-codec
# media queries whose oracles replay synthesis + feature math so a
# green row proves the container round-trip itself —
# `media_audio_features` (multimodal.synth_audio_features_oracle_sql;
# WAV PCM16) and `media_image_features`
# (multimodal.synth_image_features_oracle_sql; P5 or 24-bit BMP) —
# pick ≤ the ~10/round budget, balanced 1:1 by item-c retirements to
# hold N ≈ 155 (see the paydown-math note above — do NOT retire
# below 151 without re-running that math); retirement candidates by
# the same global-vs-grouped / subsumption test: `bpe_chunks` vs
# `windowed_chunks`+`unigram_chunk` (three chunking shapes, keep
# two), `dedup_exact` vs `dedup_spans` (span subsumes whole-doc at
# the same hash machinery), `join_stream_table_left` vs
# `join_stream_table` (the interval family already consolidated
# left into inner+outer).  Fill = the oldest r10-dated tail (~42 of
# the 48-query r10 pool), leaving ~6 r10 leftovers as r14's
# mandatory front.
#
# Late-r12 additions to the r13/r14 candidate pool (landed
# library-level with pytest-pinned oracle generators; pick from the
# combined pool by the same budget): `dedup_exactsubstr`
# (dedup.exactsubstr_oracle_sql — the alignment-free Lee et al.
# ExactSubstr recipe; natural 1:1 retirement partner `dedup_spans`,
# whose chunk-aligned claim it strictly subsumes at the same hash
# machinery), `kmv_slice_matrix` (sketch.kmv_group_jaccard_oracle_sql
# — needs a _BNLJ_OK entry for the |slices|-bounded broadcast pair
# join), and `hybrid_rrf`
# (retrieval.hybrid_rank_rrf_oracle_sql — needs a _GLOBAL_WINDOW_OK
# entry for the ≤topn-row lexical rank window; composes the
# registered bm25_search's oracle machinery verbatim).  Behavioral
# analytics over events (functions/behavior.py, both
# engine==oracle-pinned on the real table): `funnel_steps` (ordered
# min-ts cascade, zero windows — plan-tested) and `path_topk` (one
# user-partitioned lead window + TakeOrdered; needs a
# _GLOBAL_WINDOW_OK entry for the ≤k-row rank window).  Graph:
# `graph_triangles` (graph.triangle_stats_oracle_sql over a
# candidate-pair SELECT — register it over the SELECTIVE
# dedup_minhash_lsh pair surface, composing that query's oracle as
# the edge CTE; the simhash band graph is 2.4M edges at sf0.1 on
# this corpus and its wedge join would own the driver's wall).
# Mixing: `token_waterfill` (curation.token_waterfill_oracle_sql —
# max-min fair integer budget allocation over per-stratum totals;
# needs _GLOBAL_WINDOW_OK entries for the |strata|-row rank/prefix
# windows, the same bounded-offsets envelope as sample_weighted).
# Ingest: `dedup_exactsubstr_incr`
# (dedup.exactsubstr_incremental_oracle_sql, every-5th-doc split) —
# register it OR `dedup_exactsubstr` first, not both in one window
# (same machinery; the incremental adds the index-membership claim
# and its union-equivalence test already pins the shared half).
# Multimodal near-dup: `media_phash_pairs`
# (multimodal.synth_phash_pairs_oracle_sql — synthesis → real raster
# decode → aHash → band buckets → Hamming, all SQL-replayed; a green
# row proves the container round-trip AND the perceptual pipeline).
# Register with max_hamming=1 or emit groupBy(hamming).count() —
# measured pair counts at 5k ids: ≤2 → 42.7k rows (too fat for the
# driver's pandas compare), ≤1 keeps it modest.
#
# Per-node closure: `graph_local_clustering`
# (graph.local_clustering_oracle_sql over a candidate-pair SELECT —
# same LSH-surface advice as graph_triangles; per-node rows are the
# keep-best signal, the global census the corpus report — register
# at most one of the two per window).
# Order statistics: `weighted_quantiles`
# (sketch.weighted_quantiles_oracle_sql — token-weighted n_chars
# quantiles; the exact_quantiles recursion with weight mass, same
# register-sized ledger, no plan-lint caveats) and its grouped twin
# `weighted_quantiles_by_lang`
# (sketch.weighted_quantiles_grouped_oracle_sql — register at most
# one of the two per window, same global-vs-grouped rule as the
# decile family).
#
# Suggested r13 pick (14 candidates > ~10-slot budget; chosen for
# claim diversity — one per new family, defer the rest to r14):
# similarity_ivf_pq_rerank, contamination_report,
# sample_weighted_group, media_image_features, media_phash_pairs,
# dedup_exactsubstr (retiring dedup_spans 1:1), hybrid_rrf,
# funnel_steps, kmv_slice_matrix, token_waterfill — deferring
# media_audio_features (same codec-proof claim shape as image),
# path_topk (same events-sequence family as funnel_steps),
# graph_triangles and dedup_exactsubstr_incr to r14.  Retirement
# candidates stay as listed above; hold N ≈ 155.
_DEFERRED_NEW: list[str] = []


def _rotate_front(d: dict, front: list[str]) -> None:
    ordered = [k for k in front if k in d] + [k for k in d if k not in front]
    items = {k: d[k] for k in ordered}
    d.clear()
    d.update(items)


def _check_promoted_registered(front: list[str], registered) -> None:
    """Every promoted name must resolve to a REGISTERED query: r7's
    window silently lost two entries ("new" queries that were never
    registered) because _rotate_front's `if k in d` filter tolerated
    phantoms — a typo here would leave the intended query outside the
    driver's hard-evidence window while the comment claims it's in.
    Fail loudly at import instead.  (ORACLE_SQL is allowed to be a
    subset: queries without a SQL-expressible oracle get the driver's
    rows-only check.)"""
    unknown = set(front) - set(registered)
    if unknown:
        raise LookupError(
            f"_PROMOTED names not registered in QUERIES: "
            f"{sorted(unknown)} — register the query or remove the "
            "rotation entry")


_check_promoted_registered(_PROMOTED, QUERIES)
_check_promoted_registered(_DEFERRED_NEW, QUERIES)
_rotate_front(QUERIES, _PROMOTED)
_rotate_front(ORACLE_SQL, _PROMOTED)

__all__ = ["QUERIES", "ORACLE_SQL"]
