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
# r13 executes the rotation the r12 tripwire prescribed and registers
# the TEN queries the r12 plan's suggested pick named (all with
# oracle generators pytest-pinned engine==oracle in round 12), one
# per new operator family for claim diversity:
# similarity_ivf_pq_rerank (IVFADC+R; + its own _BNLJ_OK entry),
# kmv_slice_matrix (all-pairs slice Jaccard over "source", 20 slices;
# + _BNLJ_OK for the |slices|-row sketch pair join), funnel_steps
# (aggregate conversion report with a 30-day window),
# contamination_report (per-eval-doc n-gram leakage),
# sample_weighted_group (stratified exactly-n weighted draws),
# token_waterfill (max-min fair budget allocation; + its
# _GLOBAL_WINDOW_OK entry for the |strata|-row windows),
# dedup_exactsubstr (Lee et al. ExactSubstr), hybrid_rrf (BM25 ∪
# cosine RRF fusion; + _GLOBAL_WINDOW_OK for the ≤topn-row lexical
# rank window), media_image_features (real 24-bit BMP round-trip),
# media_phash_pairs (real P5 round-trip + aHash Hamming-≤1 pairs) —
# and RETIRES FOUR near-duplicate shapes under item c (the r12
# plan's named candidates), each with a carried-claim note at its
# old registration site: dedup_spans (→ dedup_exactsubstr, the named
# 1:1 partner — alignment-free strictly subsumes chunk-aligned),
# dedup_exact (→ dedup_clusters' exact-dedup prefilter stage +
# dedup_exactsubstr's whole-doc degenerate case), bpe_chunks
# (→ windowed_chunks + unigram_chunk — three chunking shapes, keep
# two), join_stream_table_left (→ join_stream_table drives the same
# core.py:373 lookup path; left-padding semantics stay checked via
# join_interval_outer).  Every retired OPERATOR stays in the library
# with its pytest goldens.  N = 161 (155 + 10 − 4); horizon stays 3
# (151..200 band).  Deferred to r14 (same pool, already
# oracle-ready): media_audio_features, path_topk, graph_triangles /
# graph_local_clustering (register at most one, over the SELECTIVE
# LSH pair surface), dedup_exactsubstr_incr, weighted_quantiles /
# weighted_quantiles_by_lang (at most one).
#
# PAYDOWN MATH, recomputed at N=161 (supersedes the r12 note): the
# horizon-3 capacity bound needs every pool older than upcoming−3 to
# drain through the window on schedule.  Pools after r13's artifact
# lands: 12 r10-dated leftovers (mandatory at r14), 49 r11, 50 r12,
# 50 r13.  r14: 12 mandatory + ~5 new registrations + 33 r11 fill →
# 16 r11 left at r15; r15: 16 + ~5 new + 29 r12 fill → 21 r12 left;
# the train keeps moving as long as (oldest pool) + (new) ≤ 50.
# Tightening to horizon 2 stays mathematically false while three
# trailing pools exist (12 + 49 > 50 at r14).  Decision standing:
# stay in the 151..200 band, keep ~5-10 free slots per round for new
# oracle-ready operators — the slack IS the feature, not debt.
# ---------------------------------------------------------------------------

_PROMOTED = [
    # Round-13 window.  Two admission rules (VERDICT r4, standing):
    # (1) every query whose newest driver CORRECTNESS row would
    #     otherwise fall past the capacity horizon — enforced by
    #     tests/test_plans.py's rotation-staleness sweep;
    # (2) every query whose implementation or oracle CHANGED this
    #     round stays inside the sampled window so the driver, not
    #     just the local checker, re-verifies the new behavior.
    #
    # -- rule 1, mandatory: the 8 r9-dated leftovers the r12 tripwire
    #    named verbatim --
    "retention_cohorts",
    "rolling_distinct_hll",
    "sample_split",
    "sample_stratified",
    "value_decile_by_type",
    "value_ohlc_daily",
    "value_outliers_mad",
    "vocab_drift",
    # -- new in round 13 (the pre-scheduled registrations; never
    #    driver-verified, so they front).  Rule 2 note: no library
    #    code path or oracle text of any already-registered query
    #    changed this round — the r13 additions are new registration
    #    surfaces over operators that landed library-level in r12;
    #    hybrid_rrf COMPOSES bm25_search's oracle machinery
    #    (bm25_rank_sql) but that generator's text is unchanged --
    "contamination_report",
    "dedup_exactsubstr",
    "funnel_steps",
    "hybrid_rrf",
    "kmv_slice_matrix",
    "media_image_features",
    "media_phash_pairs",
    "sample_weighted_group",
    "similarity_ivf_pq_rerank",
    "token_waterfill",
    # -- fill: the 32 alphabetically-first of the 44 surviving
    #    r10-dated queries (newest driver row r10 — legal outside the
    #    window this round, mandatory at r14; scheduling the oldest
    #    now keeps r14's mandatory front to the 12 leftovers
    #    similarity_ann_multiprobe..winnow_overlap_pairs) --
    "asof_enrich_forward",
    "bpe_token_lengths",
    "branch_counts",
    "dedup_clusters",
    "dedup_minhash_lsh",
    "doc_winnow",
    "embedding_quantize",
    "embedding_random_projection",
    "filter_project",
    "flat_map_word_count",
    "join_global_enrich",
    "join_interval_inner",
    "join_interval_outer",
    "join_stream_table",
    "join_table_table",
    "join_table_table_outer",
    "ktable_filter",
    "map_rekey_count",
    "merge_streams",
    "nb_langid",
    "pack_sequences",
    "pricing_summary",
    "promo_revenue_share",
    "returned_item_report",
    "revenue_rollup",
    "scan_from_timestamp",
    "scd2_asof_snapshot",
    "scd2_history",
    "semantic_clusters",
    "semdedup_prune",
    "sessionize_events",
    "similarity_ann_ivf",
]

# No over-subscription this round: the ten new registrations all fit
# inside the window alongside the 8 mandatory rotations, and the 32
# fill slots hold r10-dated rotation.  (The tripwire keeps this list
# honest: a name may sit here ONLY while it is registered, has no
# driver row yet, and every window slot is occupied by a mandatory
# rotation or another never-verified query.)
#
# r14 plan (so the next window is predictable): mandatory front = the
# 12 r10-dated leftovers (similarity_ann_multiprobe, similarity_topk,
# term_relevance_topk, text_quality, text_repetition, unigram_chunk,
# user_moving_avg, value_drift_by_slice, value_quantiles_hist,
# vocab_overlap_kmv, vocab_topk, winnow_overlap_pairs); candidate
# registrations (all oracle generators pytest-pinned engine==oracle
# already, deferred from the r12 candidate pool):
# `media_audio_features` (multimodal.synth_audio_features_oracle_sql
# — WAV PCM16 round-trip, the audio twin of media_image_features),
# `path_topk` (behavior.path_topk_oracle_sql — one user-partitioned
# lead window + TakeOrdered; needs a _GLOBAL_WINDOW_OK entry for the
# ≤k-row rank window), `graph_triangles` OR `graph_local_clustering`
# (at most one, over the SELECTIVE dedup_minhash_lsh pair surface —
# its oracle is now the shared _MINHASH_PAIRS_ORACLE variable and
# both graph compositions over that exact text are pytest-pinned in
# test_graph.py, so the registration is mechanical; the simhash band
# graph is 2.4M edges at sf0.1 and its wedge join would own the
# driver's wall), `dedup_exactsubstr_incr`
# (dedup.exactsubstr_incremental_oracle_sql, every-5th-doc split —
# adds the index-membership claim over the now-registered
# dedup_exactsubstr machinery), `weighted_quantiles` OR
# `weighted_quantiles_by_lang` (at most one, same global-vs-grouped
# rule as the decile family).  Landed library-level in r13 per
# policy item b (oracle generators pytest-pinned engine==oracle):
# `contamination_spans` (curation.contamination_spans_oracle_sql —
# span-level leakage: longest leaked token run per eval doc; the
# natural pairing rule is report-vs-spans, keep both ONLY if each
# carries a distinct claim — spans strictly extends the report, so
# consider registering spans and retiring `contamination_report` 1:1
# once the report has its first green row this round), and
# `attribution_last_touch` (behavior.attribution_oracle_sql —
# last-touch conversion credit over events; one user-partitioned
# rows-preceding window + a |types|-row report; needs the funnel's
# _BNLJ_OK rationale for its one-row total broadcast; a DISTINCT
# claim from funnel_steps/path_topk — credit assignment, not
# counting or sequence mining), and `theil_sen` /
# `theil_sen_by_user` (timeseries.theil_sen_oracle_sql — integerized
# robust median-slope trend, Sen 1968; max_points-capped pair join,
# group-partitioned windows, truncating-division parity pinned on
# negative slopes; a robust-statistics claim no registered query
# makes).  That is ~8
# adds; balance with item-c retirements where a genuine subsumption
# exists, else let N drift inside the 151..200 band (horizon 3
# holds).  Fill = the 33 alphabetically-first of the 49 surviving
# r11-dated queries, leaving ~16 r11 leftovers as r15's mandatory
# front.
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
