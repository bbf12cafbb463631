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
# staleness horizon is ceil(N/50)−1 rounds (the tripwire's capacity
# bound), and past N=200 it degrades to 4 — every window 100% mandatory,
# zero slack for re-checking changed queries.  Therefore: (a) net
# registration growth is capped at ~10 queries/round; (b) a new OPERATOR
# lands under pytest goldens first and is registered only if it earns a
# driver-verified claim the existing surface doesn't already make;
# (c) near-duplicate query shapes should be consolidated or retired
# rather than accumulated.  r10 adds ONE new registered query
# (unigram_chunk — the unigram tokenizer family's driver claim,
# VERDICT r9 item 2) and RETIRES SIX near-duplicate shapes under
# item c, each with a carried-claim note at its old registration
# site: value_outliers (→ value_outliers_mad), exact_value_quantiles
# (→ exact_quantiles_by_type), trailing_distinct_hll
# (→ rolling_distinct_hll), dedup_simhash (→ dedup_simhash_pairs),
# dedup_ngram_jaccard (→ dedup_jaccard_prefix + dedup_verified_pairs),
# decontaminate (→ decontaminate_bloom).  Every retired OPERATOR
# stays in the library with its pytest goldens.  N = 160; horizon
# stays 3 (deliberately NOT retired below 151 this round: at N ≤ 150
# the horizon tightens to 2, which the 47-query r7-dated pool cannot
# satisfy in one 50-slot window — pay down further as pools drain).
# ---------------------------------------------------------------------------

_PROMOTED = [
    # Round-10 window.  Two admission rules (VERDICT r4, standing):
    # (1) every query whose newest driver CORRECTNESS row would
    #     otherwise fall past the capacity horizon — enforced by
    #     tests/test_plans.py's rotation-staleness sweep;
    # (2) every query whose implementation or oracle CHANGED this
    #     round stays inside the sampled window so the driver, not
    #     just the local checker, re-verifies the new behavior.
    #
    # -- rule 1, mandatory: the 17 r6-dated queries the r9 tripwire
    #    named verbatim (newest driver row r6 — at horizon 3 they
    #    must front now; all pass check_oracle --exact locally) --
    "scd2_asof_snapshot",
    "scd2_history",
    "semantic_clusters",
    "semdedup_prune",
    "sessionize_events",
    "similarity_ann_ivf",
    "similarity_ann_lsh",
    "similarity_ann_multiprobe",
    "similarity_topk",
    "term_relevance_topk",
    "text_quality",
    "text_repetition",
    "user_moving_avg",
    "value_quantiles_hist",
    "vocab_overlap_kmv",
    "vocab_topk",
    "winnow_overlap_pairs",
    # -- rule 2: the r9-ADVICE fixes changed nb_classify's label
    #    hygiene + its oracle's candidate-class CTEs (nb_langid) and
    #    histogram_drift's totals-from-joined-frame plan
    #    (value_drift_by_slice) — the driver re-verifies both.
    #    (learn_bpe also changed, but only its DISTRIBUTED branch —
    #    the registered BPE queries run the driver regime, whose
    #    executed path is byte-identical; the distributed branch is
    #    covered by test_bpe.py's regime-equivalence goldens.) --
    "nb_langid",
    "value_drift_by_slice",
    # doc_winnow re-admitted under rule 2 as well: its implementation
    # switched to the staged winnow_fps form (122× faster, same
    # output — the single-expression winnow re-hashed every gram per
    # window; see text.py) and the driver should re-verify it.  It
    # takes the slot the alphabetical fill would have given
    # skew_salted_distinct, whose r7 row simply rotates at r11 with
    # the rest of its cohort.
    "doc_winnow",
    # embedding_quantize + embedding_random_projection re-admitted
    # under rule 2 the same way: quantize_int8 now stages `scale` as
    # a projection column (the lambda re-ran the array_max scan per
    # element — 3.7× at sf0.1; same outputs, exact checks pass) and
    # both queries consume it.  They displace the last two
    # alphabetical fill slots (session_count, shipping_priority),
    # whose r7 rows rotate at r11 with their cohort.
    "embedding_quantize",
    "embedding_random_projection",
    # bpe_token_lengths + bpe_chunks re-admitted under rule 2: the
    # encode pass they run now widens narrow scans before the
    # Arrow-batched mapInPandas (no-op at real scale; same outputs,
    # exact checks pass).  They displace the last two alphabetical
    # fill slots (select_key_regroup, session_aggregate).
    "bpe_token_lengths",
    "bpe_chunks",
    # -- new in round 10 (the round's ONE registration under the
    #    budget policy): the unigram-LM tokenizer family's driver
    #    claim — train + encode + chunk with the full Viterbi-EM
    #    replay oracle (VERDICT r9 item 2) --
    "unigram_chunk",
    # -- fill: the 25 alphabetically-first of the 47 r7-dated
    #    queries (newest driver row r7 — legal outside the window
    #    this round, mandatory at r11; scheduling the oldest now
    #    keeps r11's mandatory front to the 22 leftovers
    #    select_key_regroup..yahoo_pipeline) --
    "asof_enrich_forward",
    "branch_counts",
    "dedup_clusters",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_spans",
    "filter_project",
    "flat_map_word_count",
    "join_global_enrich",
    "join_interval_inner",
    "join_interval_left",
    "join_interval_outer",
    "join_stream_table",
    "join_stream_table_left",
    "join_table_table",
    "join_table_table_outer",
    "ktable_filter",
    "map_rekey_count",
    "merge_streams",
    "pack_sequences",
    "pricing_summary",
    "promo_revenue_share",
    "returned_item_report",
    "revenue_rollup",
    "scan_from_timestamp",
]

# No over-subscription this round: one new registration, and the
# window's 25 fill slots all hold r7-dated rotation.  (The tripwire
# keeps this list honest: a name may sit here ONLY while it is
# registered, has no driver row yet, and every window slot is
# occupied by a mandatory rotation or another never-verified query.)
#
# r11 plan (so the next window is predictable): mandatory front = the
# 22 r7-dated leftovers (select_key_regroup, session_aggregate,
# session_count, shipping_priority,
# skew_salted_distinct, skew_salted_join, smt_chain,
# stream_aggregate, stream_count, stream_reduce,
# supplier_nation_volume, table_group_aggregate, table_map_values,
# table_tombstones, ts_policy_previous, ts_policy_skip,
# unlimited_window_count, windowed_avg_hopping, windowed_count_hopping,
# windowed_count_tumbling, windowed_sum_tumbling, yahoo_pipeline);
# planned registrations (landed library-level this round per policy
# item b): a `windowed_chunks` sliding-window query (oracle generator
# ALREADY WRITTEN: tokeval.windows_oracle_sql, pinned vs the engine
# on documents in test_tokeval.py), a `tokenizer_eval` per-slice
# report query over the TRAINED unigram encode (oracle generator
# already written too: tokeval.unigram_eval_oracle_sql, pinned vs the
# engine at the registration params), and a `cdc_dup_stats`
# content-defined-chunking query
# (oracle generator already written: dedup.cdc_stats_oracle_sql,
# pinned vs the engine in test_llm_ops.py), and a `sax_similar_pairs`
# time-series-search query (oracle generator already written:
# timeseries.sax_pairs_oracle_sql incl. the max_bucket guard, pinned
# vs the engine in test_timeseries.py); fill = the oldest r8-dated
# tail.
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
