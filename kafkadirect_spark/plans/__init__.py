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
# r11 adds the FOUR registrations pre-scheduled by the r10 plan (all
# with oracle generators already pytest-pinned engine==oracle last
# round): cdc_dup_stats (dedup.cdc_stats_oracle_sql), sax_pairs
# (timeseries.sax_pairs_oracle_sql incl. the max_bucket guard),
# windowed_chunks (tokeval.windows_oracle_sql), tokenizer_eval
# (tokeval.unigram_eval_oracle_sql) — and RETIRES NINE near-duplicate
# shapes under item c (VERDICT r10 item 3 named three; six more fall
# to the same subsumption test), each with a carried-claim note at its
# old registration site: similarity_ann_lsh (→ similarity_ann_multiprobe),
# windowed_count_hopping (→ windowed_avg_hopping), dedup_containment
# (→ dedup_containment_anti), stream_count (→ stream_reduce +
# stream_aggregate), session_count (→ session_aggregate +
# session_reduce), join_interval_left (→ join_interval_inner +
# join_interval_outer), ts_policy_skip (→ ts_policy_previous),
# interval_overlap_join (→ interval_overlap_left),
# dedup_exact_normalized (→ dedup_exact).  Every retired OPERATOR
# stays in the library with its pytest goldens; the three retired
# queries that back fingerprint-pinned bench suites (stream_count,
# interval_overlap_join, dedup_containment) keep their functions,
# unregistered, and bench.py calls them directly.  N = 155; horizon
# stays 3 (still NOT paid below 151: at N <= 150 the horizon
# tightens to 2, which would make BOTH the 18-query r7 pool and the
# 41-query r8 pool mandatory at once — 59 > 50 slots.  The r8 pool
# must drain below ~30 first; at the current fill rate that is r12,
# after which retiring to <= 150 becomes legal).
# ---------------------------------------------------------------------------

_PROMOTED = [
    # Round-11 window.  Two admission rules (VERDICT r4, standing):
    # (1) every query whose newest driver CORRECTNESS row would
    #     otherwise fall past the capacity horizon — enforced by
    #     tests/test_plans.py's rotation-staleness sweep;
    # (2) every query whose implementation or oracle CHANGED this
    #     round stays inside the sampled window so the driver, not
    #     just the local checker, re-verifies the new behavior.
    #
    # -- rule 1, mandatory: the r7-dated cohort the r10 tripwire
    #    named verbatim (22 names, minus the four of them retired
    #    this round under policy item c: stream_count, session_count,
    #    ts_policy_skip, windowed_count_hopping) --
    "select_key_regroup",
    "session_aggregate",
    "shipping_priority",
    "skew_salted_distinct",
    "skew_salted_join",
    "smt_chain",
    "stream_aggregate",
    "stream_reduce",
    "supplier_nation_volume",
    "table_group_aggregate",
    "table_map_values",
    "table_tombstones",
    "ts_policy_previous",
    "unlimited_window_count",
    "windowed_avg_hopping",
    "windowed_count_tumbling",
    "windowed_sum_tumbling",
    "yahoo_pipeline",
    # -- new in round 11 (the pre-scheduled registrations; never
    #    driver-verified, so they front).  Rule 2 note: this round's
    #    timeseries fixes (multi-digit-word guard, per-permille oracle
    #    breakpoint arms, ISO t0/t1, persist removal) change exactly
    #    one registered query's code path — sax_pairs, new and in the
    #    window anyway; the BPE reliable-checkpoint cleanup touches
    #    only the checkpoint_dir regime, which no registered query
    #    runs (they all train in driver mode; regime equivalence is
    #    pytest-pinned in test_bpe.py) --
    "cdc_dup_stats",
    "sax_pairs",
    "windowed_chunks",
    "tokenizer_eval",
    # -- fill: the 28 alphabetically-first of the 41 r8-dated queries
    #    (newest driver row r8 — legal outside the window this round,
    #    mandatory at r12; scheduling the oldest now keeps r12's
    #    mandatory front to the 13 leftovers
    #    similarity_pq_adc..zorder_events) --
    "cheapest_supplier",
    "cluster_split",
    "corpus_profile",
    "corpus_stats",
    "customer_order_distribution",
    "dedup_incremental_lsh",
    "dedup_jaccard_prefix",
    "dedup_simhash_pairs",
    "dedup_verified_pairs",
    "disjunctive_revenue",
    "distinct_users_by_type_hll",
    "doc_chunks",
    "doc_surprisal",
    "domain_cap",
    "exact_quantiles_by_type",
    "flat_map_rekey_ledger",
    "idle_rich_customers",
    "importance_weights",
    "interval_overlap_left",
    "lonely_returns",
    "market_share",
    "ngram_topk",
    "partition_fingerprints",
    "product_type_profit",
    "quality_gopher",
    "quality_topk_per_lang",
    "sample_exact_per_group",
    "session_reduce",
]

# No over-subscription this round: the four new registrations all fit
# inside the window alongside the 18 mandatory rotations, and the 28
# fill slots hold r8-dated rotation.  (The tripwire keeps this list
# honest: a name may sit here ONLY while it is registered, has no
# driver row yet, and every window slot is occupied by a mandatory
# rotation or another never-verified query.)
#
# r12 plan (so the next window is predictable): mandatory front = the
# 13 r8-dated leftovers (similarity_pq_adc, small_quantity_revenue,
# supplier_pagerank, supplier_part_variety, surprisal_bigram,
# table_to_stream_count, temperature_mix, text_langid, text_stats,
# token_budget_select, top_supplier, volume_shipping, zorder_events);
# planned registrations (landed library-level THIS round per policy
# item b, each with its oracle generator already pytest-pinned
# engine==oracle): a `wordpiece_eval` per-slice report over the
# TRAINED WordPiece encode (wordpiece.eval_oracle_sql — or the
# lengths shape via wordpiece.encode_lengths_oracle_sql; the merges
# shape via wordpiece.merges_oracle_sql), a `dedup_edit_verified`
# Levenshtein verification over the registered simhash pairs
# (dedup.edit_verify_oracle_sql wraps the simhash query's own oracle
# SQL), and a `vocab_coverage` coverage-curve query
# (curation.vocab_coverage_oracle_sql — deliberately the naive
# rank-every-word formulation), a `similarity_ivf_pq` IVFADC
# composite query (analytics_queries.ivf_pq_oracle_sql — IVF
# shortlist CTEs + PQ codebook CTEs + shortlist-restricted ADC;
# NOTE: its centroid scoring rides the IVF-family broadcast
# nested-loop pattern, so registration must add the name to
# test_plans._BNLJ_OK),
# a `sax_nearest` k-NN query
# (timeseries.sax_nearest_oracle_sql), and a `sample_weighted`
# data-mixing query (curation.sample_weighted_oracle_sql —
# integer systematic sampling, token-count weights) — pick ≤ the ~10/round
# budget, oldest claims first; fill = the oldest r9-dated tail
# (~33 slots of the 44-query r9 pool), leaving ~11 r9 leftovers for
# r13 — after which the registry can legally retire to <= 150 and
# tighten the horizon to 2.
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
