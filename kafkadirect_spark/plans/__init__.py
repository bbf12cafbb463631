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

_PROMOTED = [
    # Round-8 window.  Two admission rules (VERDICT r4, standing):
    # (1) every query whose newest driver CORRECTNESS row would
    #     otherwise fall more than 2 rounds stale — enforced by
    #     tests/test_plans.py's rotation-staleness sweep;
    # (2) every query whose implementation or oracle CHANGED this
    #     round stays inside the sampled window so the driver, not
    #     just the local checker, re-verifies the new behavior.
    #
    # -- rule 1, mandatory: the 26 queries whose newest driver row is
    #    r5 (named by the r7 tripwire failure; all pass
    #    tools/check_oracle.py --exact locally) --
    "cheapest_supplier",
    "corpus_stats",
    "customer_order_distribution",
    "dedup_ngram_jaccard",
    "dedup_simhash_pairs",
    "dedup_verified_pairs",
    "disjunctive_revenue",
    "doc_chunks",
    "domain_cap",
    "embedding_quantize",
    "flat_map_rekey_ledger",
    "idle_rich_customers",
    "importance_weights",
    "lonely_returns",
    "market_share",
    "ngram_topk",
    "product_type_profit",
    "quality_topk_per_lang",
    "session_reduce",
    "small_quantity_revenue",
    "supplier_part_variety",
    "table_to_stream_count",
    "text_langid",
    "text_stats",
    "top_supplier",
    "volume_shipping",
    # -- new in round 8 (no driver row by construction):
    #    trailing_distinct_hll (trailing 7-day register-merge HLL),
    #    interval_overlap_join (bucketed interval×interval overlap —
    #    the r7 _PROMOTED listed these two before they existed and
    #    _rotate_front silently dropped them; now a hard error, see
    #    below), dedup_jaccard_prefix (lossless prefix-filtered
    #    Jaccard join), sample_exact_per_group (exact-n per stratum),
    #    zorder_events (Morton layout index),
    #    distinct_users_by_type_hll (grouped HLL estimate), and the
    #    late-r8 five: dedup_containment (directed containment pairs),
    #    dedup_incremental_lsh (new-batch-vs-index candidates),
    #    embedding_random_projection (±1 JL projection), doc_surprisal
    #    (integer unigram-LM bits), corpus_profile (column profiler) --
    "trailing_distinct_hll",
    "interval_overlap_join",
    "interval_overlap_left",
    "dedup_jaccard_prefix",
    "sample_exact_per_group",
    "zorder_events",
    "distinct_users_by_type_hll",
    "dedup_containment",
    "dedup_incremental_lsh",
    "embedding_random_projection",
    "doc_surprisal",
    "corpus_profile",
    "supplier_pagerank",
    "temperature_mix",
    "dedup_exact_normalized",
    #    ... and the final-r8 batch: quality_gopher (integer Gopher
    #    repetition rules), surprisal_bigram (bigram LM + stupid
    #    backoff, held-out), cluster_split (leakage-safe cluster-keyed
    #    split), token_budget_select (exact global token-budget
    #    prefix), exact_value_quantiles (true order statistics via
    #    iterative histogram narrowing), embedding_pq_codes /
    #    similarity_pq_adc (product quantization + asymmetric-distance
    #    search) --
    "quality_gopher",
    "surprisal_bigram",
    "cluster_split",
    "token_budget_select",
    "exact_value_quantiles",
    "embedding_pq_codes",
    "similarity_pq_adc",
    "exact_quantiles_by_type",
    "partition_fingerprints",
    # (no early-refresh slots remain: 26 mandatory rotations + 24 new
    # r8 queries fill all 50 slots.  Notes for r9: with >150
    # registered queries the staleness horizon is now CAPACITY-
    # DERIVED (tests/test_plans.py: ceil(N/50)−1 rounds — a 2-round
    # bound is unsatisfiable past 150).  Under it the sustainable r9
    # window is the _DEFERRED_NEW queries plus the oldest of the 48
    # r6-dated tail; r6-dated leftovers become r10's mandatory front
    # together with the oldest r7-dated.  The rule-2 re-check
    # of range_bucket_join was DISPLACED in r8 by the never-verified
    # partition_fingerprints — range_bucket_join holds a green r7
    # driver row, its r8 change is guard-only and passes
    # check_oracle locally; r9 should front it with the leftovers.)
]

# New-this-round queries that did NOT fit the saturated 50-slot window
# (26 mandatory rotations + 24 new queries already fill it).  Deferral
# is the honest bookkeeping for an over-subscribed round, and the
# rotation tripwire (tests/test_plans.py) keeps it strict: a name may
# sit here ONLY while it is registered, has no driver row yet, and
# every window slot is occupied by a mandatory rotation or another
# never-verified query — the moment a slot frees up, the test fails
# until the deferred query is fronted.  r9 MUST promote these first.
_DEFERRED_NEW = [
    "collocations_topk",
    "bpe_merges",
    "bpe_token_lengths",
    "bm25_search",
    "vocab_drift",
    "partition_diff",
    "events_skew_report",
    "value_outliers_mad",
    "value_decile_buckets",
    "dedup_keep_longest",
    "embedding_profile",
    "join_explosion_check",
    "value_decile_by_type",
    "bpe_chunks",
    "value_ohlc_daily",
]


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
