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
# rather than accumulated.  r9 adds THREE new registered queries
# (dedup_containment_anti — the survivors shape of VERDICT r8 item 5;
# nb_langid, the repo's first TRAINED classifier; value_drift_by_slice,
# completing the drift family with exact numeric-distribution drift)
# and RETIRES one (value_quantiles_by_type — grouped-sketch quantiles;
# both its claims are carried by surviving queries: sketch machinery by
# value_quantiles_hist, grouped quantiles by the strictly-stronger
# exact_quantiles_by_type; operators + goldens remain in the library,
# see plans/analytics_queries.py).  N = 165, horizon stays 3.
# ---------------------------------------------------------------------------

_PROMOTED = [
    # Round-9 window.  Two admission rules (VERDICT r4, standing):
    # (1) every query whose newest driver CORRECTNESS row would
    #     otherwise fall past the capacity horizon — enforced by
    #     tests/test_plans.py's rotation-staleness sweep;
    # (2) every query whose implementation or oracle CHANGED this
    #     round stays inside the sampled window so the driver, not
    #     just the local checker, re-verifies the new behavior.
    #
    # -- rule 1, mandatory: the 15 r8 _DEFERRED_NEW queries (the r8
    #    window was saturated; the tripwire failed by design until
    #    these were fronted; all pass check_oracle --exact locally) --
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
    "bpe_chunks",  # also rule 2: output reshaped to scalar bpe_md5
    "value_ohlc_daily",
    # -- rule 2: embedding_pq_codes' output was reshaped this round
    #    (scalar code_0..code_3 — its r8 driver row crashed the gate
    #    on the ArrayType column); range_bucket_join's guard-only r8
    #    change was displaced from the r8 window by never-verified
    #    queries (r8 note) and gets its driver re-check now --
    "embedding_pq_codes",
    "range_bucket_join",
    # -- new in round 9 (no driver row by construction; the round's
    #    registrations under the budget policy above): containment
    #    survivors via how='anti', the trained integer-exact Naive
    #    Bayes language classifier, and exact numeric-distribution
    #    drift between ingest slices --
    "dedup_containment_anti",
    "nb_langid",
    "value_drift_by_slice",
    # -- fill: the 30 alphabetically-first of the 48 r6-dated queries
    #    (newest driver row r6 — legal outside the window this round,
    #    mandatory at r10; scheduling the oldest now keeps r10's
    #    mandatory front small).  The 17 r6-dated leftovers
    #    (scd2_asof_snapshot, scd2_history,
    #    semantic_clusters..winnow_overlap_pairs, minus the retired
    #    value_quantiles_by_type) ARE r10's mandatory front. --
    "asof_enrich",
    "boilerplate_flag",
    "corpus_curation",
    "corpus_mix_upsample",
    "decontaminate",
    "decontaminate_bloom",
    "dedup_embedding_cosine",
    "distinct_orders_hll",
    "doc_fingerprint",
    "doc_winnow",
    "event_funnel",
    "event_gaps",
    "forecast_revenue",
    "global_shuffle",
    "heavy_hitters_cms",
    "important_part_stock",
    "kmeans_clusters",
    "large_order_customers",
    "late_shipment_priority",
    "length_weighted_sample",
    "local_supplier_volume",
    "multimodal_meta",
    "pii_redaction",
    "priority_returned_orders",
    "promotable_suppliers",
    "retention_cohorts",
    "rolling_distinct_hll",
    "sample_exact_count",
    "sample_split",
    "sample_stratified",
]

# No over-subscription this round: the 15 r8 deferrals are fronted
# above and the window has 30 slots of r6-dated fill besides the
# mandatory set.  (The tripwire keeps this list honest: a name may sit
# here ONLY while it is registered, has no driver row yet, and every
# window slot is occupied by a mandatory rotation or another
# never-verified query.)
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
