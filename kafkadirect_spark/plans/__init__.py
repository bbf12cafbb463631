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
    # Round-6 window.  Two admission rules (VERDICT r4, standing):
    # (1) every query whose newest driver CORRECTNESS row would
    #     otherwise fall more than 2 rounds stale — enforced by
    #     tests/test_plans.py's rotation-staleness sweep;
    # (2) every query whose implementation or oracle CHANGED this
    #     round stays inside the sampled window so the driver, not
    #     just the local checker, re-verifies the new behavior.
    #
    # -- rule 1, mandatory: the 24 round-5 queries that have never had
    #    a driver row (VERDICT r5 item #2; all pass
    #    tools/check_oracle.py --exact locally) --
    "local_supplier_volume",
    "forecast_revenue",
    "large_order_customers",
    "priority_returned_orders",
    "scd2_history",
    "sessionize_events",
    "important_part_stock",
    "late_shipment_priority",
    "promotable_suppliers",
    "semantic_clusters",
    "decontaminate_bloom",
    "length_weighted_sample",
    "distinct_orders_hll",
    "global_shuffle",
    "sample_exact_count",
    "term_relevance_topk",
    "kmeans_clusters",
    "heavy_hitters_cms",
    "event_funnel",
    "retention_cohorts",
    "value_quantiles_hist",
    "value_quantiles_by_type",
    "vocab_overlap_kmv",
    "user_moving_avg",
    # -- new in round 6 (no driver row by construction; all pass
    #    tools/check_oracle.py --exact locally): the bucketed range
    #    join, SemDeDup prune, mergeable rolling HLL, integer z-score
    #    outliers, SCD2 point-in-time snapshot --
    "range_bucket_join",
    "semdedup_prune",
    "rolling_distinct_hll",
    "value_outliers",
    "scd2_asof_snapshot",
    # -- rule 2 is also satisfied for the two changed-in-r6 queries
    #    (kmeans_clusters: oracle refactor + keep_qvec;
    #    retention_cohorts: oracle TIMESTAMP cast) — both are above.
    # -- remaining slots: the r4-green queries most at risk of drift
    #    (complex similarity / curation / winnowing / streaming-policy
    #    shapes first).  The 24 r4-green remainder (the trivial core
    #    operators — filter/map/branch/windowed counts, stream↔table
    #    joins — plus the driver-stable TPC-H Q1/Q3/Q10/rollup shapes
    #    and join_interval_inner) keep their r4 rows — exactly 2
    #    rounds old after r6, the staleness bound — and rotate in
    #    round 7. --
    "similarity_topk",
    "similarity_ann_lsh",
    "similarity_ann_ivf",
    "similarity_ann_multiprobe",
    "dedup_embedding_cosine",
    "multimodal_meta",
    "corpus_curation",
    "decontaminate",
    "sample_split",
    "sample_stratified",
    "corpus_mix_upsample",
    "vocab_topk",
    "boilerplate_flag",
    "pii_redaction",
    "text_quality",
    "text_repetition",
    "doc_fingerprint",
    "doc_winnow",
    "winnow_overlap_pairs",
    "event_gaps",
    "asof_enrich",
]


def _rotate_front(d: dict, front: list[str]) -> None:
    ordered = [k for k in front if k in d] + [k for k in d if k not in front]
    items = {k: d[k] for k in ordered}
    d.clear()
    d.update(items)


_rotate_front(QUERIES, _PROMOTED)
_rotate_front(ORACLE_SQL, _PROMOTED)

__all__ = ["QUERIES", "ORACLE_SQL"]
