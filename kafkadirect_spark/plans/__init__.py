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
    # Round-7 window.  Two admission rules (VERDICT r4, standing):
    # (1) every query whose newest driver CORRECTNESS row would
    #     otherwise fall more than 2 rounds stale — enforced by
    #     tests/test_plans.py's rotation-staleness sweep;
    # (2) every query whose implementation or oracle CHANGED this
    #     round stays inside the sampled window so the driver, not
    #     just the local checker, re-verifies the new behavior.
    #
    # -- rule 1, mandatory: the 24 queries whose newest driver row is
    #    r4 (named by the r6 tripwire failure; all pass
    #    tools/check_oracle.py --exact locally) --
    "pricing_summary",
    "filter_project",
    "flat_map_word_count",
    "branch_counts",
    "merge_streams",
    "stream_count",
    "stream_reduce",
    "stream_aggregate",
    "windowed_count_tumbling",
    "windowed_count_hopping",
    "windowed_sum_tumbling",
    "windowed_avg_hopping",
    "session_count",
    "session_aggregate",
    "unlimited_window_count",
    "ktable_filter",
    "select_key_regroup",
    "table_map_values",
    "join_stream_table",
    "join_stream_table_left",
    "join_interval_inner",
    "shipping_priority",
    "revenue_rollup",
    "returned_item_report",
    # -- rule 2: changed in round 7 (value_outliers: decimal-safe
    #    S/Q accumulation; range_bucket_join: exact pmod+div bucket
    #    ids + span guard in operators/rangejoin.py) — the driver,
    #    not just the local checker, must re-verify the new behavior --
    "value_outliers",
    "range_bucket_join",
    # -- new in round 7 (no driver row by construction) --
    "interval_overlap_join",
    "trailing_distinct_hll",
    # -- remaining slots: r5-dated queries most at risk of drift
    #    (join/skew/streaming-policy/dedup machinery first).  The r5
    #    remainder (TPC-H analytics shapes + text/curation tail) keeps
    #    its r5 rows — exactly 2 rounds old after r7, the staleness
    #    bound — and rotates in round 8. --
    "join_interval_left",
    "join_interval_outer",
    "join_table_table",
    "join_table_table_outer",
    "join_global_enrich",
    "yahoo_pipeline",
    "skew_salted_join",
    "skew_salted_distinct",
    "table_group_aggregate",
    "smt_chain",
    "scan_from_timestamp",
    "ts_policy_skip",
    "ts_policy_previous",
    "table_tombstones",
    "asof_enrich_forward",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_simhash",
    "dedup_spans",
    "pack_sequences",
    "supplier_nation_volume",
]


def _rotate_front(d: dict, front: list[str]) -> None:
    ordered = [k for k in front if k in d] + [k for k in d if k not in front]
    items = {k: d[k] for k in ordered}
    d.clear()
    d.update(items)


_rotate_front(QUERIES, _PROMOTED)
_rotate_front(ORACLE_SQL, _PROMOTED)

__all__ = ["QUERIES", "ORACLE_SQL"]
