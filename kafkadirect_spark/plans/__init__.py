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
    # Round-5 window.  Two admission rules (VERDICT r4 + ADVICE r4):
    # (1) every query without an r4 driver row — the 29 below were all
    #     r3-green but must not go two rounds unchecked;
    # (2) every query whose implementation or oracle CHANGED this
    #     round stays inside the sampled window so the driver, not
    #     just the local checker, re-verifies the new behavior.
    #
    # -- rule 2: changed in round 5 --
    "embedding_quantize",     # ArrayType output → md5 scalar (gate fix)
    "pack_sequences",         # oracle: BIGINT cast on windowed SUM
    "corpus_stats",           # avg_size → avg_size_milli; pXX dtype cast
    "quality_topk_per_lang",  # two-phase salted top-k plan
    "dedup_spans",            # winner groupBy on (xxhash64, crc32)
    # -- new in round 5 (no driver row yet by construction).  20 new
    # queries compete for 16 free slots (the 34 above are mandatory:
    # VERDICT r4 #2).  The four plain aggregate shapes
    # (local_supplier_volume/forecast_revenue/large_order_customers/
    # priority_returned_orders — Q5/Q6/Q18/Q4) wait for r6: their
    # close cousins Q1/Q3/Q10 are already driver-green, and all four
    # pass tools/check_oracle.py --exact locally (recorded in
    # COVERAGE.md).  The late batch-5 sweep completers
    # (important_part_stock/late_shipment_priority/
    # promotable_suppliers — Q11/Q12/Q20) likewise wait for r6 with
    # local --exact passes on record.  The novel machinery — semi/anti/correlated TPC-H
    # shapes, chunking, salted domain cap, importance weights, the
    # forward as-of direction — takes the driver slots. --
    "asof_enrich_forward",
    "doc_chunks",
    "domain_cap",
    "ngram_topk",
    "importance_weights",
    # -- new in round 5, batch 2: the remaining TPC-H shapes --
    "volume_shipping",
    "market_share",
    "product_type_profit",
    "customer_order_distribution",
    "top_supplier",
    "supplier_part_variety",
    "small_quantity_revenue",
    "disjunctive_revenue",
    "lonely_returns",
    "idle_rich_customers",
    "cheapest_supplier",
    # -- rule 1: no r4 CORRECTNESS row --
    "join_interval_left",
    "join_interval_outer",
    "join_table_table",
    "join_table_table_outer",
    "join_global_enrich",
    "promo_revenue_share",
    "supplier_nation_volume",
    "skew_salted_join",
    "skew_salted_distinct",
    "yahoo_pipeline",
    "table_group_aggregate",
    "smt_chain",
    "scan_from_timestamp",
    "ts_policy_skip",
    "ts_policy_previous",
    "map_rekey_count",
    "flat_map_rekey_ledger",
    "table_to_stream_count",
    "session_reduce",
    "table_tombstones",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_verified_pairs",
    "text_stats",
    "text_langid",
]


def _rotate_front(d: dict, front: list[str]) -> None:
    ordered = [k for k in front if k in d] + [k for k in d if k not in front]
    items = {k: d[k] for k in ordered}
    d.clear()
    d.update(items)


_rotate_front(QUERIES, _PROMOTED)
_rotate_front(ORACLE_SQL, _PROMOTED)

__all__ = ["QUERIES", "ORACLE_SQL"]
