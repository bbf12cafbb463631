from kafkadirect_spark.plans.queries import ORACLE_SQL, QUERIES
from kafkadirect_spark.plans import llm_queries  # noqa: F401  (registers into QUERIES)
from kafkadirect_spark.plans import curation_queries  # noqa: F401  (registers into QUERIES)

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
    # round-4 additions — no driver CORRECTNESS row yet
    "asof_enrich",
    "dedup_spans",
    "embedding_quantize",
    "shipping_priority",
    "revenue_rollup",
    "event_gaps",
    "returned_item_report",
    # rounds 1-3 tail the driver never sampled
    "text_quality",
    "text_repetition",
    "doc_fingerprint",
    "doc_winnow",
    "winnow_overlap_pairs",
    "similarity_topk",
    "similarity_ann_lsh",
    "similarity_ann_ivf",
    "similarity_ann_multiprobe",
    "dedup_embedding_cosine",
    "multimodal_meta",
    "corpus_curation",
    "sample_split",
    "sample_stratified",
    "decontaminate",
    "pack_sequences",
    "corpus_mix_upsample",
    "vocab_topk",
    "boilerplate_flag",
    "pii_redaction",
    "corpus_stats",
    "quality_topk_per_lang",
]


def _rotate_front(d: dict, front: list[str]) -> None:
    ordered = [k for k in front if k in d] + [k for k in d if k not in front]
    items = {k: d[k] for k in ordered}
    d.clear()
    d.update(items)


_rotate_front(QUERIES, _PROMOTED)
_rotate_front(ORACLE_SQL, _PROMOTED)

__all__ = ["QUERIES", "ORACLE_SQL"]
