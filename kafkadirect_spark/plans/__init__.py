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
# r14 executes the rotation the r13 tripwire prescribed (the 12
# r10-dated leftovers front, verbatim) and registers SEVEN queries —
# the r13 plan's deferred pool plus the two r13 library-level
# operators the VERDICT requires at the driver by r15 (all with
# oracle generators pytest-pinned engine==oracle in round 13 or
# earlier), one per operator family for claim diversity:
# media_audio_features (real WAV/PCM16 round-trip — the audio twin
# of the D13-green media_image_features), path_topk (consecutive
# event-type path mining; + _GLOBAL_WINDOW_OK for the ≤k-row rank
# window), graph_triangles (exact triangle census over the SELECTIVE
# registered MinHash-LSH pair surface, composing
# _MINHASH_PAIRS_ORACLE verbatim as its edge CTE; + _BNLJ_OK for the
# one-row census cross-joins — the simhash surface is 2.4M edges at
# sf0.1 and stays bench-only, and local_clustering stays
# library-level under the "at most one" rule), dedup_exactsubstr_incr
# (index-membership incremental ExactSubstr over the D13-green
# machinery), theil_sen (robust median-slope trend, Sen 1968 — the
# freshest hypothesis pin of the r13 trio), contamination_spans
# (span-level leakage, Brown/Chowdhery measure) and
# attribution_last_touch (last-touch credit assignment; + _BNLJ_OK
# for the one-row total broadcast) — and RETIRES ONE shape under
# item c, the r13 plan's named 1:1 pairing: contamination_report
# (→ contamination_spans strictly extends its gram-count claim at
# the same membership machinery; first green row landed D13, so the
# report→spans handoff loses no driver evidence).  Every retired
# OPERATOR stays in the library with its pytest goldens.
# N = 167 (161 + 7 − 1); horizon stays 3 (151..200 band).
# weighted_quantiles(/by_lang) stays deferred (oracle-ready, no slot
# pressure — the decile family already carries a driver-green
# grouped-quantile claim).
#
# PAYDOWN MATH, recomputed at N=167 (supersedes the r13 note): the
# horizon-3 capacity bound needs every pool older than upcoming−3 to
# drain through the window on schedule.  Pools after r14's artifact
# lands: 20 r11-dated leftovers (mandatory at r15 — 18 by rotation
# plus the two fill slots the rule-2 media re-verifications took),
# 50 r12, 48 r13 (the two media rows move to r14), 50 r14.  r15: 20
# mandatory + ~5 new registrations + 25 r12 fill → 25 r12 left at
# r16; r16: 25 + ~5 + 20 r13 fill → 28 r13 left; the train keeps
# moving as long as (oldest pool) + (new) ≤ 50.  Tightening to
# horizon 2 stays mathematically false while three trailing pools
# exist (20 + 50 > 50 at r15).  Decision standing:
# stay in the 151..200 band, keep ~5-10 free slots per round for new
# oracle-ready operators — the slack IS the feature, not debt.
# ---------------------------------------------------------------------------

_PROMOTED = [
    # Round-14 window.  Two admission rules (VERDICT r4, standing):
    # (1) every query whose newest driver CORRECTNESS row would
    #     otherwise fall past the capacity horizon — enforced by
    #     tests/test_plans.py's rotation-staleness sweep;
    # (2) every query whose implementation or oracle CHANGED this
    #     round stays inside the sampled window so the driver, not
    #     just the local checker, re-verifies the new behavior.
    #
    # -- rule 1, mandatory: the 12 r10-dated leftovers the r13
    #    tripwire named verbatim --
    "similarity_ann_multiprobe",
    "similarity_topk",
    "term_relevance_topk",
    "text_quality",
    "text_repetition",
    "unigram_chunk",
    "user_moving_avg",
    "value_drift_by_slice",
    "value_quantiles_hist",
    "vocab_overlap_kmv",
    "vocab_topk",
    "winnow_overlap_pairs",
    # -- new in round 14 (the pre-scheduled registrations; never
    #    driver-verified, so they front).  graph_triangles COMPOSES
    #    dedup_minhash_lsh's oracle (_MINHASH_PAIRS_ORACLE) but that
    #    generator's text is unchanged (byte-identity pinned in
    #    test_graph.py) --
    "attribution_last_touch",
    "contamination_spans",
    "dedup_exactsubstr_incr",
    "graph_triangles",
    "media_audio_features",
    "path_topk",
    "theil_sen",
    # -- rule 2: the y4m video path added branches to the SHARED
    #    multimodal helpers `sniff_media` (new magic check) and
    #    `synth_media` (new kind) that sit in these two registered
    #    queries' code paths; behavior for their pnm/bmp payloads is
    #    provably unchanged (no raster starts with the y4m magic),
    #    but rule 2 tracks implementation text, not arguments — the
    #    driver re-verifies them.  (media_audio_features shares the
    #    same helpers and fronts above as a new registration; no
    #    other registered query's implementation or oracle text
    #    changed this round — behavior.py/timeseries.py edits were
    #    docstring-only or new functions.) --
    "media_image_features",
    "media_phash_pairs",
    # -- fill: the 29 alphabetically-first of the 49 surviving
    #    r11-dated queries (newest driver row r11 — legal outside the
    #    window this round, mandatory at r15; scheduling the oldest
    #    now keeps r15's mandatory front to the 20 leftovers
    #    select_key_regroup..yahoo_pipeline) --
    "cdc_dup_stats",
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
    "sax_pairs",
]

# No over-subscription this round: the seven new registrations and
# two rule-2 re-verifications all fit inside the window alongside the
# 12 mandatory rotations, and the 29 fill slots hold r11-dated
# rotation.  (The tripwire keeps this list
# honest: a name may sit here ONLY while it is registered, has no
# driver row yet, and every window slot is occupied by a mandatory
# rotation or another never-verified query.)
#
# r15 plan (so the next window is predictable): mandatory front = the
# 20 r11-dated leftovers (select_key_regroup, session_aggregate,
# session_reduce, shipping_priority, skew_salted_distinct,
# skew_salted_join, smt_chain, stream_aggregate, stream_reduce,
# supplier_nation_volume, table_group_aggregate, table_map_values,
# table_tombstones, tokenizer_eval, ts_policy_previous,
# unlimited_window_count, windowed_avg_hopping, windowed_chunks,
# windowed_count_tumbling, yahoo_pipeline); candidate
# registrations (oracle generators already pytest-pinned
# engine==oracle unless noted): `weighted_quantiles` OR
# `weighted_quantiles_by_lang` (at most one — the long-deferred
# weighted-order-statistics claim; no slot pressure forced it out in
# r13/r14), `graph_local_clustering` (per-node closure over the same
# SELECTIVE _MINHASH_PAIRS_ORACLE surface — register only if
# graph_triangles lands green AND a per-node claim is judged distinct
# from the census; otherwise it stays library-level), plus the two
# operators that landed library-level THIS round under policy item b
# (both oracle generators pytest-pinned engine==oracle in r14):
# `media_video_features` (multimodal.synth_video_features_oracle_sql
# — real YUV4MPEG2 round-trip with integer scene-cut localization,
# completing the image/audio/video triad of driver-verified
# containers) and `cusum_changepoint` (timeseries.
# cusum_changepoint_oracle_sql — Page's sequential changepoint via
# the prefix-sum closed form; group-partitioned windows only, a
# robust-monitoring claim distinct from theil_sen's trend fit) and
# `pii_scrub` (privacy.synth_pii_scrub_oracle_sql — regex redaction
# + integer Luhn validity over Catalyst-synthesized injections; the
# oracle replays by id arithmetic with NO SQL regex, so the row
# proves the engine's regex/scrub/Luhn end to end; registering it
# PAIRS with a 1:1 `pii_redaction` retirement under item c —
# privacy.pii_scrub strictly subsumes that query's email/SSN/phone
# masking+counting claim and adds card shape, the Luhn split, IPv4
# and per-kind counts) and `basket_pairs`
# (basket.basket_pairs_oracle_sql over lineitem order/part baskets —
# unordered co-membership with truncating support/lift and the
# mega-basket cap; distinct from collocations_topk's adjacent-token
# PMI; needs a _GLOBAL_WINDOW_OK entry for the ≤k-row rank window
# and a _BNLJ_OK entry for the one-row basket-count broadcast) and
# `twap` (timeseries.twap_oracle_sql — LOCF time-weighted mean over
# a window, the irregular-sampling claim user_moving_avg's row-window
# mean cannot make; one lead window + one aggregate) and
# `mmr_diversify` (retrieval.mmr_oracle_sql — Maximal Marginal
# Relevance re-rank over exact int8 dots, the result-diversification
# claim hybrid_rrf's fusion cannot make; greedy replayed by a
# recursive-CTE argmax, the Viterbi discipline; needs a _BNLJ_OK
# entry for the one-row probe broadcast).
# That pool is ~9 candidates for ~5 slots — pick by claim diversity
# at registration time.  Balance with
# item-c retirements where a genuine subsumption exists, else let N
# drift inside the 151..200 band (horizon 3 holds).  Fill = the
# ~25 alphabetically-first of the 50 surviving r12-dated queries,
# leaving ~25 r12 leftovers toward r16's mandatory front.
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
