"""Behavioral analytics demo over the events stream table: the
ordered signup→view→click→purchase funnel (with and without a
conversion window), the most-traveled event paths, and last-touch
conversion attribution (which touch type gets credit for each
purchase).

No reference analogue (SURVEY.md §2 — the reference aggregates but
has no ordered-sequence operators); this demos the beyond-parity
behavior surface.

Run:  python examples/funnel_paths.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")

from kafkadirect_spark import get_spark
from kafkadirect_spark.functions import behavior
from kafkadirect_spark.sources.batch import load_table


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("funnel-paths-demo")
    ev = load_table(spark, sf_dir, "events")
    steps = ["signup", "view", "click", "purchase"]

    print("== funnel, unbounded ==")
    behavior.funnel_steps(ev, "user_id", "ts", "event_type",
                          steps).orderBy("step").show()

    print("== funnel, 30-day conversion window from signup ==")
    behavior.funnel_steps(ev, "user_id", "ts", "event_type", steps,
                          within_seconds=30 * 24 * 3600) \
            .orderBy("step").show()

    print("== top 10 event trigram paths ==")
    behavior.path_topk(ev, "user_id", "ts", "event_type", n=3, k=10,
                       order_break_col="event_id").show(truncate=False)

    print("== last-touch attribution, 24h lookback ==")
    behavior.attribution_last_touch(
        ev, "user_id", "ts", "event_type", "purchase",
        within_seconds=24 * 3600, order_break_col="event_id") \
        .orderBy("n_conversions", ascending=False).show()


if __name__ == "__main__":
    main(*sys.argv[1:])
