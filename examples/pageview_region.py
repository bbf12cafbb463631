"""PageView-by-region — the reference's typed-join demo
(streams/examples/.../pageview/PageViewTypedDemo.java): a view stream
joined against a user-profile table, then a windowed count per region.

Here: events (views) ⋈ customer → nation (the region dim), tumbling
hourly count per nation.

Run:  python examples/pageview_region.py [sf_dir]
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from kafkadirect_spark import GlobalTable, Stream, Table, get_spark
from kafkadirect_spark.core import Windows
from kafkadirect_spark.sources.batch import load_table


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("pageview-demo")
    views = Stream(load_table(spark, sf_dir, "events"),
                   key="user_id", ts="ts").filter(F.col("event_type") == "view")
    users = Table(load_table(spark, sf_dir, "customer")
                  .select("c_custkey", "c_nationkey"), key="c_custkey")
    nations = GlobalTable(load_table(spark, sf_dir, "nation"), key="n_nationkey")

    out = (
        views.join_table(users, on=F.col("user_id") == F.col("c_custkey"))
        .join_global(nations, on=F.col("c_nationkey") == F.col("n_nationkey"))
        .group_by("n_name")
        .windowed_by(Windows.tumbling("1 hour"))
        .count(name="views")
    )
    out.select(F.col("window.start").alias("hour"), "n_name", "views") \
        .orderBy("hour", "n_name").show(20)


if __name__ == "__main__":
    main(*sys.argv[1:])
