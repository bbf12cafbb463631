"""WordCount — the reference's canonical demo
(streams/examples/.../wordcount/WordCountDemo.java:65-70):
flatMapValues(split) → groupBy(word) → count, on the documents table.

Run:  python examples/wordcount.py [sf_dir]
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from kafkadirect_spark import Stream, get_spark
from kafkadirect_spark.sources.batch import load_table


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("wordcount-demo")
    docs = Stream(load_table(spark, sf_dir, "documents"))
    counts = (
        docs.map_values(value=F.lower("text"))
        .flat_map_values(F.split(F.col("value"), "[^a-z0-9]+"), name="word")
        .filter(F.col("word") != "")
        .group_by("word")
        .count(name="count")
    )
    counts.orderBy(F.desc("count")).show(20)


if __name__ == "__main__":
    main(*sys.argv[1:])
