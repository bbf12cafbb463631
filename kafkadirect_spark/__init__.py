"""kafkadirect_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of spcl/kafkadirect (Apache Kafka 2.2 + RDMA).

The reference engine is Kafka Streams (a typed dataflow DSL over a
partitioned log: filters, maps, joins, windowed/session/unwindowed
aggregations, suppression, stateful processors) plus the broker's
log-scan query surface and Kafka Connect's per-record transforms
(SMTs).  This package re-expresses that surface Spark-first:

- ``core``        Stream / Table / GlobalTable wrappers over DataFrames
                  (the Kafka Streams DSL shape; reference:
                  streams/.../kstream/KStream.java, KTable.java)
- ``operators``   stateless transforms, grouping/aggregation, windows,
                  joins — all compiled to DataFrame ops so Catalyst
                  optimizes (predicate pushdown, broadcast, AQE)
- ``functions``   Connect-SMT equivalents plus the large-scale
                  training-data-pipeline set: dedup (exact/MinHash-LSH/
                  SimHash/ngram-Jaccard), similarity search, text
                  analysis, multimodal binary columns, corpus curation
                  (splits, sampling/mixing, decontamination, packing)
- ``sources``     parquet/Kafka/file sources and sinks
- ``streaming``   Structured Streaming equivalents of the stateful
                  machinery (suppression, custom processors, watermarks)

Design stance (SURVEY.md §7): every operator is declarative DataFrame
API so that at 100 TB the physical plan (shuffles, broadcasts,
pushdown, codegen) is chosen by Catalyst + AQE, not hand-scheduled.
"""

from kafkadirect_spark.core import (
    GlobalTable, JoinWindows, Stream, Table, Windows,
)
from kafkadirect_spark.session import get_spark

__all__ = ["Stream", "Table", "GlobalTable", "Windows", "JoinWindows",
           "get_spark"]
__version__ = "0.2.0"
