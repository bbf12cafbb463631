"""Column-function library: Connect-SMT equivalents (smt), the
large-scale training-data-pipeline operators (text, dedup, similarity,
multimodal, curation, diagnostics), the three tokenizer families and
their shared consumers (bpe, unigram, wordpiece, tokeval), time-series search
(timeseries), layout/graph/partitioner/timestamps utilities, and the
deterministic sketch family (sketch: HLL distinct, count-min
frequency, histogram quantiles, exact order statistics).

Everything here returns Column expressions or DataFrame transforms
built from pyspark.sql.functions — JVM-side, whole-stage-codegen'd —
except the explicitly-marked Pandas-UDF paths (multimodal decode),
which are Arrow-batched.  No row-at-a-time Python UDFs anywhere.
"""

from kafkadirect_spark.functions import (  # noqa: F401
    bpe, curation, dedup, diagnostics, graph, layout, multimodal,
    partitioner, similarity, sketch, smt, text, timeseries,
    timestamps, tokeval, unigram, wordpiece,
)
