"""Scale operators that don't exist in the reference but that its
workloads need at 100 TB: explicit skew mitigation beyond what AQE
does automatically, and the time-correct as-of enrichment join."""

from kafkadirect_spark.operators import asof  # noqa: F401
from kafkadirect_spark.operators import skew  # noqa: F401
