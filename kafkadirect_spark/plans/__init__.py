from kafkadirect_spark.plans.queries import ORACLE_SQL, QUERIES
from kafkadirect_spark.plans import llm_queries  # noqa: F401  (registers into QUERIES)
from kafkadirect_spark.plans import curation_queries  # noqa: F401  (registers into QUERIES)

__all__ = ["QUERIES", "ORACLE_SQL"]
