from kafkadirect_spark.plans.queries import ORACLE_SQL, QUERIES

__all__ = ["QUERIES", "ORACLE_SQL"]
