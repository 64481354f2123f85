from cc2dataset_spark.plans.catalog import QUERIES, Query, query, queries, oracle_sql

__all__ = ["QUERIES", "Query", "query", "queries", "oracle_sql"]
