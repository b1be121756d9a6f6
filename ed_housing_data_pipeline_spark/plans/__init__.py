from ed_housing_data_pipeline_spark.plans.registry import QUERIES, oracle_sql_map, query_map  # noqa: F401
