from ed_housing_data_pipeline_spark.operators import (  # noqa: F401
    aggs,
    clean,
    events,
    joins,
    setops,
    topk,
    windows,
)
