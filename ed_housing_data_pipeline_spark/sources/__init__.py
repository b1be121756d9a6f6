from ed_housing_data_pipeline_spark.sources.tables import load_table, load_tables, register_views  # noqa: F401
from ed_housing_data_pipeline_spark.sources.readers import (  # noqa: F401
    read_csv,
    read_csv_skip_rows,
    read_excel,
    read_json_lines,
    read_parquet,
)
from ed_housing_data_pipeline_spark.sources.lake import LakeCatalog, write_parquet  # noqa: F401
from ed_housing_data_pipeline_spark.sources.export import (  # noqa: F401
    export_jsonl_shards,
    read_jsonl_shards,
    shard_id,
    write_json_lines,
)
