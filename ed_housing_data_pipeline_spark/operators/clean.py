"""Clean / cast / derive operators (SURVEY.md §2.2, §2.5).

The reference's cleaning stage (bronze_to_silver.py:62-162) is a fixed
sequence: filter label rows → project keep-list → bulk rename → coerce
numerics → derive ratios. Here each step is a reusable operator over a
lazy DataFrame; Catalyst collapses the whole chain into one projection
over the scan (column pruning + predicate pushdown reach the source).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F

from ed_housing_data_pipeline_spark.functions.numeric import coerce_double


def project_rename(df: DataFrame, keep: Mapping[str, str]) -> DataFrame:
    """Select + rename in one projection.

    ``keep`` maps source column → output name (reference's keep-list +
    ``rename(columns=...)`` pairs, bronze_to_silver.py:64-85).
    """
    return df.select([F.col(f"`{src}`").alias(dst) for src, dst in keep.items()])


def coerce_numeric(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """String→double, invalid→NULL, for each named column
    (reference bronze_to_silver.py:96-98 ``pd.to_numeric(errors='coerce')``)."""
    # one withColumns call — a withColumn per column would trigger one
    # full analysis pass each (driver latency per plan build)
    return df.withColumns({c: coerce_double(c) for c in cols})


def with_columns(df: DataFrame, derived: Mapping[str, Column]) -> DataFrame:
    """Attach derived columns in one pass."""
    return df.withColumns(dict(derived))


def drop_null_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Drop rows with NULL in any key column.

    Needed for oracle/pandas parity: pandas ``groupby`` silently drops
    NaN-keyed rows (SURVEY.md §2.4 A1 trap) while Spark would keep a
    NULL group — the engine makes the policy explicit.
    """
    return df.na.drop(subset=list(keys))
