"""Training-data export sinks: JSON-lines files and deterministic
hash shards.

The reference's only output surface is partitioned parquet
(silver_to_gold.py:101-103, SURVEY.md §2.1 S6). A training-data
pipeline additionally has to SHIP a corpus — and the interchange
format LLM data tooling consumes is JSON-lines shard files
(one JSON object per line, N fixed shards, usually gzip). Two pieces:

- :func:`write_json_lines` — plain distributed JSONL sink (optional
  compression codec, optional hive-style partitioning). Spark's JSON
  writer escapes embedded newlines/quotes, so arbitrary document text
  round-trips line-safe.
- :func:`export_jsonl_shards` — deterministic sharded export: every
  row lands in shard ``hash60(key) % n_shards``. The shard id is a
  pure row-local expression on a stable business key, so the same row
  lands in the same shard on every run, any cluster size, and any
  engine that can compute md5 (the DuckDB oracle recomputes it in
  ``doc_export_shards``, plans/queries_llm.py) — which is what makes
  an export resumable, diffable, and consistently sampleable (one
  shard is an unbiased 1/N of the corpus keyed by ``key``).

Scale shape: the shard expression is narrow (no shuffle to compute);
the single shuffle is ``repartition(n_shards, shard)`` so that each
shard's rows are co-located and ``partitionBy(shard)`` emits exactly
one file per shard directory instead of one-file-per-task-per-shard
small-file debris. Pick ``n_shards`` so one shard ≈ one comfortable
object-store file (0.5–4 GiB compressed) at the target corpus size;
at 100 TB that is O(10⁴–10⁵) shards, far past any skew concern for a
near-unique key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from ed_housing_data_pipeline_spark.functions.text import _c, hash60


def shard_id(key: Column | str, n_shards: int) -> Column:
    """Deterministic shard assignment ``hash60(key) % n_shards`` as an
    int column. ``hash60`` is non-negative (60-bit), so no sign fixup
    is needed. NULL keys get NULL shard — surface them to the caller
    rather than silently piling them into shard 0."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    return (hash60(_c(key).cast("string")) % n_shards).cast("int")


def write_json_lines(
    df: DataFrame,
    path: str,
    mode: str = "errorifexists",
    compression: str | None = None,
    partition_by: Sequence[str] = (),
) -> None:
    """Distributed JSON-lines sink. ``compression`` is a Spark codec
    name (``gzip``, ``zstd``, ...); ``partition_by`` adds hive-style
    value directories exactly like the parquet lake sink
    (sources/lake.py write_parquet)."""
    writer = df.write.mode(mode)
    if compression is not None:
        writer = writer.option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)


def export_jsonl_shards(
    df: DataFrame,
    path: str,
    key: Column | str,
    n_shards: int,
    compression: str | None = "gzip",
    shard_col: str = "shard",
    mode: str = "errorifexists",
) -> None:
    """Write ``df`` as ``n_shards`` JSONL shard directories
    ``path/shard=K/`` with deterministic membership (see module
    docstring). A NULL ``key`` fails the export job (raise_error in
    the shard expression) — a training export must not silently drop
    or misfile records."""
    if shard_col in df.columns:
        raise ValueError(f"column {shard_col!r} already exists in the frame")
    # NULL keys would vanish into a shard=__HIVE_DEFAULT_PARTITION__
    # directory that a by-number shard reader never opens; fail the
    # export instead. raise_error keeps the guard INSIDE the single
    # write pass — a separate precheck job would read the corpus twice.
    shard = shard_id(key, n_shards)
    guarded = F.when(
        shard.isNull(),
        F.raise_error(F.lit("export_jsonl_shards: NULL shard key in input")),
    ).otherwise(shard)
    keyed = df.withColumn(shard_col, guarded)
    write_json_lines(
        keyed.repartition(n_shards, F.col(shard_col)),
        path,
        mode=mode,
        compression=compression,
        partition_by=(shard_col,),
    )


def read_jsonl_shards(
    spark,
    path: str,
    schema,
    shard_col: str = "shard",
) -> DataFrame:
    """Read a sharded export back. ``schema`` covers the DATA columns
    (the shard partition directory is discovered and appended by the
    scan); passing it explicitly skips the schema-inference pass — at
    export scale, a second full read of the corpus."""
    df = spark.read.schema(schema).option("basePath", path).json(path)
    if shard_col not in df.columns:
        # an EMPTY export writes no shard=K directories, so the scan
        # discovers no partition column at all — surface the same
        # schema (with a NULL shard) instead of an analysis error
        return df.withColumn(shard_col, F.lit(None).cast("int"))
    return df.withColumn(shard_col, F.col(shard_col).cast("int"))
