"""Shared helpers for the registered query modules.

Every query callable receives (spark, sf_dir) from the driver harness,
which builds its OWN SparkSession — so each query must (a) set the
runtime confs the engine depends on (`ensure_runtime_confs`) and
(b) never rely on session defaults for semantics (ANSI-safe exprs).

Cross-engine determinism conventions (see plans/registry.py docstring):
- float aggregates rounded on both sides;
- rank/row_number cast to bigint (DuckDB windows return BIGINT,
  Spark returns int);
- timestamps exported as epoch seconds (bigint) — Spark µs vs DuckDB
  ns physical precision never reaches the comparator;
- a portable 60-bit hash (`hash60`) built from md5 hex, bit-identical
  in Spark (`conv(substring(md5(x),1,15),16,10)`) and DuckDB
  (`('0x' || substr(md5(x),1,15))::UBIGINT::BIGINT`) — this is what
  makes MinHash/SimHash oracle-checkable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ed_housing_data_pipeline_spark.functions import text as text_fns
from ed_housing_data_pipeline_spark.session import ensure_runtime_confs
from ed_housing_data_pipeline_spark.sources.tables import events_with_ts, load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a lake table with the engine's runtime confs applied."""
    ensure_runtime_confs(spark)
    return load_table(spark, sf_dir, name)


def events_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_with_ts(spark, sf_dir)


hash60 = text_fns.hash60  # canonical home: functions/text.py


def hash60_sql(expr: str) -> str:
    """The DuckDB twin of :func:`hash60` as a SQL fragment."""
    return f"CAST(CAST('0x' || substr(md5({expr}), 1, 15) AS UBIGINT) AS BIGINT)"


# DuckDB fragment: normalized text (lower, strip both ends, collapse
# inner whitespace, ''→NULL) — mirrors functions.text.normalize_text().
# Both regexp_replace calls need the 'g' flag: DuckDB is first-match-only
# by default, so without it '  x  ' keeps a trailing space (Spark's
# regexp_replace is always global).
def norm_text_sql(expr: str) -> str:
    return (
        f"NULLIF(regexp_replace(regexp_replace(lower({expr}), "
        "'^\\s+|\\s+$', '', 'g'), '\\s+', ' ', 'g'), '')"
    )


# DuckDB fragment: whitespace tokens of a text expr, [] for NULL/empty —
# mirrors functions.text.tokens().
def tokens_sql(expr: str) -> str:
    # split-then-filter, NOT trim+split: trim() semantics differ
    # across engines on tabs / unicode spaces (functions.text.tokens)
    return (
        f"CASE WHEN {expr} IS NULL THEN []::VARCHAR[] "
        f"ELSE list_filter(string_split_regex({expr}, '\\s+'), t -> t <> '') END"
    )
