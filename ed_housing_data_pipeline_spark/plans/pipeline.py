"""Medallion pipeline: bronze → silver → gold, Spark-first.

Re-expresses the reference's end-to-end capability
(/root/reference/bronze_to_silver.py:34-164 cleaning,
/root/reference/silver_to_gold.py:39-84 gold build,
/root/reference/bronze_to_silver.py:225-285 single-run orchestration)
as a composition of the engine's operators over lazy DataFrames.

Key semantic decisions (documented divergences from pandas quirks):

- CSV/Excel ingestion is all-strings + explicit coercion (SURVEY §1.2):
  the reference relies on pandas inference collapsing to object dtype
  because of the embedded label row, then repair-casts; we make the
  contract explicit and identical in effect.
- ``drop_duplicates(subset=["county"])`` keeps the first row in file
  order — a partition-order-dependent notion Spark doesn't have. We
  dedup deterministically by ``GEO_ID`` ascending
  (operators.joins.dedup_one_per_key), which for the reference data is
  the same row (one GEO per county) and is reproducible under any
  partitioning.
- pandas ``astype(str)`` turns NaN lea_id into the string ``"nan"``,
  silently defeating the later ``dropna(subset=["lea_id"])``
  (silver_to_gold.py:56,64 — SURVEY §2.2 P5). We keep NULL as NULL and
  let the dropna actually drop — the sane behavior, stated here once.
- pandas ``groupby(dropna=True)`` drops rows with NULL in ANY group
  key; Spark keeps NULL groups. ``grouped_agg(drop_null_keys=True)``
  reproduces the pandas behavior explicitly (SURVEY §2.4 A1 trap).

Scale shape: silver cleans are narrow (scan→filter→project→cast, one
stage, no shuffle); gold is one grouped agg shuffle on lea_id + two
broadcast joins (county-level dims are bounded by construction). The
cleaned frames are persisted once and fanned out to 4 sinks — the
Spark equivalent of the reference's "no parquet re-read" comment
(bronze_to_silver.py:253).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel

from ed_housing_data_pipeline_spark.functions.numeric import horizontal_sum, safe_div
from ed_housing_data_pipeline_spark.functions.text import normalize_join_key
from ed_housing_data_pipeline_spark.operators import aggs, clean, joins
from ed_housing_data_pipeline_spark.sources import lake, readers

HOUSING_KEEP = {
    "GEO_ID": "GEO_ID",
    "NAME": "county_name",
    "S2503_C01_001E": "occupied_housing_units",
    "S2503_C01_028E": "inc_lt_20k_cost_burden_30_plus",
    "S2503_C01_032E": "inc_20k_34_999_cost_burden_30_plus",
    "S2503_C01_036E": "inc_35k_49_999_cost_burden_30_plus",
    "S2503_C01_040E": "inc_50k_74_999_cost_burden_30_plus",
    "S2503_C01_044E": "inc_75k_plus_cost_burden_30_plus",
}
BURDEN_COLS = [
    "inc_lt_20k_cost_burden_30_plus",
    "inc_20k_34_999_cost_burden_30_plus",
    "inc_35k_49_999_cost_burden_30_plus",
    "inc_50k_74_999_cost_burden_30_plus",
    "inc_75k_plus_cost_burden_30_plus",
]
SCHOOL_KEEP = {
    "schoolid": "school_id",
    "schoolname": "school_name",
    "systemid": "lea_id",
    "systemname": "district_name",
    "single_score_23": "ccrpi_score_2023",
}
SPECIAL_KEEP = {
    "State LEA ID": "lea_id",
    "LEA Name": "district_name",
    "School Age All Educational Environments": "total_swd",
    "School Age Inside regular class 80% or more of the day": "inside_80_plus",
    "School Year": "school_year",
}


def clean_housing(raw: DataFrame) -> DataFrame:
    """ACS housing clean (reference bronze_to_silver.py:62-112): drop
    the label row, project+rename, coerce measures, derive the
    cost-burden share with NULL-poisoned zero denominator."""
    out = raw.filter(F.col("GEO_ID") != "Geography")
    out = clean.project_rename(out, HOUSING_KEEP)
    out = clean.coerce_numeric(out, ["occupied_housing_units", *BURDEN_COLS])
    pct = safe_div(
        horizontal_sum(*BURDEN_COLS),
        F.col("occupied_housing_units"),
        scale=100.0,
    )
    return out.withColumn("total_cost_burden_30_plus_pct", pct)


def clean_school(raw: DataFrame) -> DataFrame:
    """School performance clean (reference bronze_to_silver.py:114-125);
    the score column is coerced explicitly (all-strings ingest)."""
    out = clean.project_rename(raw, SCHOOL_KEEP)
    return clean.coerce_numeric(out, ["ccrpi_score_2023"])


def clean_special(raw: DataFrame) -> DataFrame:
    """Special-education clean (reference bronze_to_silver.py:127-162):
    project+rename, coerce counts, derive inclusion share, final
    5-column projection."""
    out = clean.project_rename(raw, SPECIAL_KEEP)
    out = clean.coerce_numeric(out, ["total_swd", "inside_80_plus"])
    out = out.withColumn(
        "pct_inclusive_80_plus",
        safe_div(F.col("inside_80_plus"), F.col("total_swd"), scale=100.0),
    )
    return out.select(
        "lea_id", "district_name", "total_swd", "pct_inclusive_80_plus", "school_year"
    )


def build_gold(
    housing: DataFrame, school: DataFrame, special: DataFrame
) -> DataFrame:
    """LEA/county gold join (reference silver_to_gold.py:39-84):
    school→LEA agg, left join special on lea_id, inner join housing on
    the normalized county key.

    Both dimension sides are bounded (LEAs, counties) → broadcast; the
    plan has no sort-merge join and only the groupBy shuffle.
    """
    housing = housing.withColumn("county", normalize_join_key("county_name"))
    school = school.withColumn("lea_id", F.trim(F.col("lea_id").cast("string")))
    school = school.withColumn("county", normalize_join_key("district_name"))
    special = special.withColumn("lea_id", F.trim(F.col("lea_id").cast("string")))

    school_lea = aggs.grouped_agg(
        school.na.drop(subset=["lea_id"]),
        keys=["lea_id", "district_name", "county"],
        aggs={
            "ccrpi_score_2023_mean": F.avg("ccrpi_score_2023"),
            "school_count": F.countDistinct("school_id"),
        },
        drop_null_keys=True,  # pandas groupby(dropna=True) parity
    )

    lea_joined = joins.equi_join(
        school_lea,
        special.select("lea_id", "total_swd", "pct_inclusive_80_plus", "school_year"),
        on="lea_id",
        how="left",
        broadcast_right=True,
    )

    housing_county = joins.dedup_one_per_key(
        housing.na.drop(subset=["county"]),
        keys=["county"],
        order_by=[F.col("GEO_ID").asc()],
    )
    return joins.equi_join(
        lea_joined, housing_county, on="county", how="inner", broadcast_right=True
    ).select(
        "lea_id",
        "district_name",
        "county",
        "ccrpi_score_2023_mean",
        "school_count",
        "total_swd",
        "pct_inclusive_80_plus",
        "school_year",
        "GEO_ID",
        "county_name",
        "occupied_housing_units",
        *BURDEN_COLS,
        "total_cost_burden_30_plus_pct",
    )


@dataclass(frozen=True)
class PipelinePaths:
    """Canonical bronze/silver/gold locations for one ingest_date
    (reference _paths, bronze_to_silver.py:18-31)."""

    catalog: lake.LakeCatalog
    ingest_date: str
    school_format: str = "xlsx"  # "xlsx" (vendored stdlib reader) | "csv"

    def bronze(self, dataset: str, filename: str) -> str:
        return f"{self.catalog.partition('bronze', dataset, self.ingest_date)}/{filename}"

    def silver(self, dataset: str) -> str:
        return self.catalog.partition("silver", dataset, self.ingest_date)

    def gold(self, dataset: str) -> str:
        return self.catalog.partition("gold", dataset, self.ingest_date)


def build_silver_frames(
    spark: SparkSession, paths: PipelinePaths
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Read the three bronze inputs and clean them (reference
    build_silver_frames, bronze_to_silver.py:34-164)."""
    housing_raw = readers.read_csv(
        spark, paths.bronze("housing_affordability", "housing2019-23.csv")
    )
    if paths.school_format == "xlsx":
        school_raw = readers.read_excel(
            spark, paths.bronze("school_performance", "school_performance.xlsx")
        )
    else:
        school_raw = readers.read_csv(
            spark, paths.bronze("school_performance", "school_performance.csv")
        )
    special_raw = readers.read_csv_skip_rows(
        spark,
        paths.bronze("special_education", "special_education2022-23.csv"),
        skip_rows=4,
    )
    return clean_housing(housing_raw), clean_school(school_raw), clean_special(special_raw)


def run_pipeline(spark: SparkSession, paths: PipelinePaths) -> dict:
    """Single-run pipeline: bronze → clean once → 3 silver sinks + gold
    sink, no re-read (reference run_bronze_to_silver_and_gold,
    bronze_to_silver.py:225-285; persist() is the Spark equivalent of
    the in-memory reuse comment at :253)."""
    housing, school, special = build_silver_frames(spark, paths)
    frames = {"housing": housing, "school": school, "special": special}
    for df in frames.values():
        df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        silver_out = {
            "housing": paths.silver("housing_affordability"),
            "school": paths.silver("school_performance"),
            "special": paths.silver("special_education"),
        }
        summary: dict = {"silver": {}, "gold": {}}
        for name, df in frames.items():
            lake.write_parquet(df, silver_out[name])
            summary["silver"][name] = lake.summarize(df, silver_out[name])

        gold = build_gold(housing, school, special)
        gold_out = paths.gold("county_analysis")
        lake.write_parquet(gold, gold_out)
        summary["gold"]["county_joined"] = lake.summarize(gold, gold_out)
        return summary
    finally:
        for df in frames.values():
            df.unpersist()


def gold_rank_sum_top1(gold: DataFrame) -> DataFrame:
    """The reference's flagship analysis on the gold table
    (duckdb_viewer/view_gold.py:94-113): rank affordability ASC,
    CCRPI DESC, inclusion DESC (all NULLS LAST), sum the ranks,
    return the best county."""
    from ed_housing_data_pipeline_spark.operators import topk, windows

    ranked = windows.ranked(
        gold,
        {
            "r_affordable": windows.order_col(
                "total_cost_burden_30_plus_pct", ascending=True
            ),
            "r_ccrpi": windows.order_col("ccrpi_score_2023_mean", ascending=False),
            "r_inclusive": windows.order_col("pct_inclusive_80_plus", ascending=False),
        },
    )
    ranked = ranked.withColumn(
        "overall_rank_sum",
        F.col("r_affordable") + F.col("r_ccrpi") + F.col("r_inclusive"),
    )
    return topk.top_k(
        ranked, [F.col("overall_rank_sum").asc(), F.col("county").asc()], k=1
    )


def analyze_gold(spark: SparkSession, gold: DataFrame) -> dict[str, DataFrame]:
    """The reference's DuckDB analysis suite over the gold table
    (duckdb_viewer/view_gold.py:37-118), re-expressed as ``spark.sql``
    over a temp view — the same SQL-over-parquet-view pattern, with
    explicit NULLS LAST (DuckDB's default, not Spark's).

    Returns the four named analyses: most-affordable county, best mean
    CCRPI, most-inclusive, and the rank-sum best-overall (top-1 each).
    """
    gold.createOrReplaceTempView("gold")
    top1 = "ORDER BY {metric} {dir} NULLS LAST, county ASC LIMIT 1"
    queries = {
        "most_affordable": f"""
            SELECT county, district_name, total_cost_burden_30_plus_pct
            FROM gold WHERE total_cost_burden_30_plus_pct IS NOT NULL
            {top1.format(metric="total_cost_burden_30_plus_pct", dir="ASC")}""",
        "best_ccrpi": f"""
            SELECT county, district_name, ccrpi_score_2023_mean
            FROM gold WHERE ccrpi_score_2023_mean IS NOT NULL
            {top1.format(metric="ccrpi_score_2023_mean", dir="DESC")}""",
        "most_inclusive": f"""
            SELECT county, district_name, pct_inclusive_80_plus
            FROM gold WHERE pct_inclusive_80_plus IS NOT NULL
            {top1.format(metric="pct_inclusive_80_plus", dir="DESC")}""",
        "best_overall": """
            WITH ranked AS (
                SELECT *,
                    rank() OVER (ORDER BY total_cost_burden_30_plus_pct
                                 ASC NULLS LAST) AS r_affordable,
                    rank() OVER (ORDER BY ccrpi_score_2023_mean
                                 DESC NULLS LAST) AS r_ccrpi,
                    rank() OVER (ORDER BY pct_inclusive_80_plus
                                 DESC NULLS LAST) AS r_inclusive
                FROM gold
            )
            SELECT county, district_name,
                   (r_affordable + r_ccrpi + r_inclusive) AS overall_rank_sum
            FROM ranked
            ORDER BY overall_rank_sum ASC, county ASC
            LIMIT 1""",
    }
    return {name: spark.sql(sql) for name, sql in queries.items()}


if __name__ == "__main__":
    # CLI runner printing a JSON summary (reference C5:
    # bronze_to_silver.py:288-302, silver_to_gold.py:118-123).
    # Env contract mirrors the reference: LAKE_BASE (required),
    # INGEST_DATE (default today), SCHOOL_FORMAT (xlsx|csv).
    import json
    import os
    import sys

    from ed_housing_data_pipeline_spark.session import get_spark

    base = os.environ.get("LAKE_BASE")
    if not base:
        sys.exit("LAKE_BASE env var required (e.g. file:///tmp/lake)")
    p = PipelinePaths(
        catalog=lake.LakeCatalog(base),
        ingest_date=lake.default_ingest_date(),
        school_format=os.environ.get("SCHOOL_FORMAT", "xlsx"),
    )
    print(json.dumps(run_pipeline(get_spark("medallion-pipeline"), p), indent=2))
