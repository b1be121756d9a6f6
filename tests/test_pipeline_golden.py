"""Golden end-to-end medallion test (SURVEY §5 item 2).

FIXTURES.md §B bronze fixtures exercising every cleaning rule: label-row
drop, skip-rows header, coerce-to-null, zero-denominator null, county
normalization, dedup-keep-first, left-join nulls, inner-join drops.
Expected gold rows are computed by hand below and asserted exactly.
"""

from __future__ import annotations

import math

import pytest

from ed_housing_data_pipeline_spark.plans import pipeline
from ed_housing_data_pipeline_spark.sources.lake import LakeCatalog

HOUSING_CSV = """\
GEO_ID,NAME,S2503_C01_001E,S2503_C01_028E,S2503_C01_032E,S2503_C01_036E,S2503_C01_040E,S2503_C01_044E
Geography,Geographic Area Name,Estimate,Estimate,Estimate,Estimate,Estimate,Estimate
0500000US13121,"Fulton County, Georgia",1000,100,50,25,10,5
0500000US13121B,"Fulton County, Georgia",2000,1,1,1,1,1
0500000US13089,"DeKalb County, Georgia",0,10,10,(X),5,5
0500000US13067,"Cobb County, Georgia",500,-,20,20,10,0
0500000US13999,"Nowhere County, Georgia",800,10,10,10,10,10
"""

SCHOOL_CSV = """\
schoolid,schoolname,systemid,systemname,single_score_23
S1,School A,601,Fulton County,90.5
S2,School B,601,Fulton County,
S1,School C,601,Fulton County,79.5
S3,School D,760,Atlanta City,88.0
S4,School E,627,DeKalb County,70.0
S5,School F,633,Cobb County,80.0
"""

SPECIAL_CSV = """\
Report of special education environments
for school year 2022-23
"note: generated export, do not edit"
blank-ish preamble line
State LEA ID,LEA Name,School Age All Educational Environments,School Age Inside regular class 80% or more of the day,School Year
 601 ,Fulton County Schools,200,150,2022-2023
627,DeKalb County Schools,0,10,2022-2023
633,Cobb County Schools,100,x,2022-2023
999,Ghost District,50,25,2022-2023
"""


@pytest.fixture(scope="module")
def gold(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("lake")
    paths = pipeline.PipelinePaths(
        catalog=LakeCatalog(base=str(base)),
        ingest_date="2024-06-01",
        school_format="csv",  # no openpyxl in this environment
    )
    for dataset, fname, content in [
        ("housing_affordability", "housing2019-23.csv", HOUSING_CSV),
        ("school_performance", "school_performance.csv", SCHOOL_CSV),
        ("special_education", "special_education2022-23.csv", SPECIAL_CSV),
    ]:
        d = base / "bronze" / dataset / "ingest_date=2024-06-01"
        d.mkdir(parents=True)
        (d / fname).write_text(content)
    summary = pipeline.run_pipeline(spark, paths)
    gold_df = spark.read.parquet(paths.gold("county_analysis"))
    return summary, gold_df


def test_clean_once_frames_persisted_before_sinks(spark, tmp_path_factory, monkeypatch):
    """The reference's clean-once contract (bronze_to_silver.py:253):
    every cleaned frame must be persisted BEFORE the silver sinks and
    summarize() counts, or each of the 4 sinks + 4 counts re-executes
    the full bronze lineage (summarize's extra-action caveat)."""
    from ed_housing_data_pipeline_spark.sources import lake as lake_mod

    base = tmp_path_factory.mktemp("lake_persist")
    paths = pipeline.PipelinePaths(
        catalog=LakeCatalog(base=str(base)),
        ingest_date="2024-06-01",
        school_format="csv",
    )
    for dataset, fname, content in [
        ("housing_affordability", "housing2019-23.csv", HOUSING_CSV),
        ("school_performance", "school_performance.csv", SCHOOL_CSV),
        ("special_education", "special_education2022-23.csv", SPECIAL_CSV),
    ]:
        d = base / "bronze" / dataset / "ingest_date=2024-06-01"
        d.mkdir(parents=True)
        (d / fname).write_text(content)

    silver_writes_cached = []
    orig_write = lake_mod.write_parquet

    def spy_write(df, path, **kw):
        if "/silver/" in path:
            silver_writes_cached.append(df.is_cached)
        return orig_write(df, path, **kw)

    monkeypatch.setattr(pipeline.lake, "write_parquet", spy_write)
    pipeline.run_pipeline(spark, paths)
    assert len(silver_writes_cached) == 3
    assert all(silver_writes_cached), "silver sink saw an unpersisted frame"


def test_summary_counts(gold):
    summary, _ = gold
    assert summary["silver"]["housing"]["rows"] == 5  # label row dropped
    assert summary["silver"]["housing"]["columns"] == 9
    assert summary["silver"]["school"]["rows"] == 6
    assert summary["silver"]["special"]["rows"] == 4
    assert summary["gold"]["county_joined"]["rows"] == 3
    assert summary["gold"]["county_joined"]["columns"] == 17


def test_gold_schema(gold):
    _, df = gold
    assert df.columns == [
        "lea_id", "district_name", "county", "ccrpi_score_2023_mean",
        "school_count", "total_swd", "pct_inclusive_80_plus", "school_year",
        "GEO_ID", "county_name", "occupied_housing_units",
        "inc_lt_20k_cost_burden_30_plus", "inc_20k_34_999_cost_burden_30_plus",
        "inc_35k_49_999_cost_burden_30_plus", "inc_50k_74_999_cost_burden_30_plus",
        "inc_75k_plus_cost_burden_30_plus", "total_cost_burden_30_plus_pct",
    ]


def test_gold_fulton_row(gold):
    _, df = gold
    r = df.filter(df.county == "fulton").collect()
    assert len(r) == 1
    row = r[0].asDict()
    assert row["lea_id"] == "601"
    assert math.isclose(row["ccrpi_score_2023_mean"], 85.0)  # null score skipped
    assert row["school_count"] == 2  # S1 duplicated -> nunique
    assert row["total_swd"] == 200.0  # " 601 " trimmed to join
    assert row["pct_inclusive_80_plus"] == 75.0
    # dedup-keep-first: GEO_ID asc picks 0500000US13121, not ...121B
    assert row["GEO_ID"] == "0500000US13121"
    assert row["occupied_housing_units"] == 1000.0
    assert math.isclose(row["total_cost_burden_30_plus_pct"], 19.0)


def test_gold_zero_denominators_are_null(gold):
    _, df = gold
    row = df.filter(df.county == "dekalb").collect()[0].asDict()
    assert row["total_swd"] == 0.0
    assert row["pct_inclusive_80_plus"] is None  # 10 / nullif(0) -> NULL
    assert row["occupied_housing_units"] == 0.0
    assert row["total_cost_burden_30_plus_pct"] is None
    assert row["inc_35k_49_999_cost_burden_30_plus"] is None  # "(X)" coerced


def test_gold_coerce_and_inclusion_null(gold):
    _, df = gold
    row = df.filter(df.county == "cobb").collect()[0].asDict()
    assert row["inc_lt_20k_cost_burden_30_plus"] is None  # "-" coerced
    # null burden counts as 0 in the horizontal sum: (0+20+20+10+0)/500*100
    assert math.isclose(row["total_cost_burden_30_plus_pct"], 10.0)
    assert row["pct_inclusive_80_plus"] is None  # "x" inside-count coerced


def test_gold_join_semantics(gold):
    _, df = gold
    counties = {r["county"] for r in df.collect()}
    assert counties == {"fulton", "dekalb", "cobb"}
    # atlanta city (no housing county) and nowhere (no district) dropped;
    # ghost LEA 999 (no school rows) absent


def test_gold_rank_sum_top1(gold):
    _, df = gold
    best = pipeline.gold_rank_sum_top1(df).collect()
    assert len(best) == 1
    # cobb: affordability rank 1 (10.0 vs 19.0 vs NULL), ccrpi rank 2,
    # inclusion rank 2/3 (NULL ties) -> sum 5|6; fulton: 2+1+1=4 -> wins
    assert best[0]["county"] == "fulton"
    assert best[0]["overall_rank_sum"] == 4


def test_analyze_gold_suite(spark, gold):
    """The reference's four viewer analyses (view_gold.py:37-118) give
    the hand-computable winners on the fixture gold."""
    _, df = gold
    out = pipeline.analyze_gold(spark, df)
    assert out["most_affordable"].first()["county"] == "cobb"  # 10.0 < 19.0
    assert out["best_ccrpi"].first()["county"] == "fulton"  # 85.0
    assert out["most_inclusive"].first()["county"] == "fulton"  # 75.0 only non-null
    best = out["best_overall"].first()
    assert best["county"] == "fulton" and best["overall_rank_sum"] == 4


def test_pipeline_xlsx_school_input_matches_csv(spark, tmp_path_factory, gold):
    """SCHOOL_FORMAT=xlsx end-to-end: the vendored stdlib xlsx reader
    (no openpyxl in this container) feeds the same golden pipeline and
    yields a bit-identical gold table to the CSV run."""
    base = tmp_path_factory.mktemp("lake_xlsx")
    paths = pipeline.PipelinePaths(
        catalog=LakeCatalog(base=str(base)),
        ingest_date="2024-06-01",
        school_format="xlsx",
    )
    from tests.conftest import write_xlsx

    school_rows = [
        ["schoolid", "schoolname", "systemid", "systemname", "single_score_23"],
        ["S1", "School A", 601, "Fulton County", 90.5],
        ["S2", "School B", 601, "Fulton County", None],
        ["S1", "School C", 601, "Fulton County", 79.5],
        ["S3", "School D", 760, "Atlanta City", 88.0],
        ["S4", "School E", 627, "DeKalb County", 70.0],
        ["S5", "School F", 633, "Cobb County", 80.0],
    ]
    for dataset, fname, content in [
        ("housing_affordability", "housing2019-23.csv", HOUSING_CSV),
        ("special_education", "special_education2022-23.csv", SPECIAL_CSV),
    ]:
        d = base / "bronze" / dataset / "ingest_date=2024-06-01"
        d.mkdir(parents=True)
        (d / fname).write_text(content)
    d = base / "bronze" / "school_performance" / "ingest_date=2024-06-01"
    d.mkdir(parents=True)
    write_xlsx(d / "school_performance.xlsx", school_rows)
    summary = pipeline.run_pipeline(spark, paths)
    assert summary["silver"]["school"]["rows"] == 6
    got = spark.read.parquet(paths.gold("county_analysis"))
    _, csv_gold = gold
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, csv_gold.collect()))


def test_silver_roundtrip_matches_inmemory_gold(spark, gold):
    """Reference entry 3: gold rebuilt FROM silver parquet must equal the
    in-memory gold (silver_to_gold.py:87-115)."""
    summary, df = gold
    silver = {
        name: spark.read.parquet(summary["silver"][name]["output_path"])
        for name in ("housing", "school", "special")
    }
    rebuilt = pipeline.build_gold(silver["housing"], silver["school"], silver["special"])
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, rebuilt.collect()))
    assert a == b
