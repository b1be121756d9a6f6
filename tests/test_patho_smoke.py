"""Always-on pathological-input differential SMOKE tier.

The full-family pathological sweeps (tests/test_patho_text.py) found
20+ real cross-engine bugs but cost minutes each, so they gate behind
RUN_SLOW=1 — which means the default suite never exercised the worst
offenders at all. This tier keeps a ~60s slice of them in EVERY run:
the smallest corpora that carry the known bug-revealing shapes (NULL
keys, unicode/both-ends whitespace, malformed JSON, zero-norm and
wrong-dimension vectors, NULL event times, zero denominators), driven
through the SAME engine-vs-DuckDB comparison the driver harness uses
(scripts/check_correctness.canon), over a curated set of the queries
those shapes historically broke.
"""

from __future__ import annotations

import importlib.util
import glob
import os
import shutil

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.test_patho_text import (
    PATHO_TEXTS,
    _patho_embeddings_rows,
    _patho_events_rows,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SPEC = importlib.util.spec_from_file_location(
    "_cc", os.path.join(REPO, "scripts", "check_correctness.py")
)
_cc = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_cc)
canon = _cc.canon

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()

# the worst offenders per family — every one of these query families
# had a real bug found by the slow sweeps (see patho-sweeps history)
SMOKE_QUERIES = [
    "doc_exact_dedup",          # both-ends whitespace normalization
    "doc_fingerprint",          # same norm feeding md5
    "doc_lang_id_heuristic",    # unicode tokenization
    "doc_gopher_quality_flags",  # token stats on empty/whitespace docs
    "doc_pack_assignment",      # NULL-partition-key sharded prefix sum
    "embedding_neardup_pairs",  # zero-norm cosine, wrong-dim quarantine
    "events_props_struct",      # malformed/typed-wrong JSON props
    "events_asof_last_view",    # NULL event-time quarantine
    "safe_division",            # zero denominators / 0→NULL
    "grouped_agg",              # NULL group keys + drop-nulls policy
    "table_summary",            # catalog-driven column count
]


def _write_single_parquet(spark, df, path):
    tmp = str(path) + "._w"
    df.coalesce(1).write.parquet(tmp)
    shutil.copy(glob.glob(f"{tmp}/part-*.parquet")[0], str(path))


@pytest.fixture(scope="module")
def smoke_sf(spark, tmp_path_factory):
    sf = tmp_path_factory.mktemp("patho_smoke_sf")
    base = "/root/testdata/sf0.001"
    for t in TABLES:
        shutil.copy(f"{base}/{t}.parquet", str(sf / f"{t}.parquet"))
    # documents: the pathological text battery (NULL, whitespace-only,
    # both-ends padded, NBSP, unicode, emoji) with NULL lang/source keys
    rows = [
        (
            i,
            t,
            "en" if i % 4 else None,
            f"src{i % 3}" if i % 5 else None,
            len(t) if t else 0,
        )
        for i, t in enumerate(PATHO_TEXTS)
    ]
    _write_single_parquet(
        spark,
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, "
            "n_chars long"
        ),
        sf / "documents.parquet",
    )
    from ed_housing_data_pipeline_spark.plans.queries_llm import EMB_DIM

    _write_single_parquet(
        spark,
        spark.createDataFrame(
            _patho_embeddings_rows(EMB_DIM),
            "vec_id long, embedding array<float>, label int",
        ),
        sf / "embeddings.parquet",
    )
    _write_single_parquet(
        spark,
        spark.createDataFrame(
            _patho_events_rows(),
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ),
        sf / "events.parquet",
    )
    # core tables: take real sf0.001 rows, then inject the bug-revealing
    # shapes via column surgery (schema guaranteed to match the driver's)
    cust = (
        spark.read.parquet(f"{base}/customer.parquet")
        .limit(40)
        .withColumn(
            "c_nationkey",
            F.when(F.col("c_custkey") % 7 == 0, F.lit(None)).otherwise(
                F.col("c_nationkey")
            ),
        )
        .withColumn(
            "c_acctbal",
            F.when(F.col("c_custkey") % 5 == 0, F.lit(None))
            .when(F.col("c_custkey") % 11 == 0, F.lit(0.0))
            .otherwise(F.col("c_acctbal")),
        )
    )
    _write_single_parquet(spark, cust, sf / "customer.parquet")
    li = (
        spark.read.parquet(f"{base}/lineitem.parquet")
        .limit(120)
        .withColumn(
            "l_quantity",
            F.when(F.col("l_orderkey") % 9 == 0, F.lit(0.0))
            .when(F.col("l_orderkey") % 13 == 0, F.lit(None))
            .otherwise(F.col("l_quantity")),
        )
    )
    _write_single_parquet(spark, li, sf / "lineitem.parquet")
    orders = (
        spark.read.parquet(f"{base}/orders.parquet")
        .limit(80)
        .withColumn(
            "o_custkey",
            F.when(F.col("o_orderkey") % 8 == 0, F.lit(None)).otherwise(
                F.col("o_custkey")
            ),
        )
        .withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 6 == 0, F.lit(None)).otherwise(
                F.col("o_totalprice")
            ),
        )
    )
    _write_single_parquet(spark, orders, sf / "orders.parquet")
    return str(sf)


def test_patho_smoke_differential(spark, smoke_sf):
    from ed_housing_data_pipeline_spark.plans.registry import (
        oracle_sql_map,
        query_map,
    )

    qmap, omap = query_map(), oracle_sql_map()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{smoke_sf}/{t}.parquet')"
        )
    failures = []
    for name in SMOKE_QUERIES:
        sdf = qmap[name](spark, smoke_sf).toPandas()
        odf = con.execute(omap[name]).df()
        if len(sdf) != len(odf):
            failures.append(f"{name}: rowcount spark={len(sdf)} oracle={len(odf)}")
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            failures.append(
                f"{name}: columns spark={sorted(sdf.columns)} "
                f"oracle={sorted(odf.columns)}"
            )
            continue
        cs, co = canon(sdf), canon(odf)
        if not cs.equals(co):
            diff = [c for c in cs.columns if not cs[c].equals(co[c])]
            failures.append(f"{name}: values differ in {diff}")
    assert not failures, "\n".join(failures)
