"""Empty-corpus degradation smoke: every doc_/embedding_ query must
run to an empty result on a zero-row documents/embeddings table. A
production pipeline hits empty partitions and empty ingest slices
routinely — an AnalysisException there is an engine bug, not a data
problem (this harness caught exactly one: read_jsonl_shards on an
export that wrote no shard directories). The two documented
exceptions: embedding_knn_ivf and embedding_knn_ivfpq TRAIN
quantizers (coarse k-means; PQ codebooks), and training on an empty
corpus is a caller error that must raise clearly."""

from __future__ import annotations

import shutil

import pytest

from ed_housing_data_pipeline_spark.plans.registry import query_map


def _write_empty_parquet(src: str, dst: str) -> None:
    """A zero-row parquet with the source file's exact schema —
    pyarrow-direct, so fixture setup schedules no Spark jobs."""
    import pyarrow.parquet as pq

    schema = pq.read_schema(src)
    pq.write_table(schema.empty_table(), dst)

_COPY_TABLES = (
    "region nation customer supplier part orders lineitem events"
).split()


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    for t in _COPY_TABLES:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", str(d / f"{t}.parquet"))
    for t in ("documents", "embeddings"):
        _write_empty_parquet(
            f"/root/testdata/sf0.001/{t}.parquet", str(d / f"{t}.parquet")
        )
    return str(d)


def test_doc_and_embedding_queries_survive_empty_corpus(spark, empty_sf_dir):
    from ed_housing_data_pipeline_spark.plans import queries_llm

    queries_llm.release_shared_caches()
    try:
        failures = []
        for name, fn in query_map().items():
            if not (name.startswith("doc_") or name.startswith("embedding_")):
                continue
            if name in (
                "embedding_knn_ivf",
                "embedding_knn_ivfpq",
                "embedding_knn_ivf_recall",
                "embedding_knn_ivfpq_recall",
                "embedding_knn_ivfpq_recall_clustered",
            ):
                # documented raisers: all five TRAIN a quantizer
                # (k-means coarse cells; ivfpq additionally trains
                # per-subspace PQ codebooks; the recall gates run the
                # trained searches) and training on an empty corpus is
                # a caller error that must fail loudly, not degrade
                with pytest.raises(ValueError, match="no non-null vectors"):
                    fn(spark, empty_sf_dir).count()
                continue
            try:
                df = fn(spark, empty_sf_dir)
                n = df.count()
            except Exception as e:  # noqa: BLE001 - collecting all failures
                failures.append(f"{name}: {type(e).__name__}: {e}")
                continue
            if name == "doc_index_stats":
                # a GLOBAL aggregate (like its oracle): one row of
                # zero counters IS the empty-corpus answer
                row = df.collect()[0]
                if n != 1 or (row["n_docs"], row["total_tokens"]) != (0, 0):
                    failures.append(
                        f"{name}: expected one (0, 0) counters row, got "
                        f"{df.collect()}"
                    )
                continue
            if n != 0:
                failures.append(f"{name}: expected 0 rows on empty corpus, got {n}")
        assert not failures, "\n".join(failures)
    finally:
        queries_llm.release_shared_caches()


@pytest.fixture(scope="module")
def all_empty_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("all_empty_sf")
    tables = _COPY_TABLES + ["documents", "embeddings"]
    for t in tables:
        _write_empty_parquet(
            f"/root/testdata/sf0.001/{t}.parquet", str(d / f"{t}.parquet")
        )
    return str(d)


def test_ansi_empty_aggregate_semantics(spark, all_empty_sf_dir):
    """ROLLUP/CUBE/scalar-profile queries must emit the ANSI
    grand-total / per-column rows on EMPTY input (Spark's native
    rollup()/cube() emit nothing there — the queries are formulated
    as groupingSets ∪ ungrouped agg to match the SQL standard and the
    DuckDB oracle), and the stream-upsert sink must read back an
    empty table, not explode on a dataset dir its sink never wrote."""
    qm = query_map()
    rollup = qm["events_rollup_day_type"](spark, all_empty_sf_dir).collect()
    assert [(r["gid"], r["n_events"]) for r in rollup] == [(3, 0)]
    cube = qm["orders_cube_status_priority"](spark, all_empty_sf_dir).collect()
    assert [(r["gid"], r["n_orders"]) for r in cube] == [(3, 0)]
    prof = qm["lineitem_numeric_profile"](spark, all_empty_sf_dir).collect()
    assert sorted((r["col"], r["n"], r["n_null"], r["vmin"]) for r in prof) == [
        ("l_discount", 0, 0, None),
        ("l_extendedprice", 0, 0, None),
        ("l_quantity", 0, 0, None),
    ]
    assert qm["events_stream_upsert_sink"](spark, all_empty_sf_dir).count() == 0
