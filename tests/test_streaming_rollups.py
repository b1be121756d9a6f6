"""Transactional-sink contracts of the streaming rollup
(streaming/rollups.py): exactly-once under micro-batch replay WITHOUT
fact ids — the batch id commits in the same manifest flip as the
batch's partial segment — plus restart-from-checkpoint convergence of
the full drain loop."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from ed_housing_data_pipeline_spark.operators import rollup
from ed_housing_data_pipeline_spark.sources import lake
from ed_housing_data_pipeline_spark.streaming import rollups as sr
from tests.conftest import rows

KEYS = ["grp"]
MEASURES = {"v": "val"}


def _df(spark, pairs):
    return spark.createDataFrame(
        [Row(grp=g, val=float(v)) for g, v in pairs], "grp string, val double"
    )


def _bootstrap(spark, root):
    rollup.bootstrap_rollup(
        spark,
        root,
        _df(spark, [("a", 1), ("b", 10)]),
        KEYS,
        MEASURES,
        segment_partitions=1,
    )


def _content(spark, root):
    return rows(
        rollup.read_rollup(spark, root, derive_avg=False).select(
            "grp", "_rows", "v_sum"
        )
    )


def test_replayed_batch_id_is_skipped_not_double_counted(spark, tmp_path):
    root = str(tmp_path / "v")
    _bootstrap(spark, root)
    batch = _df(spark, [("a", 5), ("c", 7)])
    assert sr.sink_rollup_batch(spark, root, batch, batch_id=0) is True
    after_first = _content(spark, root)
    assert after_first == [("a", 2, 6.0), ("b", 1, 10.0), ("c", 1, 7.0)]
    # crash-after-commit replay: same id re-delivered — must be a no-op
    assert sr.sink_rollup_batch(spark, root, batch, batch_id=0) is False
    assert _content(spark, root) == after_first
    # the NEXT batch commits normally and advances the recorded id
    assert sr.sink_rollup_batch(
        spark, root, _df(spark, [("a", 100)]), batch_id=1
    ) is True
    assert lake.segment_meta(spark, root)[sr.LAST_BATCH_KEY] == 1


def test_batch_id_survives_compaction(spark, tmp_path):
    root = str(tmp_path / "v")
    _bootstrap(spark, root)
    sr.sink_rollup_batch(spark, root, _df(spark, [("a", 5)]), batch_id=0)
    before = _content(spark, root)
    rollup.compact_rollup(spark, root)
    # _meta carried through the compaction commit: the replay guard
    # still holds after maintenance rewrites
    assert lake.segment_meta(spark, root)[sr.LAST_BATCH_KEY] == 0
    assert sr.sink_rollup_batch(spark, root, _df(spark, [("a", 5)]), 0) is False
    assert _content(spark, root) == before


def test_stream_drain_and_checkpoint_restart_converge(spark, tmp_path):
    """The real loop: drain a file stream into the view, then restart
    from the same checkpoint — the second drain finds no new files and
    the content stays exactly-once."""
    src = tmp_path / "facts"
    _df(spark, [("a", 2), ("b", 3), ("a", 4)]).coalesce(1).write.parquet(
        str(src)
    )
    root = str(tmp_path / "v")
    ckpt = str(tmp_path / "ckpt")
    _bootstrap(spark, root)
    stream = spark.readStream.schema("grp string, val double").parquet(str(src))
    sr.run_stream_rollup(stream, root, ckpt)
    want = [("a", 3, 7.0), ("b", 2, 13.0)]
    assert _content(spark, root) == want
    # restart with the SAME checkpoint: nothing new, nothing doubled
    stream2 = spark.readStream.schema("grp string, val double").parquet(str(src))
    sr.run_stream_rollup(stream2, root, ckpt)
    assert _content(spark, root) == want
