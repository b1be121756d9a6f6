"""Structured Streaming tests: real readStream → transform →
writeStream runs (availableNow trigger, memory sink), cross-checked
against the batch operators on the same data."""

from __future__ import annotations

import os

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ed_housing_data_pipeline_spark.operators import events as batch_events
from ed_housing_data_pipeline_spark.streaming import events as stream_events
from tests.conftest import rows


def ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


ROWS = [
    (1, ts(10, 0), 100, "view", 1.0, None),
    (2, ts(10, 20), 100, "view", 2.0, None),
    (3, ts(10, 40), 200, "buy", 3.0, None),
    (4, ts(12, 5), 100, "view", 4.0, None),
]


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    df = spark.createDataFrame(ROWS, stream_events.EVENTS_SCHEMA)
    df.write.mode("overwrite").parquet(str(d / "in"))
    return d


def test_stream_tumbling_counts(spark, events_dir):
    src = stream_events.read_events_stream(spark, str(events_dir / "in"))
    assert src.isStreaming
    agg = stream_events.stream_tumbling_counts(src, window="1 hour")
    stream_events.run_available_now(agg, "tumbling_t", str(events_dir / "cp1"))
    got = rows(spark.table("tumbling_t"), "window_start", "event_type", "n_events")
    assert got == [
        (ts(10), "buy", 1),
        (ts(10), "view", 2),
        (ts(12), "view", 1),
    ]


def test_stream_tumbling_matches_batch(spark, events_dir):
    batch = spark.read.parquet(str(events_dir / "in"))
    b = batch_events.tumbling_agg(
        batch, "ts", "hour", ["event_type"], {"n_events": F.count(F.lit(1))}
    )
    assert rows(b, "bucket", "event_type", "n_events") == rows(
        spark.table("tumbling_t"), "window_start", "event_type", "n_events"
    )


def test_stream_sessionize_stats(spark, events_dir):
    src = stream_events.read_events_stream(spark, str(events_dir / "in"))
    s = stream_events.stream_sessionize_stats(src, gap="30 minutes")
    stream_events.run_available_now(s, "sessions_t", str(events_dir / "cp2"))
    got = rows(spark.table("sessions_t"), "user_id", "n_events", "total_value")
    # user 100: 10:00+10:20 one session; 12:05 alone. user 200: one.
    assert got == [(100, 1, 4.0), (100, 2, 3.0), (200, 1, 3.0)]
    # session bounds: close = last event + gap
    r = {
        (row["user_id"], row["n_events"]): row
        for row in spark.table("sessions_t").collect()
    }
    assert r[(100, 2)]["session_start"] == ts(10, 0)
    assert r[(100, 2)]["session_end"] == ts(10, 50)


def test_stream_dedup(spark, events_dir, tmp_path):
    # duplicate the input rows into a second file: at-least-once delivery
    src_dir = tmp_path / "dup_in"
    df = spark.read.parquet(str(events_dir / "in"))
    df.write.mode("overwrite").parquet(str(src_dir))
    df.write.mode("append").parquet(str(src_dir))
    assert spark.read.parquet(str(src_dir)).count() == 8  # 4 rows x2

    src = stream_events.read_events_stream(spark, str(src_dir))
    deduped = stream_events.stream_dedup(src)
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("dedup_t")
    assert got.count() == 4
    assert sorted(r["event_id"] for r in got.collect()) == [1, 2, 3, 4]


def test_stream_running_user_totals_matches_batch(spark, tmp_path):
    """The applyInPandasWithState running totals, drained over TWO
    micro-batches (maxFilesPerTrigger=1 forces the cross-batch state
    path), equal the batch groupBy count/sum per user — including the
    all-null-value user, where F.sum yields NULL."""
    batch1 = ROWS[:2]  # user 100 ×2
    batch2 = ROWS[2:] + [(5, ts(13), 300, "view", None, None)]  # 100, 200, 300(null)
    all_rows = batch1 + batch2
    # The file stream source lists files directly under the path (no
    # recursion into write.parquet output dirs) — flatten part files.
    import shutil

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    for i, rows_b in enumerate((batch1, batch2), 1):
        out = tmp_path / f"w{i}"
        spark.createDataFrame(rows_b, stream_events.EVENTS_SCHEMA).coalesce(
            1
        ).write.parquet(str(out))
        part = next(out.glob("part-*.parquet"))
        shutil.copy(part, src_dir / f"b{i}.parquet")
    src = (
        spark.readStream.format("parquet")
        .schema(stream_events.EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(str(src_dir))
    )
    totals = stream_events.stream_running_user_totals(src)
    stream_events.run_available_now(
        totals,
        table_name="t_running_totals",
        checkpoint_dir=str(tmp_path / "ckpt_totals"),
        output_mode="update",
    )
    sink = spark.table("t_running_totals").collect()
    # update mode emits one row per user per batch it had events in;
    # totals are monotone in n_events, so the max-n row is the final.
    assert len(sink) == 4  # user 100 twice (two batches), 200 + 300 once
    got = {}
    for r in sink:
        if r.user_id not in got or r.n_events > got[r.user_id][0]:
            got[r.user_id] = (r.n_events, r.total_value)
    batch = spark.createDataFrame(all_rows, stream_events.EVENTS_SCHEMA)
    want = {
        r.user_id: (r.n, r.tv)
        for r in batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert got == want
    assert got[300] == (1, None)  # null-skipping sum parity


def test_parquet_sink_exactly_once_resume(spark, tmp_path):
    """Draining twice with the same checkpoint must not duplicate
    rows: the file-sink manifest remembers committed input files."""
    import shutil

    from ed_housing_data_pipeline_spark.streaming import events as se

    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(100)], "event_id long, user_id long, value double"
    ).coalesce(1).write.mode("overwrite").parquet(str(src))
    # file sources need files directly in the dir (no _SUCCESS issues)
    schema = "event_id long, user_id long, value double"
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = spark.readStream.schema(schema).parquet(str(src))
    se.run_to_parquet(stream.select("event_id", "value"), out, ckpt)
    assert spark.read.parquet(out).count() == 100
    se.run_to_parquet(
        spark.readStream.schema(schema).parquet(str(src)).select("event_id", "value"),
        out,
        ckpt,
    )
    assert spark.read.parquet(out).count() == 100  # no reprocessing
    shutil.rmtree(ckpt)


def test_foreach_batch_upsert_replay_idempotent(spark, tmp_path):
    """The CDC upsert sink must converge under replay: (1) draining the
    SAME checkpoint twice reprocesses nothing; (2) new data arriving
    later merges by key — updates win, older partitions survive; (3) a
    stale lower-version replay cannot clobber the newer stored row."""
    src = tmp_path / "in"
    out = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    d1 = spark.createDataFrame(
        [(1, 100, 5, "2024-01-01"), (2, 200, 5, "2024-01-02")],
        "id int, payload int, ver int, d string",
    )
    d1.write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(
        "id int, payload int, ver int, d string"
    ).parquet(str(src))
    stream_events.run_foreach_batch_upsert(
        stream, out, key_cols=["id"], checkpoint_dir=ckpt,
        partition_col="d", order_col="ver",
    )
    first = rows(spark.read.parquet(out).withColumn("d", F.col("d").cast("string")))
    # replay with the same checkpoint: no new input -> table unchanged
    stream2 = spark.readStream.schema(
        "id int, payload int, ver int, d string"
    ).parquet(str(src))
    stream_events.run_foreach_batch_upsert(
        stream2, out, key_cols=["id"], checkpoint_dir=ckpt,
        partition_col="d", order_col="ver",
    )
    assert rows(
        spark.read.parquet(out).withColumn("d", F.col("d").cast("string"))
    ) == first
    # new file: key 1 updated (higher ver), key 1 stale (lower ver) ignored
    d2 = spark.createDataFrame(
        [(1, 111, 7, "2024-01-01"), (1, 99, 3, "2024-01-01"),
         (3, 300, 5, "2024-01-01")],
        "id int, payload int, ver int, d string",
    )
    d2.write.mode("append").parquet(str(src))
    stream3 = spark.readStream.schema(
        "id int, payload int, ver int, d string"
    ).parquet(str(src))
    stream_events.run_foreach_batch_upsert(
        stream3, out, key_cols=["id"], checkpoint_dir=ckpt,
        partition_col="d", order_col="ver",
    )
    got = {
        (r["id"], r["d"]): (r["payload"], r["ver"])
        for r in spark.read.parquet(out)
        .withColumn("d", F.col("d").cast("string"))
        .collect()
    }
    assert got == {
        (1, "2024-01-01"): (111, 7),   # highest version won
        (3, "2024-01-01"): (300, 5),   # new key inserted
        (2, "2024-01-02"): (200, 5),   # untouched partition survives
    }


def test_session_window_exact_gap_boundary(spark):
    """Pin the session-merge rule the registered sessionize oracle
    depends on: an event landing EXACTLY ``gap`` after the previous one
    MERGES into the session (a new session needs a strictly greater
    delta), and the session end is last-event ts + gap. session_window
    evaluates identically on a static frame, which is what makes this
    cheap to pin without a stream drain."""
    rows_in = [
        (1, ts(10, 0), 100, "view", 1.0, None),
        (2, ts(10, 30), 100, "view", 1.0, None),   # exactly gap -> merges
        (3, ts(11, 0, ), 100, "view", 1.0, None),  # exactly gap again
        (4, ts(11, 31), 100, "view", 1.0, None),   # gap+1min -> NEW session
    ]
    df = spark.createDataFrame(rows_in, stream_events.EVENTS_SCHEMA)
    out = stream_events.stream_sessionize_stats(df, gap="30 minutes")
    got = {
        (r["session_start"], r["session_end"]): r["n_events"]
        for r in out.collect()
    }
    assert got == {
        (ts(10, 0), ts(11, 30)): 3,
        (ts(11, 31), ts(12, 1)): 1,
    }
    # the batch lag→cumsum operator draws the identical boundary
    b = batch_events.session_stats(df, "ts", "user_id", gap_minutes=30)
    assert sorted(r["n_events"] for r in b.collect()) == [1, 3]


# -------------------------- streaming incremental near-dup ingest
def _write_jsonl(path, rows_in):
    import json

    with open(path, "w") as f:
        for r in rows_in:
            f.write(json.dumps(r) + "\n")


_LONG = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lamda mu nu xi omicron pi rho sigma tau upsilon"
)


def _doc(i, text, source="stream"):
    return {"doc_id": i, "text": text, "source": source}


@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW"),
    reason="driver row doc_stream_incremental_dedup runs this full loop against its oracle every round; RUN_SLOW=1 for the local e2e",
)
def test_stream_incremental_dedup_end_to_end(spark, tmp_path):
    from ed_housing_data_pipeline_spark.streaming import documents as docstream

    root = str(tmp_path / "index")
    src = tmp_path / "in"
    src.mkdir()
    docstream.init_doc_index(spark, root)

    distinct_b1 = "one two three four five six seven eight nine ten"
    distinct_b2 = "red orange yellow green blue indigo violet pink black white"
    # batch 1: doc 1 long text, doc 2 distinct, doc 3 = exact content
    # dup of doc 1 under a new id (within-batch near-dup, jaccard 1.0)
    _write_jsonl(
        src / "f1.json",
        [_doc(1, _LONG), _doc(2, distinct_b1), _doc(3, _LONG)],
    )
    # batch 2: doc 4 = content dup of doc 1 (cross-batch, vs the
    # index), doc 5 novel, doc 1 re-delivered verbatim (id replay),
    # doc 6 = one-word edit of doc 1 (jaccard 17/19 ≈ 0.89)
    _write_jsonl(
        src / "f2.json",
        [
            _doc(4, _LONG),
            _doc(5, distinct_b2),
            _doc(1, _LONG),
            _doc(6, _LONG.replace("alpha", "ALPHA")),
        ],
    )
    stream = docstream.read_documents_stream(spark, str(src))
    docstream.run_stream_incremental_dedup(
        stream, root, checkpoint_dir=str(tmp_path / "cp1")
    )
    accepted = docstream.read_accepted_docs(spark, root)
    assert sorted(r["doc_id"] for r in accepted.collect()) == [1, 2, 5]

    # full replay with a FRESH checkpoint (forces reprocessing): the
    # sink must converge — same accepted set, no new committed version
    from ed_housing_data_pipeline_spark.sources.lake import snapshot_versions

    v_before = snapshot_versions(spark, f"{root}/manifest")
    stream2 = docstream.read_documents_stream(spark, str(src))
    docstream.run_stream_incremental_dedup(
        stream2, root, checkpoint_dir=str(tmp_path / "cp2")
    )
    assert sorted(
        r["doc_id"] for r in docstream.read_accepted_docs(spark, root).collect()
    ) == [1, 2, 5]
    assert snapshot_versions(spark, f"{root}/manifest") == v_before


def test_stream_incremental_dedup_batch_decision_unit(spark, tmp_path):
    """dedup_batch_against_index in isolation: exact-id replays drop,
    near-dups of the index drop, lowest id survives within the batch,
    short/empty texts (no shingles) pass through."""
    from ed_housing_data_pipeline_spark.streaming import documents as docstream

    root = str(tmp_path / "index")
    docstream.init_doc_index(spark, root)
    # seed the index through the sink path via a 1-file stream
    src = tmp_path / "seed"
    src.mkdir()
    _write_jsonl(src / "s.json", [_doc(100, _LONG, "corpus")])
    docstream.run_stream_incremental_dedup(
        docstream.read_documents_stream(spark, str(src)),
        root,
        checkpoint_dir=str(tmp_path / "cp"),
    )
    index = docstream._pinned(spark, root)
    batch = spark.createDataFrame(
        [
            (100, "whatever text", "s"),  # id replay: dropped pre-content
            (7, _LONG, "s"),  # near-dup of indexed 100
            (8, "tiny", "s"),  # no shingles: passes
            (9, "k1 k2 k3 k4 k5 k6 k7 k8 k9 k10", "s"),
            (10, "k1 k2 k3 k4 k5 k6 k7 k8 k9 k10", "s"),  # dup of 9: drop
        ],
        docstream.DOC_STREAM_SCHEMA,
    )
    got = docstream.dedup_batch_against_index(batch, index)
    assert sorted(r["doc_id"] for r in got.collect()) == [8, 9]


def test_stream_incremental_dedup_bootstrap_from_corpus(spark, tmp_path):
    """bootstrap_doc_index commits an existing corpus as v1; the first
    streamed batch immediately dedups against it."""
    from ed_housing_data_pipeline_spark.streaming import documents as docstream

    root = str(tmp_path / "index")
    corpus = spark.createDataFrame(
        [(100, _LONG, "corpus"), (101, "aa bb cc dd ee ff gg hh", "corpus")],
        docstream.DOC_STREAM_SCHEMA,
    )
    docstream.bootstrap_doc_index(spark, corpus, root)
    assert sorted(
        r["doc_id"]
        for r in docstream.read_accepted_docs(spark, root).collect()
    ) == [100, 101]

    src = tmp_path / "in"
    src.mkdir()
    _write_jsonl(
        src / "f1.json",
        [_doc(1, _LONG), _doc(2, "zz yy xx ww vv uu tt ss rr qq")],
    )
    docstream.run_stream_incremental_dedup(
        docstream.read_documents_stream(spark, str(src)),
        root,
        checkpoint_dir=str(tmp_path / "cp"),
    )
    assert sorted(
        r["doc_id"]
        for r in docstream.read_accepted_docs(spark, root).collect()
    ) == [2, 100, 101]


def test_stream_commits_write_batch_sized_segments(spark, tmp_path):
    """The O(batch) streaming-commit contract through the REAL sink:
    across 3 consecutive micro-batches of distinct docs, every data
    segment the sink appends holds exactly ITS batch's rows — write
    cost per commit tracks the batch, never the accumulated index
    (the full-copy commit this protocol replaced did O(index) per
    batch, O(n²) over a stream's lifetime)."""
    from ed_housing_data_pipeline_spark.sources import lake
    from ed_housing_data_pipeline_spark.streaming import documents as docstream

    root = str(tmp_path / "index")
    src = tmp_path / "in"
    src.mkdir()
    docstream.init_doc_index(spark, root)
    # 3 files of entirely-distinct vocabulary -> 3 micro-batches
    # (maxFilesPerTrigger=1), nothing dedups away
    sizes = [3, 2, 4]
    nid = 0
    for f_i, n in enumerate(sizes):
        rows = []
        for _ in range(n):
            words = " ".join(f"w{nid}x{j}" for j in range(12))
            rows.append(_doc(nid, words))
            nid += 1
        _write_jsonl(src / f"f{f_i}.json", rows)
    docstream.run_stream_incremental_dedup(
        docstream.read_documents_stream(spark, str(src)),
        root,
        checkpoint_dir=str(tmp_path / "cp"),
        bands=4,
    )
    pins = lake.segment_pins(spark, root)
    # init seg + one per micro-batch
    assert len(pins["docs"]) == 1 + len(sizes)
    per_seg = [
        lake.read_segments(spark, f"{root}/docs", [s]).count()
        for s in pins["docs"]
    ]
    assert per_seg[0] == 0 and sorted(per_seg[1:]) == sorted(sizes)
    for s, n_docs in zip(pins["bands"][1:], per_seg[1:]):
        assert lake.read_segments(spark, f"{root}/bands", [s]).count() == n_docs * 4
    assert sorted(
        r["doc_id"] for r in docstream.read_accepted_docs(spark, root).collect()
    ) == list(range(nid))


def test_stream_crash_then_same_checkpoint_restart_converges(spark, tmp_path):
    """The untested half of the recovery story: a commit crash MID-
    STREAM (not a fresh-checkpoint replay) — the streaming query
    fails, the index holds the pre-crash manifest, and restarting from
    the SAME checkpoint re-delivers the failed micro-batch
    (foreachBatch is at-least-once on retry) and converges to exactly
    the no-crash outcome. Injected at the manifest flip, the worst
    point: every segment of the failed batch is already on disk as
    unpinned debris when the retry runs."""
    from ed_housing_data_pipeline_spark.sources import lake
    from ed_housing_data_pipeline_spark.streaming import documents as docstream

    root = str(tmp_path / "index")
    src = tmp_path / "in"
    src.mkdir()
    docstream.init_doc_index(spark, root)
    _write_jsonl(src / "f0.json", [_doc(0, _LONG)])
    _write_jsonl(src / "f1.json", [_doc(1, "aa bb cc dd ee ff gg hh ii jj")])

    real_commit = lake.commit_segment_manifest
    state = {"commits": 0}

    def failing_commit(*a, **kw):
        state["commits"] += 1
        if state["commits"] == 2:  # batch 2's manifest flip
            raise RuntimeError("injected crash at manifest flip")
        return real_commit(*a, **kw)

    lake.commit_segment_manifest = failing_commit
    try:
        with pytest.raises(Exception, match="injected crash"):
            docstream.run_stream_incremental_dedup(
                docstream.read_documents_stream(spark, str(src)),
                root,
                checkpoint_dir=str(tmp_path / "cp"),
            )
    finally:
        lake.commit_segment_manifest = real_commit
    # crash left batch 1 committed, batch 2 invisible (torn = unpinned)
    assert sorted(
        r["doc_id"] for r in docstream.read_accepted_docs(spark, root).collect()
    ) == [0]
    # SAME checkpoint restart: the failed batch re-delivers and commits
    docstream.run_stream_incremental_dedup(
        docstream.read_documents_stream(spark, str(src)),
        root,
        checkpoint_dir=str(tmp_path / "cp"),
    )
    assert sorted(
        r["doc_id"] for r in docstream.read_accepted_docs(spark, root).collect()
    ) == [0, 1]
    # and the index is internally consistent: stop table == full recompute
    from ed_housing_data_pipeline_spark.operators import similarity as sim

    idx = docstream._pinned(spark, root)
    got = {(r["band"], r["key"]) for r in idx["stopbands"].collect()}
    full = {
        (r["band"], r["key"])
        for r in sim.oversized_bucket_stats(
            idx["bands"], ["band", "key"], 4096
        ).collect()
    }
    assert got == full


def test_stream_auto_compaction_preserves_content(spark, tmp_path):
    """compact_every=2: after the segment count reaches the cadence
    the sink folds the index to single segments; accepted set and a
    follow-up batch's dedup behavior are unchanged."""
    from ed_housing_data_pipeline_spark.sources import lake
    from ed_housing_data_pipeline_spark.streaming import documents as docstream

    root = str(tmp_path / "index")
    src = tmp_path / "in"
    src.mkdir()
    docstream.init_doc_index(spark, root)
    _write_jsonl(src / "f0.json", [_doc(0, _LONG)])
    _write_jsonl(src / "f1.json", [_doc(1, "aa bb cc dd ee ff gg hh ii jj")])
    docstream.run_stream_incremental_dedup(
        docstream.read_documents_stream(spark, str(src)),
        root,
        checkpoint_dir=str(tmp_path / "cp"),
        compact_every=2,
    )
    pins = lake.segment_pins(spark, root)
    assert all(len(segs) == 1 for segs in pins.values()), pins
    assert sorted(
        r["doc_id"] for r in docstream.read_accepted_docs(spark, root).collect()
    ) == [0, 1]
    # post-compaction the index still dedups: a near-dup of doc 0 drops
    src2 = tmp_path / "in2"
    src2.mkdir()
    _write_jsonl(
        src2 / "f2.json",
        [_doc(2, _LONG), _doc(3, "k1 k2 k3 k4 k5 k6 k7 k8 k9 k10")],
    )
    docstream.run_stream_incremental_dedup(
        docstream.read_documents_stream(spark, str(src2)),
        root,
        checkpoint_dir=str(tmp_path / "cp2"),
        compact_every=2,
    )
    assert sorted(
        r["doc_id"] for r in docstream.read_accepted_docs(spark, root).collect()
    ) == [0, 1, 3]


def test_doc_index_refuses_reinit_over_committed_manifest(spark, tmp_path):
    from ed_housing_data_pipeline_spark.streaming import documents as docstream

    root = str(tmp_path / "index")
    docstream.init_doc_index(spark, root)
    with pytest.raises(ValueError, match="already has a committed manifest"):
        docstream.init_doc_index(spark, root)
    corpus = spark.createDataFrame(
        [(1, _LONG, "c")], docstream.DOC_STREAM_SCHEMA
    )
    with pytest.raises(ValueError, match="already has a committed manifest"):
        docstream.bootstrap_doc_index(spark, corpus, root)


def test_sink_mirror_batch_replay_and_catchup(spark, tmp_path):
    """The continuous-mirror sink's two halves are independently
    exactly-once: a replayed micro-batch id skips the source commit
    (committed=False) and its cadence no-ops; a batch whose cadence was
    MISSED (crash between the halves) is healed by the replay's
    cadence."""
    from pyspark.sql import functions as F

    from ed_housing_data_pipeline_spark.sources import lake
    from ed_housing_data_pipeline_spark.streaming import lake_mirror

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")

    def batch(lo, hi):
        return spark.range(lo, hi).select(F.col("id").alias("k"))

    rep0 = lake_mirror.sink_mirror_batch(
        spark, src, dst, "t", batch(0, 10), 0
    )
    assert rep0["committed"] and rep0["applied"]
    # replay of batch 0: source skip, cadence no-op, nothing duplicated
    rep0b = lake_mirror.sink_mirror_batch(
        spark, src, dst, "t", batch(0, 10), 0
    )
    assert not rep0b["committed"] and not rep0b["applied"]
    # crash between halves: commit batch 1 to the source only…
    meta, base = lake.segment_meta_versioned(spark, src)
    lake.append_segments(
        spark, src, {"t": batch(10, 20)},
        meta={**meta, lake_mirror.LAST_BATCH_KEY: 1}, expected_base=base,
    )
    # …then the replayed batch-1 sink call skips half 1 but its cadence
    # catches the mirror up
    rep1 = lake_mirror.sink_mirror_batch(
        spark, src, dst, "t", batch(10, 20), 1
    )
    assert not rep1["committed"] and rep1["applied"]
    mirror = lake.read_segmented_merged(spark, dst, "t", "k")
    assert sorted(r.k for r in mirror.collect()) == list(range(20))
