"""Contract tests for the append-only segmented LSH index
(operators/incr_index.py over sources/lake.append_segments).

The protocol exists for ONE scale property: a long-running ingest
loop must write O(batch) bytes per commit, not O(index) — the
full-copy snapshot commit it replaced did O(n²) total write work
over a stream's lifetime. These tests pin that property, the exact
incremental stop-band maintenance it required, compaction
content-neutrality, and crash-atomicity at EVERY step of the commit
sequence (deterministic injection, not sampling).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ed_housing_data_pipeline_spark.operators import incr_index, similarity as sim
from ed_housing_data_pipeline_spark.sources import lake

CAP = 3  # tiny stop-band cap so tests can cross it with a handful of rows


def _bands_frame(spark, rows):
    """rows: (doc_id, band, key)"""
    return spark.createDataFrame(rows, "doc_id bigint, band int, key string")


def _shingles_frame(spark, ids):
    return spark.createDataFrame(
        [(i, [f"sh{i}"]) for i in ids], "doc_id bigint, _sh array<string>"
    )


def _bootstrap(spark, root, band_rows, ids):
    return incr_index.bootstrap_index(
        spark,
        root,
        {
            "bands": _bands_frame(spark, band_rows),
            "shingles": _shingles_frame(spark, ids),
        },
        max_bucket_width=CAP,
    )


def _stop_set(spark, root):
    return {
        (r["band"], r["key"], r["_bw"], r["_ns"])
        for r in incr_index.read_index(spark, root, ["stopbands"])[
            "stopbands"
        ].collect()
    }


def _full_recompute_stop(spark, root):
    bands = incr_index.read_index(spark, root, ["bands"])["bands"]
    return {
        (r["band"], r["key"], r["_bw"], r["_ns"])
        for r in sim.oversized_bucket_stats(bands, ["band", "key"], CAP).collect()
    }


BATCHES = [
    # batch 1: 2 more rows into bucket (0, k0) -> width 4 > CAP: crosses
    [(10, 0, "k0"), (11, 0, "k0"), (12, 1, "k1")],
    # batch 2: grows the existing stop bucket AND starts a fresh one
    [(20, 0, "k0"), (21, 2, "k2"), (22, 2, "k2"), (23, 2, "k2"), (24, 2, "k2")],
    # batch 3: touches nothing oversized
    [(30, 3, "k3")],
]


def test_incremental_stop_equals_full_recompute_across_batches(spark, tmp_path):
    """The merged_stop update (O(batch) + broadcast semi-join, never a
    full band-table aggregation) must equal oversized_bucket_stats
    over the ENTIRE pinned band table after every commit — including
    widths (_bw) and shard counts (_ns) of buckets that keep growing
    after crossing the cap."""
    root = str(tmp_path / "idx")
    # corpus: bucket (0,'k0') at width 2 (under CAP), (9,'k9') at 4 (over)
    _bootstrap(
        spark,
        root,
        [(1, 0, "k0"), (2, 0, "k0"), (3, 9, "k9"), (4, 9, "k9"), (5, 9, "k9"),
         (6, 9, "k9")],
        [1, 2, 3, 4, 5, 6],
    )
    assert _stop_set(spark, root) == _full_recompute_stop(spark, root)
    assert _stop_set(spark, root) == {(9, "k9", 4, 2)}
    for i, rows in enumerate(BATCHES):
        incr_index.append_batch(
            spark,
            root,
            {
                "bands": _bands_frame(spark, rows),
                "shingles": _shingles_frame(spark, sorted({r[0] for r in rows})),
            },
            max_bucket_width=CAP,
        )
        got = _stop_set(spark, root)
        assert got == _full_recompute_stop(spark, root), f"diverged after batch {i}"
    # final state spot check: k0 crossed (2+2+1=5), k2 crossed (4), k9 grew
    assert _stop_set(spark, root) == {
        (0, "k0", 5, 2),
        (2, "k2", 4, 2),
        (9, "k9", 4, 2),
    }


def test_append_batch_writes_only_batch_rows(spark, tmp_path):
    """Write-cost contract: across consecutive commits, every NEW data
    segment holds exactly its batch's rows; committed base segments
    are never rewritten (same segment numbers stay pinned)."""
    root = str(tmp_path / "idx")
    pins = _bootstrap(spark, root, [(1, 0, "a")], [1])
    for rows in BATCHES:
        prev = pins
        pins = incr_index.append_batch(
            spark,
            root,
            {
                "bands": _bands_frame(spark, rows),
                "shingles": _shingles_frame(spark, sorted({r[0] for r in rows})),
            },
            max_bucket_width=CAP,
        )
        assert pins["bands"][: len(prev["bands"])] == prev["bands"]
        new_segs = pins["bands"][len(prev["bands"]):]
        assert len(new_segs) == 1
        n = lake.read_segments(spark, f"{root}/bands", new_segs).count()
        assert n == len(rows)
        # bucketcounts delta is per-batch too: at most one row per
        # distinct (band, key) the batch touched
        new_counts = pins["bucketcounts"][len(prev["bucketcounts"]):]
        assert (
            lake.read_segments(spark, f"{root}/bucketcounts", new_counts).count()
            == len({(b, k) for _, b, k in rows})
        )


def test_compaction_is_content_neutral(spark, tmp_path):
    """compact_index folds every component to one segment without
    changing any reader-visible content (bands/shingles sets, the
    summed bucket counts, the stop table)."""
    root = str(tmp_path / "idx")
    _bootstrap(spark, root, [(1, 0, "k0"), (2, 0, "k0")], [1, 2])
    for rows in BATCHES:
        incr_index.append_batch(
            spark,
            root,
            {
                "bands": _bands_frame(spark, rows),
                "shingles": _shingles_frame(spark, sorted({r[0] for r in rows})),
            },
            max_bucket_width=CAP,
        )
    before = incr_index.read_index(spark, root)
    snap = {
        "bands": {tuple(r) for r in before["bands"].collect()},
        "shingles": {(r["doc_id"], tuple(r["_sh"])) for r in before["shingles"].collect()},
        "counts": {
            tuple(r)
            for r in before["bucketcounts"]
            .groupBy("band", "key")
            .agg(F.sum("_n").alias("n"))
            .collect()
        },
        "stop": _stop_set(spark, root),
    }
    pins = incr_index.compact_index(spark, root)
    assert all(len(segs) == 1 for segs in pins.values()), pins
    after = incr_index.read_index(spark, root)
    assert {tuple(r) for r in after["bands"].collect()} == snap["bands"]
    assert {
        (r["doc_id"], tuple(r["_sh"])) for r in after["shingles"].collect()
    } == snap["shingles"]
    assert {
        tuple(r)
        for r in after["bucketcounts"]
        .groupBy("band", "key")
        .agg(F.sum("_n").alias("n"))
        .collect()
    } == snap["counts"]
    assert _stop_set(spark, root) == snap["stop"]
    # and the stop table still matches a full recompute post-compaction
    assert _stop_set(spark, root) == _full_recompute_stop(spark, root)


def test_concurrent_commit_loses_cleanly_not_lost_update(spark, tmp_path):
    """Optimistic concurrency on the manifest: two writers derive pins
    from the same committed base; the first commit wins, the second
    MUST raise ConcurrentCommitError rather than commit a manifest
    that silently drops the winner's segments (the lost-update hazard
    any multi-writer append protocol has). A retry from fresh pins
    then lands both batches."""
    root = str(tmp_path / "idx")
    _bootstrap(spark, root, [(1, 0, "k0")], [1])

    # both "writers" snapshot the same pins/base
    pins_a, base_a = lake.segment_pins_versioned(spark, root)
    pins_b, base_b = lake.segment_pins_versioned(spark, root)
    assert base_a == base_b

    def staged_commit(pins, base, rows, ids):
        seg_b = lake.write_segment(spark, _bands_frame(spark, rows), f"{root}/bands")
        seg_s = lake.write_segment(spark, _shingles_frame(spark, ids), f"{root}/shingles")
        new = dict(pins)
        new["bands"] = [*pins["bands"], seg_b]
        new["shingles"] = [*pins["shingles"], seg_s]
        lake.commit_segment_manifest(spark, root, new, expected_base=base)
        return new

    # writer A wins
    staged_commit(pins_a, base_a, [(10, 0, "kA")], [10])
    # writer B, stale base: must fail loudly, not drop A's segment
    with pytest.raises(lake.ConcurrentCommitError):
        staged_commit(pins_b, base_b, [(20, 0, "kB")], [20])
    got = {
        r["doc_id"]
        for r in lake.read_segmented_components(spark, root, ["bands"])[
            "bands"
        ].collect()
    }
    assert got == {1, 10}  # A's commit intact, B invisible
    # B retries from fresh pins: both batches present, nothing lost
    pins2, base2 = lake.segment_pins_versioned(spark, root)
    staged_commit(pins2, base2, [(20, 0, "kB")], [20])
    got = {
        r["doc_id"]
        for r in lake.read_segmented_components(spark, root, ["bands"])[
            "bands"
        ].collect()
    }
    assert got == {1, 10, 20}
    # append_batch itself rides the same protocol end-to-end
    incr_index.append_batch(
        spark,
        root,
        {
            "bands": _bands_frame(spark, [(30, 1, "k1")]),
            "shingles": _shingles_frame(spark, [30]),
        },
        max_bucket_width=CAP,
    )
    # and a bootstrap over a committed index refuses (pinned at v1)
    with pytest.raises(lake.ConcurrentCommitError):
        _bootstrap(spark, root, [(99, 0, "x")], [99])


def test_threaded_committers_race_lands_every_batch(spark, tmp_path):
    """REAL concurrency (threads, not staged interleaving): four
    committers race append_batch against one index root using the
    documented client protocol — retry the WHOLE append from fresh
    pins when the optimistic commit loses. Two distinct race windows
    exist and both must degrade to a loud retry, never corruption:
    the manifest flip (ConcurrentCommitError) and the segment-number
    allocation in write_segment (two writers pick the same seg →
    the second parquet write fails on errorifexists). After all
    threads report success: every batch present exactly once (no
    lost update, no double-append from a retry), and the stop table
    equals a full recompute over the pinned band table."""
    import threading

    root = str(tmp_path / "idx")
    _bootstrap(spark, root, [(1, 0, "k0"), (2, 0, "k0")], [1, 2])

    batches = {
        t: [(100 * t + i, t % 3, f"k{t}") for i in range(4)] for t in range(4)
    }
    errors: list[BaseException] = []
    attempts = {t: 0 for t in batches}

    def is_retryable(exc: BaseException) -> bool:
        if isinstance(exc, lake.ConcurrentCommitError):
            return True
        msg = str(exc)
        return "already exists" in msg or "ALREADY_EXISTS" in msg

    def run(t: int) -> None:
        rows_t = batches[t]
        for _ in range(30):
            attempts[t] += 1
            try:
                incr_index.append_batch(
                    spark,
                    root,
                    {
                        "bands": _bands_frame(spark, rows_t),
                        "shingles": _shingles_frame(
                            spark, sorted({r[0] for r in rows_t})
                        ),
                    },
                    max_bucket_width=CAP,
                )
                return
            except Exception as exc:  # noqa: BLE001 - whitelist below
                if not is_retryable(exc):
                    errors.append(exc)
                    return
        errors.append(RuntimeError(f"thread {t}: retries exhausted"))

    threads = [threading.Thread(target=run, args=(t,)) for t in batches]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=600)
    assert not errors, errors

    idx = incr_index.read_index(spark, root)
    got = sorted(tuple(r) for r in idx["bands"].collect())
    want = sorted(
        [(1, 0, "k0"), (2, 0, "k0")]
        + [r for rows_t in batches.values() for r in rows_t]
    )
    assert got == want  # exactly once: no loss, no retry double-append
    assert _stop_set(spark, root) == _full_recompute_stop(spark, root)
    # the protocol was actually contended OR ran cleanly — either way
    # every thread terminated through the retry loop, not a deadlock
    assert all(a >= 1 for a in attempts.values())


class _Boom(RuntimeError):
    pass


def _index_content(spark, root):
    idx = incr_index.read_index(spark, root)
    return (
        frozenset(tuple(r) for r in idx["bands"].collect()),
        frozenset((r["doc_id"], tuple(r["_sh"])) for r in idx["shingles"].collect()),
        frozenset(
            tuple(r)
            for r in idx["bucketcounts"]
            .groupBy("band", "key")
            .agg(F.sum("_n").alias("n"))
            .collect()
        ),
        frozenset(
            (r["band"], r["key"], r["_bw"]) for r in idx["stopbands"].collect()
        ),
    )


def test_commit_crash_at_every_step_is_atomic_and_retryable(
    spark, tmp_path, monkeypatch
):
    """Deterministic crash injection at EVERY point of the commit
    sequence: before each of the 4+ segment writes of append_batch and
    before the manifest flip. After each induced crash the index must
    read back EXACTLY the pre-commit content (torn writes invisible),
    and a plain retry must land EXACTLY the no-crash content — the
    protocol's whole claim, checked step by step rather than sampled."""
    batch = {
        "bands": lambda: _bands_frame(spark, BATCHES[0]),
        "shingles": lambda: _shingles_frame(
            spark, sorted({r[0] for r in BATCHES[0]})
        ),
    }

    def fresh_root(name):
        root = str(tmp_path / name)
        _bootstrap(
            spark, root, [(1, 0, "k0"), (2, 0, "k0"), (3, 1, "k1")], [1, 2, 3]
        )
        return root

    # reference: the no-crash outcome
    ref_root = fresh_root("ref")
    pre_content = _index_content(spark, ref_root)
    incr_index.append_batch(
        spark,
        ref_root,
        {k: v() for k, v in batch.items()},
        max_bucket_width=CAP,
    )
    ref_content = _index_content(spark, ref_root)
    assert ref_content != pre_content

    real_write = lake.write_segment
    real_commit = lake.commit_segment_manifest

    # probe how many segment writes one append_batch performs
    calls = {"n": 0}

    def counting_write(*a, **kw):
        calls["n"] += 1
        return real_write(*a, **kw)

    monkeypatch.setattr(lake, "write_segment", counting_write)
    probe_root = fresh_root("probe")
    calls["n"] = 0
    incr_index.append_batch(
        spark, probe_root, {k: v() for k, v in batch.items()}, max_bucket_width=CAP
    )
    n_writes = calls["n"]
    monkeypatch.setattr(lake, "write_segment", real_write)
    assert n_writes >= 4  # bands, shingles, bucketcounts, stopbands

    for crash_at in range(n_writes + 1):  # +1 = crash at the manifest flip
        root = fresh_root(f"c{crash_at}")
        before = _index_content(spark, root)

        state = {"k": 0}

        def failing_write(*a, **kw):
            if state["k"] == crash_at:
                raise _Boom(f"injected before segment write {crash_at}")
            state["k"] += 1
            return real_write(*a, **kw)

        def failing_commit(*a, **kw):
            if crash_at == n_writes:
                raise _Boom("injected before manifest flip")
            return real_commit(*a, **kw)

        monkeypatch.setattr(lake, "write_segment", failing_write)
        monkeypatch.setattr(lake, "commit_segment_manifest", failing_commit)
        with pytest.raises(_Boom):
            incr_index.append_batch(
                spark,
                root,
                {k: v() for k, v in batch.items()},
                max_bucket_width=CAP,
            )
        monkeypatch.setattr(lake, "write_segment", real_write)
        monkeypatch.setattr(lake, "commit_segment_manifest", real_commit)
        # torn commit invisible: pre-commit content, exactly
        assert _index_content(spark, root) == before, f"torn at step {crash_at}"
        # plain retry converges to the no-crash content
        incr_index.append_batch(
            spark,
            root,
            {k: v() for k, v in batch.items()},
            max_bucket_width=CAP,
        )
        assert _index_content(spark, root) == ref_content, f"retry at {crash_at}"


@pytest.mark.skipif(
    not __import__("os").environ.get("RUN_SLOW"),
    reason="randomized merged_stop differential (~2 min); set RUN_SLOW=1",
)
def test_merged_stop_random_batches_equal_full_recompute(spark, tmp_path):
    """Randomized differential for the incremental stop-band update:
    arbitrary batch sequences over a small (band, key) alphabet —
    including batches that alone cross the cap, batches that re-touch
    crossed buckets, and no-op batches — must keep merged_stop equal
    to the full oversized_bucket_stats recompute after EVERY commit.
    Complements the deterministic 3-batch test with adversarial
    interleavings hypothesis finds (shrunk on failure)."""
    from hypothesis import given, settings, strategies as st

    alphabet = [(b, f"k{k}") for b in range(3) for k in range(3)]
    batch_st = st.lists(
        st.sampled_from(range(len(alphabet))), min_size=1, max_size=8
    )
    seq_st = st.lists(batch_st, min_size=1, max_size=4)
    counter = {"n": 0, "case": 0}

    @settings(max_examples=8, deadline=None)
    @given(seq=seq_st)
    def check(seq):
        counter["case"] += 1
        root = str(tmp_path / f"h{counter['case']}")
        _bootstrap(spark, root, [(0, 0, "k0")], [0])
        for rows_ix in seq:
            counter["n"] += 1
            rows = []
            for j, ix in enumerate(rows_ix):
                band, key = alphabet[ix]
                rows.append((1000 * counter["n"] + j, band, key))
            incr_index.append_batch(
                spark,
                root,
                {
                    "bands": _bands_frame(spark, rows),
                    "shingles": _shingles_frame(
                        spark, sorted({r[0] for r in rows})
                    ),
                },
                max_bucket_width=CAP,
            )
            assert _stop_set(spark, root) == _full_recompute_stop(spark, root)

    check()


def _append(spark, root, rows):
    incr_index.append_batch(
        spark,
        root,
        {
            "bands": _bands_frame(spark, rows),
            "shingles": _shingles_frame(spark, sorted({r[0] for r in rows})),
        },
        max_bucket_width=CAP,
    )


def test_compaction_loses_to_mid_flight_ingest_then_retries(
    spark, tmp_path, monkeypatch
):
    """Ordering 1 of the compact-vs-ingest race (r7 VERDICT #7),
    staged deterministically: an ingest commits BETWEEN compaction's
    pin snapshot and its manifest flip. The compacted manifest was
    derived from pre-ingest pins, so committing it would silently drop
    the ingested segments — the optimistic pin must make compaction
    lose loudly instead, and a retry from fresh pins must fold
    everything including the mid-flight batch, content-neutrally."""
    root = str(tmp_path / "idx")
    _bootstrap(spark, root, [(1, 0, "k0"), (2, 0, "k0")], [1, 2])
    _append(spark, root, [(10, 0, "k0"), (11, 1, "k1")])

    real_commit = lake.commit_segment_manifest
    state = {"armed": True}

    def ingest_lands_first(spark_, root_, pins_, expected_base, **kw):
        if state["armed"]:
            state["armed"] = False  # the nested append commits for real
            _append(spark, root, [(20, 2, "k2"), (21, 0, "k0")])
        return real_commit(spark_, root_, pins_, expected_base, **kw)

    monkeypatch.setattr(lake, "commit_segment_manifest", ingest_lands_first)
    with pytest.raises(lake.ConcurrentCommitError):
        incr_index.compact_index(spark, root)
    monkeypatch.setattr(lake, "commit_segment_manifest", real_commit)

    # the mid-flight ingest survived, exactly once
    want_bands = frozenset(
        [(1, 0, "k0"), (2, 0, "k0"), (10, 0, "k0"), (11, 1, "k1"),
         (20, 2, "k2"), (21, 0, "k0")]
    )
    before = _index_content(spark, root)
    assert before[0] == want_bands
    assert _stop_set(spark, root) == _full_recompute_stop(spark, root)
    # compaction retry from fresh pins: one segment per folded
    # component, identical content
    pins = incr_index.compact_index(spark, root)
    assert len(pins["bands"]) == 1 and len(pins["shingles"]) == 1
    assert _index_content(spark, root) == before
    assert _stop_set(spark, root) == _full_recompute_stop(spark, root)


def test_ingest_loses_to_mid_flight_compaction_then_retries(
    spark, tmp_path, monkeypatch
):
    """Ordering 2, staged: a compaction commits BETWEEN the ingest's
    pin snapshot and its manifest flip. The ingest's manifest extends
    pre-compaction pin lists, so committing it would resurrect the
    folded-away segments alongside the compacted one (double rows) —
    the ingest must lose loudly, and its retry must land the batch
    exactly once on top of the compacted index."""
    root = str(tmp_path / "idx")
    _bootstrap(spark, root, [(1, 0, "k0"), (2, 0, "k0")], [1, 2])
    _append(spark, root, [(10, 0, "k0"), (11, 1, "k1")])

    real_commit = lake.commit_segment_manifest
    state = {"armed": True}

    def compaction_lands_first(spark_, root_, pins_, expected_base, **kw):
        if state["armed"]:
            state["armed"] = False  # the nested compaction commits for real
            incr_index.compact_index(spark, root)
        return real_commit(spark_, root_, pins_, expected_base, **kw)

    monkeypatch.setattr(lake, "commit_segment_manifest", compaction_lands_first)
    with pytest.raises(lake.ConcurrentCommitError):
        _append(spark, root, [(20, 2, "k2"), (21, 0, "k0")])
    monkeypatch.setattr(lake, "commit_segment_manifest", real_commit)

    # compaction's fold is committed; the failed ingest is invisible
    assert _index_content(spark, root)[0] == frozenset(
        [(1, 0, "k0"), (2, 0, "k0"), (10, 0, "k0"), (11, 1, "k1")]
    )
    # ingest retry from fresh pins: batch lands exactly once
    _append(spark, root, [(20, 2, "k2"), (21, 0, "k0")])
    assert _index_content(spark, root)[0] == frozenset(
        [(1, 0, "k0"), (2, 0, "k0"), (10, 0, "k0"), (11, 1, "k1"),
         (20, 2, "k2"), (21, 0, "k0")]
    )
    assert _stop_set(spark, root) == _full_recompute_stop(spark, root)


def test_threaded_compaction_races_ingest(spark, tmp_path):
    """REAL concurrency: one thread drains 3 ingest batches while
    another runs compactions, both retrying on the typed conflict (the
    documented client protocol). Whatever interleaving the scheduler
    picks, the end state must hold every batch exactly once with the
    stop table matching a full recompute, and a final compaction must
    be content-neutral."""
    import threading

    root = str(tmp_path / "idx")
    _bootstrap(spark, root, [(1, 0, "k0"), (2, 0, "k0")], [1, 2])

    batches = [
        [(100 + i, i % 3, f"kt{i}") for i in range(3)],
        [(200 + i, i % 3, f"kt{i}") for i in range(3)],
        [(300 + i, i % 3, f"kt{i}") for i in range(3)],
    ]
    errors: list[BaseException] = []

    def is_retryable(exc: BaseException) -> bool:
        if isinstance(exc, lake.ConcurrentCommitError):
            return True
        msg = str(exc)
        return "already exists" in msg or "ALREADY_EXISTS" in msg

    def ingester() -> None:
        for rows in batches:
            for _ in range(30):
                try:
                    _append(spark, root, rows)
                    break
                except Exception as exc:  # noqa: BLE001 - whitelist above
                    if not is_retryable(exc):
                        errors.append(exc)
                        return
            else:
                errors.append(RuntimeError("ingester: retries exhausted"))
                return

    def compactor() -> None:
        for _ in range(3):
            for _ in range(30):
                try:
                    incr_index.compact_index(spark, root)
                    break
                except Exception as exc:  # noqa: BLE001 - whitelist above
                    if not is_retryable(exc):
                        errors.append(exc)
                        return
            else:
                errors.append(RuntimeError("compactor: retries exhausted"))
                return

    threads = [
        threading.Thread(target=ingester),
        threading.Thread(target=compactor),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=600)
    assert not errors, errors

    want_bands = frozenset(
        [(1, 0, "k0"), (2, 0, "k0")]
        + [r for rows in batches for r in rows]
    )
    assert _index_content(spark, root)[0] == want_bands
    assert _stop_set(spark, root) == _full_recompute_stop(spark, root)
    before = _index_content(spark, root)
    incr_index.compact_index(spark, root)
    assert _index_content(spark, root) == before


def test_delete_docs_unblocks_and_refreshes_stop_bands(spark, tmp_path):
    """Deleting docs retracts their band-bucket widths exactly (the
    negative additive counts), UN-stops a bucket whose width falls
    back under the cap (the merged_stop re-check), and the served
    index never shows a deleted doc's rows — all under one commit."""
    # CAP is 3 here so widths cross with few rows
    cap = 3
    root = str(tmp_path / "idx")
    incr_index.bootstrap_index(
        spark,
        root,
        {
            "bands": _bands_frame(
                spark,
                [(1, 0, "k0"), (2, 0, "k0"), (3, 0, "k0"), (4, 0, "k0"),
                 (5, 1, "k1")],
            ),
            "shingles": _shingles_frame(spark, [1, 2, 3, 4, 5]),
        },
        max_bucket_width=cap,
    )
    # (0, k0) width 4 > 3: stopped
    assert {(b, k) for b, k, *_ in _stop_set(spark, root)} == {(0, "k0")}
    incr_index.delete_docs(spark, root, [1, 2])
    # width back to 2 <= 3: un-stopped; counts fold to live widths
    assert _stop_set(spark, root) == set()
    idx = incr_index.read_index(spark, root)
    assert {r["doc_id"] for r in idx["bands"].collect()} == {3, 4, 5}
    assert {r["doc_id"] for r in idx["shingles"].collect()} == {3, 4, 5}
    counts = {
        (r["band"], r["key"], r["n"])
        for r in idx["bucketcounts"]
        .groupBy("band", "key")
        .agg(F.sum("_n").alias("n"))
        .collect()
    }
    assert counts == {(0, "k0", 2), (1, "k1", 1)}
    # replayed delete: idempotent on every stat
    incr_index.delete_docs(spark, root, [1, 999])
    idx2 = incr_index.read_index(spark, root)
    counts2 = {
        (r["band"], r["key"], r["n"])
        for r in idx2["bucketcounts"]
        .groupBy("band", "key")
        .agg(F.sum("_n").alias("n"))
        .collect()
    }
    assert counts2 == counts


def test_delete_then_reingest_resurrects_exactly_once(spark, tmp_path):
    root = str(tmp_path / "idx")
    _bootstrap(spark, root, [(1, 0, "k0"), (2, 0, "k0")], [1, 2])
    incr_index.delete_docs(spark, root, [1])
    assert {
        r["doc_id"]
        for r in incr_index.read_index(spark, root)["bands"].collect()
    } == {2}
    # re-ingest the id (a revised doc re-accepted after take-down):
    # the new rows' sequence outranks the delete's watermark
    _append(spark, root, [(1, 1, "k9")])
    idx = incr_index.read_index(spark, root)
    got = {(r["doc_id"], r["band"], r["key"]) for r in idx["bands"].collect()}
    assert got == {(2, 0, "k0"), (1, 1, "k9")}  # old (1,0,k0) stays dead
    assert _stop_set(spark, root) == _full_recompute_stop(spark, root)


def test_compaction_applies_index_deletes_physically(spark, tmp_path):
    root = str(tmp_path / "idx")
    _bootstrap(
        spark, root,
        [(1, 0, "k0"), (2, 0, "k0"), (3, 1, "k1")], [1, 2, 3],
    )
    _append(spark, root, [(10, 0, "k0"), (11, 1, "k1")])
    incr_index.delete_docs(spark, root, [2, 11])
    before = _index_content(spark, root)
    before_stop = _stop_set(spark, root)
    pins = incr_index.compact_index(spark, root)
    assert _index_content(spark, root) == before
    assert _stop_set(spark, root) == before_stop == _full_recompute_stop(
        spark, root
    )
    bands_raw = lake.read_segments(spark, f"{root}/bands", pins["bands"])
    assert bands_raw.filter(bands_raw.doc_id.isin([2, 11])).count() == 0
    tomb = lake.read_segments(
        spark, f"{root}/deleted_docs", pins["deleted_docs"]
    )
    assert tomb.count() == 0
    counts = lake.read_segments(
        spark, f"{root}/bucketcounts", pins["bucketcounts"]
    )
    assert counts.filter("_n <= 0").count() == 0
    # tombstone-free follow-up: plain fold path still works
    _append(spark, root, [(30, 2, "k2")])
    pins2 = incr_index.compact_index(spark, root)
    assert len(pins2["bands"]) == 1
