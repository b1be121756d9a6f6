"""Unit tests for operators/events.py — event-time buckets, JSON
extraction, and lag+cumsum sessionization."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ed_housing_data_pipeline_spark.operators import events
from tests.conftest import rows


def ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


def _events(spark):
    return spark.createDataFrame(
        [
            (1, ts(10, 0), 100, "view", 1.0, '{"k": 5}'),
            (2, ts(10, 20), 100, "view", 2.0, '{"k": "bad"}'),
            (3, ts(11, 5), 100, "buy", 3.0, None),
            (4, ts(10, 30), 200, "view", 4.0, '{"other": 1}'),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_with_json_field_cast_invalid_to_null(spark):
    out = events.with_json_field(_events(spark), "props", "k", "k_val", cast="double")
    got = {r["event_id"]: r["k_val"] for r in out.collect()}
    assert got == {1: 5.0, 2: None, 3: None, 4: None}


def test_tumbling_agg_hour(spark):
    out = events.tumbling_agg(
        _events(spark), "ts", "hour", ["user_id"], {"n": F.count(F.lit(1))}
    )
    assert rows(out, "bucket", "user_id", "n") == [
        (ts(10), 100, 2),
        (ts(10), 200, 1),
        (ts(11), 100, 1),
    ]


def test_sliding_window_agg(spark):
    out = events.sliding_window_agg(
        _events(spark), "ts", "1 hour", "30 minutes", [], {"n": F.count(F.lit(1))}
    )
    got = {(r["window_start"], r["n"]) for r in out.collect()}
    # [09:30, 10:30) holds 10:00 and 10:20 (end-exclusive)
    assert (ts(9, 30), 2) in got
    assert (ts(10, 0), 3) in got  # 10:00, 10:20, 10:30


def test_sessionize_gap_split(spark):
    out = events.sessionize(_events(spark), "ts", "user_id", gap_minutes=30)
    got = {r["event_id"]: r["session_id"] for r in out.collect()}
    # user 100: 10:00 and 10:20 same session; 11:05 is 45min later -> new
    assert got[1] == got[2] == 1
    assert got[3] == 2
    assert got[4] == 1  # user 200's own first session


def test_sessionize_tiebreak_column_optional(spark):
    df = _events(spark).drop("event_id")
    # must not raise despite the default tie-break column being absent
    out = events.sessionize(df, "ts", "user_id", gap_minutes=30)
    assert out.count() == 4
    out2 = events.sessionize(
        _events(spark), "ts", "user_id", gap_minutes=30, tiebreak_col=None
    )
    assert out2.count() == 4


def test_session_stats(spark):
    out = events.session_stats(_events(spark), "ts", "user_id", gap_minutes=30)
    r = {(row["user_id"], row["session_id"]): row for row in out.collect()}
    s1 = r[(100, 1)]
    assert s1["n_events"] == 2
    assert s1["span_sec"] == 1200.0
    assert s1["total_value"] == 3.0
    assert r[(100, 2)]["n_events"] == 1


def test_sessionize_rejects_unknown_explicit_tiebreak(spark):
    import pytest

    with pytest.raises(ValueError, match="tiebreak_col"):
        events.sessionize(_events(spark), "ts", "user_id", 30, tiebreak_col="nope")
