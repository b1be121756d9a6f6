"""HTTP surface tests (C1/C2 parity): health echo, pipeline run with
ok/error envelope, 404 fallback — driven through a real socket."""

from __future__ import annotations

import json
import urllib.request

import pytest

from ed_housing_data_pipeline_spark.plans import http_app

HOUSING = """\
GEO_ID,NAME,S2503_C01_001E,S2503_C01_028E,S2503_C01_032E,S2503_C01_036E,S2503_C01_040E,S2503_C01_044E
Geography,Label,x,x,x,x,x,x
0500000US13121,"Fulton County, Georgia",1000,100,50,25,10,5
"""
SCHOOL = """\
schoolid,schoolname,systemid,systemname,single_score_23
S1,A,601,Fulton County,90
"""
SPECIAL = (
    "m1\nm2\nm3\nm4\n"
    "State LEA ID,LEA Name,School Age All Educational Environments,"
    "School Age Inside regular class 80% or more of the day,School Year\n"
    "601,Fulton,200,150,2022-2023\n"
)


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
        return r.status, json.loads(r.read())


@pytest.fixture()
def server(spark, tmp_path, monkeypatch):
    base = tmp_path / "lake"
    for ds, fname, content in [
        ("housing_affordability", "housing2019-23.csv", HOUSING),
        ("school_performance", "school_performance.csv", SCHOOL),
        ("special_education", "special_education2022-23.csv", SPECIAL),
    ]:
        d = base / "bronze" / ds / "ingest_date=2024-06-01"
        d.mkdir(parents=True)
        (d / fname).write_text(content)
    monkeypatch.setenv("LAKE_BASE", str(base))
    monkeypatch.setenv("INGEST_DATE", "2024-06-01")
    monkeypatch.setenv("SCHOOL_FORMAT", "csv")
    srv, port = http_app.serve_background(spark)
    yield port
    srv.shutdown()


def test_health(server):
    status, body = _get(server, "/api/health")
    assert status == 200 and body["status"] == "ok"


def test_process_endpoint(server):
    status, body = _get(server, "/api/process-bronze-to-silver")
    assert status == 200
    assert body["status"] == "ok"
    assert body["gold"]["county_joined"]["rows"] == 1


def test_not_found_and_error_envelope(server, monkeypatch):
    try:
        _get(server, "/api/nope")
        raise AssertionError("expected 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404
    monkeypatch.delenv("LAKE_BASE")
    try:
        _get(server, "/api/process-bronze-to-silver")
        raise AssertionError("expected 500")
    except urllib.error.HTTPError as e:
        assert e.code == 500
        assert json.loads(e.read())["status"] == "error"
