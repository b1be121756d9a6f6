"""Thin HTTP wrapper around the medallion pipeline — C1/C2 parity.

The reference ships as an Azure Functions HTTP app
(/root/reference/function_app.py:12-73): a health-check echo endpoint
and a process endpoint that runs bronze→silver→gold and returns the
JSON summary (500 + error envelope on failure). This is the stdlib
equivalent: same routes, same envelope, no framework dependency —
deploy-side frameworks (Functions, Flask) would wrap the same two
functions. Not engine-core; the engine surface is the plans/ API.
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession

from ed_housing_data_pipeline_spark.plans import pipeline
from ed_housing_data_pipeline_spark.sources import lake


def health_payload() -> dict:
    """Health-check echo (reference function_app.py:12-35)."""
    return {"status": "ok", "service": "ed_housing_data_pipeline_spark"}


def process_payload(spark: SparkSession) -> tuple[int, dict]:
    """Run the full pipeline; (status_code, body) with the reference's
    ok/error envelope (function_app.py:57-73)."""
    base = os.environ.get("LAKE_BASE")
    if not base:
        return 500, {"status": "error", "message": "LAKE_BASE env var required"}
    try:
        paths = pipeline.PipelinePaths(
            catalog=lake.LakeCatalog(base),
            ingest_date=lake.default_ingest_date(),
            school_format=os.environ.get("SCHOOL_FORMAT", "xlsx"),
        )
        summary = pipeline.run_pipeline(spark, paths)
        return 200, {"status": "ok", **summary}
    except Exception as exc:  # noqa: BLE001 - envelope contract
        return 500, {"status": "error", "message": str(exc)}


# Serializes pipeline runs: concurrent requests would overwrite the
# same silver/gold output paths mid-write (health stays concurrent).
_process_lock = threading.Lock()


def make_server(spark: SparkSession, port: int = 0) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; port 0 picks a free port."""

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, body: dict) -> None:
            data = json.dumps(body).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self) -> None:  # noqa: N802 - stdlib API
            if self.path == "/api/health":
                self._send(200, health_payload())
            elif self.path == "/api/process-bronze-to-silver":
                with _process_lock:
                    self._send(*process_payload(spark))
            else:
                self._send(404, {"status": "error", "message": "not found"})

        do_POST = do_GET  # reference accepts GET and POST alike

        def log_message(self, *args) -> None:  # quiet test output
            pass

    return ThreadingHTTPServer(("127.0.0.1", port), Handler)


def serve_background(spark: SparkSession, port: int = 0) -> tuple[ThreadingHTTPServer, int]:
    """Start the server on a daemon thread; returns (server, port)."""
    srv = make_server(spark, port)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, srv.server_address[1]


if __name__ == "__main__":
    from ed_housing_data_pipeline_spark.session import get_spark

    srv = make_server(get_spark("http-app"), int(os.environ.get("PORT", "8080")))
    print(f"listening on {srv.server_address}")
    srv.serve_forever()
