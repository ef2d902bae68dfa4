"""CLI end-to-end over a real local HTTP server (exercises the
stdlib urllib transport, not a fake)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

from etl_python_azure_spark.cli import main as cli_main
from tests.test_plans_e2e import latinad_transport


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):
        # reuse the fixture transport as the routing table
        status, body = latinad_transport(self.path, dict(self.headers))
        if status < 0:
            status = 599
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body.encode())

    def log_message(self, *a):  # quiet
        pass


def test_latinad_cli_against_local_http(spark, tmp_path, capsys):
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_port}"
        rc = cli_main(
            [
                "latinad",
                "--base-url", base,
                "--sink", str(tmp_path / "wh"),
                "--header", "Authorization=Bearer test",
                "--timeout", "30",
            ]
        )
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["pipeline"] == "latinad"
        # the content-12 report endpoint 500s → captured, not fatal
        assert out["failed_requests"] == 1
        disp = spark.read.parquet(str(tmp_path / "wh" / "display_info"))
        assert disp.count() == 2
    finally:
        srv.shutdown()


def test_query_subcommand_runs_and_lists(spark, tmp_path, capsys):
    assert cli_main(["query", "--list"]) == 0
    names = capsys.readouterr().out.split()
    assert "pricing_summary" in names and len(names) > 100

    out = tmp_path / "ps"
    rc = cli_main(
        [
            "query",
            "pricing_summary",
            "--data",
            "/root/testdata/sf0.001",
            "--out",
            str(out),
        ]
    )
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["query"] == "pricing_summary" and payload["rows"] > 0

    assert cli_main(["query", "no_such_query"]) == 2
