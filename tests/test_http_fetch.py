"""Loopback-HTTP tests for the chunked download source.

Drives data_services_spark/sources/http_fetch.py against a stdlib
http.server on 127.0.0.1 — real sockets, real Range resume, no external
network. Mirrors the reference's download_channel behavior
(aims_realtime_util.py:488-548): 1 MiB-chunk streaming, 403 -> skip row,
zip handoff."""

from __future__ import annotations

import http.server
import io
import threading
import zipfile

import pytest

from data_services_spark.sources.http_fetch import fetch_zip_members, http_fetch


def _make_zip() -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("site1/temps.csv", "ts,v\n1,20.5\n2,21.0\n")
        zf.writestr("site1/readme.txt", "not data")
        zf.writestr("site2/temps.csv", "ts,v\n1,19.0\n")
    return buf.getvalue()


ZIP_BYTES = _make_zip()
BIG_BODY = bytes(range(256)) * 512  # 128 KiB, content-addressable


class _Handler(http.server.BaseHTTPRequestHandler):
    flaky_hits = 0

    def log_message(self, *a):  # quiet
        pass

    def _send(self, body: bytes, status: int = 200,
              extra: dict | None = None) -> None:
        self.send_response(status)
        self.send_header("Content-Length", str(len(body)))
        for k, v in (extra or {}).items():
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 (stdlib API)
        cls = _Handler
        if self.path == "/data.zip":
            self._send(ZIP_BYTES)
        elif self.path == "/forbidden.zip":
            self.send_error(403)
        elif self.path == "/big.bin":
            rng = self.headers.get("Range")
            if rng:  # bytes=N-
                start = int(rng.split("=")[1].rstrip("-"))
                self._send(
                    BIG_BODY[start:], status=206,
                    extra={"Content-Range":
                           f"bytes {start}-{len(BIG_BODY)-1}/{len(BIG_BODY)}"},
                )
            else:
                self._send(BIG_BODY)
        elif self.path == "/flaky.bin":
            rng = self.headers.get("Range")
            if rng is None:
                cls.flaky_hits += 1
                # advertise the full length, deliver half, drop the socket
                self.send_response(200)
                self.send_header("Content-Length", str(len(BIG_BODY)))
                self.end_headers()
                self.wfile.write(BIG_BODY[: len(BIG_BODY) // 2])
                self.wfile.flush()
                self.connection.close()
            else:
                start = int(rng.split("=")[1].rstrip("-"))
                self._send(
                    BIG_BODY[start:], status=206,
                    extra={"Content-Range":
                           f"bytes {start}-{len(BIG_BODY)-1}/{len(BIG_BODY)}"},
                )
        else:
            self.send_error(404)


@pytest.fixture(scope="module")
def server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_fetch_chunked_and_error_isolation(spark, server):
    urls = spark.createDataFrame(
        [(f"{server}/data.zip",), (f"{server}/forbidden.zip",),
         (f"{server}/missing.zip",), (f"{server}/big.bin",)],
        "url string",
    ).repartition(4)
    # 4 KiB chunks force the streaming loop through many reads
    rows = {r["url"].rsplit("/", 1)[1]: r
            for r in http_fetch(urls, chunk_bytes=4096).collect()}
    assert rows["data.zip"]["status"] == 200
    assert bytes(rows["data.zip"]["content"]) == ZIP_BYTES
    assert rows["big.bin"]["status"] == 200
    assert bytes(rows["big.bin"]["content"]) == BIG_BODY
    # poison URLs become rows, not task failures (reference's per-channel skip)
    assert rows["forbidden.zip"]["status"] == 403
    assert rows["forbidden.zip"]["content"] is None
    assert rows["missing.zip"]["status"] == 404


def test_truncated_body_resumes_via_range(spark, server):
    _Handler.flaky_hits = 0
    urls = spark.createDataFrame([(f"{server}/flaky.bin",)], "url string")
    [row] = http_fetch(urls, chunk_bytes=8192).collect()
    assert row["status"] == 200
    assert bytes(row["content"]) == BIG_BODY  # resumed, not restarted
    assert _Handler.flaky_hits == 1  # exactly one cold start; rest was Range


def test_fetch_zip_members_end_to_end(spark, server):
    urls = spark.createDataFrame(
        [(f"{server}/data.zip",), (f"{server}/forbidden.zip",)], "url string"
    )
    members = fetch_zip_members(spark, urls, suffix=".csv").collect()
    names = sorted(m["entry"] for m in members)
    assert names == ["site1/temps.csv", "site2/temps.csv"]
    assert all(m["source"].endswith("/data.zip") for m in members)
    got = next(bytes(m["content"]) for m in members
               if m["entry"] == "site2/temps.csv")
    assert got == b"ts,v\n1,19.0\n"
