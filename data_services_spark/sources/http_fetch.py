"""Distributed chunked HTTP download: URL rows -> payload rows.

The reference's realtime channel pipelines download each channel's zip
over HTTP in 1 MiB chunks, treat 403/404 as a per-channel skip (not a job
failure), and hand the bytes to the unzip stage
(aims_realtime_util.py:488-548 ``download_channel``: urlopen + ``read(
1024*1024)`` loop + ZipFile; faimms.py:149-195 per-channel ``break`` on
failure). Spark-first shape: the fetch is a ``mapInPandas`` stage over a
DataFrame of URLs — each task streams its partition's URLs with the
stdlib, so a 10k-channel crawl fans out across executors and the bytes
land directly in the next stage (``operators.archives.zip_entries``)
without touching the driver or local disk.

Scale notes:
- One URL is one row; ``repartition(n)`` the URL frame to set fetch
  parallelism (each task holds at most one payload in memory at a time —
  payloads stream chunk-by-chunk into one buffer, not one buffer per row
  of the Arrow batch, because the generator yields one-row frames).
- Transient truncation resumes via HTTP Range (``bytes=<got>-``) up to
  ``max_retries`` — the chunked loop knows exactly how many bytes it has.
- HTTP errors isolate per URL: (status, empty content) rows, mirroring
  the reference's per-channel skip. A poison URL never kills the stage.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

FETCH_SCHEMA = "url string, status int, n_bytes long, content binary"


def _fetch_one(
    url: str, chunk_bytes: int, timeout: float, max_retries: int
) -> tuple[int, bytes]:
    """Stream one URL in ``chunk_bytes`` reads; resume truncations with a
    Range request. Returns (http status, body)."""
    import http.client
    import urllib.error
    import urllib.request

    buf = bytearray()
    expected: int | None = None
    for _attempt in range(max_retries + 1):
        req = urllib.request.Request(url)
        ranged = bool(buf)
        if ranged:
            req.add_header("Range", f"bytes={len(buf)}-")
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                if ranged and resp.status != 206:
                    buf.clear()  # server ignored Range: full body follows
                if expected is None:
                    clen = resp.headers.get("Content-Length")
                    expected = int(clen) if clen is not None else None
                while True:
                    try:
                        chunk = resp.read(chunk_bytes)
                    except http.client.IncompleteRead as e:
                        buf.extend(e.partial)
                        break  # truncated mid-chunk: resume via Range
                    if not chunk:
                        break
                    buf.extend(chunk)
            if expected is None or len(buf) >= expected:
                return 200, bytes(buf)
            # short read with no exception: retry from the current offset
        except urllib.error.HTTPError as e:
            if e.code == 416 and buf and expected and len(buf) >= expected:
                return 200, bytes(buf)  # raced past the end on resume
            return e.code, b""
        except (urllib.error.URLError, http.client.HTTPException,
                OSError, TimeoutError):
            if _attempt == max_retries:
                return -1, b""
    return -1, b""


def http_fetch(
    urls: DataFrame,
    url_col: str = "url",
    chunk_bytes: int = 1024 * 1024,
    timeout: float = 30.0,
    max_retries: int = 2,
) -> DataFrame:
    """One row per URL: (url, status, n_bytes, content). Chain with
    ``operators.archives.zip_entries`` for the reference's
    download->unzip->member-files pipeline."""
    import pandas as pd

    def fetch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = ["url", "status", "n_bytes", "content"]
        for pdf in batches:
            for url in pdf[url_col]:
                status, body = _fetch_one(
                    str(url), chunk_bytes, timeout, max_retries
                )
                # one-row frames keep peak memory at one payload per task
                yield pd.DataFrame(
                    [(url, status, len(body), body if body else None)],
                    columns=cols,
                )

    return urls.select(url_col).mapInPandas(fetch, schema=FETCH_SCHEMA)


def fetch_zip_members(
    spark: SparkSession,
    urls: DataFrame,
    url_col: str = "url",
    suffix: str | None = None,
    **fetch_kwargs,
) -> DataFrame:
    """The reference's full idiom in one plan: chunked download -> in-memory
    unzip -> one row per member file (only 2xx payloads reach the unzip)."""
    from data_services_spark.operators.archives import zip_entries

    fetched = http_fetch(urls, url_col=url_col, **fetch_kwargs)
    ok = fetched.filter("status = 200 AND content IS NOT NULL")
    return zip_entries(ok, payload_col="content", source_col="url",
                       suffix=suffix)
