"""Zip payload extraction: binary archive column -> entry rows
(the data half of the reference's wget-zip-unzip pipelines)."""

from __future__ import annotations

import zipfile

from pyspark.sql import functions as F

from data_services_spark.operators.archives import zip_entries


def _zip_path(tmp_path):
    p = tmp_path / "delivery.zip"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("data/site_a.csv", "ts,temp\n1,21.5\n")
        zf.writestr("data/site_b.csv", "ts,temp\n1,19.0\n")
        zf.writestr("README.txt", "ignore me")
        zf.writestr("data/", "")  # directory entry
    return str(p)


def test_entries_exploded(spark, tmp_path):
    raw = spark.read.format("binaryFile").load(_zip_path(tmp_path))
    entries = zip_entries(raw)
    got = {r["entry"]: (r["n_bytes"], bytes(r["content"])) for r in entries.collect()}
    assert set(got) == {"data/site_a.csv", "data/site_b.csv", "README.txt"}
    assert got["data/site_a.csv"][1].decode().startswith("ts,temp")


def test_suffix_filter_and_manifest(spark, tmp_path):
    raw = spark.read.format("binaryFile").load(_zip_path(tmp_path))
    csvs = zip_entries(raw, suffix=".csv", include_content=False)
    rows = csvs.collect()
    assert {r["entry"] for r in rows} == {"data/site_a.csv", "data/site_b.csv"}
    assert all(r["content"] is None for r in rows)  # manifest pass: no inflate
    assert all(r["n_bytes"] > 0 and r["crc32"] is not None for r in rows)
