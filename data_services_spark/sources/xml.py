"""XML feed scans from spec (stdlib ``xml.etree`` only) — the reference's
three load-bearing XML shapes, re-expressed as distributed Spark scans:

* RSS/channel item feeds — the AIMS feed that drives the reference's whole
  CDC loop (``lib/python/aims_realtime_util.py:431-475``): each ``<item>``
  becomes a row keyed by the feed's primary key element.
* WFS GML FeatureCollections — member features to typed columns
  (``ARDC_API_NRT/ardc_nrt/lib/bom/wfs.py:38-66`` ``xml2dataframe``).
* KML site folders — Placemark id/name/coordinates/description rows
  (``DOT-WA-WAVE/lib/waverider/common_waverider.py:97-150``); the
  reference's regex field extraction (depth, Location ID, zip URLs) stays
  JVM-side as ``regexp_extract`` column expressions over the raw
  description, not Python.

Physical shape (same as ``sources/xlsx.py``): ``spark.read.format
("binaryFile")`` gives one (path, content) row per file; ``mapInPandas``
parses each file on an executor; everything downstream is column
expressions. The parser cores take a (path, content) iterator, so callers
can also feed XML held in a DataFrame column (the registry query
synthesizes feed XML from the events table to get a DuckDB-checkable
round-trip with no filesystem dependency).

Namespace handling: tags are matched on their LOCAL name (the reference
strips ``{ns}`` prefixes with a regex, ``wfs.py:46``) — GML/KML documents
vary their namespace URIs per server.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LOCAL = re.compile(r"^\{.*\}")


def _local(tag: str) -> str:
    return _LOCAL.sub("", tag)


# ------------------------------------------------------------------ RSS ---

RSS_ITEM_SCHEMA = "path string, item_idx int, tag string, value string"


def _iter_rss_items(path: str, content: bytes):
    """Yield (path, item_idx, tag, text) for every child element of every
    ``<item>`` under the first ``<channel>`` (reference walks
    ``root[0]`` then the item nodes, ``aims_realtime_util.py:440-443``)."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(content)
    channel = None
    for ch in root:
        if _local(ch.tag) == "channel":
            channel = ch
            break
    if channel is None:  # flat feeds: items directly under the root
        channel = root
    idx = 0
    for node in channel:
        if _local(node.tag) != "item":
            continue
        for field in node:
            yield (path, idx, _local(field.tag), field.text)
        idx += 1


def parse_rss_items(raw: DataFrame) -> DataFrame:
    """Long-format (path, item_idx, tag, value) from a (path, content)
    frame — one executor task per file, no driver-side XML."""
    import pandas as pd

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = ["path", "item_idx", "tag", "value"]
        for pdf in batches:
            rows = [
                r
                for p, content in zip(pdf["path"], pdf["content"])
                for r in _iter_rss_items(p, bytes(content))
            ]
            yield pd.DataFrame(rows, columns=cols)

    return raw.select("path", "content").mapInPandas(parse, schema=RSS_ITEM_SCHEMA)


def read_rss_items(spark: SparkSession, path: str) -> DataFrame:
    return parse_rss_items(spark.read.format("binaryFile").load(path))


def rss_table(spark: SparkSession, path: str, tags: list[str]) -> DataFrame:
    """Widen the long item frame to one row per item with the requested
    tags as columns (groupBy + conditional first — no pivot-inference
    job), the reference's dict-per-item shape
    (``aims_realtime_util.py:451-466``)."""
    long = read_rss_items(spark, path)
    return long.groupBy("path", "item_idx").agg(
        *[
            F.first(F.when(F.col("tag") == t, F.col("value")), ignorenulls=True)
            .alias(t)
            for t in tags
        ]
    )


# ------------------------------------------------------------------ WFS ---

WFS_SCHEMA = "path string, feature_idx int, varname string, value string"


def _iter_wfs_features(path: str, content: bytes):
    """GML FeatureCollection: each non-bounds member's first child is the
    feature; its child elements are (varname, value) — the reference reads
    ``root[i][0][j]`` and strips namespaces (``wfs.py:39-49``). Emitted
    long-format; nested geometry elements contribute their stripped text."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(content)
    idx = 0
    for member in root:
        if _local(member.tag) in ("boundedBy", "name", "description"):
            continue
        if len(member) == 0:
            continue
        feature = member[0]
        for fld in feature:
            name = _local(fld.tag)
            text = fld.text
            if text is None or not text.strip():
                # geometry wrapper: take the first descendant with text
                for sub in fld.iter():
                    if sub.text and sub.text.strip():
                        text = sub.text
                        break
            yield (path, idx, name, None if text is None else text.strip())
        idx += 1


def read_wfs_features(spark: SparkSession, path: str) -> DataFrame:
    import pandas as pd

    raw = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = ["path", "feature_idx", "varname", "value"]
        for pdf in batches:
            rows = [
                r
                for p, content in zip(pdf["path"], pdf["content"])
                for r in _iter_wfs_features(p, bytes(content))
            ]
            yield pd.DataFrame(rows, columns=cols)

    return raw.select("path", "content").mapInPandas(parse, schema=WFS_SCHEMA)


def wfs_typed(
    spark: SparkSession,
    path: str,
    int_cols: tuple[str, ...] = ("statid",),
    ts_cols: tuple[str, ...] = ("datetime",),
    keep_string: tuple[str, ...] = (),
) -> DataFrame:
    """Typed wide frame per feature, the reference's column typing rule
    (``wfs.py:47-60``): named id columns -> int, named time columns ->
    timestamp, everything else -> double (missing -> NULL, the NaN
    analogue)."""
    long = read_wfs_features(spark, path)
    names = [r["varname"] for r in long.select("varname").distinct().collect()]
    wide = long.groupBy("path", "feature_idx").agg(
        *[
            F.first(F.when(F.col("varname") == n, F.col("value")), ignorenulls=True)
            .alias(n)
            for n in sorted(names)
        ]
    )
    for n in sorted(names):
        if n in keep_string:
            continue
        if n in int_cols:
            wide = wide.withColumn(n, F.col(n).cast("int"))
        elif n in ts_cols:
            wide = wide.withColumn(n, F.to_timestamp(n))
        else:
            wide = wide.withColumn(n, F.col(n).cast("double"))
    return wide


# ------------------------------------------------------------------ KML ---

KML_SCHEMA = (
    "path string, folder string, placemark_id string, name string, "
    "longitude double, latitude double, snippet string, description string"
)


def _iter_kml_placemarks(path: str, content: bytes):
    """Placemark rows per Folder (``common_waverider.py:97-126``):
    id attribute, name, Point coordinates split lon,lat, snippet, raw
    description (field regexes stay Spark-side)."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(content)
    for folder in root.iter():
        if _local(folder.tag) != "Folder":
            continue
        folder_name = None
        for ch in folder:
            if _local(ch.tag) == "name":
                folder_name = ch.text
                break
        for pm in folder:
            if _local(pm.tag) != "Placemark":
                continue
            fields = {"name": None, "snippet": None, "description": None}
            lon = lat = None
            for ch in pm:
                t = _local(ch.tag)
                if t in fields:
                    fields[t] = ch.text
                elif t == "Point":
                    for sub in ch:
                        if _local(sub.tag) == "coordinates" and sub.text:
                            parts = sub.text.strip().split(",")
                            lon = float(parts[0])
                            lat = float(parts[1])
            yield (
                path,
                folder_name,
                pm.attrib.get("id"),
                fields["name"],
                lon,
                lat,
                fields["snippet"],
                fields["description"],
            )


def read_kml_placemarks(spark: SparkSession, path: str) -> DataFrame:
    import pandas as pd

    raw = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = [
            "path", "folder", "placemark_id", "name",
            "longitude", "latitude", "snippet", "description",
        ]
        for pdf in batches:
            rows = [
                r
                for p, content in zip(pdf["path"], pdf["content"])
                for r in _iter_kml_placemarks(p, bytes(content))
            ]
            yield pd.DataFrame(rows, columns=cols)

    return raw.select("path", "content").mapInPandas(parse, schema=KML_SCHEMA)


def kml_sites(spark: SparkSession, path: str) -> DataFrame:
    """The reference's site table (``common_waverider.py:110-150``): depth
    and Location ID pulled from the HTML description, start/end parsed from
    the snippet — ALL as column expressions over the parsed placemarks."""
    pm = read_kml_placemarks(spark, path)
    return pm.select(
        "placemark_id",
        F.col("name").alias("site_name"),
        "latitude",
        "longitude",
        F.regexp_extract("description", r"<b>Depth:</b>\s*([0-9.]+)\s*m<br>", 1)
        .try_cast("double")  # no-match -> '' -> NULL (ANSI-safe)
        .alias("water_depth"),
        F.regexp_extract("description", r"<b>Location ID:</b>\s*([^<]+?)\s*<br>", 1)
        .alias("site_code"),
        F.to_date(F.split("snippet", " - ").getItem(0), "d/M/yyyy").alias("time_start"),
        F.to_date(F.split("snippet", " - ").getItem(1), "d/M/yyyy").alias("time_end"),
        F.regexp_extract(
            "description", r'href="(https?://[^"]*_Metadata\.zip)"', 1
        ).alias("metadata_zip_url"),
        F.regexp_extract(
            "description", r'href="(https?://[^"]*_YEARLY_PROCESSED\.zip)"', 1
        ).alias("data_zip_url"),
    )
