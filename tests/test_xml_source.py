"""XML feed scans (stdlib ElementTree, namespace-insensitive local-name
matching): RSS item feeds, WFS GML FeatureCollections, KML site folders —
the reference's three XML shapes (aims_realtime_util.py:431-475,
bom/wfs.py:38-66, common_waverider.py:97-150)."""

from __future__ import annotations

import pytest

from data_services_spark.sources.xml import (
    kml_sites,
    read_kml_placemarks,
    read_rss_items,
    rss_table,
    read_wfs_features,
    wfs_typed,
)

_RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel>
 <title>AIMS feed</title>
 <link>http://example.invalid</link>
 <description>channels</description>
 <item>
  <title>Water Temp @ Pier</title>
  <channel_id>101</channel_id>
  <site_name>Pier</site_name>
  <parameter>TEMP</parameter>
  <from_date>2024-01-01T00:00:00Z</from_date>
 </item>
 <item>
  <title>Salinity @ Buoy</title>
  <channel_id>202</channel_id>
  <site_name>Buoy</site_name>
  <parameter>PSAL</parameter>
  <from_date>2024-02-01T00:00:00Z</from_date>
 </item>
</channel></rss>"""

_GML = """<?xml version="1.0"?>
<wfs:FeatureCollection xmlns:wfs="http://www.opengis.net/wfs"
  xmlns:gml="http://www.opengis.net/gml" xmlns:bom="http://bom.invalid">
 <gml:boundedBy><gml:Box>0 0 1 1</gml:Box></gml:boundedBy>
 <gml:featureMember>
  <bom:wave_obs>
   <bom:the_geom><gml:Point><gml:pos>-32.1 115.7</gml:pos></gml:Point></bom:the_geom>
   <bom:obs_id>1</bom:obs_id>
   <bom:statid>55035</bom:statid>
   <bom:datetime>2024-03-01T10:00:00Z</bom:datetime>
   <bom:hs>1.25</bom:hs>
   <bom:tp>9.5</bom:tp>
  </bom:wave_obs>
 </gml:featureMember>
 <gml:featureMember>
  <bom:wave_obs>
   <bom:the_geom><gml:Point><gml:pos>-33.0 114.9</gml:pos></gml:Point></bom:the_geom>
   <bom:obs_id>2</bom:obs_id>
   <bom:statid>55036</bom:statid>
   <bom:datetime>2024-03-01T10:30:00Z</bom:datetime>
   <bom:hs>2.5</bom:hs>
   <bom:tp>11.0</bom:tp>
  </bom:wave_obs>
 </gml:featureMember>
</wfs:FeatureCollection>"""

_KML = """<?xml version="1.0"?>
<kml xmlns="http://www.opengis.net/kml/2.2"><Document>
 <Folder>
  <name>Current sites</name>
  <Placemark id="ALB01">
   <name>Albany</name>
   <snippet>01/06/1998 - 31/12/2020</snippet>
   <description>&lt;b&gt;Location ID:&lt;/b&gt; ALB &lt;br&gt;&lt;b&gt;Depth:&lt;/b&gt; 55.5 m&lt;br&gt;
    &lt;a href="https://example.invalid/ALB_Metadata.zip"&gt;meta&lt;/a&gt;
    &lt;a href="https://example.invalid/ALB_YEARLY_PROCESSED.zip"&gt;data&lt;/a&gt;</description>
   <Point><coordinates>117.8,-35.0,0</coordinates></Point>
  </Placemark>
  <Placemark id="MAN01">
   <name>Mandurah</name>
   <snippet>15/03/2004 - 01/01/2021</snippet>
   <description>&lt;b&gt;Location ID:&lt;/b&gt; MAN &lt;br&gt;</description>
   <Point><coordinates>115.6,-32.5,0</coordinates></Point>
  </Placemark>
 </Folder>
</Document></kml>"""


@pytest.fixture()
def xml_dir(tmp_path):
    (tmp_path / "feed.xml").write_text(_RSS)
    (tmp_path / "waves.gml").write_text(_GML)
    (tmp_path / "sites.kml").write_text(_KML)
    return tmp_path


def test_rss_long_and_wide(spark, xml_dir):
    long = read_rss_items(spark, str(xml_dir / "feed.xml"))
    got = {(r["item_idx"], r["tag"]): r["value"] for r in long.collect()}
    # channel preamble (title/link/description) is NOT item data
    assert got[(0, "channel_id")] == "101"
    assert got[(1, "parameter")] == "PSAL"
    assert (0, "link") not in got

    wide = rss_table(
        spark, str(xml_dir / "feed.xml"), ["channel_id", "site_name", "parameter"]
    )
    rows = {r["channel_id"]: (r["site_name"], r["parameter"]) for r in wide.collect()}
    assert rows == {"101": ("Pier", "TEMP"), "202": ("Buoy", "PSAL")}


def test_wfs_features_typed(spark, xml_dir):
    long = read_wfs_features(spark, str(xml_dir / "waves.gml"))
    vals = {(r["feature_idx"], r["varname"]): r["value"] for r in long.collect()}
    assert vals[(0, "statid")] == "55035"
    assert vals[(1, "hs")] == "2.5"
    assert vals[(0, "the_geom")] == "-32.1 115.7"  # nested geometry text

    typed = wfs_typed(spark, str(xml_dir / "waves.gml"), keep_string=("the_geom",))
    rows = sorted(typed.collect(), key=lambda r: r["feature_idx"])
    assert rows[0]["statid"] == 55035 and isinstance(rows[0]["statid"], int)
    assert rows[1]["hs"] == 2.5
    assert rows[0]["datetime"].year == 2024  # timestamp-typed
    assert dict(typed.dtypes)["hs"] == "double"


def test_kml_placemarks_and_sites(spark, xml_dir):
    pm = read_kml_placemarks(spark, str(xml_dir / "sites.kml"))
    rows = {r["placemark_id"]: r for r in pm.collect()}
    assert rows["ALB01"]["folder"] == "Current sites"
    assert rows["ALB01"]["longitude"] == 117.8
    assert rows["ALB01"]["latitude"] == -35.0

    sites = {r["placemark_id"]: r for r in kml_sites(spark, str(xml_dir / "sites.kml")).collect()}
    alb = sites["ALB01"]
    assert alb["site_code"] == "ALB"
    assert alb["water_depth"] == 55.5
    assert str(alb["time_start"]) == "1998-06-01"
    assert str(alb["time_end"]) == "2020-12-31"
    assert alb["metadata_zip_url"].endswith("ALB_Metadata.zip")
    assert alb["data_zip_url"].endswith("ALB_YEARLY_PROCESSED.zip")
    # site with no depth/zip: NULL depth, empty url, but still a row
    man = sites["MAN01"]
    assert man["water_depth"] is None
    assert man["data_zip_url"] == ""
