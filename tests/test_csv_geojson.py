"""CSV WKT-column + GeoJSON FeatureCollection sources
(sources/csvgeo.py, sources/geojson.py). Reference:
ogr/ogrsf_frmts/csv/ogrcsvlayer.cpp WKT mode,
ogr/ogrsf_frmts/geojson/ogrgeojsonlayer.cpp."""

import json

import numpy as np
import pytest

from gdal_spark.geo.wkb import parse_wkb, wkb_point, wkb_polygon


def sq(x0, y0, s):
    return np.array(
        [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]],
        dtype=float,
    )


@pytest.fixture()
def zones_df(spark):
    rows = []
    for i in range(23):
        # non-integer coords exercise repr-exact text round-trips
        x0 = (i * 13) % 50 + 0.125 + i * 1e-9
        rings = [sq(x0, (i * 7) % 50 + 0.25, 5.5)]
        rows.append((i, f"k{i % 4}", bytearray(wkb_polygon(rings))))
    return spark.createDataFrame(
        rows, "fid long, kind string, geometry binary"
    ), rows


class TestCsvWkt:
    def test_roundtrip_bit_exact(self, spark, zones_df, tmp_path):
        from gdal_spark.sources.csvgeo import read_csv_wkt, write_csv_wkt

        df, rows = zones_df
        p = str(tmp_path / "z.csv")
        write_csv_wkt(df, p)
        back = {
            r.fid: r
            for r in read_csv_wkt(spark, p, "fid long, kind string").collect()
        }
        assert len(back) == 23
        for i, kind, wkb in rows:
            got = parse_wkb(bytes(back[i].geometry))
            orig = parse_wkb(bytes(wkb))
            assert np.array_equal(got.parts[0], orig.parts[0])
            assert back[i].kind == kind

    def test_header_and_quoting(self, spark, zones_df, tmp_path):
        from gdal_spark.sources.csvgeo import write_csv_wkt

        df, _rows = zones_df
        p = str(tmp_path / "z.csv")
        write_csv_wkt(df, p)
        with open(p) as f:
            head = f.readline().strip()
            body = f.readline()
        assert head == "fid,kind,WKT"
        assert '"POLYGON' in body  # WKT contains commas -> quoted


class TestGeoJson:
    def test_roundtrip(self, spark, zones_df, tmp_path):
        from gdal_spark.sources.geojson import read_geojson, write_geojson

        df, rows = zones_df
        p = str(tmp_path / "z.geojson")
        write_geojson(df, p)
        with open(p) as f:
            doc = json.load(f)  # the whole file is valid JSON
        assert doc["type"] == "FeatureCollection"
        assert len(doc["features"]) == 23
        back = {
            r.fid: r
            for r in read_geojson(spark, p, "fid long, kind string").collect()
        }
        assert len(back) == 23
        for i, _kind, wkb in rows:
            got = parse_wkb(bytes(back[i].geometry))
            orig = parse_wkb(bytes(wkb))
            assert np.array_equal(got.parts[0], orig.parts[0])

    def test_pretty_printed_fallback(self, spark, tmp_path):
        from gdal_spark.sources.geojson import read_geojson

        # an externally-written, pretty-printed document: the line
        # scan finds nothing and the driver-side fallback parses it
        doc = {
            "type": "FeatureCollection",
            "features": [
                {
                    "type": "Feature",
                    "properties": {"fid": 7},
                    "geometry": {"type": "Point", "coordinates": [1.5, -2.5]},
                }
            ],
        }
        p = str(tmp_path / "pretty.geojson")
        with open(p, "w") as f:
            json.dump(doc, f, indent=2)
        rows = read_geojson(spark, p, "fid long").collect()
        assert len(rows) == 1
        assert bytes(rows[0].geometry) == wkb_point(1.5, -2.5)
