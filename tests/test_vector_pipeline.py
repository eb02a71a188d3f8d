"""gdal vector pipeline step tests."""

import numpy as np
from pyspark.sql import functions as F

from gdal_spark.geo.wkb import (
    WKB_MULTIPOLYGON,
    parse_wkb,
    wkb_multipolygon,
    wkb_polygon,
)
from gdal_spark.operators import vector_pipeline as vp

SQ1 = [np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0], [0.0, 0.0]])]
SQ2 = [np.array([[5.0, 5.0], [6.0, 5.0], [6.0, 6.0], [5.0, 6.0], [5.0, 5.0]])]


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "park", bytearray(wkb_polygon(SQ1))),
            (2, "farm", bytearray(wkb_polygon(SQ2))),
            (3, "park", bytearray(wkb_multipolygon([SQ1, SQ2]))),
        ],
        ["fid", "kind", "geometry"],
    )


def test_filter_select(spark):
    df = _df(spark)
    out = vp.step_select(vp.step_filter(df, "kind = 'park'"), ["fid"])
    assert {r["fid"] for r in out.collect()} == {1, 3}
    assert out.columns == ["fid", "geometry"]


def test_swap_xy_roundtrip(spark):
    df = _df(spark).where("fid = 1")
    once = vp.step_swap_xy(df)
    twice = vp.step_swap_xy(once)
    g1 = parse_wkb(bytes(once.collect()[0]["geometry"]))
    g2 = parse_wkb(bytes(twice.collect()[0]["geometry"]))
    assert np.allclose(g1.parts[0], SQ1[0][:, ::-1])
    assert np.allclose(g2.parts[0], SQ1[0])


def test_clip_drops_outside(spark):
    df = _df(spark).where("fid <= 2")
    out = vp.step_clip(df, (-1.0, -1.0, 1.0, 1.0)).collect()
    assert [r["fid"] for r in out] == [1]
    ring = parse_wkb(bytes(out[0]["geometry"])).parts[0]
    assert ring[:, 0].max() <= 1.0 and ring[:, 1].max() <= 1.0


def test_explode_and_promote(spark):
    df = _df(spark)
    exploded = vp.step_explode_collections(df)
    assert exploded.count() == 4  # 1 + 1 + 2 parts
    promoted = vp.step_set_geom_type_multi(df.where("fid = 1"))
    g = parse_wkb(bytes(promoted.collect()[0]["geometry"]))
    assert g.type_id == WKB_MULTIPOLYGON


def test_concat_schema_union(spark):
    a = spark.createDataFrame([(1, "x")], ["fid", "name"])
    b = spark.createDataFrame([(2, 9.0)], ["fid", "score"])
    out = vp.step_concat([a, b])
    assert set(out.columns) == {"fid", "name", "score"}
    assert out.count() == 2


def test_segmentize_buffer_chain(spark):
    df = _df(spark).where("fid = 1")
    out = vp.step_buffer(vp.step_segmentize(df, 0.5), 1.0)
    ring = parse_wkb(bytes(out.collect()[0]["geometry"])).parts[0]
    from gdal_spark.geo.geom import polygon_area

    area = polygon_area([ring])
    assert 4 + 8 + 3.0 < area <= 4 + 8 + np.pi + 1e-9


def test_step_reproject_roundtrip_and_mercator(spark):
    import numpy as np

    from gdal_spark.geo.wkb import parse_wkb, wkb_polygon
    from gdal_spark.operators.vector_pipeline import step_reproject
    from gdal_spark.tiles import tilemath as tm

    ring = np.array(
        [[-10.0, 40.0], [-9.0, 40.0], [-9.0, 41.0], [-10.0, 41.0], [-10.0, 40.0]]
    )
    df = spark.createDataFrame([(1, wkb_polygon([ring]))], ["fid", "geometry"])
    merc = step_reproject(df, "4326", "3857")
    out = parse_wkb(bytes(merc.collect()[0]["geometry"])).all_rings()[0][0]
    assert abs(out[0, 0] - tm.EARTH_RADIUS * np.radians(-10.0)) < 1e-6
    # roundtrip through LCC back to 4326
    back = step_reproject(
        step_reproject(df, "4326", "lcc:33,45,39,-96"),
        "lcc:33,45,39,-96", "4326",
    )
    ring2 = parse_wkb(bytes(back.collect()[0]["geometry"])).all_rings()[0][0]
    assert np.abs(ring2 - ring).max() < 1e-9


def test_step_reproject_registry_crs(spark):
    # any resolve_crs spelling works in the pipeline step: a WKB
    # point reprojected 'EPSG:4326' -> 'EPSG:3035' matches the
    # registry forward exactly (no legacy tag for LAEA exists)
    import numpy as np

    from gdal_spark.geo import projzoo as pz
    from gdal_spark.geo.wkb import parse_wkb, wkb_point
    from gdal_spark.operators.vector_pipeline import step_reproject

    df = spark.createDataFrame(
        [(1, wkb_point(5.0, 50.0))], ["fid", "geometry"]
    )
    out = step_reproject(df, "EPSG:4326", "EPSG:3035").collect()[0]["geometry"]
    g = parse_wkb(bytes(out))
    ex, ey = pz.forward(3035, np.array([5.0]), np.array([50.0]))
    # 4326->3035 crosses the zero-Helmert ETRS89 step (~0.1 mm)
    assert abs(g.parts[0][0, 0] - float(ex[0])) < 1e-3
    assert abs(g.parts[0][0, 1] - float(ey[0])) < 1e-3
    # mixed legacy + registry spelling
    out2 = step_reproject(df, "4326", "+proj=moll").collect()[0]["geometry"]
    g2 = parse_wkb(bytes(out2))
    mx, my = pz.forward("ESRI:54009", np.array([5.0]), np.array([50.0]))
    assert abs(g2.parts[0][0, 0] - float(mx[0])) < 1e-6
    assert abs(g2.parts[0][0, 1] - float(my[0])) < 1e-6
