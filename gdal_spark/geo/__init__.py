from gdal_spark.geo.wkb import wkb_polygon, parse_wkb  # noqa: F401
