"""Dataset/layer info reports — the engine's gdalinfo / ogrinfo -so
surface (apps/gdalinfo_lib.cpp report fields; apps/ogrinfo_lib.cpp
summary mode).

`raster_info` mirrors gdalinfo -json's core report per image row:
driver (sniffed from the REAL bytes, never trusted from metadata),
size, band count, the georeferencing block when present (geotransform
origin/res, EPSG, cornerCoordinates, wgs84Extent through the
registry's inverse projection), and band-0 statistics + checksum.

`vector_info` mirrors ogrinfo -so per layer: feature count, geometry
type, extent — a single distributed aggregation, no driver collects.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["raster_info", "vector_info"]

_RASTER_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("driver", T.StringType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("n_bands", T.IntegerType()),
        T.StructField("epsg", T.IntegerType()),
        T.StructField("ulx_q2", T.LongType()),
        T.StructField("uly_q2", T.LongType()),
        T.StructField("lrx_q2", T.LongType()),
        T.StructField("lry_q2", T.LongType()),
        T.StructField("west_e6", T.LongType()),
        T.StructField("north_e6", T.LongType()),
        T.StructField("checksum_b0", T.IntegerType()),
        T.StructField("min_b0", T.IntegerType()),
        T.StructField("max_b0", T.IntegerType()),
    ]
)


def raster_info(df: DataFrame, bytes_col: str = "bytes",
                id_col: str = "image_id") -> DataFrame:
    """(id, bytes) -> one gdalinfo-shaped report row per image."""
    def run(batches):
        import math

        import numpy as np

        from gdal_spark.geo import projzoo as pz
        from gdal_spark.raster.checksum import gdal_checksum
        from gdal_spark.raster.codecs import decode_image, sniff_format
        from gdal_spark.raster.tiff import read_georef

        for pdf in batches:
            recs = []
            for img_id, buf in zip(pdf[id_col], pdf[bytes_col]):
                buf = bytes(buf)
                fmt = sniff_format(buf[:12])
                arr = decode_image(buf, fmt)
                h, w = arr.shape[:2]
                nb = 1 if arr.ndim == 2 else arr.shape[2]
                band0 = arr if arr.ndim == 2 else arr[:, :, 0]
                rec = {
                    "image_id": img_id,
                    "driver": fmt,
                    "w": w,
                    "h": h,
                    "n_bands": nb,
                    "epsg": None,
                    "ulx_q2": None, "uly_q2": None,
                    "lrx_q2": None, "lry_q2": None,
                    "west_e6": None, "north_e6": None,
                    "checksum_b0": gdal_checksum(band0),
                    "min_b0": int(band0.min()),
                    "max_b0": int(band0.max()),
                }
                geo = read_georef(buf) if fmt == "tiff" else None
                if geo is not None:
                    gt, epsg = geo
                    ulx, uly = gt[0], gt[3]
                    lrx = gt[0] + w * gt[1]
                    lry = gt[3] + h * gt[5]
                    lon_w, lat_n = pz.inverse(
                        epsg, np.float64(ulx), np.float64(uly))
                    rec.update(
                        epsg=int(epsg),
                        ulx_q2=math.floor(ulx * 100.0),
                        uly_q2=math.floor(uly * 100.0),
                        lrx_q2=math.floor(lrx * 100.0),
                        lry_q2=math.floor(lry * 100.0),
                        west_e6=math.floor(float(lon_w) * 1e6),
                        north_e6=math.floor(float(lat_n) * 1e6),
                    )
                recs.append(rec)
            yield pd.DataFrame(
                recs, columns=[f.name for f in _RASTER_SCHEMA.fields]
            )

    return df.select(id_col, bytes_col).mapInPandas(run, _RASTER_SCHEMA)


_VECTOR_PART_SCHEMA = T.StructType(
    [
        T.StructField("geom_type", T.StringType()),
        T.StructField("minx", T.DoubleType()),
        T.StructField("miny", T.DoubleType()),
        T.StructField("maxx", T.DoubleType()),
        T.StructField("maxy", T.DoubleType()),
    ]
)


def vector_info(df: DataFrame, geom_col: str = "geometry",
                layer: str = "layer") -> DataFrame:
    """ogrinfo -so summary: one row (layer, n_features, geom_type,
    extent).  Geometry type reports the layer-wide type, MIXED when
    features disagree (the reference prints 'Unknown (any)')."""
    def bounds(batches):
        from gdal_spark.geo.wkb import parse_wkb

        for pdf in batches:
            recs = []
            for wkb in pdf[geom_col]:
                g = parse_wkb(bytes(wkb))
                bx = g.bounds()
                recs.append(
                    {"geom_type": g.type_name, "minx": bx[0],
                     "miny": bx[1], "maxx": bx[2], "maxy": bx[3]}
                )
            yield pd.DataFrame(
                recs,
                columns=[f.name for f in _VECTOR_PART_SCHEMA.fields],
            )

    parts = df.select(geom_col).mapInPandas(bounds, _VECTOR_PART_SCHEMA)
    return parts.agg(
        F.lit(layer).alias("layer"),
        F.count(F.lit(1)).cast("long").alias("n_features"),
        F.when(F.countDistinct("geom_type") == 1, F.min("geom_type"))
        .otherwise(F.lit("MIXED")).alias("geom_type"),
        F.min("minx").alias("minx"),
        F.min("miny").alias("miny"),
        F.max("maxx").alias("maxx"),
        F.max("maxy").alias("maxy"),
    ).select(
        "layer", "n_features", "geom_type",
        F.floor(F.col("minx") * 1e6).cast("long").alias("minx_e6"),
        F.floor(F.col("miny") * 1e6).cast("long").alias("miny_e6"),
        F.floor(F.col("maxx") * 1e6).cast("long").alias("maxx_e6"),
        F.floor(F.col("maxy") * 1e6).cast("long").alias("maxy_e6"),
    )


# --- driver registry (gdalinfo --formats / ogrinfo --formats) -----------------

# (short_name, kind, read, write, typical extension, module) — the
# engine's answer to GDALGetDriverCount/GDALGetDriver enumeration
# (gcore/gdaldrivermanager.cpp); one row per REAL codec/format module
# in this repo (stubs and dispatch-only paths are excluded).
DRIVERS: tuple[tuple[str, str, bool, bool, str, str], ...] = (
    ("PNG", "raster", True, True, "png", "raster/png.py"),
    ("JPEG", "raster", True, True, "jpg", "raster/jpeg.py"),
    ("GTiff", "raster", True, True, "tif", "raster/tiff.py"),
    ("COG", "raster", True, True, "tif", "raster/cog.py"),
    ("WEBP", "raster", True, True, "webp", "raster/webp.py"),
    ("GIF", "raster", True, True, "gif", "raster/gif.py"),
    ("BMP", "raster", True, True, "bmp", "raster/bmp.py"),
    ("ENVI", "raster", True, True, "dat", "raster/envi.py"),
    ("AAIGrid", "raster", True, True, "asc", "raster/asciigrid.py"),
    ("XYZ", "raster", True, True, "xyz", "raster/asciigrid.py"),
    ("SRTMHGT", "raster", True, True, "hgt", "raster/hgt.py"),
    ("DTED", "raster", True, True, "dt1", "raster/dted.py"),
    ("USGSDEM", "raster", True, True, "dem", "raster/usgsdem.py"),
    ("GRIB", "raster", True, True, "grb2", "raster/grib.py"),
    ("JP2OpenJPEG", "raster", True, True, "jp2", "raster/jp2.py"),
    ("PDS", "raster", True, True, "img", "raster/pds.py"),
    ("FITS", "raster", True, True, "fits", "raster/fits.py"),
    ("TGA", "raster", True, True, "tga", "raster/tga.py"),
    ("GSAG", "raster", True, True, "grd", "raster/simplegrids.py"),
    ("GSBG", "raster", True, True, "grd", "raster/simplegrids.py"),
    ("ZMap", "raster", True, True, "dat", "raster/simplegrids.py"),
    ("RST", "raster", True, True, "rst", "raster/idrisi.py"),
    ("Terragen", "raster", True, True, "ter", "raster/terragen.py"),
    ("HF2", "raster", True, True, "hfz", "raster/hf2.py"),
    ("ERS", "raster", True, True, "ers", "raster/hdrpairs.py"),
    ("ILWIS", "raster", True, True, "mpr", "raster/hdrpairs.py"),
    ("EHdr", "raster", True, True, "bil", "raster/hdrpairs.py"),
    ("SAGA", "raster", True, True, "sdat", "raster/hdrpairs.py"),
    ("PAux", "raster", True, True, "aux", "raster/hdrpairs.py"),
    ("GXF", "raster", True, True, "gxf", "raster/gxf.py"),
    ("ISIS3", "raster", True, True, "cub", "raster/isis3.py"),
    ("LAN", "raster", True, True, "lan", "raster/lan.py"),
    ("NTv2", "raster", True, True, "gsb", "raster/ntv2.py"),
    ("PNM", "raster", True, True, "pnm", "raster/rawformats.py"),
    ("KRO", "raster", True, True, "kro", "raster/rawformats.py"),
    ("GTX", "raster", True, True, "gtx", "raster/rawformats.py"),
    ("SNODAS", "raster", True, True, "hdr", "raster/rawformats.py"),
    ("SIGDEM", "raster", True, True, "sigdem", "raster/rawformats.py"),
    ("NGSGEOID", "raster", True, True, "bin", "raster/rawformats.py"),
    ("JDEM", "raster", True, True, "mem", "raster/rawformats.py"),
    ("ACE2", "raster", True, True, "ACE2", "raster/rawformats.py"),
    ("HDF5", "multidim", True, True, "h5", "sources/hdf5.py"),
    ("netCDF-4", "multidim", True, True, "nc4", "sources/netcdf4.py"),
    ("Arrow", "vector", True, True, "arrow", "sources/arrowipc.py"),
    ("G711", "audio", True, True, "au", "raster/g711.py"),
    ("MRF", "raster", True, True, "mrf", "raster/mrf.py"),
    ("GTFS", "vector", True, True, "txt", "sources/gtfs.py"),
    ("JSONFG", "vector", True, True, "json", "sources/jsonfg.py"),
    ("ESRIC", "raster", True, True, "bundle", "sources/esric.py"),
    ("KMLSUPEROVERLAY", "raster", True, True, "kml",
     "operators/kmlsuperoverlay.py"),
    ("BSB", "raster", True, True, "kap", "raster/bsb.py"),
    ("NITF", "raster", True, True, "ntf", "raster/nitf.py"),
    ("PCIDSK", "raster", True, True, "pix", "raster/pcidsk.py"),
    ("HDF4", "raster", True, True, "hdf", "raster/hdf4.py"),
    ("MBTiles", "raster", True, True, "mbtiles", "sources/mbtiles.py"),
    ("PMTiles", "raster", True, True, "pmtiles", "sources/pmtiles.py"),
    ("Zarr", "multidim", True, True, "zarr", "sources/zarr.py"),
    ("netCDF", "multidim", True, True, "nc", "sources/netcdf.py"),
    ("VRT", "raster", True, True, "vrt", "sources/vrt.py"),
    ("STACIT", "raster", True, False, "json", "sources/stac.py"),
    ("STACTA", "raster", True, True, "json", "sources/stacta.py"),
    ("WAV", "audio", True, True, "wav", "raster/wav.py"),
    ("FLAC", "audio", True, True, "flac", "raster/flac.py"),
    ("OggFLAC", "audio", True, True, "ogg", "raster/ogg.py"),
    ("AVI", "video", True, True, "avi", "raster/avi.py"),
    ("MP4", "video", True, True, "mp4", "raster/mp4.py"),
    ("GeoParquet", "vector", True, True, "parquet", "sources/geoparquet.py"),
    ("GPKG", "vector", True, True, "gpkg", "sources/gpkg.py"),
    ("ESRI Shapefile", "vector", True, True, "shp", "sources/shapefile.py"),
    ("FlatGeobuf", "vector", True, True, "fgb", "sources/flatgeobuf.py"),
    ("GeoJSON", "vector", True, True, "geojson", "sources/geojson.py"),
    ("GeoJSONSeq", "vector", True, True, "geojsonl", "sources/geojsonseq.py"),
    ("CSV", "vector", True, True, "csv", "sources/csvgeo.py"),
    ("KML", "vector", True, True, "kml", "sources/kml.py"),
    ("GML", "vector", True, True, "gml", "sources/gml.py"),
    ("GPX", "vector", True, True, "gpx", "sources/gpx.py"),
    ("DXF", "vector", True, True, "dxf", "sources/dxf.py"),
    ("MapInfo File", "vector", True, True, "mif", "sources/mif.py"),
    ("SQLite", "vector", True, True, "sqlite", "sources/spatialite.py"),
    ("TopoJSON", "vector", True, True, "topojson", "sources/topojson.py"),
    ("JML", "vector", True, True, "jml", "sources/jml.py"),
    ("GMT", "vector", True, True, "gmt", "sources/gmt.py"),
    ("OSM", "vector", True, True, "osm", "sources/osmxml.py"),
    ("OSMPBF", "vector", True, True, "pbf", "sources/osmpbf.py"),
    ("PGDump", "vector", False, True, "sql", "sources/pgdump.py"),
    ("MVT", "vector", True, True, "pbf", "sources/mvt.py"),
    ("SOZip", "container", True, True, "zip", "sources/sozip.py"),
)


def driver_list(spark) -> "DataFrame":
    """One row per registered format driver — the engine's
    `gdalinfo --formats` / `ogrinfo --formats` enumeration."""
    rows = [
        (n, k, "r" + ("w" if w else "") if r else "w", ext, mod)
        for n, k, r, w, ext, mod in DRIVERS
    ]
    return spark.createDataFrame(
        rows,
        "short_name string, kind string, caps string, extension string,"
        " module string",
    )
