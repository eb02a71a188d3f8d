"""VRT XML dataset descriptions — the reference's virtual-format
carrier (frmts/vrt/vrtdataset.cpp; gdalbuildvrt writes these,
apps/gdalbuildvrt_lib.cpp).

The engine's execution path for mosaics is the DataFrame compositor
(operators/render.py) and, at tile-index scale, the GTI scan — a
single XML with 10^12 <SimpleSource> nodes is not a scale format and
the reference agrees (that's what GTI exists for).  What THIS module
provides is the interchange surface: `build_vrt` emits the
gdalbuildvrt-shaped document for an images table (streamed, one
source element per feature), and `parse_vrt` / `read_vrt_sources`
turn any VRTDataset back into the placement table the compositor
consumes.  SourceFilename values are the engine's image ids (a MEM
namespace, relativeToVRT=0), mirroring how the reference resolves
filenames through VSI.

All doubles serialize repr-exact (shortest roundtrip), so placements
survive the XML unchanged.
"""

from __future__ import annotations

import math
import os
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "build_vrt",
    "parse_vrt",
    "read_vrt_sources",
    "lookup_lut",
    "apply_complex_source",
]


def lookup_lut(values, lut_in, lut_out):
    """VRTComplexSource::LookupValue (frmts/vrt/vrtsources.cpp:
    lower_bound segment search, clamp below the first / above the
    last entry, exact hits return the paired output, otherwise
    linear interpolation out[i-1] + (v-in[i-1]) * ((out[i]-out[i-1])
    / (in[i]-in[i-1])).  A leading NaN input maps NaN values to its
    paired output.  Vectorized over a numpy array."""
    import numpy as np

    v = np.asarray(values, dtype=np.float64)
    li = np.asarray(lut_in, dtype=np.float64)
    lo = np.asarray(lut_out, dtype=np.float64)
    nan_out = None
    if li.size and np.isnan(li[0]):
        nan_out = lo[0]
        li, lo = li[1:], lo[1:]
    if li.size == 0:
        return np.full(v.shape, nan_out)
    idx = np.searchsorted(li, v, side="left")  # std::lower_bound
    out = np.empty(v.shape, dtype=np.float64)
    lowm = idx == 0
    highm = idx == li.size
    out[lowm] = lo[0]
    out[highm] = lo[-1]
    mid = ~(lowm | highm)
    im = idx[mid]
    exact = li[im] == v[mid]
    seg = np.where(
        exact,
        lo[im],
        lo[im - 1]
        + (v[mid] - li[im - 1]) * ((lo[im] - lo[im - 1]) / (li[im] - li[im - 1])),
    )
    out[mid] = seg
    if nan_out is not None:
        out[np.isnan(v)] = nan_out
    return out


def apply_complex_source(values, scale_ratio=1.0, scale_offset=0.0,
                         nodata=None, lut_in=None, lut_out=None):
    """The ComplexSource pixel pipeline in the reference's order
    (vrtsources.cpp RasterIOInternal): NODATA pixels are masked out
    FIRST (validity mask returned alongside), then linear scaling,
    then the LUT.  Returns (out_values float64, valid bool mask)."""
    import numpy as np

    v = np.asarray(values, dtype=np.float64)
    valid = np.ones(v.shape, dtype=bool)
    if nodata is not None:
        valid = v != float(nodata)
    out = v * float(scale_ratio) + float(scale_offset)
    if lut_in is not None and len(lut_in):
        out = lookup_lut(out, lut_in, lut_out)
    return out, valid


def _r(v: float) -> str:
    return repr(float(v))


def build_vrt(images_geo: DataFrame, path: str, res: float,
              n_bands: int = 3) -> tuple:
    """gdalbuildvrt: compute the union extent of (xmin, ymax, w, h)
    image footprints at resolution `res`, emit a VRTDataset with one
    SimpleSource per image per band.  Extent comes from ONE
    distributed aggregation; sources stream through toLocalIterator
    (driver memory O(one partition)).  Returns (w, h, geotransform).
    """
    from pyspark.sql import functions as F

    ext = images_geo.agg(
        F.min("xmin").alias("x0"),
        F.max(F.col("xmin") + F.col("w") * F.lit(res)).alias("x1"),
        F.max("ymax").alias("y0"),
        F.min(F.col("ymax") - F.col("h") * F.lit(res)).alias("y1"),
    ).first()
    x0, y0 = float(ext["x0"]), float(ext["y0"])
    rw = int(math.ceil((float(ext["x1"]) - x0) / res))
    rh = int(math.ceil((y0 - float(ext["y1"])) / res))
    gt = (x0, res, 0.0, y0, 0.0, -res)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(
            f'<VRTDataset rasterXSize="{rw}" rasterYSize="{rh}">\n'
        )
        f.write(
            "  <GeoTransform>"
            + ", ".join(_r(v) for v in gt)
            + "</GeoTransform>\n"
        )
        rows = list(images_geo.select(
            "image_id", "w", "h", "xmin", "ymax").toLocalIterator())
        for band in range(1, n_bands + 1):
            f.write(
                f'  <VRTRasterBand dataType="Byte" band="{band}">\n'
            )
            for row in rows:
                xoff = (float(row["xmin"]) - x0) / res
                yoff = (y0 - float(row["ymax"])) / res
                f.write(
                    "    <SimpleSource>\n"
                    f'      <SourceFilename relativeToVRT="0">'
                    f'{row["image_id"]}</SourceFilename>\n'
                    f"      <SourceBand>{band}</SourceBand>\n"
                    f'      <SrcRect xOff="0" yOff="0" '
                    f'xSize="{int(row["w"])}" ySize="{int(row["h"])}"/>\n'
                    f'      <DstRect xOff="{_r(xoff)}" yOff="{_r(yoff)}" '
                    f'xSize="{int(row["w"])}" ySize="{int(row["h"])}"/>\n'
                    "    </SimpleSource>\n"
                )
            f.write("  </VRTRasterBand>\n")
        f.write("</VRTDataset>\n")
    os.replace(tmp, path)
    return rw, rh, gt


def parse_vrt(path: str):
    """-> (raster_w, raster_h, geotransform, sources) where sources
    is a list of dicts (filename, band, src_rect, dst_rect) —
    the subset of the reference's VRTSimpleSource model the
    compositor consumes."""
    root = ET.parse(path).getroot()
    if root.tag != "VRTDataset":
        raise ValueError("vrt: not a VRTDataset document")
    rw = int(root.get("rasterXSize"))
    rh = int(root.get("rasterYSize"))
    gt_node = root.find("GeoTransform")
    gt = tuple(float(v) for v in gt_node.text.split(","))
    sources = []
    for band_node in root.findall("VRTRasterBand"):
        band = int(band_node.get("band"))
        for src in band_node:
            if src.tag not in ("SimpleSource", "ComplexSource"):
                continue
            fn = src.find("SourceFilename").text
            sb_node = src.find("SourceBand")
            sb = int(sb_node.text) if sb_node is not None else 1

            def rect(node):
                return (
                    float(node.get("xOff")), float(node.get("yOff")),
                    float(node.get("xSize")), float(node.get("ySize")),
                )

            def fnode(name, default):
                nd = src.find(name)
                return float(nd.text) if nd is not None else default

            # <LUT>in:out,in:out,...</LUT> (vrtsources.cpp SetLUT /
            # the "%g:%g" comma-joined serialization at :2688-2721)
            lut_node = src.find("LUT")
            lut_in: list = []
            lut_out: list = []
            if lut_node is not None and lut_node.text:
                for pair in lut_node.text.split(","):
                    a, b = pair.split(":")
                    lut_in.append(float(a))
                    lut_out.append(float(b))

            sources.append(
                {
                    "filename": fn,
                    "band": band,
                    "source_band": sb,
                    "src_rect": rect(src.find("SrcRect")),
                    "dst_rect": rect(src.find("DstRect")),
                    # ComplexSource pixel math (vrtsources.cpp
                    # ScaleRatio/ScaleOffset/NODATA/LUT); SimpleSource
                    # defaults are the identity
                    "scale_ratio": fnode("ScaleRatio", 1.0),
                    "scale_offset": fnode("ScaleOffset", 0.0),
                    "nodata": fnode("NODATA", None)
                    if src.find("NODATA") is not None else None,
                    "lut_in": lut_in,
                    "lut_out": lut_out,
                }
            )
    return rw, rh, gt, sources


def read_vrt_sources(spark: SparkSession, path: str) -> DataFrame:
    """VRT -> placement DataFrame (filename, band, dst xmin/ymax in
    model coordinates, source size) — the compositor's input
    contract.  The XML parse is driver-side (a VRT is metadata-sized
    by design; the tile-index scan is the at-scale path)."""
    rw, rh, gt, sources = parse_vrt(path)
    rows = [
        (
            s["filename"], s["band"], s["source_band"],
            gt[0] + s["dst_rect"][0] * gt[1],
            gt[3] + s["dst_rect"][1] * gt[5],
            int(s["src_rect"][2]), int(s["src_rect"][3]),
            s["scale_ratio"], s["scale_offset"], s["nodata"],
            s["lut_in"], s["lut_out"],
        )
        for s in sources
    ]
    return spark.createDataFrame(
        rows,
        "filename string, band int, source_band int, "
        "dst_xmin double, dst_ymax double, src_w int, src_h int, "
        "scale_ratio double, scale_offset double, nodata double, "
        "lut_in array<double>, lut_out array<double>",
    )
