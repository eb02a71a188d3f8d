"""Georeferencing sidecar files: ESRI world files and GDAL PAM.

Re-derives (not copies) two reference surfaces:

- World files (.tfw/.pgw/.wld): 6 decimal lines pinning the CENTER of
  the top-left pixel — gcore/gdal_misc.cpp GDALReadWorldFile /
  GDALWriteWorldFile: line order is gt[1], gt[4], gt[2], gt[5], then
  gt[0] + 0.5*gt[1] + 0.5*gt[2] and gt[3] + 0.5*gt[4] + 0.5*gt[5];
  reading inverts the half-pixel shift.
- PAM (.aux.xml): the <PAMDataset> sidecar the reference writes for
  statistics and metadata on read-only formats
  (gcore/gdalpamdataset.cpp) — subset: SRS, GeoTransform, per-band
  statistics + metadata items.
"""

from __future__ import annotations

import re
from xml.etree import ElementTree as ET


# ---------------------------------------------------------------------------
# world files
# ---------------------------------------------------------------------------

def write_world_file(gt: tuple) -> str:
    """6-term gdal geotransform -> world-file text (center-of-pixel
    convention)."""
    lines = [
        gt[1],
        gt[4],
        gt[2],
        gt[5],
        gt[0] + 0.5 * gt[1] + 0.5 * gt[2],
        gt[3] + 0.5 * gt[4] + 0.5 * gt[5],
    ]
    return "".join(f"{v!r}\n" for v in (float(x) for x in lines))


def read_world_file(text: str) -> tuple:
    """world-file text -> 6-term gdal geotransform (inverts the
    half-pixel center shift)."""
    vals = [float(v) for v in text.split()]
    if len(vals) != 6:
        raise ValueError(f"world file: expected 6 numbers, got {len(vals)}")
    a, d, b, e, cx, cy = vals
    return (cx - 0.5 * a - 0.5 * b, a, b, cy - 0.5 * d - 0.5 * e, d, e)


# ---------------------------------------------------------------------------
# PAM (.aux.xml)
# ---------------------------------------------------------------------------

def write_pam(
    gt: tuple | None = None,
    srs_wkt: str | None = None,
    band_stats: list[dict] | None = None,
    metadata: dict | None = None,
) -> str:
    """Build a <PAMDataset> sidecar.  band_stats: one dict per band
    with any of min/max/mean/stddev (written as the reference's
    STATISTICS_* metadata items, gcore/gdalpamrasterband.cpp)."""
    root = ET.Element("PAMDataset")
    if srs_wkt is not None:
        ET.SubElement(root, "SRS").text = srs_wkt
    if gt is not None:
        ET.SubElement(root, "GeoTransform").text = ", ".join(
            repr(float(v)) for v in gt)
    if metadata:
        md = ET.SubElement(root, "Metadata")
        for k in sorted(metadata):
            mdi = ET.SubElement(md, "MDI", key=k)
            mdi.text = str(metadata[k])
    for bi, stats in enumerate(band_stats or [], start=1):
        band = ET.SubElement(root, "PAMRasterBand", band=str(bi))
        md = ET.SubElement(band, "Metadata")
        for name in ("min", "max", "mean", "stddev"):
            if name in stats:
                mdi = ET.SubElement(
                    md, "MDI", key=f"STATISTICS_{name.upper()}")
                mdi.text = repr(float(stats[name]))
    return ET.tostring(root, encoding="unicode")


def read_pam(text: str) -> dict:
    """Parse a <PAMDataset>: {'gt': tuple|None, 'srs_wkt': str|None,
    'metadata': dict, 'band_stats': [dict per band]}."""
    root = ET.fromstring(text)
    if root.tag != "PAMDataset":
        raise ValueError(f"PAM: expected PAMDataset, got {root.tag!r}")
    out = {"gt": None, "srs_wkt": None, "metadata": {}, "band_stats": []}
    srs = root.find("SRS")
    if srs is not None and srs.text:
        out["srs_wkt"] = srs.text.strip()
    gt_el = root.find("GeoTransform")
    if gt_el is not None and gt_el.text:
        vals = [float(v) for v in re.split(r"[,\s]+", gt_el.text.strip())
                if v]
        if len(vals) != 6:
            raise ValueError("PAM: GeoTransform needs 6 terms")
        out["gt"] = tuple(vals)
    md = root.find("Metadata")
    if md is not None:
        for mdi in md.findall("MDI"):
            out["metadata"][mdi.get("key")] = mdi.text or ""
    bands = sorted(root.findall("PAMRasterBand"),
                   key=lambda b: int(b.get("band", "0")))
    for band in bands:
        stats = {}
        bmd = band.find("Metadata")
        if bmd is not None:
            for mdi in bmd.findall("MDI"):
                key = mdi.get("key", "")
                if key.startswith("STATISTICS_"):
                    stats[key[len("STATISTICS_"):].lower()] = float(
                        mdi.text or "nan")
        out["band_stats"].append(stats)
    return out
