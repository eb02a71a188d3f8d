"""World files + PAM sidecars (gdal_spark/raster/sidecar.py) —
gcore/gdal_misc.cpp GDALRead/WriteWorldFile, gcore/gdalpamdataset.cpp."""

import pytest

from gdal_spark.raster.sidecar import (
    read_pam,
    read_world_file,
    write_pam,
    write_world_file,
)

GT = (-20037508.34, 152.87, 0.0, 20037508.34, 0.0, -152.87)


def test_world_file_roundtrip_exact():
    txt = write_world_file(GT)
    assert len(txt.strip().splitlines()) == 6
    assert read_world_file(txt) == GT


def test_world_file_center_convention():
    # line 5/6 carry the CENTER of pixel (0,0), not the corner
    lines = [float(v) for v in write_world_file(GT).split()]
    assert lines[4] == GT[0] + 0.5 * GT[1]
    assert lines[5] == GT[3] + 0.5 * GT[5]


def test_world_file_rotated_terms():
    gt = (100.0, 2.0, 0.5, 900.0, -0.25, -2.0)
    got = read_world_file(write_world_file(gt))
    assert max(abs(a - b) for a, b in zip(gt, got)) < 1e-12


def test_world_file_bad_input():
    with pytest.raises(ValueError):
        read_world_file("1 2 3")


def test_pam_roundtrip():
    from gdal_spark.geo.wktcrs import to_wkt

    stats = [
        {"min": 0.0, "max": 255.0, "mean": 127.25, "stddev": 73.9},
        {"min": 5.0, "max": 250.0},
    ]
    xml = write_pam(gt=GT, srs_wkt=to_wkt(3857),
                    band_stats=stats, metadata={"AREA_OR_POINT": "Area"})
    got = read_pam(xml)
    assert got["gt"] == GT
    assert got["metadata"] == {"AREA_OR_POINT": "Area"}
    assert got["band_stats"] == stats
    from gdal_spark.geo.wktcrs import wkt_to_crs

    assert wkt_to_crs(got["srs_wkt"]) == 3857


def test_pam_minimal_and_bad():
    assert read_pam(write_pam()) == {
        "gt": None, "srs_wkt": None, "metadata": {}, "band_stats": []}
    with pytest.raises(ValueError):
        read_pam("<NotPAM/>")
    with pytest.raises(ValueError):
        read_pam("<PAMDataset><GeoTransform>1, 2</GeoTransform>"
                 "</PAMDataset>")
