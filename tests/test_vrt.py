"""VRT XML carrier (sources/vrt.py) vs hand-built documents
(frmts/vrt/vrtdataset.cpp)."""

from gdal_spark.sources.vrt import build_vrt, parse_vrt, read_vrt_sources


def test_build_parse_roundtrip(spark, tmp_path):
    rows = [
        ("img_a", 20, 10, 1000.0, 2000.0),
        ("img_b", 30, 15, 1000.0 + 20 * 2.5, 2000.0 - 3.75),
    ]
    geo = spark.createDataFrame(
        rows, "image_id string, w int, h int, xmin double, ymax double"
    )
    path = str(tmp_path / "m.vrt")
    rw, rh, gt = build_vrt(geo, path, res=2.5, n_bands=2)
    assert gt == (1000.0, 2.5, 0.0, 2000.0, 0.0, -2.5)
    assert rw == 50           # union width: 20 + 30 columns
    assert rh == 17           # 15 rows shifted down 1.5 px -> ceil 16.5
    rw2, rh2, gt2, sources = parse_vrt(path)
    assert (rw2, rh2, gt2) == (rw, rh, gt)
    assert len(sources) == 4  # 2 images x 2 bands
    a0 = [s for s in sources if s["filename"] == "img_a" and s["band"] == 1][0]
    assert a0["dst_rect"] == (0.0, 0.0, 20.0, 10.0)
    b0 = [s for s in sources if s["filename"] == "img_b" and s["band"] == 2][0]
    assert b0["dst_rect"] == (20.0, 1.5, 30.0, 15.0)
    back = read_vrt_sources(spark, path).toPandas()
    bb = back[(back["filename"] == "img_b") & (back["band"] == 1)].iloc[0]
    assert bb["dst_xmin"] == 1000.0 + 20 * 2.5
    assert bb["dst_ymax"] == 2000.0 - 3.75


def test_parse_foreign_vrt(tmp_path):
    """gdalbuildvrt-shaped documents parse: ComplexSource accepted,
    SourceBand defaults to 1 when absent."""
    doc = """<VRTDataset rasterXSize="8" rasterYSize="4">
  <GeoTransform> 5.0, 1.0, 0.0, 9.0, 0.0, -1.0</GeoTransform>
  <VRTRasterBand dataType="Byte" band="1">
    <ComplexSource>
      <SourceFilename relativeToVRT="1">x.tif</SourceFilename>
      <SrcRect xOff="0" yOff="0" xSize="8" ySize="4"/>
      <DstRect xOff="0" yOff="0" xSize="8" ySize="4"/>
    </ComplexSource>
  </VRTRasterBand>
</VRTDataset>
"""
    path = str(tmp_path / "f.vrt")
    with open(path, "w") as f:
        f.write(doc)
    rw, rh, gt, sources = parse_vrt(path)
    assert (rw, rh) == (8, 4)
    assert gt == (5.0, 1.0, 0.0, 9.0, 0.0, -1.0)
    assert sources[0]["source_band"] == 1
    assert sources[0]["filename"] == "x.tif"


def test_complex_source_scale_offset_nodata(spark, tmp_path):
    doc = """<VRTDataset rasterXSize="8" rasterYSize="4">
  <GeoTransform> 5.0, 1.0, 0.0, 9.0, 0.0, -1.0</GeoTransform>
  <VRTRasterBand dataType="Byte" band="1">
    <ComplexSource>
      <SourceFilename relativeToVRT="1">x.tif</SourceFilename>
      <SourceBand>2</SourceBand>
      <ScaleRatio>0.5</ScaleRatio>
      <ScaleOffset>10</ScaleOffset>
      <NODATA>255</NODATA>
      <SrcRect xOff="0" yOff="0" xSize="8" ySize="4"/>
      <DstRect xOff="0" yOff="0" xSize="8" ySize="4"/>
    </ComplexSource>
  </VRTRasterBand>
</VRTDataset>
"""
    path = str(tmp_path / "c.vrt")
    with open(path, "w") as f:
        f.write(doc)
    _rw, _rh, _gt, sources = parse_vrt(path)
    s = sources[0]
    assert s["scale_ratio"] == 0.5
    assert s["scale_offset"] == 10.0
    assert s["nodata"] == 255.0
    assert s["source_band"] == 2
    row = read_vrt_sources(spark, path).collect()[0]
    assert row["scale_ratio"] == 0.5 and row["nodata"] == 255.0
    # SimpleSource defaults are the identity
    doc2 = doc.replace("ComplexSource", "SimpleSource").replace(
        "<ScaleRatio>0.5</ScaleRatio>", "").replace(
        "<ScaleOffset>10</ScaleOffset>", "").replace(
        "<NODATA>255</NODATA>", "")
    with open(path, "w") as f:
        f.write(doc2)
    row = read_vrt_sources(spark, path).collect()[0]
    assert row["scale_ratio"] == 1.0
    assert row["scale_offset"] == 0.0
    assert row["nodata"] is None
