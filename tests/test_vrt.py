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


def test_lookup_lut_semantics():
    """VRTComplexSource::LookupValue (vrtsources.cpp): clamp below
    first / above last, exact hits, linear interpolation, NaN head."""
    import numpy as np

    from gdal_spark.sources.vrt import lookup_lut

    li, lo = [10.0, 100.0, 250.0], [100.0, 40.0, 224.0]
    v = np.array([0.0, 10.0, 55.0, 100.0, 175.0, 250.0, 300.0])
    out = lookup_lut(v, li, lo)
    assert out[0] == 100.0           # below first -> first output
    assert out[1] == 100.0           # exact first
    assert out[3] == 40.0            # exact middle
    assert out[5] == 224.0           # exact last
    assert out[6] == 224.0           # above last -> last output
    assert out[2] == 100.0 + 45.0 * ((40.0 - 100.0) / 90.0)
    assert out[4] == 40.0 + 75.0 * ((224.0 - 40.0) / 150.0)
    # leading-NaN entry maps NaN inputs to its paired output
    out2 = lookup_lut(np.array([np.nan, 55.0]), [np.nan] + li, [7.0] + lo)
    assert out2[0] == 7.0 and out2[1] == out[2]


def test_apply_complex_source_order():
    """NODATA masks the RAW source value; scaling runs before LUT."""
    import numpy as np

    from gdal_spark.sources.vrt import apply_complex_source

    v = np.array([77.0, 100.0])
    out, valid = apply_complex_source(
        v, scale_ratio=0.5, scale_offset=16.0, nodata=77.0,
        lut_in=[10.0, 100.0, 250.0], lut_out=[100.0, 40.0, 224.0],
    )
    assert not valid[0] and valid[1]
    # 100 -> 66 -> interp on the first segment
    assert out[1] == 100.0 + (66.0 - 10.0) * ((40.0 - 100.0) / 90.0)


def test_parse_lut_node(tmp_path):
    doc = """<VRTDataset rasterXSize="2" rasterYSize="1">
  <GeoTransform>0.0, 1.0, 0.0, 1.0, 0.0, -1.0</GeoTransform>
  <VRTRasterBand dataType="Byte" band="1">
    <ComplexSource>
      <SourceFilename relativeToVRT="0">x</SourceFilename>
      <LUT>0:0,128:64,255:255</LUT>
      <SrcRect xOff="0" yOff="0" xSize="2" ySize="1"/>
      <DstRect xOff="0" yOff="0" xSize="2" ySize="1"/>
    </ComplexSource>
  </VRTRasterBand>
</VRTDataset>
"""
    path = str(tmp_path / "l.vrt")
    with open(path, "w") as f:
        f.write(doc)
    s = parse_vrt(path)[3][0]
    assert s["lut_in"] == [0.0, 128.0, 255.0]
    assert s["lut_out"] == [0.0, 64.0, 255.0]


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
