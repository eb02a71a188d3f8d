"""HDF5 classic-subset source/sink (sources/hdf5.py) + the netCDF-4
dimension-scale layer (sources/netcdf4.py).

Truth sources: the published lookup3 self-test vectors (checksums),
the public HDF5 spec's fixed superblock layout (structural pins), and
closed-form roundtrips across superblock/OH/layout/filter variants."""

import struct

import numpy as np
import pytest

from gdal_spark.operators.multidim import MDArray
from gdal_spark.sources import hdf5 as H


# ---------------------------------------------------------------------------
# lookup3 — pinned to Bob Jenkins' published self-test values
# ---------------------------------------------------------------------------

def test_lookup3_published_vectors():
    assert H.lookup3(b"", 0) == 0xDEADBEEF
    assert H.lookup3(b"Four score and seven years ago", 0) == 0x17770551
    assert H.lookup3(b"Four score and seven years ago", 1) == 0xCD628161


def _cube_md(spark, T=6, Y=13, X=17):
    rows = [(t, y, x, int((x + 3 * y + 7 * t) % 251))
            for t in range(T) for y in range(Y) for x in range(X)]
    df = spark.createDataFrame(rows, "t long, y long, x long, value int")
    return MDArray(df=df, dims=(("t", T), ("y", Y), ("x", X)),
                   value_col="value"), rows


@pytest.mark.parametrize(
    "sb,oh,chunks,gzip,shuffle",
    [
        (0, 1, (2, 5, 5), 6, False),    # h5py-default metadata style
        (0, 1, None, 0, False),         # contiguous
        (2, 2, (2, 5, 5), 6, True),     # checksummed 'latest' + shuffle
        (0, 2, (4, 4, 4), 0, False),    # chunked, no filters
        (0, 1, (1, 2, 2), 6, False),    # 546 chunks -> multi-level btree
    ],
)
def test_roundtrip_variants(spark, tmp_path, sb, oh, chunks, gzip, shuffle):
    md, rows = _cube_md(spark)
    path = str(tmp_path / "cube.h5")
    H.write_hdf5(md, path, dtype="<i4", chunks=chunks, gzip=gzip,
                 shuffle=shuffle, superblock=sb, oh_version=oh,
                 attrs={"title": "cube", "answer": 42})
    info = H.describe_hdf5(path)
    assert info["superblock"] == sb
    assert info["datasets"]["data"]["attrs"] == {
        "title": "cube", "answer": 42}
    back = H.read_hdf5(spark, path, dim_names=["t", "y", "x"])
    got = {(r["t"], r["y"], r["x"]): r["value"] for r in back.df.collect()}
    assert got == {(t, y, x): v for t, y, x, v in rows}


def test_multilevel_btree_actually_deep(spark, tmp_path):
    md, _ = _cube_md(spark)
    path = str(tmp_path / "deep.h5")
    H.write_hdf5(md, path, dtype="<i4", chunks=(1, 2, 2), gzip=0)
    spec = H.describe_hdf5(path)["datasets"]["data"]
    _, bt_addr, _cd = spec["layout"]
    with open(path, "rb") as fh:
        f = H._F(fh)
        head = f.read(bt_addr, 8)
        assert head[:4] == b"TREE"
        assert head[5] >= 1          # root level >= 1: internal nodes
        chunks = H._collect_chunks(f, bt_addr, 3)
    assert len(chunks) == 6 * 7 * 9  # ceil(6/1)*ceil(13/2)*ceil(17/2)


def test_float_dtypes_roundtrip(spark, tmp_path):
    T, Y = 4, 9
    rows = [(t, y, float(t) * 0.5 - y * 0.25)
            for t in range(T) for y in range(Y)]
    df = spark.createDataFrame(rows, "t long, y long, value double")
    md = MDArray(df=df, dims=(("t", T), ("y", Y)), value_col="value")
    path = str(tmp_path / "f8.h5")
    H.write_hdf5(md, path, dtype="<f8", chunks=(2, 4), gzip=6)
    back = H.read_hdf5(spark, path, dim_names=["t", "y"])
    got = {(r["t"], r["y"]): r["value"] for r in back.df.collect()}
    assert got == {(t, y): v for t, y, v in rows}


def test_superblock_v0_structural_pin(spark, tmp_path):
    """Fixed fields straight from the spec: signature, versions,
    size-of-offsets/lengths 8, leaf/internal k 4/16, EOF == filesize."""
    md, _ = _cube_md(spark, T=2, Y=3, X=4)
    path = str(tmp_path / "pin.h5")
    H.write_hdf5(md, path, dtype="<i2", chunks=None)
    raw = open(path, "rb").read()
    assert raw[:8] == b"\x89HDF\r\n\x1a\n"
    assert raw[8] == 0 and raw[13] == 8 and raw[14] == 8
    assert struct.unpack_from("<HH", raw, 16) == (4, 16)
    eof = struct.unpack_from("<Q", raw, 40)[0]
    assert eof == len(raw)
    # contiguous payload is the raw little-endian cube at the layout
    # address
    spec = H.describe_hdf5(path)["datasets"]["data"]
    kind, addr, nb = spec["layout"]
    assert kind == "contiguous" and nb == 2 * 3 * 4 * 2
    vals = np.frombuffer(raw[addr:addr + nb], dtype="<i2")
    want = np.array([(x + 3 * y + 7 * t) % 251 for t in range(2)
                     for y in range(3) for x in range(4)], dtype="<i2")
    assert np.array_equal(vals, want)


def test_v2_superblock_checksum_verified(spark, tmp_path):
    md, _ = _cube_md(spark, T=2, Y=3, X=4)
    path = str(tmp_path / "v2.h5")
    H.write_hdf5(md, path, dtype="<i4", superblock=2, oh_version=2)
    raw = bytearray(open(path, "rb").read())
    raw[20] ^= 0xFF                  # corrupt EOF inside checksum span
    bad = str(tmp_path / "bad.h5")
    open(bad, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="checksum"):
        H.describe_hdf5(bad)


def test_foreign_garbage_is_loud(tmp_path):
    p = str(tmp_path / "x.h5")
    open(p, "wb").write(b"\x89HDF\r\n\x1a\n" + b"\x99" * 64)
    with pytest.raises(ValueError):
        H.describe_hdf5(p)
    open(p, "wb").write(b"not an hdf5 file at all" * 4)
    with pytest.raises(ValueError, match="signature"):
        H.describe_hdf5(p)


def test_netcdf4_dim_names_resolve(spark, tmp_path):
    from gdal_spark.sources.netcdf4 import read_netcdf4, write_netcdf4

    md, rows = _cube_md(spark, T=3, Y=5, X=7)
    path = str(tmp_path / "c.nc4")
    write_netcdf4(md, path, dtype="<i4", chunks=(2, 3, 3), gzip=6)
    info = H.describe_hdf5(path)
    assert info["datasets"]["t"]["attrs"]["CLASS"] == "DIMENSION_SCALE"
    assert info["datasets"]["x"]["attrs"]["_Netcdf4Dimid"] == 2
    back = read_netcdf4(spark, path)
    assert [n for n, _ in back.dims] == ["t", "y", "x"]
    got = {(r["t"], r["y"], r["x"]): r["value"] for r in back.df.collect()}
    assert got == {(t, y, x): v for t, y, x, v in rows}


def test_netcdf4_phony_fallback(spark, tmp_path):
    """Plain HDF5 (no scales, no _Netcdf4Coordinates) -> phony_dim_N,
    the reference HDF5-driver fallback."""
    from gdal_spark.sources.netcdf4 import read_netcdf4

    md, _ = _cube_md(spark, T=2, Y=3, X=4)
    path = str(tmp_path / "plain.h5")
    H.write_hdf5(md, path, dtype="<i4", chunks=(1, 3, 2), gzip=6)
    back = read_netcdf4(spark, path)
    assert [n for n, _ in back.dims] == [
        "phony_dim_0", "phony_dim_1", "phony_dim_2"]


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=12, deadline=None)
@given(seed=st.integers(0, 2 ** 31 - 1),
       dt=st.sampled_from(["<i1", "<i2", "<i4", "<u2", "<f4", "<f8"]),
       cy=st.integers(1, 5), cx=st.integers(1, 6),
       gz=st.sampled_from([0, 1, 6]), shuf=st.booleans())
def test_chunk_payload_property(seed, dt, cy, cx, gz, shuf):
    """Writer/reader chunk codecs agree for random arrays without
    Spark in the loop: pack one chunk the writer's way, decode the
    reader's way (shuffle + deflate + edge trim)."""
    import zlib

    rng = np.random.RandomState(seed)
    dtype = np.dtype(dt)
    shape = (int(rng.randint(1, 9)), int(rng.randint(1, 11)))
    if dtype.kind == "f":
        arr = rng.randn(*shape).astype(dtype)
    else:
        info = np.iinfo(dtype)
        arr = rng.randint(info.min, int(info.max) + 1,
                          size=shape).astype(dtype)
    cshape = (cy, cx)
    csize = cy * cx
    # writer-side: pad the (single) edge chunk at origin (0,0)
    buf = np.zeros(cshape, dtype=dtype)
    sub = arr[:cy, :cx]
    buf[:sub.shape[0], :sub.shape[1]] = sub
    raw = buf.ravel().tobytes()
    if shuf:
        raw = (np.frombuffer(raw, np.uint8)
               .reshape(csize, dtype.itemsize).T.tobytes())
    if gz:
        raw = zlib.compress(raw, gz)
    # reader-side
    out = raw
    if gz:
        out = zlib.decompress(out)
    if shuf:
        out = (np.frombuffer(out, np.uint8)
               .reshape(dtype.itemsize, csize).T.tobytes())
    dec = np.frombuffer(out, dtype=dtype).reshape(cshape)
    trim = dec[:min(cy, shape[0]), :min(cx, shape[1])]
    assert np.array_equal(trim, arr[:cy, :cx])
