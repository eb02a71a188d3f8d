"""Property-based tests for the round-4 codecs — GIF LZW, SOZip
chunked deflate + line splits, BMP, ENVI, PMTiles tile ids, MID
quoting, TopoJSON arc decoding."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_spark.raster.bmp import decode_bmp, encode_bmp
from gdal_spark.raster.envi import decode_envi, encode_envi
from gdal_spark.raster.gif import decode_gif, encode_gif, lzw_decode, lzw_encode
from gdal_spark.sources.mif import _split_mid_line
from gdal_spark.sources.pmtiles import tileid_to_zxy, zxy_to_tileid
from gdal_spark.sources.sozip import sozip_index, write_sozip


@given(st.integers(2, 8), st.lists(st.integers(0, 255), min_size=1,
                                   max_size=3000))
@settings(max_examples=40, deadline=None)
def test_lzw_roundtrip_any_stream(mcs, vals):
    data = np.asarray([v % (1 << mcs) for v in vals], dtype=np.uint8)
    assert np.array_equal(lzw_decode(lzw_encode(data, mcs), mcs,
                                     len(data)), data)


@given(st.integers(1, 40), st.integers(1, 40), st.integers(2, 256),
       st.booleans(), st.integers(0, 2 ** 31))
@settings(max_examples=40, deadline=None)
def test_gif_roundtrip_any_image(h, w, ncol, interlace, seed):
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, ncol, size=(h, w)).astype(np.uint8)
    pal = rng.integers(0, 256, size=(ncol, 3)).astype(np.uint8)
    i2, p2, _ = decode_gif(encode_gif(idx, pal, interlace=interlace))
    assert np.array_equal(i2, idx)
    assert np.array_equal(p2[:ncol], pal)


@given(st.integers(1, 20), st.integers(1, 20), st.integers(0, 2 ** 31))
@settings(max_examples=40, deadline=None)
def test_bmp_roundtrip_any_shape(h, w, seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(arr)), arr)


@given(st.sampled_from(["bsq", "bil", "bip"]),
       st.integers(1, 12), st.integers(1, 12), st.integers(1, 4),
       st.integers(0, 2 ** 31))
@settings(max_examples=40, deadline=None)
def test_envi_roundtrip_any_layout(il, h, w, b, seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 255, size=(h, w, b)).astype(np.uint8)
    back, _ = decode_envi(*encode_envi(arr, interleave=il))
    assert np.array_equal(back, arr)


@given(st.integers(0, 14), st.integers(0, 2 ** 31), st.integers(0, 2 ** 31))
@settings(max_examples=80, deadline=None)
def test_pmtiles_tileid_bijection(z, xs, ys):
    x = xs % (1 << z)
    y = ys % (1 << z)
    assert tileid_to_zxy(zxy_to_tileid(z, x, y)) == (z, x, y)


@given(st.lists(
    st.one_of(st.none(),
              st.text(alphabet='ab",\\ ', min_size=0, max_size=8),
              st.integers(-999, 999)),
    min_size=1, max_size=6,
))
@settings(max_examples=60, deadline=None)
def test_mid_quoting_roundtrip(vals):
    """The MID writer's quoting rules invert through _split_mid_line."""
    toks = []
    for v in vals:
        if v is None:
            toks.append("")
        elif isinstance(v, str):
            toks.append('"' + v.replace('"', '""') + '"')
        else:
            toks.append(str(v))
    line = ",".join(toks)
    got = _split_mid_line(line, ",")
    assert len(got) == len(vals)
    for g, v in zip(got, vals):
        if v is None:
            assert g is None
        elif isinstance(v, str):
            assert g == v
        else:
            assert g == str(v)


@given(st.lists(st.text(alphabet="abcxyz 0123", min_size=0, max_size=60),
                min_size=1, max_size=60),
       st.integers(8, 200))
@settings(max_examples=25, deadline=None)
def test_sozip_chunk_independence(lines, chunk_size):
    """Every chunk inflates independently to its exact byte slice,
    whatever the chunking (the distributed-scan precondition)."""
    import tempfile
    import zlib

    text = "".join(ln + "\n" for ln in lines)
    data = text.encode()
    with tempfile.NamedTemporaryFile(suffix=".zip") as f:
        write_sozip(f.name, "m.txt", data, chunk_size=chunk_size)
        cs, us, csz, offs, ds = sozip_index(f.name, "m.txt")
        blob = open(f.name, "rb").read()
    assert us == len(data)
    bounds = offs + [csz]
    rec = b""
    for i in range(len(offs)):
        part = zlib.decompressobj(-15).decompress(
            blob[ds + bounds[i]:ds + bounds[i + 1]])
        assert part == data[i * cs:(i + 1) * cs]
        rec += part
    assert rec == data
