"""Codec parity: lossless exact roundtrip, lossy PSNR >= 40 dB —
the same criteria BASELINE.json sets for decoded-pixel parity."""

import numpy as np
import pytest

from gdal_spark.fixtures.georef import JPEG_QUALITY, np_image_pixels
from gdal_spark.raster.codecs import decode_image, encode_image, sniff_format

DIMS = [(20, 20), (64, 64), (100, 257), (256, 256)]


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


@pytest.mark.parametrize("fmt", ["png", "tiff"])
@pytest.mark.parametrize("dims", DIMS)
def test_lossless_exact(fmt, dims):
    h, w = dims
    arr = np_image_pixels(11, w, h)
    data = encode_image(arr, fmt)
    assert sniff_format(data) == fmt
    out = decode_image(data, fmt)
    assert out.shape == arr.shape
    assert np.array_equal(out, arr)


@pytest.mark.parametrize("dims", DIMS)
def test_jpeg_psnr(dims):
    h, w = dims
    arr = np_image_pixels(7, w, h)
    data = encode_image(arr, "jpeg", quality=JPEG_QUALITY)
    assert sniff_format(data) == "jpeg"
    out = decode_image(data, "jpeg")
    assert out.shape == arr.shape
    assert psnr(arr, out) >= 40.0


def test_jpeg_noise_roundtrip():
    rng = np.random.default_rng(42)
    arr = rng.integers(0, 256, (48, 56, 3)).astype(np.uint8)
    out = decode_image(encode_image(arr, "jpeg", quality=JPEG_QUALITY))
    assert out.shape == arr.shape


def test_gray_png_tiff():
    arr = (np.arange(400, dtype=np.uint8).reshape(20, 20)) % 251
    for fmt in ("png", "tiff"):
        out = decode_image(encode_image(arr, fmt), fmt)
        assert np.array_equal(out, arr)


def test_nearblack_scan_semantics():
    """Edge scans mask the collar but NOT interior dark pixels that
    are shielded from the edges (nearblack is not a flood fill)."""
    import numpy as np

    from gdal_spark.raster.nearblack import nearblack_mask

    img = np.full((10, 12), 200, dtype=np.uint8)
    img[:2, :] = 3          # top collar
    img[:, :1] = 3          # left collar
    img[5, 5] = 0           # interior dark pixel, shielded
    mask = nearblack_mask(img, near_dist=15)
    assert mask[:2, :].all() and mask[:, 0].all()
    assert not mask[5, 5]
    # a dark TONGUE reaching in from the right edge is masked
    img2 = np.full((8, 8), 200, dtype=np.uint8)
    img2[3, 4:] = 1
    m2 = nearblack_mask(img2, near_dist=15)
    assert m2[3, 4:].all() and not m2[3, 3]


def test_nearblack_near_white():
    import numpy as np

    from gdal_spark.raster.nearblack import nearblack_mask

    img = np.full((6, 6), 100, dtype=np.uint8)
    img[:, -2:] = 250
    m = nearblack_mask(img, near_dist=15, near_white=True)
    assert m[:, -2:].all() and not m[:, :4].any()


def test_jpeg_restart_markers_bit_exact():
    # DRI/RSTn (T.81 §B.2.4.4/E.2.4): restart layout must not change
    # a single decoded pixel vs the plain stream, for color and gray,
    # across interval edge cases (1 = marker between every MCU)
    import numpy as np

    from gdal_spark.raster.jpeg import decode_jpeg, encode_jpeg

    x, y = np.meshgrid(np.arange(88), np.arange(72))
    rgb = np.stack(
        [np.abs(((x + y + p) % 510) - 255) for p in (0, 85, 170)],
        axis=2).astype(np.uint8)
    plain = decode_jpeg(encode_jpeg(rgb))
    for ri in (1, 3, 8, 99):
        withr = decode_jpeg(encode_jpeg(rgb, restart_interval=ri))
        assert np.array_equal(withr, plain)
    g = np.abs(((x + y) % 510) - 255).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(g, gray=True, restart_interval=4)),
        decode_jpeg(encode_jpeg(g, gray=True)))
    # a clobbered marker is a loud error, not silent garbage
    blob = bytearray(encode_jpeg(rgb, restart_interval=4))
    idx = blob.find(b"\xff\xd0", 600)
    blob[idx + 1] = 0x00
    import pytest as _pt

    with _pt.raises(ValueError):
        decode_jpeg(bytes(blob))


def test_jpeg_420_subsampling():
    # 4:2:0 (the libjpeg default layout; frmts/jpeg/jpgdataset.cpp
    # writes it unless JPEGMEM quality tweaks request 4:4:4):
    # 2x2-sampled luma MCUs with half-resolution chroma.  Smooth
    # fixtures keep PSNR comfortably above the 40 dB lossy bar, the
    # stream must be measurably smaller, and odd dimensions (MCU = 16
    # now, not 8) must crop back exactly.
    import numpy as np

    from gdal_spark.raster.jpeg import decode_jpeg, encode_jpeg

    x, y = np.meshgrid(np.arange(120), np.arange(104))
    rgb = np.stack(
        [np.abs(((x + y + p) % 510) - 255) for p in (0, 85, 170)],
        axis=2).astype(np.uint8)
    e444 = encode_jpeg(rgb, 90)
    e420 = encode_jpeg(rgb, 90, subsampling="420")
    d = decode_jpeg(e420)
    assert d.shape == rgb.shape
    assert psnr(rgb, d) >= 40.0
    assert len(e420) < len(e444)
    # SOF sampling bytes: Y is 0x22, chroma 0x11
    sof = e420.find(b"\xff\xc0")
    assert e420[sof + 11] == 0x22 and e420[sof + 14] == 0x11
    # restart markers with 16x16 MCUs stay bit-exact vs plain 4:2:0
    for ri in (1, 5):
        assert np.array_equal(
            decode_jpeg(encode_jpeg(rgb, 90, restart_interval=ri,
                                    subsampling="420")), d)
    # odd dims (MCU-16 crop) and tiny images
    for shape in ((17, 19), (1, 1), (8, 33), (16, 16)):
        im = np.stack([np.abs(((np.add.outer(np.arange(shape[0]),
                                             np.arange(shape[1])) + p)
                               % 510) - 255) for p in (0, 85, 170)],
                      axis=2).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(im, 92, subsampling="420"))
        assert out.shape == im.shape
    import pytest as _pt
    with _pt.raises(ValueError, match="444 or 420"):
        encode_jpeg(rgb, 90, subsampling="422")


def test_png_adam7_interlace():
    # Adam7 (PNG spec §8.2): pure pixel reordering — decode of an
    # interlaced stream must be bit-identical to the source for every
    # sample layout, including dims where whole passes are empty.
    import struct
    import zlib

    import numpy as np

    from gdal_spark.raster.png import _ADAM7, decode_png, encode_png

    # the seven passes tile every (y, x) exactly once
    for h, w in ((1, 1), (8, 8), (9, 7), (13, 21)):
        cov = np.zeros((h, w), int)
        for x0, y0, dx, dy in _ADAM7:
            cov[y0::dy, x0::dx] += 1
        assert (cov == 1).all()

    rng = np.random.default_rng(3)
    for shape in ((1, 1), (3, 3), (9, 7), (33, 17), (5, 1), (1, 9)):
        for c in (None, 3, 4):
            s = shape if c is None else shape + (c,)
            a = rng.integers(0, 256, s).astype(np.uint8)
            blob = encode_png(a, interlace=True)
            assert blob[8 + 8 + 12] == 1  # IHDR interlace byte
            assert np.array_equal(decode_png(blob), a)
        u = rng.integers(0, 65536, shape).astype(np.uint16)
        assert np.array_equal(decode_png(encode_png(u, interlace=True)), u)

    # foreign encoders filter each pass scanline (Sub/Up/Avg/Paeth,
    # prev row = previous row of the SAME pass): forward-filter our
    # stream per pass and the decoder must still invert it exactly
    a = rng.integers(0, 256, (21, 19, 3)).astype(np.uint8)
    bpp = 3
    parts = []
    for pi, (x0, y0, dx, dy) in enumerate(_ADAM7):
        sub = a[y0::dy, x0::dx]
        if not (sub.shape[0] and sub.shape[1]):
            continue
        ph, pw = sub.shape[:2]
        flat = sub.reshape(ph, pw * bpp).astype(np.int32)
        for y in range(ph):
            ftype = (pi + y) % 5
            line = flat[y]
            prev = flat[y - 1] if y else np.zeros_like(line)
            left = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]])
            upl = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
            if ftype == 0:
                f = line
            elif ftype == 1:
                f = line - left
            elif ftype == 2:
                f = line - prev
            elif ftype == 3:
                f = line - ((left + prev) >> 1)
            else:
                p = left + prev - upl
                pa, pb, pc = (np.abs(p - left), np.abs(p - prev),
                              np.abs(p - upl))
                pred = np.where((pa <= pb) & (pa <= pc), left,
                                np.where(pb <= pc, prev, upl))
                f = line - pred
            parts.append(bytes([ftype]) + (f & 0xFF).astype(np.uint8)
                         .tobytes())
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data +
                struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 19, 21, 8, 2, 0, 0, 1)
    blob = (sig + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(parts)))
            + chunk(b"IEND", b""))
    assert np.array_equal(decode_png(blob), a)


def test_jpeg_progressive_bit_identical_to_baseline():
    # SOF2 progressive is pure entropy reorganization of the SAME
    # quantized coefficients (T.81 Annex G; frmts/jpeg/jpgdataset.cpp
    # decodes both transparently via libjpeg) — the decoded pixels
    # must equal the baseline stream's bit for bit.
    from gdal_spark.raster.jpeg import (decode_jpeg, encode_jpeg,
                                        encode_jpeg_progressive)

    rng = np.random.RandomState(11)
    for h, w in [(20, 20), (17, 23), (8, 8), (64, 48), (1, 33)]:
        rgb = np_image_pixels(3, w, h)
        for q in (50, 90, 100):
            assert np.array_equal(
                decode_jpeg(encode_jpeg(rgb, q)),
                decode_jpeg(encode_jpeg_progressive(rgb, q)))
        noisy = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg(noisy, 90)),
            decode_jpeg(encode_jpeg_progressive(noisy, 90)))
        g = rng.randint(0, 256, (h, w)).astype(np.uint8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg(g, 90, gray=True)),
            decode_jpeg(encode_jpeg_progressive(g, 90, gray=True)))


def test_jpeg_progressive_eob_and_zrl_paths():
    # constant image = every AC band is one long EOB run; impulse =
    # isolated coefficients exercising ZRL + refinement correction
    # walks; checkerboard = dense high-frequency band
    from gdal_spark.raster.jpeg import (decode_jpeg, encode_jpeg,
                                        encode_jpeg_progressive)

    flat = np.full((40, 40, 3), 200, np.uint8)
    imp = np.zeros((48, 48, 3), np.uint8)
    imp[7, 7] = 255
    imp[40, 3, 1] = 200
    cb1 = ((np.indices((32, 32)).sum(0) % 2) * 255).astype(np.uint8)
    cb = np.stack([cb1, 255 - cb1, cb1], -1)
    for arr in (flat, imp, cb):
        for q in (10, 75, 100):
            assert np.array_equal(
                decode_jpeg(encode_jpeg(arr, q)),
                decode_jpeg(encode_jpeg_progressive(arr, q)))


def test_jpeg_progressive_stream_structure():
    import struct as _s

    from gdal_spark.raster.jpeg import encode_jpeg_progressive

    rgb = np_image_pixels(5, 24, 16)
    blob = encode_jpeg_progressive(rgb, 90)
    assert b"\xff\xc2" in blob and b"\xff\xc0" not in blob[2:-2]
    # libjpeg-style script: 10 scans for color, 6 for gray; every SOS
    # carries a valid spectral band + successive-approximation header
    def scans(b):
        out, p = [], 2
        while p < len(b) - 1:
            if b[p] != 0xFF:
                p += 1
                continue
            m = b[p + 1]
            if m == 0xDA:
                (ln,) = _s.unpack_from(">H", b, p + 2)
                ns = b[p + 4]
                ss, se, ahal = _s.unpack_from(
                    "BBB", b, p + 5 + 2 * ns)
                out.append((ns, ss, se, ahal >> 4, ahal & 15))
                p += 2 + ln
            elif m in (0xD8, 0xD9) or 0xD0 <= m <= 0xD7 or m == 0x00:
                p += 2
            else:
                (ln,) = _s.unpack_from(">H", b, p + 2)
                p += 2 + ln
        return out

    sc = scans(blob)
    assert len(sc) == 10
    assert sc[0] == (3, 0, 0, 0, 1)          # interleaved DC first
    assert all(ns == 1 for ns, ss, *_ in sc if ss > 0)  # AC: 1 comp
    assert any(ah > 0 for _, _, _, ah, _ in sc)         # refinements
    g = scans(encode_jpeg_progressive(
        np_image_pixels(5, 24, 16)[:, :, 0], 90, gray=True))
    assert len(g) == 6
