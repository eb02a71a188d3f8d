"""MRF (Meta Raster Format) codec (frmts/mrf/marfa_dataset.cpp)."""

import struct

import numpy as np
import pytest

from gdal_spark.raster.mrf import decode_mrf, encode_mrf, mrf_tile_entries

rng = np.random.RandomState(4)


@pytest.mark.parametrize("comp", ["NONE", "PNG", "DEFLATE"])
def test_lossless_roundtrip(comp):
    a = rng.randint(0, 256, (100, 130, 3)).astype(np.uint8)
    xml, idx, data = encode_mrf(a, page=(48, 32), compression=comp)
    out, bbox = decode_mrf(xml, idx, data)
    assert np.array_equal(out, a)
    assert bbox is None


def test_idx_layout_is_big_endian_rowmajor():
    a = rng.randint(0, 256, (40, 100)).astype(np.uint8)
    xml, idx, data = encode_mrf(a, page=(48, 32), compression="NONE")
    # pagecount 3x2; records (offset,size) net64 BE in x-major order
    assert len(idx) == 16 * 3 * 2
    offs = [struct.unpack_from(">qq", idx, 16 * k) for k in range(6)]
    assert offs[0][0] == 0 and all(s == 48 * 32 for _o, s in offs)
    assert [o for o, _s in offs] == sorted(o for o, _s in offs)


def test_sparse_skip_and_fill():
    g = np.zeros((64, 64), np.uint8)
    g[2:30, 2:30] = 9  # only tile (0,0) non-uniform
    xml, idx, data = encode_mrf(g, page=(32, 32), compression="PNG",
                                skip_uniform=0)
    ents = list(mrf_tile_entries(xml, idx))
    assert sum(1 for e in ents if (e[2], e[3]) != (0, 0)) == 1
    out, _ = decode_mrf(xml, idx, data)
    assert np.array_equal(out[:, :, 0], g)
    # non-zero fill for missing tiles
    out9, _ = decode_mrf(xml, idx, data, fill=9)
    assert (out9[40:, 40:] == 9).all()


def test_bbox_and_guards():
    g = rng.randint(0, 256, (20, 20)).astype(np.uint8)
    xml, idx, data = encode_mrf(g, bbox=(1.25, 2.5, 3.75, 5.0))
    _out, bbox = decode_mrf(xml, idx, data)
    assert bbox == (1.25, 2.5, 3.75, 5.0)
    with pytest.raises(ValueError, match="compression"):
        encode_mrf(g, compression="LERC2")
    with pytest.raises(ValueError, match="index shorter"):
        decode_mrf(xml, idx[:8], data)
    with pytest.raises(ValueError, match="MRF_META"):
        decode_mrf(b"<Other/>", idx, data)
