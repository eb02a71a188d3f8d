"""Property-based tests for the round-3-tail kernels — reclassify,
ASCII grids, AVI, hex cells, calc expressions, NTv2 interpolation."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_spark.operators.calc import compile_calc
from gdal_spark.raster.asciigrid import (
    decode_aaigrid, decode_xyz, encode_aaigrid, encode_xyz,
)
from gdal_spark.raster.avi import decode_avi, encode_avi
from gdal_spark.raster.reclassify import parse_mapping
from gdal_spark.tiles import hexcell as hx


@given(
    st.lists(
        st.tuples(st.integers(0, 200), st.integers(1, 30),
                  st.integers(-100, 100)),
        min_size=1, max_size=6,
    ),
    st.lists(st.floats(-50, 250, allow_nan=False), min_size=1, max_size=40),
)
@settings(max_examples=60, deadline=None)
def test_reclassify_matches_scalar_walk(raw_intervals, values):
    """Vectorized apply == per-value linear scan over the parsed
    intervals (non-overlapping by construction)."""
    spans = []
    cursor = -300.0
    for gap, width, dst in raw_intervals:
        lo = cursor + gap + 1
        hi = lo + width
        spans.append((lo, hi, dst))
        cursor = hi
    text = ";".join(f"[{lo},{hi}]={dst}" for lo, hi, dst in spans)
    rc = parse_mapping(text + ";DEFAULT=-999")
    got = rc.apply(np.array(values))
    for v, g in zip(values, got):
        want = -999.0
        for lo, hi, dst in spans:
            if lo <= v <= hi:
                want = float(dst)
                break
        assert g == want, (v, text)


@given(
    st.integers(2, 12), st.integers(2, 12),
    st.integers(-1000, 1000), st.integers(-1000, 1000), st.integers(1, 9),
)
@settings(max_examples=40, deadline=None)
def test_aaigrid_xyz_roundtrip_random_grids(h, w, xll, yll, cell):
    rng = np.random.default_rng(h * 1000 + w)
    arr = rng.integers(-500, 500, (h, w)).astype(np.float64)
    back, geo = decode_aaigrid(
        encode_aaigrid(arr, xll, yll, cell, center=bool(xll % 2))
    )
    np.testing.assert_array_equal(back, arr)
    back2, _ = decode_xyz(
        encode_xyz(back, geo["x0"], geo["y0"], geo["dx"], geo["dy"],
                   sep="," if w % 2 else " ")
    )
    np.testing.assert_array_equal(back2, arr)


@given(st.integers(1, 6), st.integers(2, 10), st.integers(2, 10))
@settings(max_examples=30, deadline=None)
def test_avi_roundtrip_random_dims(n, h, w):
    rng = np.random.default_rng(n * 100 + h * 10 + w)
    frames = rng.integers(0, 256, (n, h, w, 3)).astype(np.uint8)
    out, fps = decode_avi(encode_avi(frames, fps=12))
    assert fps == 12
    np.testing.assert_array_equal(out, frames)


@given(
    st.floats(-85, 85, allow_nan=False),
    st.floats(-180, 180, allow_nan=False),
    st.integers(1, 12),
)
@settings(max_examples=60, deadline=None)
def test_hex_parent_is_coarser_and_nearby(lat, lon, res):
    """parent(cell) contains-ish: the coarse cell of the point and the
    parent of its fine cell have centers within 2 coarse cell sizes
    (geometric aperture-7 reparenting can differ by one step, never
    drift)."""
    fine = hx.encode(np.array([lat]), np.array([lon]), res)
    par = hx.parent(fine, res - 1)
    direct = hx.encode(np.array([lat]), np.array([lon]), res - 1)
    la1, lo1 = hx.cell_center(par)
    la2, lo2 = hx.cell_center(direct)
    s, _, _ = hx._res_params(res - 1)
    # compare on the unit sphere via chord distance
    def xyz(la, lo):
        la, lo = np.radians(la), np.radians(lo)
        return np.stack(
            [np.cos(la) * np.cos(lo), np.cos(la) * np.sin(lo), np.sin(la)],
            axis=-1,
        )
    chord = np.linalg.norm(xyz(la1, lo1) - xyz(la2, lo2))
    assert chord < 4.0 * s


@given(st.integers(0, 255), st.integers(0, 255), st.integers(0, 255))
@settings(max_examples=60, deadline=None)
def test_calc_scalar_semantics(a, b, c):
    bands = {
        "A": np.array([[a]], dtype=np.int64),
        "B": np.array([[b]], dtype=np.int64),
        "C": np.array([[c]], dtype=np.int64),
    }
    expr = "where(A > B, A - B, B - A) + minimum(B, C) % 7"
    got = compile_calc(expr)(bands)[0, 0]
    assert got == abs(a - b) + min(b, c) % 7
