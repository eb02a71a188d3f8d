"""GDALMDArray view semantics vs numpy ground truth.

Every view operation is checked against the literal numpy expression
it reimplements (GetView doc examples, gdalmultidim.cpp:5677)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.operators import multidim as mdim


T, Y, X = 4, 5, 6


def _np_cube():
    t, y, x = np.meshgrid(
        np.arange(T), np.arange(Y), np.arange(X), indexing="ij"
    )
    return (7 * t + 13 * y + 29 * x + 3) % 251


def _md(spark, nodata=None):
    arr = _np_cube()
    rows = [
        (int(t), int(y), int(x), int(arr[t, y, x]))
        for t in range(T)
        for y in range(Y)
        for x in range(X)
    ]
    df = spark.createDataFrame(rows, "t long, y long, x long, value int")
    return mdim.MDArray(
        df=df, dims=(("t", T), ("y", Y), ("x", X)), nodata=nodata
    )


def _collect_dense(md):
    """Materialize an MDArray back into a dense numpy array."""
    shape = md.shape
    out = np.full(shape, -999, dtype=np.float64)
    cols = md.index_cols() + [md.value_col]
    for row in md.df.select(*cols).collect():
        idx = tuple(int(row[c]) for c in md.index_cols())
        v = row[md.value_col]
        out[idx] = np.nan if v is None else float(v)
    assert not (out == -999).any(), "sparse result: missing cells"
    return out


# -- parser ----------------------------------------------------------------

def test_parse_tokens():
    assert mdim.parse_view_expr("[1,2]") == [1, 2]
    assert mdim.parse_view_expr("[1][2]") == [1, 2]
    assert mdim.parse_view_expr("[:,2:3:]") == [(None, None, None), (2, 3, None)]
    assert mdim.parse_view_expr("[::-1]") == [(None, None, -1)]
    assert mdim.parse_view_expr("[newaxis,...]") == ["newaxis", "..."]


def test_parse_rejects():
    with pytest.raises(ValueError):
        mdim.parse_view_expr("1:2")
    with pytest.raises(ValueError):
        mdim.parse_view_expr("[1:2:3:4]")


# -- GetView: the doc examples from gdalmultidim.cpp:5699-5730 -------------

@pytest.mark.parametrize(
    "expr,np_idx",
    [
        ("[1]", np.s_[1]),
        ("[1,2]", np.s_[1, 2]),
        ("[:,2]", np.s_[:, 2]),
        ("[:,2:3:]", np.s_[:, 2:3]),
        ("[...,2]", np.s_[..., 2]),
        ("[:,::2]", np.s_[:, ::2]),
        ("[:,1::2]", np.s_[:, 1::2]),
        ("[:,1:3:]", np.s_[:, 1:3]),
        ("[::-1,:]", np.s_[::-1, :]),
        ("[1:, ::-1, 2:9:3]", np.s_[1:, ::-1, 2:9:3]),
        ("[-1]", np.s_[-1]),
        ("[:, -2::-2, :]", np.s_[:, -2::-2, :]),
        ("[2:0:-1]", np.s_[2:0:-1]),
    ],
)
def test_get_view_matches_numpy(spark, expr, np_idx):
    ref = _np_cube()[np_idx]
    got = _collect_dense(mdim.get_view(_md(spark), expr))
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


def test_get_view_newaxis(spark):
    ref = _np_cube()[np.newaxis, :, :, :]
    got = _collect_dense(mdim.get_view(_md(spark), "[newaxis,...]"))
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


def test_get_view_chained_equals_combined(spark):
    a = mdim.get_view(mdim.get_view(_md(spark), "[1]"), "[2]")
    b = mdim.get_view(_md(spark), "[1,2]")
    np.testing.assert_array_equal(_collect_dense(a), _collect_dense(b))


def test_get_view_zero_size_rejected(spark):
    # GDAL difference from numpy: zero-size dims are an error.
    with pytest.raises(ValueError):
        mdim.get_view(_md(spark), "[1:1]")


def test_get_view_out_of_range(spark):
    with pytest.raises(ValueError):
        mdim.get_view(_md(spark), "[99]")


# -- Transpose -------------------------------------------------------------

@pytest.mark.parametrize("axis_map", [[2, 0, 1], [1, 0, 2], [0, 1, 2]])
def test_transpose_matches_numpy(spark, axis_map):
    ref = np.transpose(_np_cube(), axis_map)
    got = _collect_dense(mdim.transpose(_md(spark), axis_map))
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


def test_transpose_newaxis(spark):
    out = mdim.transpose(_md(spark), [-1, 2, 0, 1])
    assert out.shape == (1, X, T, Y)
    ref = np.transpose(_np_cube(), [2, 0, 1])[np.newaxis]
    np.testing.assert_array_equal(_collect_dense(out), ref)


def test_transpose_validation(spark):
    md = _md(spark)
    with pytest.raises(ValueError):
        mdim.transpose(md, [0, 1])  # missing axis
    with pytest.raises(ValueError):
        mdim.transpose(md, [0, 1, 1])  # repeated
    with pytest.raises(ValueError):
        mdim.transpose(md, [0, 1, 3])  # out of range


# -- Unscaled / mask -------------------------------------------------------

def test_unscaled_and_mask(spark):
    md = _md(spark, nodata=17.0)
    arr = _np_cube().astype(np.float64)
    ref = np.where(arr == 17.0, np.nan, arr * 0.5 + 10.0)
    got = _collect_dense(mdim.get_unscaled(md, scale=0.5, offset=10.0))
    np.testing.assert_array_equal(np.isnan(got), np.isnan(ref))
    np.testing.assert_array_equal(got[~np.isnan(ref)], ref[~np.isnan(ref)])
    mask = _collect_dense(mdim.get_mask(md))
    np.testing.assert_array_equal(mask, (arr != 17.0).astype(float))


# -- Decimated resample ----------------------------------------------------

@pytest.mark.parametrize("alg", ["average", "min", "max", "sum", "nearest"])
def test_resample_decimate(spark, alg):
    fy, fx = 2, 3
    arr = _np_cube().astype(np.float64)
    oy, ox = (Y + fy - 1) // fy, (X + fx - 1) // fx
    ref = np.zeros((T, oy, ox))
    for by in range(oy):
        for bx in range(ox):
            blk = arr[:, by * fy : (by + 1) * fy, bx * fx : (bx + 1) * fx]
            if alg == "average":
                ref[:, by, bx] = blk.mean(axis=(1, 2))
            elif alg == "min":
                ref[:, by, bx] = blk.min(axis=(1, 2))
            elif alg == "max":
                ref[:, by, bx] = blk.max(axis=(1, 2))
            elif alg == "sum":
                ref[:, by, bx] = blk.sum(axis=(1, 2))
            else:  # nearest: block top-left sample
                ref[:, by, bx] = arr[:, by * fy, bx * fx]
    out = mdim.resample_decimate(_md(spark), fy, fx, alg=alg)
    assert out.shape == (T, oy, ox)
    np.testing.assert_allclose(_collect_dense(out), ref, rtol=1e-12)


# -- Statistics ------------------------------------------------------------

def test_statistics_excludes_nodata(spark):
    md = _md(spark, nodata=17.0)
    arr = _np_cube()
    valid = arr[arr != 17]
    row = mdim.statistics(md).collect()[0]
    assert row["vmin"] == valid.min()
    assert row["vmax"] == valid.max()
    assert row["vsum"] == valid.sum()
    assert row["n"] == valid.size


def test_statistics_grouped(spark):
    md = _md(spark, nodata=17.0)
    arr = _np_cube()
    rows = {r["t"]: r for r in mdim.statistics(md, by=["t"]).collect()}
    for t in range(T):
        valid = arr[t][arr[t] != 17]
        assert rows[t]["vsum"] == valid.sum()
        assert rows[t]["n"] == valid.size
