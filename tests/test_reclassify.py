"""Reclassify mapping grammar (raster/reclassify.py) vs the
reference's Reclassifier semantics (frmts/vrt/vrtreclassifier.cpp)."""

import numpy as np
import pytest

from gdal_spark.raster.reclassify import parse_mapping


def test_interval_forms_and_defaults():
    rc = parse_mapping("NO_DATA=0;[0,63]=1;(63,127]=2;DEFAULT=9", nodata=200)
    v = np.array([0.0, 63.0, 63.5, 127.0, 128.0, 200.0, 255.0])
    np.testing.assert_array_equal(
        rc.apply(v), [1, 1, 2, 2, 9, 0, 9]
    )


def test_open_bounds_are_nextafter():
    rc = parse_mapping("(1,2)=5;DEFAULT=0")
    eps_in = np.nextafter(1.0, 2.0)
    eps_hi = np.nextafter(2.0, 1.0)
    np.testing.assert_array_equal(
        rc.apply(np.array([1.0, eps_in, 1.5, eps_hi, 2.0])),
        [0, 5, 5, 5, 0],
    )


def test_pass_through_and_inf():
    rc = parse_mapping("[-inf,0)=0;[0,99]=PASS_THROUGH;[100,inf]=255")
    v = np.array([-1e12, -0.5, 0.0, 42.0, 99.0, 100.0, 1e12])
    np.testing.assert_array_equal(
        rc.apply(v), [0, 0, 0, 42, 99, 255, 255]
    )


def test_constant_source_and_nodata_dest():
    rc = parse_mapping("7=NO_DATA;DEFAULT=PASS_THROUGH", nodata=-9999)
    np.testing.assert_array_equal(
        rc.apply(np.array([6.0, 7.0, 8.0])), [6, -9999, 8]
    )


def test_nan_mapping():
    rc = parse_mapping("NAN=0;DEFAULT=1")
    np.testing.assert_array_equal(
        rc.apply(np.array([np.nan, 5.0])), [0, 1]
    )


def test_errors():
    with pytest.raises(ValueError, match="overlaps"):
        parse_mapping("[0,10]=1;[5,20]=2")
    with pytest.raises(ValueError, match="nodata is not set"):
        parse_mapping("NO_DATA=0")
    with pytest.raises(ValueError, match="lower bound"):
        parse_mapping("[5,1]=0")
    with pytest.raises(ValueError, match="no specified mapping"):
        parse_mapping("[0,10]=1").apply(np.array([11.0]))
    with pytest.raises(ValueError, match="cannot parse"):
        parse_mapping("[0,10]=xyz")
