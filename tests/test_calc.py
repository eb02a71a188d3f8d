"""gdal_calc expression compiler (operators/calc.py)."""

import numpy as np
import pytest

from gdal_spark.operators.calc import compile_calc


def _bands():
    rng = np.random.default_rng(2)
    return {
        "A": rng.integers(0, 256, (8, 9)).astype(np.int64),
        "B": rng.integers(0, 256, (8, 9)).astype(np.int64),
        "C": rng.integers(0, 256, (8, 9)).astype(np.int64),
    }


def test_matches_direct_numpy():
    b = _bands()
    cases = {
        "where(A > B, A - B, B - A)": np.abs(b["A"] - b["B"]),
        "(A * 3 + B * 2 + C) // 6": (b["A"] * 3 + b["B"] * 2 + b["C"]) // 6,
        "(A > 100) * 255 + (A <= 100) * (C % 50)":
            (b["A"] > 100) * 255 + (b["A"] <= 100) * (b["C"] % 50),
        "minimum(A, maximum(B, C))": np.minimum(b["A"], np.maximum(b["B"], b["C"])),
        "-A + 2 ** 3": -b["A"] + 8,
        "clip(A - B, 0, 64)": np.clip(b["A"] - b["B"], 0, 64),
    }
    for expr, want in cases.items():
        got = compile_calc(expr)(b)
        np.testing.assert_array_equal(got, want, err_msg=expr)


def test_float_funcs():
    b = _bands()
    got = compile_calc("sqrt(A * B)")(b)
    np.testing.assert_allclose(got, np.sqrt(b["A"] * b["B"]))


@pytest.mark.parametrize(
    "bad",
    [
        "__import__('os').system('true')",
        "A.sum()",                 # attribute access
        "(lambda: 1)()",           # lambda
        "open('/etc/passwd')",     # non-whitelisted call
        "[1, 2][0]",               # subscription
        "A if B else C",           # conditional expr (use where())
        "'x' + 'y'",               # non-numeric literal
        "A < B < C",               # chained comparison
        "where(A, B, C, key=1)",   # keyword args
    ],
)
def test_rejects_unsafe_syntax(bad):
    with pytest.raises(ValueError):
        compile_calc(bad)


def test_unbound_band_name():
    fn = compile_calc("A + Z")
    with pytest.raises(NameError, match="Z"):
        fn({"A": np.zeros((2, 2))})
