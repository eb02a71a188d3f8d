"""gdal_calc expression surface — compile a band-algebra expression
string to a vectorized numpy kernel and run it over decoded payloads.

The reference surface is the public gdal_calc utility
(/root/reference/swig/python/gdal-utils/osgeo_utils/gdal_calc.py):
band letters A..Z bind to input bands and `--calc` evaluates a numpy
expression per pixel block.  This module re-derives that contract
safely: the expression is parsed with `ast` and interpreted over a
WHITELIST of node types and numpy functions — never `eval`.

Supported grammar: band names (single letters or identifiers bound by
the caller), int/float literals, + - * / // % **, unary -/+,
comparisons (< <= > >= == !=, numpy-bool results that multiply/add
like 0/1 — gdal_calc's masking idiom), & | on masks, and calls to
where/minimum/maximum/abs/clip/sqrt/floor/ceil/exp/log/log10/
logical_and/logical_or/logical_not.

Float-parity note (CLAUDE.md rules): the oracled query restricts
itself to EXACT integer operators (// % * + - comparisons, where/
minimum/maximum/abs); sqrt/exp/log are provided for API completeness
and need caller-side quantization before any cross-engine compare.

Scale shape: compilation is driver-side and tiny; execution is the
standard per-payload Arrow kernel (one input row -> its own decoded
block), a narrow map with no shuffle.
"""

from __future__ import annotations

import ast
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.raster.checksum import gdal_checksum
from gdal_spark.raster.codecs import decode_image

_FUNCS = {
    "where": np.where,
    "minimum": np.minimum,
    "maximum": np.maximum,
    "abs": np.abs,
    "clip": np.clip,
    "sqrt": np.sqrt,
    "floor": np.floor,
    "ceil": np.ceil,
    "exp": np.exp,
    "log": np.log,
    "log10": np.log10,
    "logical_and": np.logical_and,
    "logical_or": np.logical_or,
    "logical_not": np.logical_not,
}

_BINOPS = {
    ast.Add: np.add,
    ast.Sub: np.subtract,
    ast.Mult: np.multiply,
    ast.Div: np.true_divide,
    ast.FloorDiv: np.floor_divide,
    ast.Mod: np.mod,
    ast.Pow: np.power,
    ast.BitAnd: np.bitwise_and,
    ast.BitOr: np.bitwise_or,
}

_CMPOPS = {
    ast.Lt: np.less,
    ast.LtE: np.less_equal,
    ast.Gt: np.greater,
    ast.GtE: np.greater_equal,
    ast.Eq: np.equal,
    ast.NotEq: np.not_equal,
}


def compile_calc(expr: str) -> Callable[[dict], np.ndarray]:
    """Parse + validate once; returns fn(bands: {name: ndarray})."""
    tree = ast.parse(expr, mode="eval")

    def check(node: ast.AST) -> None:
        if isinstance(node, ast.Expression):
            check(node.body)
        elif isinstance(node, ast.BinOp):
            if type(node.op) not in _BINOPS:
                raise ValueError(f"operator not allowed: {ast.dump(node.op)}")
            check(node.left)
            check(node.right)
        elif isinstance(node, ast.UnaryOp):
            if not isinstance(node.op, (ast.USub, ast.UAdd)):
                raise ValueError("only unary +/- allowed")
            check(node.operand)
        elif isinstance(node, ast.Compare):
            if len(node.ops) != 1 or type(node.ops[0]) not in _CMPOPS:
                raise ValueError("single simple comparison only")
            check(node.left)
            check(node.comparators[0])
        elif isinstance(node, ast.Call):
            if (not isinstance(node.func, ast.Name)
                    or node.func.id not in _FUNCS):
                raise ValueError(f"function not allowed: {ast.dump(node.func)}")
            if node.keywords:
                raise ValueError("keyword arguments not allowed")
            for a in node.args:
                check(a)
        elif isinstance(node, ast.Name):
            pass  # resolved against the band dict at run time
        elif isinstance(node, ast.Constant):
            if not isinstance(node.value, (int, float)):
                raise ValueError("only numeric literals allowed")
        else:
            raise ValueError(f"syntax not allowed: {type(node).__name__}")

    check(tree)

    def run(node: ast.AST, env: dict):
        if isinstance(node, ast.Expression):
            return run(node.body, env)
        if isinstance(node, ast.BinOp):
            return _BINOPS[type(node.op)](
                run(node.left, env), run(node.right, env)
            )
        if isinstance(node, ast.UnaryOp):
            v = run(node.operand, env)
            return -v if isinstance(node.op, ast.USub) else +v
        if isinstance(node, ast.Compare):
            return _CMPOPS[type(node.ops[0])](
                run(node.left, env), run(node.comparators[0], env)
            )
        if isinstance(node, ast.Call):
            return _FUNCS[node.func.id](*(run(a, env) for a in node.args))
        if isinstance(node, ast.Name):
            try:
                return env[node.id]
            except KeyError:
                raise NameError(f"unbound band name {node.id!r}") from None
        if isinstance(node, ast.Constant):
            return node.value
        raise AssertionError  # unreachable after check()

    return lambda bands: np.asarray(run(tree, bands))


CALC_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("expr_name", T.StringType()),
        T.StructField("checksum", T.IntegerType()),
        T.StructField("vsum", T.LongType()),
    ]
)


def image_calc(images: DataFrame, exprs: dict[str, str]) -> DataFrame:
    """Run each expression over every image's decoded bands
    (A/B/C = band 0/1/2 int64 planes, the gdal_calc letter binding)
    and emit the per-result GDAL checksum + value sum."""
    compiled = {name: compile_calc(e) for name, e in exprs.items()}

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for _, row in pdf.iterrows():
                arr = decode_image(
                    bytes(row["bytes"]), row["fmt"]
                ).astype(np.int64)
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                bands = {
                    "A": arr[:, :, 0],
                    "B": arr[:, :, min(1, arr.shape[2] - 1)],
                    "C": arr[:, :, min(2, arr.shape[2] - 1)],
                }
                for name, fn in compiled.items():
                    out = fn(bands).astype(np.int64)
                    recs.append(
                        {
                            "image_id": row["image_id"],
                            "expr_name": name,
                            "checksum": int(gdal_checksum(out)),
                            "vsum": int(out.sum(dtype=np.int64)),
                        }
                    )
            yield pd.DataFrame(recs, columns=[f.name for f in CALC_SCHEMA])

    return images.select("image_id", "fmt", "bytes").mapInPandas(
        kernel, CALC_SCHEMA
    )
