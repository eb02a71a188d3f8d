"""Deterministic train/val/test split assignment.

The last stage of a training-data pipeline: every document gets a
stable, reshuffle-proof split from a salted hash of its key — the
same document always lands in the same split across reruns, cluster
resizes and repartitions (no RNG, no global state).

Leakage control: pass ``cluster_col`` (a near-dup cluster id, a
domain, a source document id) and the WHOLE cluster hashes as one
unit — near-duplicates can never straddle train and test, the
classic eval-contamination bug.

Scale shape: pure Column math (md5 + string ops), zero shuffle,
zero UDFs; runs fused into whatever scan precedes it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["split_hash_u60", "assign_splits"]

_U60 = float(1 << 60)


def split_hash_u60(key: Column, salt: str) -> Column:
    """First 15 hex digits of md5(salt:key) as a uniform integer in
    [0, 2^60) — bit-identical in any engine with standard md5."""
    h = F.md5(F.concat(F.lit(salt), F.lit(":"), key.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def assign_splits(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float] | None = None,
    salt: str = "split-v1",
    cluster_col: str | None = None,
) -> DataFrame:
    """Add a ``split`` column.  ``fractions`` maps split name ->
    fraction in declaration order (must sum to 1); the hash unit is
    ``cluster_col`` when given, else ``key_col``."""
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions sum to {total}, not 1")
    unit = F.col(cluster_col if cluster_col else key_col)
    u = split_hash_u60(unit, salt) / F.lit(_U60)
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
    expr = (F.lit(names[0]) if expr is None
            else expr.otherwise(F.lit(names[-1])))
    return df.withColumn("split", expr)
