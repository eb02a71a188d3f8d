"""Deterministic text hashing shared by dedup/fingerprint operators.

The polynomial character hash (h = fold(chars, acc*31 + ascii) mod
2^31-1) is chosen over murmur/xxhash because it is expressible in
BOTH Spark SQL and DuckDB list algebra — every dedup operator gets an
independent SQL oracle. Widths are bounded so all intermediates fit
int64: acc < 2^31, acc*31 + 255 < 2^36; minhash a*h + b < 2^62.
"""

from __future__ import annotations

MOD = 2147483647  # 2^31 - 1

N_PERM = 16          # minhash permutations
BANDS = 8            # LSH bands (2 rows each)
ROWS_PER_BAND = N_PERM // BANDS

SIMHASH_BITS = 16        # legacy 16-bit simhash (simhash() / sql_simhash)
SIMHASH64_BITS = 64      # scale simhash: 4 bands x 16 bits
SIMHASH64_BANDS = 4
SIMHASH64_BAND_BITS = SIMHASH64_BITS // SIMHASH64_BANDS


def perm_constants(n: int = N_PERM) -> list[tuple[int, int]]:
    """(a, b) pairs for hash permutations h' = (a*h + b) mod M;
    a odd, deterministic (documented so oracles can inline them).
    Used for minhash (n=N_PERM) and the 64 simhash bit streams."""
    out = []
    for j in range(n):
        a = 2 * ((j * 2654435761 + 101) % (MOD // 2)) + 1
        b = (j * 40503 + 7919) % MOD
        out.append((a, b))
    return out


# --- expression text builders (Spark SQL dialect) ---------------------------

def spark_token_hashes(toks: str) -> str:
    """Array of per-token polynomial hashes from an array<string>."""
    return (
        f"transform({toks}, t -> aggregate("
        f"transform(split(t, ''), c -> cast(ascii(c) as bigint)), "
        f"cast(0 as bigint), (acc, x) -> (acc * 31 + x) % {MOD}))"
    )


def spark_shingle_hashes(hashes: str, n: int) -> str:
    """Array of word n-gram (shingle) hashes folded from ORDERED
    per-token hashes: sh_i = fold(h[i..i+n-1], acc*1000003 + h mod M).
    Docs shorter than n tokens yield an empty array (never a
    descending `sequence`)."""
    fold = f"{hashes}[i]"
    for k in range(1, n):
        fold = f"(({fold}) * 1000003 + {hashes}[i + {k}]) % {MOD}"
    return (
        f"CASE WHEN size({hashes}) >= {n} THEN "
        f"transform(sequence(0, size({hashes}) - {n}), i -> {fold}) "
        f"ELSE cast(array() as array<bigint>) END"
    )


def spark_minhash(hashes: str, j: int) -> str:
    a, b = perm_constants()[j]
    return f"array_min(transform({hashes}, h -> ({a} * h + {b}) % {MOD}))"


def spark_fingerprint(hashes: str) -> str:
    """Order-sensitive document fingerprint: fold of token hashes."""
    return (
        f"aggregate({hashes}, cast(0 as bigint), "
        f"(acc, x) -> (acc * 1000003 + x) % {MOD})"
    )


# --- DuckDB twins -----------------------------------------------------------

def duck_token_hashes(toks: str) -> str:
    return (
        f"list_transform({toks}, t -> list_reduce("
        f"list_prepend(cast(0 as bigint), "
        f"list_transform(string_split(t, ''), c -> cast(ascii(c) as bigint))), "
        f"(acc, x) -> (acc * 31 + x) % {MOD}))"
    )


def duck_shingle_hashes(hashes: str, n: int) -> str:
    """DuckDB twin of spark_shingle_hashes (1-based list indexing;
    generate_series(1, 0) is the empty list)."""
    fold = f"{hashes}[i]"
    for k in range(1, n):
        fold = f"(({fold}) * 1000003 + {hashes}[i + {k}]) % {MOD}"
    return (
        f"list_transform(generate_series(1, len({hashes}) - {n - 1}), "
        f"i -> {fold})"
    )


def duck_minhash(hashes: str, j: int) -> str:
    a, b = perm_constants()[j]
    return f"list_min(list_transform({hashes}, h -> ({a} * h + {b}) % {MOD}))"


def duck_fingerprint(hashes: str) -> str:
    return (
        f"list_reduce(list_prepend(cast(0 as bigint), {hashes}), "
        f"(acc, x) -> (acc * 1000003 + x) % {MOD})"
    )
