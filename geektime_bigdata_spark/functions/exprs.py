"""Native column expressions shared across operators."""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: str = "text") -> Column:
    """Whitespace tokenization (X1, InvertedMain.scala:15)."""
    return F.split(F.col(col), " ")


def shingles(toks: str = "toks", n: int = 3) -> Column:
    """Distinct word-``n``-gram shingles from a token-array column,
    1-based ``element_at`` to match 1-based SQL list indexing."""
    idx = ", ".join(f"element_at({toks}, i + {k})" for k in range(n))
    return F.expr(
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size({toks}) - {n - 1}), "
        f"i -> concat_ws(' ', {idx}))) "
        f"ELSE array() END"
    )


def dot_product(a: str, b: str) -> Column:
    """Double-precision dot product of two array columns — a codegen'd
    fold, accumulation order = element order (matches a sequential SQL
    sum over positions to ~1ulp)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, "
        f"(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def vec_norm(a: str) -> Column:
    """L2 norm of an array column in double precision."""
    return F.sqrt(
        F.expr(
            f"aggregate({a}, CAST(0 AS DOUBLE), "
            f"(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
        )
    )


def hash_unit_weight(tag: str) -> float:
    """Deterministic pseudo-random weight in [-1, 1]: first 8 md5 hex chars
    of ``tag`` -> int, % 2001 -> [-1000, 1000] / 1000. Bit-identical to the
    SQL formula ``(('0x'||substr(md5(tag),1,8))::BIGINT % 2001 - 1000)/1000.0``
    used by the DuckDB oracles, so weights can be precomputed driver-side
    and inlined as literals (constant-folded, no per-row hashing)."""
    h = int(hashlib.md5(tag.encode()).hexdigest()[:8], 16)
    return (h % 2001 - 1000) / 1000.0
