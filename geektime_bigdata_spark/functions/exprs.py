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


def exact_sum(col: Column | str, scale: int = 6) -> Column:
    """Order-independent exact group sum of a double expression for hashed
    contract edges: cast each addend to ``DECIMAL(18, scale)`` (exact for
    the <= 2-decimal money/value columns in this dataset; products of
    2-decimal values land within ~1e-13 of the decimal grid, far from any
    rounding-mode tie), sum exactly, and emit double.

    Plain ``sum(double)`` over a group accumulates in partition order —
    nondeterministic under shuffle — so ``round(sum(value), 6)`` can
    straddle a 0.5e-6 boundary and hash-mismatch a DuckDB oracle even
    when both engines are "right" (this was round 1's only driver FAIL,
    ``sessionize``). Decimal addition is associative and commutative, so
    the result is bit-identical regardless of partitioning; mirror with
    ``CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE)`` in the oracle. At
    100 TB the decimal sum still runs partial+final hash aggregation
    inside whole-stage codegen (Spark keeps a specialized unscaled-long
    accumulator for precision <= 18 inputs), so the determinism costs no
    shuffle and negligible CPU."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def hash_unit_weight(tag: str) -> float:
    """Deterministic pseudo-random weight in [-1, 1]: first 8 md5 hex chars
    of ``tag`` -> int, % 2001 -> [-1000, 1000] / 1000. Bit-identical to the
    SQL formula ``(('0x'||substr(md5(tag),1,8))::BIGINT % 2001 - 1000)/1000.0``
    used by the DuckDB oracles, so weights can be precomputed driver-side
    and inlined as literals (constant-folded, no per-row hashing)."""
    h = int(hashlib.md5(tag.encode()).hexdigest()[:8], 16)
    return (h % 2001 - 1000) / 1000.0
