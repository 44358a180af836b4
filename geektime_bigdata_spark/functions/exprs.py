"""Native column expressions shared across operators."""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: str = "text") -> Column:
    """Whitespace tokenization (X1, InvertedMain.scala:15)."""
    return F.split(F.col(col), " ")


def shingles(toks: str = "toks", n: int = 3) -> Column:
    """Distinct word-``n``-gram shingles from a token-array column.

    Built as ``arrays_zip`` of the array against its own 1..n-1 offset
    slices, trimmed to the first ``size - (n-1)`` entries (r17, guide
    §1.2 step 2): zip/slice are plain native expressions, so the only
    lambda left is the per-shingle ``concat_ws`` — the earlier
    ``transform(sequence(...), i -> concat_ws(element_at x n))`` form
    also paid n interpreted ``element_at`` calls per position
    (measured 1.86 -> 1.15 CPU-s on the sf0.1 shingle explode).
    ``size < n`` yields an empty slice and hence ``array()``, exactly
    the old CASE arm. NULL-input note (ADVICE r17): a NULL token array
    yields NULL (the zip/slice chain propagates it), where the pre-r17
    CASE form yielded ``array()`` — benign for the explode-only
    consumers in this repo, but an API behavior change. ``n=1``
    short-circuits to ``array_distinct(toks)`` (the zip form would
    render a trailing-comma ``arrays_zip(toks, )`` SQL syntax error)."""
    if n == 1:
        return F.expr(f"array_distinct({toks})")
    slices = ", ".join(
        f"slice({toks}, {k + 1}, greatest(size({toks}) - {k}, 0))"
        for k in range(1, n)
    )
    fields = [toks] + [str(k) for k in range(1, n)]
    cw = ", ".join(f"s['{f}']" for f in fields)
    return F.expr(
        f"array_distinct(transform("
        f"slice(arrays_zip({toks}, {slices}), 1,"
        f" greatest(size({toks}) - {n - 1}, 0)),"
        f" s -> concat_ws(' ', {cw})))"
    )


def dot_product(a: str, b: str) -> Column:
    """Dot product of two array columns with per-term micro-quantization:
    each product is snapped to the 1e-6 grid (``floor(x*y*1e6 + 0.5)`` —
    identical IEEE double ops in every engine) and accumulated as a LONG,
    so the result is bit-identical regardless of summation order. A plain
    double fold is sequential in Spark but a DuckDB oracle's group sum
    has no order guarantee — on a hashed contract edge that is a latent
    flake (same class as round 1's ``sessionize`` fail). The ~1e-7
    per-term quantization is noise at ANN precision; 64 terms of
    unit-range values stay ~1e9 below the long envelope."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, "
        f"(x, y) -> CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)"
        f" * 1000000.0D + 0.5D) AS BIGINT)), "
        f"0L, (acc, v) -> acc + v) / 1000000.0D"
    )


def vec_norm(a: str) -> Column:
    """L2 norm of an array column over micro-quantized squared terms
    (same order-independence contract as :func:`dot_product`)."""
    return F.sqrt(
        F.expr(
            f"aggregate({a}, 0L, "
            f"(acc, x) -> acc + CAST(floor(CAST(x AS DOUBLE)"
            f" * CAST(x AS DOUBLE) * 1000000.0D + 0.5D) AS BIGINT))"
            f" / 1000000.0D"
        )
    )


def exact_sum(
    col: Column | str,
    scale: int = 6,
    wide: bool = False,
    guarded: bool = True,
) -> Column:
    """Order-independent group sum of a double expression for hashed
    contract edges.

    Plain ``sum(double)`` over a group accumulates in partition order —
    nondeterministic under shuffle — so ``round(sum(value), 6)`` can
    straddle a 0.5e-6 boundary and hash-mismatch a DuckDB oracle even
    when both engines are "right" (this was round 1's only driver FAIL,
    ``sessionize``).

    Fast path (default): quantize each addend to a LONG count of
    ``10^-scale`` units via ``floor(x * 10^scale + 0.5)`` — pure double
    arithmetic, identical IEEE ops in every engine — then sum integers
    (exact, associative, whole-stage-codegen primitive: benchmarked at
    plain-double-sum speed, vs ~6x slower for a DECIMAL accumulate).
    Mirror in the oracle with::

        CAST(sum(CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
            / 1000000.0

    Envelope: the group's |sum of micro-units| must stay below 2^63.
    Overflow always fails LOUDLY: under ANSI mode (Spark 4 default) the
    long sum itself raises ARITHMETIC_OVERFLOW the moment it wraps; for
    ``ansi=false`` deployments a parallel ``count * max(abs(micro))``
    guard (two cheap primitive aggregates) raises instead of silently
    wrapping when a group could exceed the envelope — at 2-decimal money values (~1e5) and scale 6 that
    triggers around 1e12 rows per group; ``wide=True`` switches to the
    overflow-proof DECIMAL(38, scale) accumulator (~6x slower) for
    beyond-long aggregations. ``guarded=False`` drops the guard pair —
    only for callers that prove the envelope themselves (e.g. a wide
    64-column centroid agg over unit-range values, where 64 extra
    count/max aggregates would dominate the plan)."""
    c = F.col(col) if isinstance(col, str) else col
    if wide:
        return F.sum(c.cast(f"decimal(38,{scale})")).cast("double")
    k = F.lit(float(10**scale))
    micro = F.floor(c * k + F.lit(0.5)).cast("long")
    if not guarded:
        return (F.sum(micro) / k).cast("double")
    # conservative in double space: count * max|micro| bounds |sum(micro)|.
    # coalesce: an empty/all-null global aggregate has count=0 and a NULL
    # max, making the product NULL — that must take the sum branch (which
    # is NULL, matching SQL semantics), not the raise branch.
    fits = F.coalesce(
        (
            F.count(c).cast("double") * F.max(F.abs(micro)).cast("double")
        )
        < F.lit(9.0e18),
        F.lit(True),
    )
    total = F.when(fits, F.sum(micro)).otherwise(
        F.raise_error(
            F.lit(
                "exact_sum: long micro-unit envelope exceeded for this "
                "group; use exact_sum(..., wide=True)"
            )
        ).cast("long")
    )
    return (total / k).cast("double")


def sum_micros(col: Column | str, scale: int = 6) -> Column:
    """Order-independent LONG micro-unit group sum — :func:`exact_sum`
    WITHOUT the final division back to double: emits the raw integer sum
    of ``floor(x * 10^scale + 0.5)`` units.

    This is the strongest form of the hashed-contract-edge rule: an
    integer column cannot knife-edge a cross-engine hash at all (round 2
    verdict: ``sessionize``'s ``round(micro_sum / 1e6, 6)`` DOUBLE
    surface hash-failed the driver two rounds running even though the
    micro sum itself is provably engine-identical — so the contract edge
    now ships the integer). Oracle mirror::

        sum(CAST(floor(x * 1000000.0 + 0.5) AS BIGINT))

    Same 2^63 envelope note as :func:`exact_sum`; under ANSI mode (the
    repo default) overflow raises rather than wrapping."""
    c = F.col(col) if isinstance(col, str) else col
    k = F.lit(float(10**scale))
    return F.sum(F.floor(c * k + F.lit(0.5)).cast("long"))


def grid_round(col: Column | str, scale: int = 6) -> Column:
    """Engine-portable rounding for hashed contract edges:
    ``floor(x * 10^scale + 0.5) / 10^scale`` — two IEEE double ops that
    every engine evaluates identically.

    ``round(x, n)`` is NOT portable at exact decimal ties: Spark rounds
    HALF_UP on BigDecimal.valueOf's shortest-repr decimal while DuckDB
    rounds the ``x * 10^n`` double — and integer-sum / small-count
    ratios (means of micro-unit sums, Jaccard c/(a+b-c), coverage
    fractions) produce exact ties ROUTINELY, not pathologically
    (observed: label centroid mean 642700/200/1e6 hashed differently at
    sf0.1). Ties are not representable in binary, so whichever side of
    the tie the double lands on, both engines see the same double and
    this expression floors it identically. Use for every hashed float
    that is not already an exact multiple of the grid."""
    c = F.col(col) if isinstance(col, str) else col
    k = F.lit(float(10**scale))
    return (F.floor(c * k + F.lit(0.5)) / k).cast("double")


def values_relation(spark, rows, schema: str):
    """Lift small driver-side numeric rows into a JVM VALUES
    LocalRelation (r17, guide §4.1): ``spark.createDataFrame`` on a
    Python list builds a 32-slice pickled RDD, and every broadcast
    exchange or sink pass over it materializes through 32 near-idle
    Python-worker tasks (~0.2 s each, measured on dedup_clusters'
    label join and the contamination suite row). A VALUES literal is
    driver-side SQL text — zero tasks, constant-folded.

    ``rows``: sequence of tuples of int/float (the gated driver-path
    results — bounded by the same thresholds that allowed collecting
    them). ``schema``: ``"name type, ..."`` with types long|bigint|
    double. Longs inline as ``{v}L``; doubles as ``repr(v)D`` —
    ``Double.parseDouble`` of the shortest round-trip repr is the
    identical IEEE value, so nothing moves off the value grid.

    Guards (ADVICE r17): empty ``rows`` would render malformed SQL
    (``... FROM VALUES ``) and a non-finite double would render an
    unparseable literal (``repr(nan) -> 'nanD'``) — both fall back to
    ``spark.createDataFrame`` (same schema, same rows), trading the
    pickled-RDD cost for correctness on the degenerate inputs no
    current call site produces but the public helper must survive."""
    import math

    rows = list(rows)
    fields = [f.strip().rsplit(" ", 1) for f in schema.split(",")]
    if not rows or any(
        isinstance(v, float) and not math.isfinite(v)
        for r in rows
        for v in r
    ):
        return spark.createDataFrame(rows, schema)

    def lit(v, t):
        t = t.lower()
        if t in ("long", "bigint"):
            return f"{int(v)}L"
        if t == "double":
            return f"{float(v)!r}D"
        raise ValueError(f"values_relation: unsupported type {t!r}")

    vals = ", ".join(
        "(" + ", ".join(lit(v, t) for v, (_, t) in zip(r, fields)) + ")"
        for r in rows
    )
    proj = ", ".join(
        f"col{i + 1} AS {n}" for i, (n, _) in enumerate(fields)
    )
    return spark.sql(f"SELECT {proj} FROM VALUES {vals}")


def lift_collected(spark, df):
    """``collect()`` a tiny result DataFrame and re-enter it as a VALUES
    LocalRelation — the scratch-lifetime materialization every
    roundtrip surface needs (the scratch dir is deleted in ``finally``,
    so the returned frame must not reference it), without the
    ``createDataFrame`` pickled-RDD cost (see :func:`values_relation`;
    the sink pass over the 32-slice RDD was a near-idle 32-Python-task
    stage per query). Supports long/double/string/boolean columns and
    NULLs; any other column type falls back to ``createDataFrame``
    unchanged. Doubles inline as round-trip ``repr`` (identical IEEE
    value); strings are backslash-escaped (the default Spark SQL
    string-literal escape mode)."""
    from pyspark.sql import types as T

    rows = df.collect()
    sql_types = []
    for f in df.schema.fields:
        if isinstance(f.dataType, T.LongType):
            sql_types.append("BIGINT")
        elif isinstance(f.dataType, T.DoubleType):
            sql_types.append("DOUBLE")
        elif isinstance(f.dataType, T.StringType):
            sql_types.append("STRING")
        elif isinstance(f.dataType, T.BooleanType):
            sql_types.append("BOOLEAN")
        else:
            return spark.createDataFrame(rows, df.schema)
    if not rows:
        return spark.createDataFrame(rows, df.schema)
    import math

    # non-finite doubles render unparseable literals (repr(nan) ->
    # 'nanD'); fall back to createDataFrame for those rows' frames
    # (ADVICE r17 — loud-but-avoidable failure made unreachable)
    if any(
        isinstance(v, float) and not math.isfinite(v)
        for r in rows
        for v in r
    ):
        return spark.createDataFrame(rows, df.schema)

    def lit(v, t):
        if v is None:
            return f"CAST(NULL AS {t})"
        if t == "BIGINT":
            return f"{int(v)}L"
        if t == "DOUBLE":
            return f"{float(v)!r}D"
        if t == "BOOLEAN":
            return "true" if v else "false"
        esc = str(v).replace("\\", "\\\\").replace("'", "\\'")
        return f"'{esc}'"

    vals = ", ".join(
        "(" + ", ".join(lit(v, t) for v, t in zip(r, sql_types)) + ")"
        for r in rows
    )
    proj = ", ".join(
        f"col{i + 1} AS `{f.name}`"
        for i, f in enumerate(df.schema.fields)
    )
    return spark.sql(f"SELECT {proj} FROM VALUES {vals}")


def hash_unit_weight(tag: str) -> float:
    """Deterministic pseudo-random weight in [-1, 1]: first 8 md5 hex chars
    of ``tag`` -> int, % 2001 -> [-1000, 1000] / 1000. Bit-identical to the
    SQL formula ``(('0x'||substr(md5(tag),1,8))::BIGINT % 2001 - 1000)/1000.0``
    used by the DuckDB oracles, so weights can be precomputed driver-side
    and inlined as literals (constant-folded, no per-row hashing)."""
    h = int(hashlib.md5(tag.encode()).hexdigest()[:8], 16)
    return (h % 2001 - 1000) / 1000.0
