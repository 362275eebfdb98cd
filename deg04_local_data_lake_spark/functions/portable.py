"""Cross-engine-deterministic expression builders.

Floating-point aggregation is order-dependent, and Spark's shuffle order is
nondeterministic — so ``SUM(double)`` is not reproducible even across two
Spark runs, let alone against a DuckDB oracle. Every aggregate this engine
exposes therefore routes through *exact decimal arithmetic*:

    sum:    SUM(CAST(x AS DECIMAL(18,4)))            -- exact, order-free
    avg:    CAST(sum_dec AS DOUBLE) / COUNT(*)       -- one IEEE division
    stddev: sqrt((s2 - s1*s1/n) / (n-1))             -- from exact s1, s2

The same construction is used in the DuckDB oracle SQL, making results
bitwise identical. This also fixes the reference's own reproducibility bug:
its silver aggregates use ``first``/``last`` with no ordering
(financial_dl_etl.py:56-57), which Spark documents as nondeterministic — we
use ``min_by``/``max_by`` keyed on a unique ordering column instead.

At scale these decimal aggregates still run as partial+final hash aggregates
with map-side combine (decimal sums are associative), so the plan shape is
identical to a double sum — no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,4)"


def dec(c: Column | str, typ: str = DEC) -> Column:
    """Deterministically quantize a double column to exact decimal."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(typ)


def exact_sum(c: Column | str, typ: str = DEC) -> Column:
    """Order-insensitive, cross-engine-exact sum of a double column."""
    return F.sum(dec(c, typ)).cast("double")


def exact_avg(c: Column | str, typ: str = DEC) -> Column:
    """Exact-sum / count. DuckDB twin:
    ``CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)``."""
    return F.sum(dec(c, typ)).cast("double") / F.count(F.lit(1))


def exact_std(c: Column | str, q_scale: int = 4) -> Column:
    """Sample stddev, bitwise-reproducible across engines; NULL for n<2.

    The naive ``sqrt((s2 - s1²/n)/(n-1))`` over doubles is poisoned by
    catastrophic cancellation: a single-ulp difference in the decimal→double
    conversion of ``s2`` (DuckDB converts int128/10^scale with two
    roundings) blows up through the subtraction. Instead we quantize x to an
    integer ``q = round(x·10^q_scale)`` and compute the variance numerator
    ``n·Σq² − (Σq)²`` entirely in exact decimal integer arithmetic; only
    that one exact integer is converted to double (a single correctly
    rounded conversion in both engines), then::

        stddev = sqrt(num / (n·(n−1))) / 10^q_scale

    Width budget (documented limits): |q| < 10^19, Σq² < 10^28 — e.g.
    10^6-row groups of values up to ~10^7, or 10^4-row groups up to ~10^8
    (at q_scale=4). The count×powersum multiply pins the widths: DuckDB
    requires operand widths to sum ≤ 38, so COUNT gets (10,0) and Σq² gets
    (28,0) — rebalance, don't just widen, if a larger budget is needed.

    DuckDB twin: :func:`exact_std_sql`.
    """
    scale_f = float(10**q_scale)
    qd = (dec(c, f"decimal(18,{q_scale})") * (10**q_scale)).cast("decimal(19,0)")
    n = F.count(F.lit(1))
    s1 = F.sum(qd).cast("decimal(19,0)")
    s2 = F.sum(qd * qd).cast("decimal(28,0)")
    num = n.cast("decimal(10,0)") * s2 - s1 * s1
    return F.when(
        n > 1, F.sqrt(num.cast("double") / (n * (n - 1))) / scale_f
    ).otherwise(F.lit(None))


def exact_std_sql(expr: str, q_scale: int = 4) -> str:
    """DuckDB-side twin of :func:`exact_std` (string-template form)."""
    p = 10**q_scale
    qd = f"CAST(CAST({expr} AS DECIMAL(18,{q_scale})) * {p} AS DECIMAL(19,0))"
    # NB: the numerator exceeds 2^53, and DuckDB's direct int128→double cast
    # rounds twice (upper·2^64 + lower); routing through VARCHAR gets the
    # correctly rounded strtod conversion, matching Java's BigInteger path.
    return (
        "CASE WHEN COUNT(*) > 1 THEN sqrt(CAST(CAST("
        f"CAST(COUNT(*) AS DECIMAL(10,0)) * CAST(SUM({qd} * {qd}) AS DECIMAL(28,0))"
        f" - CAST(SUM({qd}) AS DECIMAL(19,0)) * CAST(SUM({qd}) AS DECIMAL(19,0))"
        f" AS VARCHAR) AS DOUBLE) / (COUNT(*) * (COUNT(*) - 1))) / {p}.0 ELSE NULL END"
    )


def md5_long(c: Column | str, salt: str | None = None) -> Column:
    """Portable 60-bit hash: first 15 hex chars of md5 as a bigint.

    Used by MinHash/SimHash so signatures are identical in Spark and the
    DuckDB oracle. DuckDB twin: ``('0x' || substr(md5(x), 1, 15))::BIGINT``.
    """
    col = F.col(c) if isinstance(c, str) else c
    if salt is not None:
        col = F.concat(F.lit(salt), F.lit(":"), col)
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str, salt: str | None = None) -> str:
    """DuckDB-side twin of :func:`md5_long` (string-template form)."""
    inner = f"'{salt}:' || {expr}" if salt is not None else expr
    return f"('0x' || substr(md5({inner}), 1, 15))::BIGINT"


def exact_corr(
    x: Column | str, y: Column | str, q_scale: int = 4
) -> Column:
    """Pearson correlation, bitwise-reproducible across engines; NULL for
    n<2 or a zero-variance side.

    Same construction as :func:`exact_std`, extended to cross-moments:
    quantize both inputs to integers, accumulate Σqx, Σqy, Σqx², Σqy²,
    Σqx·qy in exact decimal, form the three cancellation-free numerators

        num_xy = n·Σqxqy − Σqx·Σqy
        num_x  = n·Σqx²  − (Σqx)²
        num_y  = n·Σqy²  − (Σqy)²

    exactly, and convert each ONCE to double for the final
    ``num_xy / sqrt(num_x · num_y)`` (the 10^q_scale factors cancel).
    Width budget matches exact_std: |q| < 10^19, Σq² and Σqxqy < 10^28 —
    at q_scale=4 that is ~10^9 rows of values up to ~10^5 per group.
    DuckDB twin: :func:`exact_corr_sql`.
    """

    def q(c: Column | str) -> Column:
        return (dec(c, f"decimal(18,{q_scale})") * (10**q_scale)).cast(
            "decimal(19,0)"
        )

    qx, qy = q(x), q(y)
    n = F.count(F.lit(1))
    nd = n.cast("decimal(10,0)")
    sx = F.sum(qx).cast("decimal(19,0)")
    sy = F.sum(qy).cast("decimal(19,0)")
    sxx = F.sum(qx * qx).cast("decimal(28,0)")
    syy = F.sum(qy * qy).cast("decimal(28,0)")
    sxy = F.sum(qx * qy).cast("decimal(28,0)")
    num_xy = (nd * sxy - sx * sy).cast("double")
    num_x = (nd * sxx - sx * sx).cast("double")
    num_y = (nd * syy - sy * sy).cast("double")
    return F.when(
        (n > 1) & (num_x > 0) & (num_y > 0),
        num_xy / F.sqrt(num_x * num_y),
    ).otherwise(F.lit(None))


def exact_corr_sql(ex: str, ey: str, q_scale: int = 4) -> str:
    """DuckDB-side twin of :func:`exact_corr` (string-template form)."""
    p = 10**q_scale

    def q(e: str) -> str:
        return f"CAST(CAST({e} AS DECIMAL(18,{q_scale})) * {p} AS DECIMAL(19,0))"

    qx, qy = q(ex), q(ey)
    nd = "CAST(COUNT(*) AS DECIMAL(10,0))"
    sx = f"CAST(SUM({qx}) AS DECIMAL(19,0))"
    sy = f"CAST(SUM({qy}) AS DECIMAL(19,0))"
    sxx = f"CAST(SUM({qx} * {qx}) AS DECIMAL(28,0))"
    syy = f"CAST(SUM({qy} * {qy}) AS DECIMAL(28,0))"
    sxy = f"CAST(SUM({qx} * {qy}) AS DECIMAL(28,0))"
    # int128 → VARCHAR → double: single correctly-rounded conversion
    # (see exact_std_sql)
    num_xy = f"CAST(CAST({nd} * {sxy} - {sx} * {sy} AS VARCHAR) AS DOUBLE)"
    num_x = f"CAST(CAST({nd} * {sxx} - {sx} * {sx} AS VARCHAR) AS DOUBLE)"
    num_y = f"CAST(CAST({nd} * {syy} - {sy} * {sy} AS VARCHAR) AS DOUBLE)"
    return (
        f"CASE WHEN COUNT(*) > 1 AND {num_x} > 0 AND {num_y} > 0 "
        f"THEN {num_xy} / sqrt({num_x} * {num_y}) ELSE NULL END"
    )
