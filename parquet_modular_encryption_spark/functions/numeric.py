"""Cross-engine-deterministic numeric helpers.

Floating-point SUM/AVG are order-dependent: a distributed Spark sum and a
DuckDB sum over the same doubles differ in low-order bits, which breaks the
driver's value-hash comparison. The fix used throughout this engine:

1. Evaluate the per-row double expression (IEEE ops on identical inputs are
   bit-identical across engines).
2. Cast each value to DECIMAL(38,10). All source data here carries ≤6 true
   decimal digits (2-decimal money × 2-decimal rates), so the scale-10 cast
   performs NO rounding — it is exact in both engines. (A lower scale would
   round, and Spark's HALF_UP disagrees with DuckDB on exact `..xx50` ties,
   which 6-decimal products hit at the ~1% level.)
   MAGNITUDE BOUND: the per-row |value| must stay under ~9e5 — DuckDB's
   double→decimal cast scales by 10^10 in double arithmetic, so beyond
   2^53/10^10 it loses ulps and disagrees with Spark's exact-expansion
   rounding (measured: 667/4599 rows off by 1-2e-10 for ~5e6 values).
   Scale larger expressions into range first and unscale after the sum
   (see q37_derived_stats).
3. SUM in decimal — exact, order-independent. The result is then FLOORed
   at scale 4 and returned as DOUBLE: the floored integer is < 2^53 for
   |sum| < ~9e11 so the →double cast is exact in both engines, and the
   driver's typed value-hash sees a plain DOUBLE on both sides. (Returning
   DECIMAL directly is value-exact but hash-incompatible: Spark
   DecimalType vs DuckDB DECIMAL/HUGEINT cells hash differently — the
   round-1 driver failure mode. And DuckDB's decimal→double cast is not
   correctly rounded once the unscaled value exceeds 2^53, so a full
   scale-10 →double cast of big sums is unsafe; flooring to scale 4
   first is.)
4. For averages, the exact sum is first cast to DECIMAL(38,4) — at scale 4
   the unscaled value stays below 2^53 for magnitudes up to ~9e11, making
   the →double cast exact in both engines — then divided by the count in
   double.

At scale this costs nothing material: decimal sums are still map-side
partial aggregates inside whole-stage codegen; the per-row cast is a cheap
JVM op, and the shuffle carries one 16-byte decimal per group instead of an
8-byte double.

``dsum``/``davg`` are the Spark side; ``sql_dsum``/``sql_davg`` emit the
matching DuckDB/ANSI fragment for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,10)"
DEC_OUT = "decimal(38,4)"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dsum(c: Column | str) -> Column:
    """Order-independent, cross-engine-exact SUM of a double expr, as DOUBLE.

    Round-1 lesson: returning DECIMAL(38,10) is value-exact in both engines
    but the driver hashes *typed* values, and a Spark DecimalType vs DuckDB
    DECIMAL/HUGEINT cell never hashes equal to a DOUBLE. So the exact decimal
    sum is floored at scale 4 (floor is tie-free — no HALF_UP/HALF_EVEN
    divergence) and returned as DOUBLE: the floored integer stays < 2^53 for
    |sum| < ~9e11, making the →double cast exact in both engines.
    """
    return dsum_floor(c, 10_000)


def davg(c: Column | str) -> Column:
    """Deterministic AVG as DOUBLE.

    The exact decimal sum is scaled by 10^4 and FLOORed — floor is tie-free,
    unlike a rounding cast, where Spark's HALF_UP and DuckDB's HALF_EVEN
    disagree on exact `..50` boundaries — giving an integer < 2^53 whose
    →double cast is exact in both engines; the remaining divisions are IEEE
    ops on identical doubles.
    """
    col = _col(c)
    floored = F.floor(F.sum(col.cast(DEC)) * 10000).cast("bigint")
    return floored.cast("double") / F.lit(10000.0) / F.count(col)


def sql_dsum(expr: str) -> str:
    """DuckDB twin of :func:`dsum` — floored exact decimal sum as DOUBLE."""
    return sql_dsum_floor(expr, 10_000)


def sql_davg(expr: str) -> str:
    return (
        f"(CAST(CAST(floor(SUM(CAST(({expr}) AS DECIMAL(38,10))) * 10000) AS BIGINT)"
        f" AS DOUBLE) / 10000.0 / COUNT({expr}))"
    )


def dsum_floor(c: Column | str, shift: int = 10_000) -> Column:
    """Exact decimal sum floored at 1/shift, returned as DOUBLE.

    Building block for derived statistics (variance, correlation): the
    floored integer is < 2^53 for |sum| < 2^53/shift, so the →double cast
    is exact in both engines and downstream IEEE arithmetic on it is
    bit-identical. Use a smaller shift for large-magnitude sums (e.g.
    Σx·y of money products)."""
    return F.floor(F.sum(_col(c).cast(DEC)) * shift).cast("bigint").cast("double") / F.lit(
        float(shift)
    )


def sql_dsum_floor(expr: str, shift: int = 10_000) -> str:
    return (
        f"(CAST(CAST(floor(SUM(CAST(({expr}) AS DECIMAL(38,10))) * {shift}) AS BIGINT)"
        f" AS DOUBLE) / {float(shift)})"
    )


def dsum_partial(c: Column | str) -> Column:
    """Exact DECIMAL(38,10) partial sum for multi-phase aggregation.

    Multi-phase (e.g. salted) aggregations must NOT floor per-partial —
    flooring each partial then summing doubles diverges from flooring the
    grand total once. Keep partials in exact decimal and apply
    :func:`dsum_finalize` on the re-aggregation."""
    return F.sum(_col(c).cast(DEC))


def dsum_finalize(c: Column | str, shift: int = 10_000) -> Column:
    """Re-aggregate decimal partials and finalize as driver-hashable DOUBLE
    (single floor over the exact grand total — matches ``sql_dsum``)."""
    return F.floor(F.sum(_col(c)) * shift).cast("bigint").cast("double") / F.lit(float(shift))


def dsum_window(c: Column | str, window) -> Column:
    """Deterministic windowed SUM as DOUBLE (e.g. running totals).

    DuckDB evaluates windowed aggregates with a segment tree (different
    addition order than Spark's incremental frame evaluation), so the same
    decimal trick applies inside the frame. Scale 4 keeps the →double cast
    exact for money magnitudes (unscaled value < 2^53); inputs with ≤4
    true decimals (prices, quantities) lose nothing to the cast.
    """
    return F.sum(_col(c).cast(DEC_OUT)).over(window).cast("double")
