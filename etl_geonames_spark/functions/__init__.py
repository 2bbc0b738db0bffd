"""Shared expression helpers.

``qround`` — comparison-safe rounding for derived doubles.

Spark's ROUND(double, d) routes through BigDecimal.valueOf (the
double's *shortest decimal representation*), while DuckDB rounds the
raw binary value; on half-boundaries (x.xxxxx5) the two legitimately
disagree by one ulp of the target precision. ``FLOOR(x*10^d + 0.5)``
is pure IEEE double arithmetic — bit-identical across engines given
bit-identical inputs — so differential comparisons never flip.

Use plain ROUND only for *grid-aligned* values (sums/products of
fixed-point inputs rounded at their own grid precision), where the
true value can never sit on a boundary; use ``qround`` for ratios,
averages, scores and similarities.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def qround(col: Column, digits: int = 6) -> Column:
    """Engine-portable round-half-up: FLOOR(x*10^d + 0.5)/10^d."""
    s = float(10**digits)
    return F.floor(col * F.lit(s) + F.lit(0.5)) / F.lit(s)


def sql_qround(expr: str, digits: int = 6) -> str:
    """The DuckDB-side mirror of :func:`qround` (same op order)."""
    s = float(10**digits)
    return f"FLOOR(({expr}) * {s} + 0.5) / {s}"


def spread(df, *cols):
    """Hash-repartition to the session's core count before a
    compute-bound map stage (shingle builds, per-char Horner hashes,
    per-point distance math): single-file inputs give one partition
    and serialize the work on one core.

    The count MUST be explicit: a count-free ``repartition(col)`` is
    AQE-coalescible, and on small inputs adaptive coalescing folds it
    straight back to one partition — the shuffle is paid, the
    parallelism never arrives (measured 2× slower than no repartition
    at sf0.1). ``defaultParallelism`` tracks the session: cores on
    local[N], total executor cores on a cluster — never a hardcoded
    cap on a wide scan. Layout-only by contract: call it only where
    every downstream aggregate is order-independent."""
    return df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, *cols
    )
