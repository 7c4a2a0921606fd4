"""Deterministic distributional statistics for pipeline thresholds.

``percentile_approx`` is a mergeable sketch, but its merge result can
depend on partition merge ORDER — a pipeline thresholding on it can
keep a different survivor set after an innocent repartition, breaking
the corpus-prep determinism contract (pipelines/corpus_prep.py).
Spark's exact ``percentile`` is deterministic but materializes every
value per group — not a 100 TB global aggregate.

``quantized_quantile`` is the scalable deterministic middle: quantize
the value to a fixed grid, count per grid cell (one shuffle whose
width is bounded by the GRID, not the data), cumulative-sum the cell
histogram, and read the quantile off the grid.  Values within one
quantum are indistinguishable by construction — exactly the tolerance
a quality threshold wants — and the answer is identical under any
partitioning, cluster size, or row order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantized_quantile(
    df: DataFrame,
    col: str,
    p: float,
    quantum: float = 1e-6,
) -> DataFrame:
    """1-row DataFrame ``(threshold: double)``: the smallest grid
    value ``t`` such that at least ``ceil(p * n)`` non-null values are
    ``< t + quantum`` (i.e. the p-quantile rounded down to the grid).
    Filtering ``col >= threshold`` afterwards keeps the top
    ``1 - p`` fraction (grid ties included on the keep side).

    Kept as a DataFrame so callers broadcast it back in-plan (the
    ``user_level`` global-scalar pattern) instead of a driver
    round-trip.  The cumulative window is a single-partition sort of
    the HISTOGRAM — bounded by the grid cardinality (1e6 cells for
    scores in [0,1] at the default quantum), not by data volume."""
    if not 0.0 <= p <= 1.0:
        raise ValueError(f"p must be in [0, 1], got {p}")
    buckets = df.filter(F.col(col).isNotNull()).select(
        F.floor(F.col(col) / F.lit(quantum)).cast("long").alias("_b")
    )
    hist = buckets.groupBy("_b").agg(F.count("*").alias("_n"))
    w = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, 0)
    ranked = hist.withColumns(
        {
            "_cum": F.sum("_n").over(w),
            "_total": F.sum("_n").over(
                Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        }
    )
    return (
        ranked.filter(F.col("_cum") >= F.ceil(F.col("_total") * F.lit(p)))
        .agg(F.min("_b").alias("_b"))
        .select((F.col("_b") * F.lit(quantum)).cast("double").alias("threshold"))
    )
