"""Binned range (interval) join — point-in-interval matching that
stays an EQUI-join.

Spark has no native range-join optimization: ``left.join(right,
(ts >= start) & (ts <= end))`` plans as a BroadcastNestedLoopJoin (or
cartesian) — O(|L|·|R|) comparisons, a scale-killer for event-to-
session attribution, ad-window matching, or slowly-changing interval
lookups.

The standard fix (public Databricks/Flink "bin join" pattern): pick a
bin width, stamp every point with its bin, explode every interval
into the bins it covers, equi-join on the bin id, then apply the
exact range predicate as a residual filter.  Each matching (point,
interval) pair meets in EXACTLY one bin — the point's own bin — so no
dedup pass is needed.  Cost: an equi-shuffle on bin id + interval
fan-out of ⌈span/width⌉ rows; pick ``bin_width`` near the typical
interval span so fan-out stays O(1) per interval.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_engineering_user_session_analysis_spark.operators.sessionize import epoch_micros


def _bin(col: Column, width_micros: int) -> Column:
    return F.floor(epoch_micros(col) / F.lit(width_micros)).cast("long")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_width_seconds: int = 3600,
    extra_keys: tuple[str, ...] = (),
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= ts <= end`` (and equal ``extra_keys``, e.g. user_id)
    via bin equi-join + residual filter.

    ``how`` supports "inner" (matched pairs) and "left_semi" (points
    that fall in at least one interval).  Columns from both inputs
    survive an inner join; name collisions beyond ``extra_keys`` must
    be resolved by the caller beforehand.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(f"unsupported join type: {how}")
    width = bin_width_seconds * 1_000_000
    p = points.withColumn("_bin", _bin(F.col(point_ts), width))
    i = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                _bin(F.col(start_col), width), _bin(F.col(end_col), width)
            )
        ),
    )
    on = ["_bin", *extra_keys]
    residual = (F.col(point_ts) >= F.col(start_col)) & (
        F.col(point_ts) <= F.col(end_col)
    )
    if how == "left_semi":
        # a point inside several intervals matches once per interval;
        # collapse back to distinct point rows for EXISTS semantics
        return (
            p.join(i.select(*on, start_col, end_col), on)
            .filter(residual)
            .select(*points.columns)
            .distinct()
        )
    return p.join(i, on).filter(residual).drop("_bin")
