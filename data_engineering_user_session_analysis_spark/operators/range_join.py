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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_engineering_user_session_analysis_spark.operators.sessionize import epoch_micros


def _bin(col: Column, width_micros: int) -> Column:
    return F.floor(epoch_micros(col) / F.lit(width_micros)).cast("long")


_BIN = "__range_join_bin__"
_LEFT_WORK_COLS = (
    "__range_join_ok__",
    "__range_join_any__",
    "__range_join_rn__",
)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_width_seconds: int = 3600,
    extra_keys: tuple[str, ...] = (),
    how: str = "inner",
    point_key: str | None = None,
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= ts <= end`` (and equal ``extra_keys``, e.g. user_id)
    via bin equi-join + residual filter.

    ``how`` supports:

    * ``"inner"`` — matched (point, interval) pairs; columns from
      both inputs survive.  Name collisions beyond ``extra_keys``
      must be resolved by the caller beforehand.
    * ``"left"`` — every point row, interval columns null where no
      interval contains the point.  Requires ``point_key`` (a column
      that uniquely identifies a point row, e.g. event_id).
      SINGLE-PASS: one left bin-equi-join, then one window over the
      point key keeps residual matches (fanning out like a true
      range left join) and exactly one null-extended representative
      for keys with no residual match — each input is scanned once
      (a matched/anti two-branch formulation recomputes the whole
      bin join for the anti side).
    * ``"left_semi"`` — points that fall in at least one interval.
      With ``point_key`` this is a true left-semi (duplicate point
      rows sharing a key all survive, exactly one output row per
      input row); without it the fallback collapses to DISTINCT full
      point rows (EXISTS over row *values* — duplicated input rows
      merge; pass ``point_key`` when that matters).

    Both inputs must be free of the reserved internal working
    columns (``__range_join_bin__`` and, for ``how='left'``, the
    ``__range_join_ok__``/``__range_join_any__``/``__range_join_rn__``
    flags) — guarded with an explicit error rather than silent
    clobbering.
    """
    if how not in ("inner", "left", "left_semi"):
        raise ValueError(f"unsupported join type: {how}")
    if how == "left" and point_key is None:
        raise ValueError("how='left' requires point_key (unique point row id)")
    reserved = (_BIN, *_LEFT_WORK_COLS) if how == "left" else (_BIN,)
    for side, df in (("points", points), ("intervals", intervals)):
        for col in reserved:
            if col in df.columns:
                raise ValueError(
                    f"{side} input already has reserved column {col}"
                )
    width = bin_width_seconds * 1_000_000
    p = points.withColumn(_BIN, _bin(F.col(point_ts), width))
    i = intervals.withColumn(
        _BIN,
        F.explode(
            F.sequence(
                _bin(F.col(start_col), width), _bin(F.col(end_col), width)
            )
        ),
    )
    on = [_BIN, *extra_keys]
    residual = (F.col(point_ts) >= F.col(start_col)) & (
        F.col(point_ts) <= F.col(end_col)
    )
    if how == "left_semi":
        matched = p.join(i.select(*on, start_col, end_col), on).filter(residual)
        if point_key is not None:
            # true EXISTS: left-semi against the distinct matched-key
            # set — duplicate point rows sharing a key all survive
            return points.join(
                matched.select(point_key).distinct(), point_key, "left_semi"
            )
        # fallback EXISTS over row values: duplicated inputs collapse
        return matched.select(*points.columns).distinct()
    if how == "left":
        ok, any_ok, rn = _LEFT_WORK_COLS
        wk = Window.partitionBy(point_key)
        joined = (
            p.join(i, on, "left")
            # residual is NULL on null-extended rows -> coalesce False
            .withColumn(ok, F.coalesce(residual, F.lit(False)))
        )
        joined = joined.withColumn(
            any_ok, F.max(F.col(ok).cast("int")).over(wk)
        ).withColumn(
            # any row serves as the unmatched representative: the
            # point columns are identical within a key (point_key is
            # unique per point row) and the interval columns get
            # nulled below
            rn,
            F.row_number().over(wk.orderBy(F.col(ok).desc())),
        )
        kept = joined.filter(
            F.col(ok) | ((F.col(any_ok) == 0) & (F.col(rn) == 1))
        )
        for c in i.columns:
            if c not in (*extra_keys, _BIN):
                kept = kept.withColumn(c, F.when(F.col(ok), F.col(c)))
        return kept.drop(ok, any_ok, rn, _BIN)
    return p.join(i, on).filter(residual).drop(_BIN)
