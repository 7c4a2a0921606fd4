"""Slowly-changing-dimension type 2 merge — MERGE INTO emulation with
plain DataFrame ops (anti-join + union; no Delta/Iceberg required).

History model: one row per (key, version) with ``valid_from`` /
``valid_to`` timestamps; the open version has ``valid_to IS NULL``.
Applying an update batch:

* unchanged keys keep their open row;
* changed keys: the open row is closed at the update timestamp and a
  new open row is appended;
* brand-new keys get an open row.

All three classes are computed with one join of the open rows against
the updates — shuffle on the dimension key, scale-safe (dimension
history is small next to facts; at 100 TB the same logic runs as a
MERGE INTO on a lakehouse table format, which this operator's output
contract matches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_merge(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    change_ts_col: str = "change_ts",
) -> DataFrame:
    """Apply an update batch to an SCD2 history table.

    ``history``: key, *tracked, valid_from, valid_to (NULL = open).
    ``updates``: key, *tracked, change_ts (one row per key — dedupe
    upstream with e.g. max_by(change_ts) if needed).
    Returns the new full history.
    """
    closed = history.filter(F.col("valid_to").isNotNull())
    open_rows = history.filter(F.col("valid_to").isNull())

    u = updates.select(
        F.col(key),
        *[F.col(c).alias(f"_u_{c}") for c in tracked],
        F.col(change_ts_col).alias("_u_ts"),
    )
    joined = open_rows.join(u, key, "full_outer")

    changed_pred = F.col("_u_ts").isNotNull() & (
        F.col("valid_from").isNull()  # brand-new key (no open row)
        | ~F.struct(*[F.col(c) for c in tracked]).eqNullSafe(
            F.struct(*[F.col(f"_u_{c}") for c in tracked])
        )
    )

    # open rows with no (effective) change survive untouched
    untouched = joined.filter(~changed_pred).filter(
        F.col("valid_from").isNotNull()
    ).select(key, *tracked, "valid_from", "valid_to")

    # close superseded versions at the update timestamp
    closed_now = (
        joined.filter(changed_pred & F.col("valid_from").isNotNull())
        .select(
            key,
            *tracked,
            "valid_from",
            F.col("_u_ts").alias("valid_to"),
        )
    )

    # new open versions (changed or brand-new keys)
    fresh = joined.filter(changed_pred).select(
        key,
        *[F.col(f"_u_{c}").alias(c) for c in tracked],
        F.col("_u_ts").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )

    return closed.select(key, *tracked, "valid_from", "valid_to").unionByName(
        untouched
    ).unionByName(closed_now).unionByName(fresh)
