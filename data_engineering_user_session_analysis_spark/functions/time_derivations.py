"""Event-time derivation columns.

Mirrors the reference's enrichment block
(``spark_jobs/spark_stream.py:66-71``): processing date, event date,
weekday name, hour-of-day.  Implemented as a single ``withColumns``
projection — the reference chains six ``withColumn`` calls and leans
on Catalyst's CollapseProject; one projection keeps the logical plan
flat from the start (SURVEY.md §2.2 P4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_derivations(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Add extracted_date / date / date_of_week / hour_of_day."""
    return df.withColumns(
        {
            "extracted_date": F.current_date(),
            "date": F.to_date(F.col(ts_col)),
            "date_of_week": F.date_format(F.col(ts_col), "EEEE"),
            "hour_of_day": F.hour(F.col(ts_col)),
        }
    )
