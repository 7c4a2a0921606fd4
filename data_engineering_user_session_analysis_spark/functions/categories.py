"""Dotted-taxonomy split (reference F6, with the regex-dot bug fixed).

The reference splits ``category_code`` with pattern ``"."``
(``spark_jobs/spark_stream.py:70-71``) — a regex any-char, so both
derived columns come out empty.  The *intent* is a literal-dot split;
this implements the intent (SURVEY.md §2.7 F6) and is pinned by a
unit test.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_category(
    df: DataFrame,
    col: str = "category_code",
    main_col: str = "main_category",
    sub_col: str = "sub_category",
    fill: str = "unknown",
) -> DataFrame:
    """main/sub category from a dotted code, null-filled with `fill`."""
    parts: Column = F.split(F.col(col), "\\.")
    # F.get (not getItem): NULL on out-of-bounds under ANSI mode
    # (codes without a sub-part), then null-fill like the reference.
    return df.withColumns(
        {
            main_col: F.coalesce(F.get(parts, 0), F.lit(fill)),
            sub_col: F.coalesce(F.get(parts, 1), F.lit(fill)),
        }
    )
