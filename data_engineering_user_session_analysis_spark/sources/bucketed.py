"""Bucketed tables: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a fact-fact join (lineitem ⋈ orders)
is shuffling both sides on the key.  Bucketing pays that shuffle ONCE
at write time: both tables hash-clustered into the same bucket count
on the join key, so every subsequent join/aggregation on that key is
exchange-free (SortMergeJoin reads bucket i against bucket i).

Local-mode note: bucketed tables live in the session catalog under
``spark.sql.warehouse.dir``; the layout and the no-shuffle join plan
are identical on a real cluster with a shared metastore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by key."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
