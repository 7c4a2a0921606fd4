"""JDBC serving-table sink/source (reference S5/S6).

The reference writes three result tables to Postgres with
``df.write.jdbc(mode='overwrite')`` (``spark_jobs/spark_batch_job.py
:138-148``) and declares (but never wires) a micro-batch append sink
whose URL points at ``localhost`` — unreachable from executors inside
the cluster (``spark_jobs/spark_stream.py:143``).  These wrappers fix
the contract: the URL is explicit, executors open one connection per
partition, and `coalesce_partitions` bounds connection count for
small serving tables.

LIVE-TESTED against embedded Derby (the JDBC driver Spark ships for
its metastore): overwrite + read-back, range-partitioned parallel
reads, and the streaming foreachBatch append path all round-trip for
real in ``tests/test_jdbc.py`` — no parquet stand-in needed for
verification.  In production the same wrappers take a Postgres/MySQL
URL + driver jar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    properties: dict[str, str] | None = None,
    coalesce_partitions: int | None = 8,
) -> None:
    """Write a serving table over JDBC.

    Serving outputs are post-aggregation (small); coalescing bounds
    the number of parallel connections the database sees."""
    out = df.coalesce(coalesce_partitions) if coalesce_partitions else df
    out.write.jdbc(url=url, table=table, mode=mode, properties=properties or {})


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Read a table over JDBC, optionally range-partitioned so the
    scan parallelizes across executors instead of a single connection."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader.load()
