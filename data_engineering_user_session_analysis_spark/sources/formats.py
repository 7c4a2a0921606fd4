"""Format-agnostic lake I/O: one write/read API over the columnar and
row formats Spark ships built-in (parquet, ORC, JSON-lines, CSV).

The reference's lake is parquet-only (``spark_jobs/spark_stream.py:
170-176``); a production pipeline also meets ORC lakes (Hive
ecosystems), JSONL drops (API exports, LLM training corpora are
usually JSONL), and CSV (the reference's own ingest side,
``dags/kafka_stream.py:61``).  All four go through the same
DataFrameReader/Writer surface, so partitioned layout, Hive-style
partition pruning, and (for the columnar pair) predicate pushdown +
column pruning come for free — pinned in tests/test_formats.py.

Scale notes: parquet and ORC are the only formats to use at volume —
columnar, compressed, splittable, with pushdown into the scan (the
ORC reader is vectorized like parquet's).  JSON/CSV scans are
schema-explicit here (never inferred: inference is an extra full
pass and a schema drift hazard); they exist as ingest/egress
boundaries, not analytics storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: formats safe for analytics storage (columnar, pushdown-capable)
COLUMNAR_FORMATS = ("parquet", "orc")
#: row formats for ingest/egress boundaries (schema must be explicit)
ROW_FORMATS = ("json", "csv")
SUPPORTED_FORMATS = COLUMNAR_FORMATS + ROW_FORMATS


def write_lake_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Write a table in any supported format with optional Hive-style
    partitioning (directory layout identical across formats, so the
    partition-pruning story carries over)."""
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; pick from {SUPPORTED_FORMATS}")
    writer = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_lake_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """Read a table in any supported format.  Columnar formats carry
    their own schema; row formats REQUIRE an explicit one (schema
    inference would add a full extra pass and silently drift)."""
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; pick from {SUPPORTED_FORMATS}")
    reader = spark.read.format(fmt)
    if fmt in ROW_FORMATS:
        if schema is None:
            raise ValueError(
                f"{fmt} reads need an explicit schema (inference is an "
                "extra full pass and a drift hazard)"
            )
        reader = reader.schema(schema)
        if fmt == "csv":
            reader = reader.option("header", "true")
    elif schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)
