"""Serving-table DDL side channel (reference S9).

The reference drops/creates its Postgres ``user_session`` table over
psycopg2 before streaming starts (``spark_jobs/spark_stream.py:93-133,
156-163``).  Engine equivalent: derive the DDL *from the Spark
schema* (one source of truth — the reference hand-maintains the
column list in two places), and execute it over psycopg2 when the
driver is importable/reachable.
"""

from __future__ import annotations

from pyspark.sql import types as T

_TYPE_MAP: dict[str, str] = {
    "string": "TEXT",
    "long": "BIGINT",
    "bigint": "BIGINT",
    "int": "INTEGER",
    "integer": "INTEGER",
    "double": "DOUBLE PRECISION",
    "float": "REAL",
    "boolean": "BOOLEAN",
    "timestamp": "TIMESTAMPTZ",
    "timestamp_ntz": "TIMESTAMP",
    "date": "DATE",
    "binary": "BYTEA",
}


def _sql_type(dt: T.DataType) -> str:
    name = dt.simpleString()
    if name.startswith("decimal"):
        return name.upper().replace("DECIMAL", "NUMERIC")
    if name.startswith(("array", "map", "struct")):
        return "JSONB"  # serialize nested values with to_json at the boundary
    return _TYPE_MAP.get(name, "TEXT")


def ddl_for_schema(
    table: str,
    schema: T.StructType,
    primary_key: str | None = None,
    drop_first: bool = False,
) -> str:
    """CREATE TABLE DDL for a Spark schema (Postgres dialect)."""
    cols = []
    for f in schema.fields:
        null = "" if f.nullable else " NOT NULL"
        pk = " PRIMARY KEY" if f.name == primary_key else ""
        cols.append(f"  {f.name} {_sql_type(f.dataType)}{null}{pk}")
    stmt = f"CREATE TABLE IF NOT EXISTS {table} (\n" + ",\n".join(cols) + "\n);"
    if drop_first:
        stmt = f"DROP TABLE IF EXISTS {table};\n" + stmt
    return stmt


def apply_ddl(dsn: str, ddl: str) -> bool:
    """Execute DDL over psycopg2 when available/reachable.  Returns
    True on success, False when the driver is absent (this container)."""
    try:
        import psycopg2  # type: ignore[import-not-found]
    except ImportError:
        return False
    conn = psycopg2.connect(dsn)
    try:
        with conn, conn.cursor() as cur:
            cur.execute(ddl)
    finally:
        conn.close()
    return True
