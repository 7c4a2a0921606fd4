"""Serving-table DDL side channel (reference S9).

The reference drops/creates its Postgres ``user_session`` table over
psycopg2 before streaming starts (``spark_jobs/spark_stream.py:93-133,
156-163``).  Engine equivalent: derive the DDL *from the Spark
schema* (one source of truth — the reference hand-maintains the
column list in two places), and execute it over psycopg2 when the
driver is importable/reachable OR over any JDBC url through the
JVM's DriverManager (LIVE-tested against embedded Derby in
``tests/test_serving_ddl.py`` — real DDL execution + a write into
the pre-created table, no external database needed).
"""

from __future__ import annotations

from pyspark.sql import types as T

_TYPE_MAPS: dict[str, dict[str, str]] = {
    "postgres": {
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
        "_nested": "JSONB",
        "_decimal": "NUMERIC",
    },
    # Derby (embedded; what Spark ships) — no TEXT/JSONB/TIMESTAMPTZ
    "derby": {
        "string": "VARCHAR(32000)",
        "long": "BIGINT",
        "bigint": "BIGINT",
        "int": "INTEGER",
        "integer": "INTEGER",
        "double": "DOUBLE",
        "float": "REAL",
        "boolean": "BOOLEAN",
        "timestamp": "TIMESTAMP",
        "timestamp_ntz": "TIMESTAMP",
        "date": "DATE",
        "binary": "BLOB",
        "_nested": "LONG VARCHAR",
        "_decimal": "DECIMAL",
    },
}


def _sql_type(dt: T.DataType, dialect: str) -> str:
    tmap = _TYPE_MAPS[dialect]
    name = dt.simpleString()
    if name.startswith("decimal"):
        return name.upper().replace("DECIMAL", tmap["_decimal"])
    if name.startswith(("array", "map", "struct")):
        # serialize nested values with to_json at the boundary
        return tmap["_nested"]
    return tmap.get(name, tmap["string"])


def ddl_for_schema(
    table: str,
    schema: T.StructType,
    primary_key: str | None = None,
    drop_first: bool = False,
    dialect: str = "postgres",
) -> str:
    """CREATE TABLE DDL for a Spark schema.

    ``dialect``: "postgres" (reference target; IF NOT EXISTS guards)
    or "derby" (plain statements — Derby has no IF [NOT] EXISTS; the
    executor treats already-exists/not-found as idempotent success)."""
    cols = []
    for f in schema.fields:
        null = "" if f.nullable else " NOT NULL"
        pk = " PRIMARY KEY" if f.name == primary_key else ""
        cols.append(f"  {f.name} {_sql_type(f.dataType, dialect)}{null}{pk}")
    guard = "IF NOT EXISTS " if dialect == "postgres" else ""
    stmt = f"CREATE TABLE {guard}{table} (\n" + ",\n".join(cols) + "\n);"
    if drop_first:
        drop_guard = "IF EXISTS " if dialect == "postgres" else ""
        stmt = f"DROP TABLE {drop_guard}{table};\n" + stmt
    return stmt


# Derby SQLStates for idempotent DDL: table already exists / not found.
_IDEMPOTENT_SQLSTATES = {"X0Y32", "42Y55"}


def apply_ddl_jdbc(spark, url: str, ddl: str) -> bool:
    """Execute DDL statements over JDBC via the JVM DriverManager —
    works with any driver on Spark's classpath (embedded Derby in
    tests; Postgres/MySQL in production).  Statements run one at a
    time; already-exists / not-found errors are treated as idempotent
    success so drop+create scripts re-run cleanly.

    Statement splitting is a plain ``';'`` split: scripts must not
    contain semicolons inside string literals (``ddl_for_schema``
    output never does; callers passing arbitrary DDL must respect the
    same constraint)."""
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        try:
            for stmt in (s.strip() for s in ddl.split(";")):
                if not stmt:
                    continue
                try:
                    st.execute(stmt)
                except Exception as exc:  # py4j wraps SQLException
                    state = getattr(getattr(exc, "java_exception", None), "getSQLState", lambda: "")()
                    if state not in _IDEMPOTENT_SQLSTATES:
                        raise
        finally:
            st.close()
    finally:
        conn.close()
    return True


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
