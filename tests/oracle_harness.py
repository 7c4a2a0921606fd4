"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs a named query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, sorted column names,
and an order-insensitive exact value comparison (floats compared
bit-exactly — the driver hashes, so approximate equality would hide
real failures).
"""

from __future__ import annotations

import datetime
import math
import os
from decimal import Decimal

import duckdb
import pandas as pd


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        return str(v.normalize())
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def _normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(_norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple((x is None, x or "") for x in r))


def compare(name: str, spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    return compare_pandas(name, spark_df.toPandas(), oracle_pdf)


def compare_pandas(
    name: str, spdf: pd.DataFrame, oracle_pdf: pd.DataFrame
) -> list[str]:
    """compare() on an ALREADY-COLLECTED Spark result: callers that
    timed the collection pass it in, so the compared rows are exactly
    the timed rows and the query doesn't execute twice (ADVICE r11:
    the sweep's double toPandas() roughly doubled sf1 wall time)."""
    problems: list[str] = []
    if sorted(spdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"{name}: columns differ spark={sorted(spdf.columns)} "
            f"oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    if len(spdf) != len(oracle_pdf):
        problems.append(f"{name}: rowcount spark={len(spdf)} oracle={len(oracle_pdf)}")
    a, b = _normalize(spdf), _normalize(oracle_pdf)
    if a != b:
        diffs = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
        for i in diffs:
            problems.append(f"{name}: row {i} spark={a[i]} oracle={b[i]}")
        if not diffs and len(a) != len(b):
            problems.append(f"{name}: normalized row sets differ in length")
    return problems
