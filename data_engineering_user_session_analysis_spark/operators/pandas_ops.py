"""Pandas-based escape hatches (SURVEY.md §2.8).

The engine's rule: built-ins first — every production operator in
this package is JVM-side.  These implementations exist to prove the
escape hatch works for semantics Spark built-ins genuinely can't
express (custom per-key state machines, model scoring, exotic
sessionization policies), and to pin that the hatch agrees with the
built-in path where they overlap.

``sessionize_applyinpandas`` is the reference's per-user session
state machine (the checkpoint's stateful operator, SURVEY.md §2.9
ST4) written imperatively per user: same gap semantics as
``operators.sessionize.sessionize`` — tested equal row-for-row.
Cost note: this shuffles whole rows to Python via Arrow; the window
version stays in the JVM.  At 100 TB prefer the window; use this
shape only when the per-session logic outgrows SQL.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def sessionize_applyinpandas(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-user gap sessionization via ``applyInPandas`` — one pandas
    frame per user, imperative gap scan, same second-truncated gap
    semantics as the window implementation."""
    from data_engineering_user_session_analysis_spark.runtime import ensure_worker_imports

    ensure_worker_imports(df.sparkSession)

    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("session_seq", T.LongType(), False),
            T.StructField("session_id", T.StringType(), False),
        ]
    )

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, tiebreak_col]).reset_index(drop=True)
        secs = pdf[ts_col].astype("int64") // 1_000_000_000
        gaps = secs.diff()
        is_new = gaps.isna() | (gaps > gap_seconds)
        pdf["session_seq"] = is_new.cumsum().astype("int64")
        pdf["session_id"] = (
            pdf[user_col].astype(str) + "-" + pdf["session_seq"].astype(str)
        )
        return pdf

    return df.groupBy(user_col).applyInPandas(per_user, schema=out_schema)


def zscore_pandas_udf(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Scalar Arrow-vectorized pandas UDF example (the SNIPPETS [1]
    extension point): per-batch z-score-ish transform.  Built-in
    equivalent exists (mean/stddev window) — this pins the UDF
    plumbing, not the math."""
    from data_engineering_user_session_analysis_spark.runtime import ensure_worker_imports

    ensure_worker_imports(df.sparkSession)

    @F.pandas_udf(T.DoubleType())
    def center(v: pd.Series) -> pd.Series:
        return v - v.mean()

    return df.withColumn("value_centered_batch", center(F.col(value_col)))


# NOTE: a mapInPandas per-session aggregator was considered and
# rejected: Arrow batching can split one session across batches
# within a partition, so per-batch groupby double-counts — grouped
# semantics belong to applyInPandas (above), per-row/batch transforms
# to mapInPandas (see operators/multimodal.py).
