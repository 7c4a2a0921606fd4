"""Scalar function helpers (SURVEY.md §2.7) — all thin wrappers over
JVM built-ins so every expression stays inside whole-stage codegen."""

from data_engineering_user_session_analysis_spark.functions.time_derivations import time_derivations
from data_engineering_user_session_analysis_spark.functions.categories import split_category

__all__ = ["time_derivations", "split_category"]
