"""PySpark-native user-session analytics engine.

A brand-new, Spark-first re-expression of the capabilities of the
reference pipeline ``trannam710/data-engineering-user-session-analysis``
(clickstream ingestion -> sessionization -> session/user-level analytics
-> serving tables), designed for 100 TB scale:

- Declarative DataFrame/SQL plans (Catalyst does pushdown/pruning/AQE).
- Gap-based and key-based sessionization (batch window fns + streaming
  ``session_window``) -- reference semantics per SURVEY.md §2.9.
- Training-data pipeline extensions: dedup (exact/MinHash/SimHash),
  similarity search over embeddings, text quality/language analysis.

Everything here derives from the public Apache Spark API and the
public reference repo's observable behavior.
"""

from data_engineering_user_session_analysis_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
