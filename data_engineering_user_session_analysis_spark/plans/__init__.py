"""Physical-plan introspection utilities (see `plans.audit`)."""

from data_engineering_user_session_analysis_spark.plans.audit import (  # noqa: F401
    count_exchanges,
    count_scans,
    executed_plan,
    has_partition_filter,
    has_pushed_filter,
    is_equi_join_only,
    whole_stage_codegen_spans,
)
