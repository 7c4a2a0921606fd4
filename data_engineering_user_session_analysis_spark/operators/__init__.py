"""Relational/dataflow operators — every one a ``DataFrame -> DataFrame``
function built from Spark built-ins (no custom Catalyst rules needed,
per SURVEY.md §4)."""
