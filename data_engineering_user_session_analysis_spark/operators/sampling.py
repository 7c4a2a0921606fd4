"""Deterministic sampling operators for training-data pipelines.

Spark's ``TABLESAMPLE`` / ``df.sample`` are seed-dependent AND
partitioning-dependent (the same seed yields different rows after a
repartition), which makes pipeline runs unreproducible.  These
operators derive inclusion from CONTENT (md5 of a key), so a sample
is stable across runs, engines, partition layouts, and cluster sizes
— the property a 100 TB corpus pipeline needs for auditable data
mixes.

* ``hash_bernoulli_sample`` — keep a deterministic ~p fraction of
  rows by key-hash bucket (pure filter: pushes to the scan, no
  shuffle).  The same idiom backs the registry queries
  ``scalar_doc_functions`` (row filter) and ``dedup_exact``
  (re-crawl shard selection).
* ``stratified_sample`` — exactly ``k`` rows per stratum (or all
  rows of smaller strata), chosen by md5 order within the stratum:
  the per-group quota sampler used to balance a training mixture
  (e.g. k documents per language).  One shuffle on the strata
  columns; the rank is a WindowGroupLimit at execution, so only the
  top-k per stratum survive the sort buffer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _key_hash(col: Column) -> Column:
    """First 8 md5 hex chars of the key as a non-negative long —
    reproducible in any engine (unlike murmur/xxhash/rand)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")


def hash_bernoulli_sample(
    df: DataFrame,
    key_col: str,
    rate: float,
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic ~``rate`` sample: keep rows whose key-hash bucket
    falls below ``rate * buckets``.  A pure filter — no shuffle, and
    the same rows are kept on every run and every engine."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    threshold = int(rate * buckets)
    return df.filter(_key_hash(F.col(key_col)) % buckets < threshold)


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    key_col: str,
) -> DataFrame:
    """Exactly ``min(k, |stratum|)`` rows per stratum, deterministic.

    Rows rank within their stratum by (md5(key), key) — a stable
    pseudo-random order — and the top ``k`` survive.  Adding rows to
    OTHER strata never changes a stratum's sample; adding rows to the
    same stratum changes it only where the new keys hash into the
    top-k (the minimal possible disturbance for a quota sampler)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = Window.partitionBy(*strata_cols).orderBy(
        _key_hash(F.col(key_col)).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
