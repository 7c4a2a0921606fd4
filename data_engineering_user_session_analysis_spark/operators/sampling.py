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
* ``weighted_sample`` — k rows without replacement with inclusion
  probability proportional to a weight column (quality-weighted
  training mixes), via the Efraimidis–Spirtakis exponential-keys
  scheme with the content-hash as the uniform variate — the one
  weighted sampler that is both single-pass distributed AND
  deterministic.
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


#: hash-bucket denominator for the uniform variate: md5's first 8 hex
#: chars span [0, 2^32), so (h + 1) / (2^32 + 1) lies strictly in
#: (0, 1) — pow(u, 1/w) stays finite for every weight.
_U_DENOM = float((1 << 32) + 1)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """``k`` rows without replacement, inclusion probability
    proportional to ``weight_col`` — deterministic.

    Efraimidis–Spirtakis A-ES: each row scores ``u ** (1 / w)`` with
    ``u`` uniform in (0, 1); the k largest scores are a weighted
    sample without replacement.  Here ``u`` comes from the row's
    content hash instead of ``rand()``, so the sample is reproducible
    across runs, engines, and partition layouts — and retry-safe
    (re-executed tasks recompute identical scores, the SPARK-23207
    hazard class that seed-based sampling has on shuffle retry).

    Scale shape: scores are a map-only projection; the top-k is
    ``orderBy(...).limit(k)`` = TakeOrderedAndProject — per-partition
    partial top-k, one driver merge of partitions·k rows, NO global
    sort shuffle.  Rows with non-positive weight are excluded (their
    inclusion probability is 0).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    u = (_key_hash(F.col(key_col)) + 1) / F.lit(_U_DENOM)
    score = F.pow(u, 1.0 / F.col(weight_col).cast("double"))
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_es_score", score)
        .orderBy(F.col("_es_score").desc(), F.col(key_col).asc())
        .limit(k)
        .drop("_es_score")
    )
