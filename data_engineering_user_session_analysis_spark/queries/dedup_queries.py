"""Near-duplicate detection queries over `documents` — exact n-gram
Jaccard (ground truth, DF-capped shingles), MinHash+LSH (the 100 TB
path, verified so its output matches the exact oracle), and SimHash
near-pairs (md5-derived bits, pigeonhole-blocked candidates).

The SimHash *fingerprint* operator has no separate registry entry
(round 1's ``simhash_fingerprints`` — see COVERAGE.md): the
``simhash_near_pairs`` oracle recomputes every fingerprint from raw
text in DuckDB, so a fingerprint defect would break that row's hash
match — the operator stays fully oracle-checked through its consumer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_user_session_analysis_spark.operators.dedup import (
    DEFAULT_MAX_SHINGLE_DF,
    SIMHASH_BITS,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from data_engineering_user_session_analysis_spark.queries import register
from data_engineering_user_session_analysis_spark.sources.tables import load_table

_JACCARD_THRESHOLD = 0.5


def _ngram_jaccard_sql(max_shingle_df: int | None) -> str:
    """Jaccard-pair oracle; optionally with the stop-shingle DF cap
    (mirrored from operators/dedup.py so the capped plan stays fully
    hash-checked even when the cap binds)."""
    cap_cte = (
        f""", dfc AS (
  SELECT s FROM sh GROUP BY s HAVING count(*) <= {max_shingle_df}
), shc AS (
  SELECT sh.doc_id, sh.s FROM sh JOIN dfc ON sh.s = dfc.s
)"""
        if max_shingle_df is not None
        else ", shc AS (SELECT doc_id, s FROM sh)"
    )
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), sh AS (
  SELECT doc_id,
    unnest(list_distinct(list_transform(range(1, len(w) - 1),
           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
  FROM toks WHERE len(w) >= 3
){cap_cte}, sizes AS (
  SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
  FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, CAST(c AS BIGINT) AS intersection,
  c / CAST(sa.n + sb.n - c AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE c / CAST(sa.n + sb.n - c AS DOUBLE) >= {_JACCARD_THRESHOLD}
"""


@register("dedup_ngram_jaccard", _ngram_jaccard_sql(DEFAULT_MAX_SHINGLE_DF))
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (inverted-index self-join,
    stop-shingle DF ceiling bounding the quadratic blowup at scale)."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        docs, threshold=_JACCARD_THRESHOLD, max_shingle_df=DEFAULT_MAX_SHINGLE_DF
    )


@register("dedup_minhash_lsh", _ngram_jaccard_sql(None))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs.  Oracle = the exact (uncapped)
    Jaccard method: every emitted pair is exact-Jaccard-verified
    (precision 1.0) and at this threshold/band layout LSH recall is
    ~1 - 4e-8 for the qualifying pairs, so the outputs coincide."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, threshold=_JACCARD_THRESHOLD)


def _simhash_bits_sql() -> str:
    bit_sums = ",\n    ".join(
        f"SUM(CASE WHEN (h & {1 << j}) != 0 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(SIMHASH_BITS)
    )
    fingerprint = " + ".join(
        f"(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(SIMHASH_BITS)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents
), h AS (
  SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS h FROM toks
), bits AS (
  SELECT doc_id,
    {bit_sums}
  FROM h GROUP BY doc_id
), fp AS (
  SELECT doc_id, CAST({fingerprint} AS BIGINT) AS fingerprint FROM bits
)
"""


@register(
    "simhash_near_pairs",
    _simhash_bits_sql()
    + """
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  CAST(bit_count(xor(a.fingerprint, b.fingerprint)) AS INT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.fingerprint, b.fingerprint)) <= 2
""",
)
def simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs at Hamming distance <= 2 of 32 (TF-weighted
    fingerprints put random pairs at ~10 on this corpus, planted
    near-dups at 0-5).  Candidates via lossless pigeonhole block
    joins (operators/dedup.py:simhash_pairs) — the oracle is the
    all-pairs ground truth, so the row proves the blocking loses
    nothing."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_pairs(docs, max_hamming=2)
