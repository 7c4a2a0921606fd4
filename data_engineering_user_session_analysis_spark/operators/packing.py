"""Token-budget sequence packing for training-data pipelines.

Pretraining consumes documents in fixed-token-budget rows (e.g. 4096
tokens); feeding one short doc per row wastes the budget, so
pipelines PACK multiple documents into each training row.  Packing
is inherently sequential (the next doc's placement depends on the
running fill), which fights Spark's parallelism — the standard
resolution, used here, is *sharded next-fit*: documents are
hash-assigned to independent shards, deterministically ordered
within their shard, and packed greedily shard-by-shard.  Shards
parallelize perfectly (one ``applyInPandas`` group each); the greedy
fill inside a shard is a tight numpy loop over an Arrow batch.

Guarantees (pinned in tests/test_packing.py):

* every document appears in exactly one pack;
* a pack's token total never exceeds ``budget`` — except a pack
  holding a single oversized document (callers chunk or drop those
  upstream; the packer must not silently lose them);
* output is deterministic across runs, partition layouts, and
  cluster sizes (order and shard assignment are content-derived,
  never ``rand()``/partition-id-based);
* pack ids are globally unique: ``shard * 2^40 + local_bin``.

At 100 TB: one shuffle on the shard key, then embarrassingly
parallel packing; shard count is the parallelism knob (default 256 —
at ~390 GB of documents per shard raise it so a shard's id+token
pairs fit an executor's Arrow batch budget comfortably; only (key,
n_tokens) travel through the packer, never document payloads).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: bits reserved for the within-shard bin counter in the global pack id
_BIN_BITS = 40

DEFAULT_SHARDS = 256


def pack_sequences(
    df: DataFrame,
    key_col: str,
    token_col: str,
    budget: int,
    n_shards: int = DEFAULT_SHARDS,
) -> DataFrame:
    """Assign each row a ``pack_id`` such that the rows sharing a
    pack have ``sum(token_col) <= budget`` (single oversized rows get
    a singleton pack).  Returns ``(key_col, token_col, pack_id)`` —
    join back on ``key_col`` to carry payloads.

    Rows with a NULL token count are excluded (a sizeless doc has no
    defined placement; count tokens upstream — the quality stage
    already does).  Next-fit within a shard: docs are walked in
    content-hash order and appended to the current pack until the
    next doc would overflow, then a new pack opens.  Next-fit (vs first-fit) keeps
    the loop O(n) with zero lookback state, and its fill efficiency
    is within a few percent of first-fit for doc-length
    distributions whose mean is well under the budget — the
    pretraining regime.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if not 0 < n_shards <= (1 << 23):
        raise ValueError(f"n_shards must be in (0, 2^23], got {n_shards}")

    # content-derived shard + order (same md5 idiom as sampling.py:
    # reproducible in any engine, stable under repartitioning)
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    slim = df.filter(F.col(token_col).isNotNull()).select(
        F.col(key_col).alias("key"),
        F.col(token_col).cast("long").alias("n_tokens"),
        (h % n_shards).alias("_shard"),
        h.alias("_order"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_order", "key"], kind="mergesort")
        shard = int(pdf["_shard"].iloc[0])
        bins, fill, current = [], 0, -1
        for t in pdf["n_tokens"]:
            t = int(t)
            if current < 0 or fill + t > budget:
                current += 1
                fill = 0
            fill += t
            bins.append(current)
        if current >= (1 << _BIN_BITS):
            raise ValueError(
                f"shard {shard} produced {current + 1} packs, "
                f"exceeding the {_BIN_BITS}-bit pack-id space"
            )
        return pd.DataFrame(
            {
                "key": pdf["key"],
                "n_tokens": pdf["n_tokens"],
                "pack_id": [(shard << _BIN_BITS) + b for b in bins],
            }
        )

    key_type = slim.schema["key"].dataType.simpleString()
    out = slim.groupBy("_shard").applyInPandas(
        pack, schema=f"key {key_type}, n_tokens long, pack_id long"
    )
    return out.select(
        F.col("key").alias(key_col),
        F.col("n_tokens").alias(token_col),
        "pack_id",
    )
