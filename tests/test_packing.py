"""Sequence packing and weighted sampling: budget guarantee,
losslessness, determinism under repartitioning, exact replay of the
content-hash math in local python, and weight-proportional inclusion."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_engineering_user_session_analysis_spark.operators.packing import pack_sequences
from data_engineering_user_session_analysis_spark.operators.sampling import weighted_sample
from data_engineering_user_session_analysis_spark.sources.tables import load_table


def _doc_tokens(spark, sf_small):
    return (
        load_table(spark, sf_small, "documents")
        .select(
            "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
        )
    )


def _md5_h(key) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16)


BUDGET = 512


def test_pack_budget_and_losslessness(spark, sf_small):
    docs = _doc_tokens(spark, sf_small)
    # shard count sized to the corpus (500 docs / 4 shards); the
    # 256-shard default targets corpus scale, where per-shard doc
    # counts are large — with ~2 docs per shard nothing can fill
    packed = pack_sequences(docs, "doc_id", "n_tokens", BUDGET, n_shards=4)
    rows = packed.collect()
    # lossless: every doc exactly once, token counts intact
    src = {r.doc_id: r.n_tokens for r in docs.collect()}
    assert {r.doc_id: r.n_tokens for r in rows} == src
    assert len(rows) == len(src)
    # budget: no multi-doc pack exceeds it; oversized docs are alone
    packs: dict[int, list] = {}
    for r in rows:
        packs.setdefault(r.pack_id, []).append(r.n_tokens)
    assert len(packs) > 1
    for members in packs.values():
        assert sum(members) <= BUDGET or len(members) == 1
    # the packer actually packs: mean fill of full packs well above
    # a one-doc-per-pack strawman
    fills = [sum(m) for m in packs.values()]
    assert sum(fills) / (len(fills) * BUDGET) > 0.5


def test_pack_deterministic_under_repartition(spark, sf_small):
    docs = _doc_tokens(spark, sf_small)
    a = pack_sequences(docs, "doc_id", "n_tokens", BUDGET).collect()
    b = pack_sequences(
        docs.repartition(7, "n_tokens"), "doc_id", "n_tokens", BUDGET
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pack_replays_in_local_python(spark, sf_small):
    """The shard assignment, order, and next-fit fill are pure
    functions of content — replay them in plain python and demand
    bit-identical pack membership."""
    docs = _doc_tokens(spark, sf_small)
    got = {
        r.doc_id: r.pack_id
        for r in pack_sequences(
            docs, "doc_id", "n_tokens", BUDGET, n_shards=16
        ).collect()
    }
    shards: dict[int, list] = {}
    for r in docs.collect():
        h = _md5_h(r.doc_id)
        shards.setdefault(h % 16, []).append((h, r.doc_id, r.n_tokens))
    expected = {}
    for shard, members in shards.items():
        members.sort()
        fill, current = 0, -1
        for _, doc_id, t in members:
            if current < 0 or fill + t > BUDGET:
                current += 1
                fill = 0
            fill += t
            expected[doc_id] = (shard << 40) + current
    assert got == expected


def test_pack_excludes_null_token_counts(spark):
    """NULL sizes have no defined placement: excluded, documented,
    and never a worker crash."""
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 20)], "doc_id long, n_tokens long"
    )
    got = pack_sequences(df, "doc_id", "n_tokens", 100, n_shards=1).collect()
    assert sorted(r.doc_id for r in got) == [1, 3]


def test_weighted_sample_plan_is_take_ordered(spark, sf_small):
    """The top-k must compile to TakeOrderedAndProject (partial
    per-partition top-k + driver merge), never a global sort."""
    docs = _doc_tokens(spark, sf_small).withColumn(
        "w", (F.col("n_tokens") + 1).cast("double")
    )
    plan = (
        weighted_sample(docs, "doc_id", "w", 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan


def test_pack_plan_single_shuffle(spark, sf_small):
    """Packing shuffles once, on the shard key: exactly one exchange
    in the executed plan."""
    docs = _doc_tokens(spark, sf_small)
    plan = (
        pack_sequences(docs, "doc_id", "n_tokens", BUDGET, n_shards=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_pack_oversized_doc_gets_singleton(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 999), (3, 20), (4, 30)], "doc_id long, n_tokens long"
    )
    packed = pack_sequences(df, "doc_id", "n_tokens", budget=100, n_shards=1)
    packs: dict[int, list] = {}
    for r in packed.collect():
        packs.setdefault(r.pack_id, []).append(r.n_tokens)
    oversized = [m for m in packs.values() if 999 in m]
    assert oversized == [[999]]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**6),
            st.integers(min_value=1, max_value=800),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda e: e[0],
    ),
    st.integers(min_value=50, max_value=600),
)
def test_pack_property(spark, rows, budget):
    """For arbitrary doc sizes and budgets: lossless, budget-safe
    (singleton exception), and shard-consistent pack ids."""
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_sequences(df, "doc_id", "n_tokens", budget, n_shards=3)
    got = out.collect()
    assert {(r.doc_id, r.n_tokens) for r in got} == set(rows)
    packs: dict[int, list] = {}
    for r in got:
        packs.setdefault(r.pack_id, []).append(r.n_tokens)
    for members in packs.values():
        assert sum(members) <= budget or len(members) == 1
    # pack ids embed the shard: docs in one pack share a shard
    for r in got:
        assert (r.pack_id >> 40) == _md5_h(r.doc_id) % 3


def test_weighted_sample_replays_exponential_keys(spark, sf_small):
    """Top-k by u^(1/w) with the content-hash u — replayed exactly in
    local python on the same rows."""
    docs = _doc_tokens(spark, sf_small).withColumn(
        "w", (F.col("n_tokens") + 1).cast("double")
    )
    k = 50
    got = [r.doc_id for r in weighted_sample(docs, "doc_id", "w", k).collect()]
    rows = docs.collect()
    scored = sorted(
        (
            -(((_md5_h(r.doc_id) + 1) / float((1 << 32) + 1)) ** (1.0 / r.w)),
            r.doc_id,
        )
        for r in rows
    )
    expected = [doc_id for _, doc_id in scored[:k]]
    assert got == expected


def test_weighted_sample_prefers_heavy_rows(spark):
    """A 1000:1 weight skew must dominate the sample, and zero/negative
    weights are never selected."""
    rows = [(i, 1000.0 if i < 20 else 1.0) for i in range(200)]
    rows += [(900, 0.0), (901, -5.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    picked = {r.doc_id for r in weighted_sample(df, "doc_id", "w", 20).collect()}
    assert not picked & {900, 901}
    heavy = {i for i in range(20)}
    assert len(picked & heavy) >= 15, picked
