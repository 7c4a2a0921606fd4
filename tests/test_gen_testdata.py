"""Pins for tools/gen_testdata.py — the sf1-decade generator behind
sweep_oracle.py (VERDICT r10 item 2).

The sweep's claim is only as good as the generated decade: these
tests pin (a) arrow-schema byte-parity with the driver's own files,
(b) determinism, and (c) the planted dedup structure the minhash
rows rely on (near-dups at trigram-shingle Jaccard inside the 16x4
LSH layout's ~1-4e-8 recall zone — below ~0.8 the row would measure
LSH's honest partial recall instead of the outputs-coincide
contract)."""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.gen_testdata import gen  # noqa: E402

DRIVER_SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def gen_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("gen") / "sf0.001"
    gen(0.001, str(out))
    return str(out)


@pytest.mark.skipif(
    not os.path.isdir(DRIVER_SF),
    reason="driver-shipped /root/testdata not present on this machine "
    "(the schema-parity pin only means something where the reference "
    "files exist — ADVICE r11)",
)
def test_schemas_match_driver_files(gen_dir):
    for t in TABLES:
        driver = pq.read_schema(os.path.join(DRIVER_SF, f"{t}.parquet"))
        ours = pq.read_schema(os.path.join(gen_dir, f"{t}.parquet"))
        assert driver.remove_metadata().equals(ours.remove_metadata()), t


def test_deterministic(gen_dir, tmp_path):
    out2 = tmp_path / "again"
    gen(0.001, str(out2))
    for t in ("documents", "events", "lineitem"):
        a = pq.read_table(os.path.join(gen_dir, f"{t}.parquet"))
        b = pq.read_table(os.path.join(str(out2), f"{t}.parquet"))
        assert a.equals(b), t


def test_planted_neardups_inside_lsh_recall_zone(gen_dir):
    # every pair at trigram-shingle J >= 0.5 must sit at J >= 0.88
    # (one replaced token in a >=60-token doc: J >= (L-5)/(L+1)) or be
    # an exact dup — otherwise the sf1 sweep's minhash rows would be
    # probabilistic coin flips instead of correctness checks
    import duckdb

    path = os.path.join(gen_dir, "documents.parquet")
    rows = duckdb.sql(
        f"""
        WITH toks AS (
          SELECT doc_id, string_split(text,' ') w FROM read_parquet('{path}')
        ), sh AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
            range(1,len(w)-1), i -> w[i]||' '||w[i+1]||' '||w[i+2]))) s
          FROM toks WHERE len(w)>=3
        ), sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
        inter AS (
          SELECT a.doc_id da, b.doc_id db, count(*) c
          FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id<b.doc_id GROUP BY 1,2
        )
        SELECT c/CAST(sa.n+sb.n-c AS DOUBLE) j
        FROM inter JOIN sizes sa ON da=sa.doc_id JOIN sizes sb ON db=sb.doc_id
        WHERE c/CAST(sa.n+sb.n-c AS DOUBLE) >= 0.5
        """
    ).fetchall()
    assert rows, "generator must plant at least one qualifying near-dup pair"
    assert all(j >= 0.88 for (j,) in rows), sorted(j for (j,) in rows)[:5]
