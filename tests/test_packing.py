"""Sequence packing (operators/packing.py): hand case, sharded ==
global-per-shard, chunk-cover properties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chainalytic_framework_spark.operators.packing import pack_chunks


def test_hand_case(spark):
    rows = [(1, 300), (2, 300), (3, 1100), (4, 24), (5, 0)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = {r["doc_id"]: r for r in pack_chunks(df, seq_len=512).collect()}
    assert 5 not in out  # zero-token doc occupies no chunk
    assert (out[1]["start_off"], out[1]["first_chunk"], out[1]["n_chunks"]) == (0, 0, 1)
    # doc2: tokens 300..599 -> chunks 0..1
    assert (out[2]["start_off"], out[2]["first_chunk"], out[2]["n_chunks"]) == (300, 0, 2)
    # doc3: tokens 600..1699 -> chunks 1..3
    assert (out[3]["start_off"], out[3]["first_chunk"], out[3]["n_chunks"]) == (600, 1, 3)
    # doc4: tokens 1700..1723 -> chunk 3
    assert (out[4]["start_off"], out[4]["first_chunk"], out[4]["n_chunks"]) == (1700, 3, 1)


def test_sharded_equals_global_per_shard(spark):
    rows = [(s, i, 37 + 13 * ((i * 7 + s) % 29)) for s in range(3) for i in range(200)]
    df = spark.createDataFrame(rows, "shard int, doc_id long, n_tokens long")
    sharded = pack_chunks(df, 128, shard_col="shard")
    for s in range(3):
        g = pack_chunks(df.where(F.col("shard") == s).drop("shard"), 128)
        a = sharded.where(F.col("shard") == s).drop("shard")
        assert a.exceptAll(g).count() == 0 and g.exceptAll(a).count() == 0


def test_chunk_cover_properties(spark):
    rows = [(i, 1 + (i * 131) % 997) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_chunks(df, 256).orderBy("doc_id").collect()
    # offsets are the exclusive prefix sum; chunks tile the stream
    run = 0
    for r in out:
        assert r["start_off"] == run
        last_chunk = (r["start_off"] + r["n_tokens"] - 1) // 256
        assert r["first_chunk"] == r["start_off"] // 256
        assert r["n_chunks"] == last_chunk - r["first_chunk"] + 1
        run += r["n_tokens"]


def test_rejects_bad_seq_len(spark):
    df = spark.createDataFrame([(1, 5)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError):
        pack_chunks(df, 0)


def test_packing_property_vs_python_reference(spark):
    """Randomized: pack_chunks must equal the trivial python prefix-sum
    reference for arbitrary token-count multisets and seq lens."""
    import random

    rng = random.Random(17)
    for trial in range(3):
        seq_len = rng.choice([1, 7, 256, 1000])
        rows = [(i, rng.choice([0, 1, 3, seq_len - 1 if seq_len > 1 else 1,
                                seq_len, seq_len + 1, 5000]))
                for i in range(rng.randint(1, 120))]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        got = {r["doc_id"]: (r["start_off"], r["first_chunk"], r["n_chunks"])
               for r in pack_chunks(df, seq_len).collect()}
        run = 0
        exp = {}
        for i, n in rows:  # doc_id order == insertion order here
            if n <= 0:
                continue
            first = run // seq_len
            last = (run + n - 1) // seq_len
            exp[i] = (run, first, last - first + 1)
            run += n
        assert got == exp, (seq_len, trial)
