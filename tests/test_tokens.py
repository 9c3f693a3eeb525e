"""Token-transform library: values vs pandas oracles + the vectorization gate
(BASELINE.md "UDF discipline": no BatchEvalPython in any engine plan)."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pytest

from etl_spark.functions.tokens import (
    append_eos,
    assert_vectorized_plan,
    chunk_for_training,
    clamp_vocab,
    drop_token,
    recount,
    token_stats,
    truncate_tokens,
)

ROWS = [
    ("a", list(range(10))),
    ("b", [5, 99999, 3, -1, 7]),
    ("c", list(range(25))),
    ("d", [1]),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id string, tokens array<int>").cache()


def test_catalyst_transforms(spark, docs):
    out = docs.select(
        "doc_id",
        truncate_tokens("tokens", 4).alias("trunc"),
        append_eos("tokens", eos_id=2, max_len=6).alias("eos"),
        recount("tokens").alias("n"),
        drop_token("tokens", 3).alias("no3"),
        clamp_vocab("tokens", vocab=100, unk_id=0).alias("clamped"),
    )
    assert_vectorized_plan(out)
    got = {r["doc_id"]: r for r in out.collect()}
    assert got["a"]["trunc"] == list(range(4))
    assert got["a"]["eos"] == [0, 1, 2, 3, 4] + [2]
    assert got["c"]["n"] == 25
    assert got["b"]["no3"] == [5, 99999, -1, 7]
    assert got["b"]["clamped"] == [5, 0, 3, 0, 7]
    assert got["d"]["eos"] == [1, 2]


def test_token_stats(spark, docs):
    r = token_stats(docs).collect()[0]
    assert r["n_seq"] == 4
    assert r["total_tokens"] == 10 + 5 + 25 + 1
    assert r["max_tokens"] == 25


def test_chunk_for_training_matches_oracle(spark, docs):
    out = chunk_for_training(docs, seq_len=8, stride=8)
    assert_vectorized_plan(out)
    got = out.toPandas().sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)

    exp_rows = []
    for doc_id, toks in ROWS:
        if len(toks) <= 8:
            exp_rows.append((doc_id, 0, toks, len(toks)))
        else:
            for cid, start in enumerate(range(0, len(toks), 8)):
                piece = toks[start : start + 8]
                if piece:
                    exp_rows.append((doc_id, cid, piece, len(piece)))
    exp = pd.DataFrame(exp_rows, columns=["doc_id", "chunk_id", "tokens", "n_tok"]).sort_values(
        ["doc_id", "chunk_id"]
    ).reset_index(drop=True)
    assert len(got) == len(exp)
    for i in range(len(exp)):
        assert got.iloc[i]["doc_id"] == exp.iloc[i]["doc_id"]
        assert list(got.iloc[i]["tokens"]) == list(exp.iloc[i]["tokens"])


def test_chunk_overlapping_stride(spark, docs):
    out = chunk_for_training(docs.where("doc_id = 'c'"), seq_len=10, stride=5).toPandas()
    chunks = [list(t) for t in out.sort_values("chunk_id")["tokens"]]
    assert chunks[0] == list(range(10))
    assert chunks[1] == list(range(5, 15))
    assert chunks[-1][-1] == 24


def test_vectorization_gate_catches_row_udf(spark, docs):
    from pyspark.sql.functions import udf

    bad = udf(lambda xs: len(xs), "int")
    df = docs.select(bad("tokens").alias("n"))
    with pytest.raises(AssertionError, match="BatchEvalPython"):
        assert_vectorized_plan(df)


def test_engine_plans_are_vectorized(spark, tmp_table_dir):
    """The whole merge pipeline must stay JVM-side (zero Python eval nodes)."""
    from etl_spark.datagen import BinlogSpec, generate_binlog
    from etl_spark.operators.dedup import lww_dedup, lww_dedup_salted

    feed = generate_binlog(spark, BinlogSpec(n_events=200, n_keys=20, seed=3)).drop(
        "delivery_pos", "lsn_bucket"
    )
    assert_vectorized_plan(feed)
    assert_vectorized_plan(lww_dedup(feed))
    assert_vectorized_plan(lww_dedup_salted(feed))
