"""Deterministic mixture sampling (operators/sampling.py): membership is a
pure key-hash decision — identical across replays, repartitionings, and
engines — unlike seeded sample()/sampleBy(), which depend on partition
layout."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_spark.operators.sampling import hash_bucket, hash_sample, sample_by_rates


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.format_string("d%06d", F.col("id")).alias("doc_id"),
        F.element_at(
            F.array(F.lit("web"), F.lit("books"), F.lit("news")), (F.col("id") % 3 + 1).cast("int")
        ).alias("source"),
    )


def test_hash_sample_is_replay_stable_and_layout_independent(spark):
    docs = _docs(spark)
    a = {r["doc_id"] for r in hash_sample(docs, 300).collect()}
    b = {r["doc_id"] for r in hash_sample(docs.repartition(13), 300).collect()}
    assert a == b and a  # identical membership regardless of partitioning
    # monotone: a lower rate selects a strict subset
    c = {r["doc_id"] for r in hash_sample(docs, 100).collect()}
    assert c < a
    # rate is approximately honored (hash uniformity, 2000 keys)
    assert 0.25 < len(a) / 2000 < 0.35


def test_sample_by_rates_stratified(spark):
    docs = _docs(spark)
    rates = {"web": 200, "books": 900, "news": 0}
    out = sample_by_rates(docs, rates)
    got = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert "news" not in got  # rate 0 drops the stratum entirely
    n_web = docs.where("source = 'web'").count()
    n_books = docs.where("source = 'books'").count()
    assert 0.13 < got["web"] / n_web < 0.27
    assert 0.84 < got["books"] / n_books < 0.96
    # per-stratum membership equals the single-stratum operator's choice
    web_only = {r["doc_id"] for r in hash_sample(docs.where("source = 'web'"), 200).collect()}
    assert {r["doc_id"] for r in out.where("source = 'web'").collect()} == web_only


def test_sample_plan_is_narrow_filter(spark):
    docs = _docs(spark)
    plan = hash_sample(docs, 500)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure filter: no shuffle
    assert "BatchEvalPython" not in plan


def test_hash_bucket_range(spark):
    docs = _docs(spark, 500)
    mm = docs.select(
        F.min(hash_bucket("doc_id")).alias("lo"), F.max(hash_bucket("doc_id")).alias("hi")
    ).collect()[0]
    assert 0 <= mm["lo"] and mm["hi"] < 1000
