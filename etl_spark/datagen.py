"""Deterministic synthetic binlog generator (FIXTURES.md §1, SURVEY.md §7.2 step 1).

The reference validated against live downloads and had no fixtures
(``/root/reference/Justfile:22`` empty test target); the new engine generates
its change feed itself, fully deterministically, **inside Spark**: every random
draw is ``xxhash64(seed, id, tag)`` of the event's logical position, so the
same parameters produce bit-identical feeds at any parallelism and any scale
(the 10^10-event design point needs generation to be distributed — no driver
RNG, no collect).

Feed semantics:
- ``(commit_lsn, op_seq)`` is a total order; pairs of events share an lsn so
  equal-lsn ties are exercised (tie broken only by op_seq).
- Delivery order != commit order for ``ooo_frac`` of events (bounded jitter),
  exercising out-of-order apply.
- ``dup_frac`` exact re-deliveries exercise idempotence.
- ``tombstone_frac`` deletes (null payload) exercise tombstones, including
  delete-then-reinsert at higher lsn.
- ``doc_id`` drawn with a power-law skew so a few keys are hot (salted-dedup
  path), controlled by ``skew``.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class BinlogSpec:
    n_events: int = 10_000
    n_keys: int = 1_000
    seed: int = 42
    skew: float = 2.0          # >1 => mass concentrates on low key ids (hot keys)
    ooo_frac: float = 0.10     # fraction delivered out of commit order
    ooo_window: int = 500      # max delivery displacement in events
    dup_frac: float = 0.05     # fraction re-delivered verbatim
    tombstone_frac: float = 0.05
    min_tokens: int = 4
    max_tokens: int = 64       # bench tier raises this toward 2048
    vocab: int = 32_000
    n_buckets: int = 16        # delivery-order file buckets (lsn_bucket=k dirs)
    include_lang: bool = False  # v2 evolved feed: adds nullable lang column
    lsn_offset: int = 0        # shift commit_lsn (v2 feed continues after v1)


def _u(col, seed: int, tag: int):
    """Deterministic uniform in [0,1) from an id column."""
    h = F.xxhash64(col, F.lit(seed), F.lit(tag))
    return (F.pmod(h, F.lit(1_000_000_007)).cast("double")) / 1_000_000_007.0


def generate_binlog(spark: SparkSession, spec: BinlogSpec) -> DataFrame:
    """Return the change feed as a DataFrame with a ``delivery_pos`` ordering
    column and an ``lsn_bucket`` partition column (drop both to get the pure
    FIXTURES.md §1 shape)."""
    s = spec
    df = spark.range(s.n_events).withColumnRenamed("id", "eid")

    # total order: two ops per commit_lsn => equal-lsn ties broken by op_seq
    df = df.withColumn("commit_lsn", (F.col("eid") / 2).cast("long") + 1 + s.lsn_offset)
    df = df.withColumn("op_seq", F.pmod(F.col("eid"), F.lit(2)).cast("int"))

    # skewed key draw: floor(n_keys * u^skew) biases toward low ids
    u_key = _u(F.col("eid"), s.seed, 1)
    key_id = F.floor(F.pow(u_key, F.lit(s.skew)) * s.n_keys).cast("long")
    df = df.withColumn("doc_id", F.concat(F.lit("doc_"), F.lpad(key_id.cast("string"), 8, "0")))

    # op: tombstone with prob tombstone_frac, else I/U split (same apply semantics)
    u_op = _u(F.col("eid"), s.seed, 2)
    df = df.withColumn(
        "op",
        F.when(u_op < s.tombstone_frac, F.lit("D"))
        .when(u_op < s.tombstone_frac + 0.3, F.lit("I"))
        .otherwise(F.lit("U")),
    )

    # payload: tokens deterministic in (doc_id, commit_lsn, op_seq)
    n_tok = (
        F.lit(s.min_tokens)
        + F.pmod(F.xxhash64(F.col("eid"), F.lit(s.seed), F.lit(3)), F.lit(s.max_tokens - s.min_tokens + 1))
    ).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(1), n_tok),
        lambda i: F.pmod(F.xxhash64(F.col("doc_id"), F.col("commit_lsn"), F.col("op_seq"), i), F.lit(s.vocab)).cast(
            "int"
        ),
    )
    src = F.element_at(
        F.array(F.lit("web"), F.lit("books"), F.lit("code"), F.lit("wiki")),
        (F.pmod(F.xxhash64(F.col("eid"), F.lit(s.seed), F.lit(4)), F.lit(4)) + 1).cast("int"),
    )
    is_del = F.col("op") == "D"
    df = df.withColumn("tokens", F.when(is_del, F.lit(None)).otherwise(tokens))
    df = df.withColumn("n_tok", F.when(is_del, F.lit(None)).otherwise(F.size(F.col("tokens"))).cast("int"))
    df = df.withColumn("source", F.when(is_del, F.lit(None)).otherwise(src))
    if s.include_lang:
        lang = F.element_at(
            F.array(F.lit("en"), F.lit("es"), F.lit("de"), F.lit("fr"), F.lit("zh")),
            (F.pmod(F.xxhash64(F.col("eid"), F.lit(s.seed), F.lit(8)), F.lit(5)) + 1).cast("int"),
        )
        df = df.withColumn("lang", F.when(is_del, F.lit(None)).otherwise(lang))

    # delivery order: bounded jitter for ooo_frac of events
    u_ooo = _u(F.col("eid"), s.seed, 5)
    jitter = (F.pmod(F.xxhash64(F.col("eid"), F.lit(s.seed), F.lit(6)), F.lit(2 * s.ooo_window + 1)) - s.ooo_window)
    df = df.withColumn(
        "delivery_pos",
        F.when(u_ooo < s.ooo_frac, F.greatest(F.lit(0), F.col("eid") + jitter)).otherwise(F.col("eid")).cast("long"),
    )

    # exact duplicate re-deliveries, shipped one window later
    u_dup = _u(F.col("eid"), s.seed, 7)
    dups = df.where(u_dup < s.dup_frac).withColumn(
        "delivery_pos", F.col("delivery_pos") + F.lit(s.ooo_window)
    )
    df = df.unionByName(dups)

    bucket_span = max(1, (s.n_events + s.ooo_window) // s.n_buckets + 1)
    df = df.withColumn("lsn_bucket", (F.col("delivery_pos") / bucket_span).cast("int"))
    return df.drop("eid")


def write_binlog(spark: SparkSession, spec: BinlogSpec, path: str) -> None:
    """Materialize the feed as ``path/lsn_bucket=k/part-*.parquet`` so the
    streaming tail (and partition pruning) see lsn-ordered file chunks."""
    df = generate_binlog(spark, spec)
    (
        df.repartition(max(2, spec.n_buckets), "lsn_bucket")
        .sortWithinPartitions("delivery_pos")
        .drop("delivery_pos")
        .write.mode("overwrite")
        .partitionBy("lsn_bucket")
        .parquet(path)
    )


def write_binlog_json(
    spark: SparkSession, spec: BinlogSpec, path: str, envelope: str = "debezium"
) -> None:
    """Materialize the feed as ``path/lsn_bucket=k/part-*.txt`` JSON lines —
    the wire shape a Debezium-style connector (``envelope='debezium'``) or a
    flat change-row producer (``envelope='flat'``) would land. Consumed by
    ``run_stream_replay(feed_format='debezium-json' | 'json')``."""
    from etl_spark.schema import BINLOG_SCHEMA
    from etl_spark.streaming.formats import debezium_value_col

    if envelope not in ("debezium", "flat"):
        raise ValueError(f"unknown envelope {envelope!r}")
    ordered = (
        generate_binlog(spark, spec)
        .repartition(max(2, spec.n_buckets), "lsn_bucket")
        .sortWithinPartitions("delivery_pos")
    )
    if envelope == "debezium":
        value_df = ordered.withColumn("value", debezium_value_col())
    else:
        value_df = ordered.withColumn(
            "value",
            F.to_json(F.struct(*[F.col(f.name) for f in BINLOG_SCHEMA.fields])),
        )
    (
        value_df.select("value", "lsn_bucket")
        .write.mode("overwrite")
        .partitionBy("lsn_bucket")
        .text(path)
    )
