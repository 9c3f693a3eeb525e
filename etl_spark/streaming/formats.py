"""Feed-envelope formats for the change-stream tail.

Real CDC feeds rarely arrive as clean parquet: the dominant wire shapes are
Debezium-style JSON envelopes (``{"op": "c|u|d", "before": ..., "after": ...,
"source": {"lsn": ...}}``) and flat JSON-lines change rows. This module maps
both onto the engine's canonical feed schema (schema.BINLOG_SCHEMA:
``doc_id, commit_lsn, op_seq, op, <payload>``) with PURE Catalyst expressions
— ``from_json`` + projections, no Python in the row path — so the same
epoch-fenced merge applies regardless of the wire format.

Reference analog: the extract stage's format adapters (CSV/GeoTIFF container
handling in ``src/common/extract/*.scala``) — here the adapters are logical
projections the optimizer can see through, not imperative readers.

Spark-first notes for 100 TB:
- ``from_json`` with an explicit schema is JVM-side and codegen'd; the JSON
  text column is parsed once, then pruned to the referenced fields.
- The JSON file-streaming source (``spark.readStream.text``) preserves the
  file-discovery/offset-log semantics of the parquet tail — checkpoint
  resume, maxFilesPerTrigger batching, and the fence-based exactly-once
  apply are format-independent.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from etl_spark.schema import BINLOG_SCHEMA, relax_nullability

# Debezium op codes -> engine ops. Debezium 'r' (snapshot read) applies as an
# upsert: replaying a snapshot into an existing table must be idempotent,
# which LWW gives for free (the snapshot rows carry their source lsn).
_DEBEZIUM_OP = {"c": "I", "u": "U", "d": "D", "r": "U"}


def payload_fields(feed_schema: StructType = BINLOG_SCHEMA) -> list[StructField]:
    """The non-key, non-order columns of the canonical feed schema."""
    return [f for f in feed_schema.fields if f.name not in ("doc_id", "commit_lsn", "op_seq", "op")]


def debezium_envelope_schema(feed_schema: StructType = BINLOG_SCHEMA) -> StructType:
    """The JSON envelope a Debezium-style connector emits for this table:
    ``before``/``after`` rows carry the key + payload, ``source.lsn`` is the
    WAL position, ``source.seq`` disambiguates same-lsn ops."""
    row = StructType(
        [StructField("doc_id", StringType(), True)] + [StructField(f.name, f.dataType, True) for f in payload_fields(feed_schema)]
    )
    return StructType(
        [
            StructField("op", StringType(), True),
            StructField("before", row, True),
            StructField("after", row, True),
            StructField(
                "source",
                StructType(
                    [
                        StructField("lsn", LongType(), True),
                        StructField("seq", IntegerType(), True),
                    ]
                ),
                True,
            ),
        ]
    )


def normalize_debezium(
    raw: DataFrame, json_col: str = "value", feed_schema: StructType = BINLOG_SCHEMA
) -> DataFrame:
    """Debezium-style JSON envelope text -> canonical feed rows.

    Pure Catalyst: ONE ``from_json`` per input row, then projections. The
    key/payload come from ``after`` for upserts and ``before`` for deletes
    (a Debezium delete's ``after`` is null); payload columns of deletes are
    nulled to the engine's tombstone shape. Rows whose envelope fails to
    parse (nulls from from_json) or carry an unknown op are DROPPED — a
    production tail would route them to a dead-letter sink; the filter
    keeps the semantics explicit either way."""
    env = F.from_json(F.col(json_col), debezium_envelope_schema(feed_schema))
    row = F.when(env["op"] == "d", env["before"]).otherwise(env["after"])
    op = F.create_map(
        *[x for k, v in _DEBEZIUM_OP.items() for x in (F.lit(k), F.lit(v))]
    )[env["op"]]
    is_del = op == "D"
    by_name = {
        "doc_id": row["doc_id"].alias("doc_id"),
        "commit_lsn": env["source"]["lsn"].alias("commit_lsn"),
        "op_seq": F.coalesce(env["source"]["seq"], F.lit(0)).alias("op_seq"),
        "op": op.alias("op"),
    }
    for f in payload_fields(feed_schema):
        # relax containsNull/nullable: a JSON-parsed array is nullable-element
        # typed, and Spark refuses array<int> -> array<int containsNull=false>
        by_name[f.name] = (
            F.when(is_del, F.lit(None)).otherwise(row[f.name]).cast(relax_nullability(f.dataType)).alias(f.name)
        )
    return (
        raw.select(*[by_name[f.name] for f in feed_schema.fields])  # canonical column order
        .where(F.col("op").isNotNull() & F.col("doc_id").isNotNull() & F.col("commit_lsn").isNotNull())
    )


def normalize_flat_json(
    raw: DataFrame, json_col: str = "value", feed_schema: StructType = BINLOG_SCHEMA
) -> DataFrame:
    """Flat JSON-lines change rows (the canonical feed columns as one JSON
    object per line) -> canonical feed rows. One from_json + unpack."""
    parsed = F.from_json(F.col(json_col), feed_schema)
    cols = [parsed[f.name].alias(f.name) for f in feed_schema.fields]
    return (
        raw.select(*cols)
        .where(F.col("op").isNotNull() & F.col("doc_id").isNotNull() & F.col("commit_lsn").isNotNull())
    )


def debezium_value_col(feed_schema: StructType = BINLOG_SCHEMA) -> Column:
    """Debezium-envelope JSON string Column over the canonical feed columns.
    Deletes carry ``before`` and a null ``after``; inserts/updates the
    reverse. Round-trips exactly through :func:`normalize_debezium`."""
    pf = [f.name for f in payload_fields(feed_schema)]
    row = F.struct(F.col("doc_id"), *[F.col(c) for c in pf])
    is_del = F.col("op") == "D"
    op = F.when(is_del, "d").when(F.col("op") == "I", "c").otherwise("u")
    env = F.struct(
        op.alias("op"),
        F.when(is_del, row).alias("before"),
        F.when(~is_del, row).alias("after"),
        F.struct(F.col("commit_lsn").alias("lsn"), F.col("op_seq").alias("seq")).alias("source"),
    )
    return F.to_json(env)


def to_debezium_json(feed: DataFrame, feed_schema: StructType = BINLOG_SCHEMA) -> DataFrame:
    """Inverse of :func:`normalize_debezium` (test/datagen side): canonical
    feed rows -> one Debezium-envelope JSON string per row in ``value``."""
    return feed.select(debezium_value_col(feed_schema).alias("value"))
