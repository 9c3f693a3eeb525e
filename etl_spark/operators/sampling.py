"""Deterministic sampling for training-data mixture construction.

A corpus pipeline weights sources into a training mixture ("keep 40% of
web, 90% of books, ..."). Spark's ``sample``/``sampleBy`` are seeded but
partition-layout-dependent, which breaks exactly-once replay (a retried
stage could sample a different subset) and cross-engine verification. These
operators instead decide membership by a pure hash of the ROW KEY:

    keep(row)  <=>  md5_int(key) mod 1000 < rate_milli(stratum)

- deterministic under retries, repartitioning, and replay (north-rule
  exactly-once discipline extends to sampling decisions);
- reproducible in ANSI SQL (``('0x'||substr(md5(k),1,7))::bigint``), so the
  driver's DuckDB oracle can verify the exact membership;
- a narrow codegen'd filter: no shuffle, pushes below joins when the key
  survives, and composes with every other operator.

The rate table is a plain dict (stratum -> keep-rate in milli-units); at
100 TB it broadcasts as a literal CASE chain — never a join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from etl_spark.functions.text import md5_int

SAMPLE_BUCKETS = 1000


def hash_bucket(col: Column | str, buckets: int = SAMPLE_BUCKETS) -> Column:
    """Stable per-key bucket in [0, buckets): md5-derived, engine-portable.
    The key is cast to its string form first so any key type (bigint ids,
    uuids) hashes identically in Spark and the SQL oracle
    (``md5(CAST(k AS VARCHAR))``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(md5_int(c.cast("string"), 7), F.lit(buckets))


def hash_sample(df: DataFrame, rate_milli: int, key_col: str = "doc_id") -> DataFrame:
    """Keep a deterministic ~rate_milli/1000 fraction of rows by key hash."""
    return df.where(hash_bucket(key_col) < rate_milli)


def sample_by_rates(
    df: DataFrame,
    rates: dict[str, int],
    strat_col: str = "source",
    key_col: str = "doc_id",
    default_milli: int = 0,
) -> DataFrame:
    """Stratified deterministic sampling (the ``sampleBy`` analog): each
    stratum keeps its own milli-rate; strata absent from ``rates`` keep
    ``default_milli``. Membership is a pure key-hash decision (see module
    docstring), so two replays — or Spark and the SQL oracle — select the
    IDENTICAL row set, not merely the same expected fraction."""
    expr: Column = F.lit(default_milli)
    for k, v in sorted(rates.items(), reverse=True):
        expr = F.when(F.col(strat_col) == k, F.lit(v)).otherwise(expr)
    return df.where(hash_bucket(key_col) < expr)
