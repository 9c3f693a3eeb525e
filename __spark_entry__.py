"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC replay (events change feed -> 3-epoch
epoch-fenced copy-on-write MERGE -> final table state) at sf0.001.
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the training-data pipeline operators (dedup families,
similarity search, text analysis, multimodal plumbing); oracles live next to
the Spark formulations in ``etl_spark/queries.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_spark.queries import oracle_sqls, query_fns


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full CDC replay through the
    epoch-fenced MERGE path (including an idempotent re-apply)."""
    return query_fns()["cdc_replay_merge"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return query_fns()


def oracle_sql() -> dict[str, str]:
    return oracle_sqls()
