from etl_spark.table.table import LakeTable, TableCommitError

__all__ = ["LakeTable", "TableCommitError"]
