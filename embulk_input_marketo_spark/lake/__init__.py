from embulk_input_marketo_spark.lake.table import LakeTable
from embulk_input_marketo_spark.lake.merge import merge_batch, MergeResult

__all__ = ["LakeTable", "merge_batch", "MergeResult"]
