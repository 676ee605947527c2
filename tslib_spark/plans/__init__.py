from tslib_spark.plans.lineage import CheckpointStore

__all__ = ["CheckpointStore"]
