from vstream_spark.partitioners.dispatch import partition_data, partition_queries

__all__ = ["partition_data", "partition_queries"]
