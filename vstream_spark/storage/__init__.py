from vstream_spark.storage.segments import SegmentStore

__all__ = ["SegmentStore"]
