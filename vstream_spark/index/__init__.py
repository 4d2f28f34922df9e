from vstream_spark.index.hnsw import HnswIndex

__all__ = ["HnswIndex"]
