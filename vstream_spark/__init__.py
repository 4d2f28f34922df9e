"""vstream-spark: a PySpark-native engine with the query and data-processing
capabilities of ZJU-DAILY/VStream (streaming top-k vector search over mutable
vector collections with TTL freshness), rebuilt Spark-first.

Layout:
  session       SparkSession factory tuned for the engine
  config        engine configuration objects (mirrors reference Parameters.java surface)
  functions/    scalar/array expression library (distances, text analysis, hashing)
  operators/    DataFrame-composable operators (kNN, merge, dedup, similarity join)
  partitioners/ exchange operators (LSH, space-filling curves, k-means, simple)
  sources/      readers (fvecs/bvecs decode, testdata fixtures)
  streaming/    Structured Streaming pipelines
  plans/        plan inspection helpers
"""

from vstream_spark.config import EngineConf, PartitionerConf, VectorIndexConf
from vstream_spark.engine import VStreamEngine
from vstream_spark.session import get_spark

__all__ = [
    "EngineConf",
    "PartitionerConf",
    "VStreamEngine",
    "VectorIndexConf",
    "get_spark",
]
__version__ = "0.1.0"
