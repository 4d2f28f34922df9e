from vstream_spark.sources.tables import (
    TABLES,
    load_table,
    register_views,
    vectors_fixture,
    queries_fixture,
)
from vstream_spark.sources.fvecs import read_fvecs, read_bvecs, read_ivecs

__all__ = [
    "TABLES",
    "load_table",
    "register_views",
    "vectors_fixture",
    "queries_fixture",
    "read_fvecs",
    "read_bvecs",
    "read_ivecs",
]
