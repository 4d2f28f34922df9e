import pytest

from vstream_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("vstream-tests", extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s
    s.stop()
