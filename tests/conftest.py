import pytest

from named_entity_discovery_and_linking_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ndl-tests", master="local[4]", shuffle_partitions=8)
    yield s
