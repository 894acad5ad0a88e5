import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from rdf_indexer_spark.session import get_spark

    s = get_spark(cpus=4, app_name="rdf-indexer-tests", shuffle_partitions=4)
    yield s


REFERENCE_TEST_DATA = "/root/reference/test_data"
