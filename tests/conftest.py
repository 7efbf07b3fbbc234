import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gaia_spark.session import get_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_session(
        master="local[4]",
        app_name="gaia_spark_tests",
        confs={"spark.sql.shuffle.partitions": "8", "spark.driver.memory": "4g"},
    )
    yield s
