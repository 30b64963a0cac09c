import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))


@pytest.fixture(scope="session")
def spark():
    from unfurl_spark.operators.pipeline import session

    s = session(app="unfurl_spark_tests", master="local[8]",
                shuffle_partitions=8)
    yield s
    s.stop()
