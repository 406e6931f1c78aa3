from __future__ import annotations

import pytest

from kafka_streams_demo_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="kafka-streams-demo-spark-tests")
    yield s
    s.stop()
