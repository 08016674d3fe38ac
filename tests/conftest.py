import pytest

from docling_metrics_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="dms-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.default.parallelism": "8"},
    )
    yield s
    s.stop()
