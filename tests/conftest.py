from __future__ import annotations

import pytest

from py_image_dedup_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="py-image-dedup-spark-tests",
        master="local[8]",
        shuffle_partitions=8,
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
