from __future__ import annotations

import pytest

from lash_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="lash_spark_tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_pages(spark):
    from lash_spark.synth import generate_pages

    return generate_pages(spark, 600, seed=42, partitions=4).cache()
