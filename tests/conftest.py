from __future__ import annotations

import pytest

from etl_pipeline_aws_spark.session import session_builder

SF_DIR = "/root/testdata/sf0.01"
SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = (
        session_builder("etl_pipeline_aws_spark-tests", master="local[8]", shuffle_partitions=8)
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()
