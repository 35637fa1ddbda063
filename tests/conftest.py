import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    from jsonschema_spark.session import apply_engine_confs

    spark = (
        apply_engine_confs(SparkSession.builder.master("local[4]"))
        .appName("jsonschema_spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        # 8g: the suite is ~750 tests in ONE JVM (~6k stages); at 4g the
        # accumulated codegen/plan/broadcast state OOMed the tail of the run
        # while every file passed in isolation (observed round 4, session 4)
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    yield spark
    spark.stop()
