import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_RESOURCES = "/root/reference/src/test/resources"


def load_reference_model(name: str) -> dict:
    """Load a fixture entity model JSON from the reference test resources
    (read-only; data only, no code)."""
    with open(os.path.join(REFERENCE_RESOURCES, name)) as fh:
        return json.load(fh)


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("zentity-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    yield spark
    spark.stop()
