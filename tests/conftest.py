import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("cocrawler_spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        # many engine runs share this session; reclaim shuffle/broadcast
        # state promptly instead of at the default 30min cleaner tick
        .config("spark.cleaner.periodicGC.interval", "1min")
        # deep per-wave lineage makes AQE's per-stage plan-string
        # generation (onUpdatePlan -> explainString) a driver-serial CPU
        # hog; nothing in the tests consumes those strings
        .config("spark.sql.maxPlanStringLength", "1024")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def tiny_web():
    from cocrawler_spark.synth import generate

    return generate("tiny", seed=42)


@pytest.fixture(scope="session")
def small_web():
    from cocrawler_spark.synth import generate

    return generate("small", seed=42)


@pytest.fixture(scope="session")
def synth_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("synthdata"))
