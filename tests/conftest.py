import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.session.timeZone", "UTC")
         .appName("nvtabular-spark-tests").getOrCreate())
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def author_df(spark):
    """Reference test_categorify.py:163-170 frame."""
    return spark.createDataFrame(pd.DataFrame({
        "Author": ["User_A", "User_E", "User_B", "User_C"],
        "Engaging User": ["User_B", "User_B", "User_A", "User_D"],
        "Post": [1, 2, 3, 4],
    }))


@pytest.fixture(scope="session")
def list_df(spark):
    """Reference test_categorify.py:128-135 frame (multi-hot)."""
    return spark.createDataFrame(pd.DataFrame({
        "Authors": [["User_A"], ["User_A", "User_E"],
                    ["User_B", "User_C"], ["User_C"]],
        "Post": [1, 2, 3, 4],
    }))


@pytest.fixture(scope="session")
def timeseries_df(spark):
    """Reference conftest.py:120-198-style deterministic timeseries."""
    import numpy as np
    rng = np.random.RandomState(42)
    n = 1000
    names = [f"name_{i}" for i in range(26)]
    pdf = pd.DataFrame({
        "id": rng.randint(0, 50, n).astype("int64"),
        "ts": pd.date_range("2000-01-01", periods=n, freq="60s"),
        "name-string": rng.choice(names, n),
        "label": rng.randint(0, 2, n).astype("int64"),
        "x": rng.randn(n),
        "y": rng.randn(n),
        "z": rng.randn(n),
    })
    for c in ("x", "y", "z"):
        pdf.loc[rng.choice(n, 2, replace=False), c] = None
    return spark.createDataFrame(pdf)


@pytest.fixture(scope="session")
def sf_dir():
    return TESTDATA


def collect_sorted(df, by):
    return df.orderBy(by).toPandas()
