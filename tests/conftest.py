from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

SF_DIR = os.environ["SPARK_GRAFT_SF_DIR"]


@pytest.fixture(scope="session")
def spark():
    from verdictdb_spark.session import get_spark

    s = get_spark("verdictdb-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def files_df(spark):
    from verdictdb_spark.datagen import code_files

    df = code_files(spark, rows=20_000, n_repos=40, partitions=8, seed=42)
    df = df.cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
