from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deduplicator_go_spark.fixtures.webtext import generate, to_spark
from deduplicator_go_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def corpus():
    return generate(n_docs=600, seed=42)


@pytest.fixture(scope="session")
def docs(spark, corpus):
    df = to_spark(spark, corpus).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def load(spark, sf_dir: str, name: str):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
