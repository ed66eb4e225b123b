import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mmore_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("mmore_spark-tests", master="local[8]",
                  extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s


@pytest.fixture(scope="session")
def small_docs():
    from mmore_spark.corpus.generator import generate_local

    return generate_local(120, seed=42)


@pytest.fixture(scope="session")
def small_docs_df(spark):
    from mmore_spark.corpus.generator import generate_documents

    return generate_documents(spark, 120, seed=42, partitions=4).cache()
