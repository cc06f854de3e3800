from __future__ import annotations

import os

import pytest

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_DIR", "/root/testdata/sf0.01")
REFERENCE_CORPUS = "/root/reference/files/inputs"


@pytest.fixture(scope="session")
def spark():
    from mapreducewordcount_spark.session import get_spark

    s = get_spark("mapreducewordcount_spark-tests")
    yield s
