from __future__ import annotations

import os

import pytest

# executor python workers need the repo + tests dir importable (for
# functions shipped via cloudpickle from test modules)
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_TESTS = os.path.join(_REPO, "tests")
os.environ["PYTHONPATH"] = (
    f"{_REPO}:{_TESTS}:" + os.environ.get("PYTHONPATH", "")
)

from etl_python_azure_spark.session import get_spark  # noqa: E402

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="etl_python_azure_spark-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
