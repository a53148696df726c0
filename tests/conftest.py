from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# Workers spawn fresh interpreters; they need the repo root and tests dir
# on PYTHONPATH to unpickle closures defined in test modules.
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in [REPO, os.path.join(REPO, "tests"), os.environ.get("PYTHONPATH")] if p
)
sys.path.insert(0, os.path.join(REPO, "tests"))

from maillogsentinel_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="mls-tests", shuffle_partitions=8)
    yield s
