from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "sf01_gate: rotating sf0.1 oracle spot-gate (scale-dependent semantics)",
    )


@pytest.fixture(scope="session")
def spark():
    from remote_shuffle_spark import EngineConfig, get_session

    session = get_session(EngineConfig(app_name="remote_shuffle_spark_tests"))
    yield session


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_correct() -> str:
    return SF_CORRECT
