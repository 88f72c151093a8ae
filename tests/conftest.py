from __future__ import annotations

import pytest

from data_pipeline_evolution_batch_streaming_apache_flink_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dpe-tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
