import numpy as np
import pytest


@pytest.fixture(scope="session")
def spark():
    from pyradiomics_spark.session import get_spark

    s = get_spark(app_name="pytest", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def rng():
    return np.random.default_rng(42)
