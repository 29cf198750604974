"""TPU-resident test tier (VERDICT r2 item 4).

Run SEPARATELY from the default suite:  python -m pytest tests_tpu -q
The default tier (tests/) pins the process to CPU at conftest import, so
the two tiers cannot share one pytest invocation. Everything here executes
on the real tunneled chip and is skipped wholesale on any other backend.
A captured run log is committed as docs/TPU_TESTS_r03.log.
"""

import numpy as np
import pytest

import jax

from schwingermodel_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

ON_TPU = jax.default_backend() == "tpu"


def pytest_collection_modifyitems(config, items):
    if not ON_TPU:
        skip = pytest.mark.skip(reason="TPU-resident tier: backend is not tpu")
        for it in items:
            it.add_marker(skip)
    for it in items:
        it.add_marker(pytest.mark.tpu)


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: runs on the real TPU chip")


@pytest.fixture
def rng():
    return np.random.default_rng(2024)
