"""Test configuration: CPU backend with 8 virtual devices and float64.

Correctness gates run in f64 on CPU (the reference is entirely double
precision); the 8 fake devices let the shard_map/ppermute distributed paths
be exercised without a TPU pod, per SURVEY.md section 4.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

# The environment may pre-import jax with JAX_PLATFORMS pointing at a TPU
# backend (sitecustomize); jax.config.update still wins as long as no backend
# has been initialized, which is the case at conftest import time.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

# the suite is compile-bound (this box has 2 cores); the persistent cache is
# keyed per-host CPU signature (utils/cache.py) so reruns drop from ~10 min
# to ~2. `pytest -n 2` (xdist) also works for another ~2x.
from schwingermodel_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from schwingermodel_tpu.config import CGParams, HMCParams, LatticeParams  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


@pytest.fixture
def small_lattice():
    return LatticeParams(Nx=8, Nt=8, real_dtype="float64")


@pytest.fixture
def small_hmc():
    return HMCParams(beta=2.0, m0=0.1, md_steps=10, trajectory_length=1.0,
                     cg=CGParams(tol=1e-12, max_iter=10000))


def random_theta(rng, Nx, Nt, batch=()):
    return np.asarray(
        rng.uniform(-np.pi, np.pi, size=batch + (2, Nx, Nt)), dtype=np.float64
    )


def random_spinor(rng, Nx, Nt, batch=()):
    shape = batch + (2, Nx, Nt)
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
        np.complex128
    )
