"""Cross-algorithm validation: independent NumPy Metropolis vs the
framework's quenched HMC vs the exact 2D U(1) plaquette.

The reference's own validation methodology (HMC_doc.pdf Fig. 1: HMC vs a
separate Metropolis code, average plaquette vs beta; README.md:60-66) --
reproduced here with a fully independent sampler
(schwingermodel_tpu/tools/metropolis.py: plain NumPy, own RNG, no shared
code with the JAX stack) plus the exact analytic anchor neither code has.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from schwingermodel_tpu.config import CGParams, HMCParams, LatticeParams
from schwingermodel_tpu.hmc import sampler
from schwingermodel_tpu.models.schwinger import SchwingerModel
from schwingermodel_tpu.tools import metropolis as mp
from schwingermodel_tpu.utils import prng


def test_exact_plaquette_quadrature():
    """The quadrature Bessel ratio matches known I1/I0 values."""
    assert abs(mp.exact_plaquette(2.0) - 0.697775) < 1e-5
    assert abs(mp.exact_plaquette(1.0) - 0.446390) < 1e-5


def test_metropolis_sweep_preserves_shapes(rng):
    theta = rng.uniform(-np.pi, np.pi, size=(2, 8, 8))
    acc = mp.sweep(theta, 2.0, np.random.default_rng(0))
    assert theta.shape == (2, 8, 8)
    assert 0.0 < acc <= 1.0


@pytest.mark.slow
@pytest.mark.parametrize("beta", [1.0, 3.0])
def test_metropolis_vs_quenched_hmc_vs_exact(beta):
    """Three-way agreement at 2-3 sigma: independent Metropolis, quenched
    HMC, and the exact I1(beta)/I0(beta)."""
    # independent NumPy Metropolis
    ep_m, err_m, _ = mp.run(8, 8, beta, n_therm=400, n_meas=2000, seed=3)

    # framework quenched HMC
    model = SchwingerModel(
        lattice=LatticeParams(Nx=8, Nt=8, real_dtype="float64"),
        hmc=HMCParams(beta=beta, m0=0.0, md_steps=10, trajectory_length=1.0,
                      quenched=True, cg=CGParams(tol=1e-10, max_iter=100)),
    )
    key = prng.root_key(5)
    theta = jax.random.uniform(key, (2, 8, 8), minval=-np.pi, maxval=np.pi,
                               dtype=jnp.float64)

    @jax.jit
    def block(th, idx):
        def body(t, i):
            t, st = sampler.hmc_trajectory(model, t, prng.trajectory_key(key, i))
            return t, model.plaquette_sum(t) / 64.0
        return jax.lax.scan(body, th, idx)

    theta, _ = block(theta, jnp.arange(300))
    theta, plq = block(theta, jnp.arange(300, 2300))
    v = np.asarray(plq)
    bins = v.reshape(20, -1).mean(axis=1)
    ep_h = float(v.mean())
    err_h = float(bins.std(ddof=1) / np.sqrt(20))

    exact = mp.exact_plaquette(beta)
    sig = np.hypot(err_m, err_h)
    assert abs(ep_m - exact) < 3.0 * max(err_m, 1e-4), (ep_m, exact, err_m)
    assert abs(ep_h - exact) < 3.0 * max(err_h, 1e-4), (ep_h, exact, err_h)
    assert abs(ep_m - ep_h) < 3.0 * max(sig, 2e-4), (ep_m, ep_h, sig)
