"""Hasenbusch mass preconditioning (config.HMCParams.hasenbusch_dm).

The reference runs single-pseudofermion HMC (src/hmc.cpp:159-160) whose
acceptance collapses with volume near the critical mass (README.md:94 calls
the regime delicate; its own goldens drop 0.94 at 8x8 -> 0.56 at 16x16 at
beta=2, m0=-0.19). The two-pseudofermion determinant split is exact -- the
sampled gauge distribution is identical -- so the gates here are:

  - force = -dS/dtheta against finite differences of the solved action
    (both terms, both operator modes),
  - the heat-bath identity S_f(theta_old) = |chi1|^2 + |chi2|^2,
  - <exp(-dH)> = 1 (detailed balance) in f64 and under the f32+refinement
    contract,
  - MD reversibility with the pseudofermion pair,
  - sharded == single-device bit-equality for the full trajectory
    (the ratio force differentiates through ppermute halos),
  - and the point of it all: |dH| (hence acceptance) beats the plain
    algorithm at equal step size near the critical mass.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from schwingermodel_tpu.config import CGParams, HMCParams, LatticeParams
from schwingermodel_tpu.hmc import sampler
from schwingermodel_tpu.hmc.integrators import leapfrog
from schwingermodel_tpu.models.schwinger import SchwingerModel, SolveStats
from schwingermodel_tpu.utils import prng

from tests.conftest import random_theta


def _model(Nx=8, Nt=8, *, dtype="float64", m0=-0.19, dm=0.3, beta=2.0,
           md_steps=10, tau=1.0, even_odd=True, tol=1e-12, refine=False,
           dm_off=False):
    return SchwingerModel(
        lattice=LatticeParams(Nx=Nx, Nt=Nt, real_dtype=dtype),
        hmc=HMCParams(beta=beta, m0=m0, md_steps=md_steps,
                      trajectory_length=tau, even_odd=even_odd,
                      hasenbusch_dm=None if dm_off else dm,
                      cg=CGParams(tol=tol, refine=refine)),
    )


def _noise_pair(rng, model, theta_shape):
    shape = model.chi_shape(theta_shape)
    return jnp.asarray(rng.standard_normal(shape)
                       + 1j * rng.standard_normal(shape))


@pytest.mark.parametrize("even_odd", [True, False])
def test_hasenbusch_force_matches_finite_difference(rng, even_odd):
    """F = -dS_f/dtheta for S_f = S1 + S2 with both pseudofermions fixed."""
    Nx, Nt = 4, 4
    model = _model(Nx, Nt, even_odd=even_odd, tol=1e-14)
    theta = jnp.asarray(random_theta(rng, Nx, Nt))
    chi = _noise_pair(rng, model, theta.shape)
    phi, _ = model.pseudofermion_fields(theta, chi, SolveStats.zero())

    def S_f(th):
        s, _ = model.fermion_action(jnp.asarray(th), phi, SolveStats.zero())
        return float(s)

    # beta = 0: the gauge force vanishes, F is purely fermionic
    F, _, _ = model.force(theta, phi, SolveStats.zero(), beta=0.0)
    F = np.asarray(F)

    eps = 1e-6
    for (mu, x, t) in [(0, 0, 0), (0, 3, 1), (1, 2, 3), (1, 1, 2), (0, 2, 2)]:
        dtheta = np.zeros((2, Nx, Nt))
        dtheta[mu, x, t] = eps
        num = (S_f(theta + dtheta) - S_f(theta - dtheta)) / (2 * eps)
        np.testing.assert_allclose(F[mu, x, t], -num, rtol=2e-5, atol=1e-8)


@pytest.mark.parametrize("even_odd", [True, False])
def test_hasenbusch_heat_bath_identity(rng, even_odd):
    """S_f(theta, Phi(chi)) = |chi1|^2 + |chi2|^2 to solver tolerance --
    the exact_initial_fermion_action identity extended to the split."""
    model = _model(even_odd=even_odd, tol=1e-12)
    theta = jnp.asarray(random_theta(rng, 8, 8))
    chi = _noise_pair(rng, model, theta.shape)
    phi, stats = model.pseudofermion_fields(theta, chi, SolveStats.zero())
    assert bool(stats.all_converged)
    s, _ = model.fermion_action(theta, phi, SolveStats.zero())
    want = float(jnp.sum(jnp.abs(chi) ** 2))
    np.testing.assert_allclose(float(s), want, rtol=1e-8)


def _run_chain(model, n_therm, n_meas, seed=7):
    key = prng.root_key(seed)
    dtype = model.lattice.rdtype
    Nx, Nt = model.lattice.Nx, model.lattice.Nt
    theta = jax.random.uniform(key, (2, Nx, Nt), minval=-np.pi, maxval=np.pi,
                               dtype=dtype)

    @jax.jit
    def block(th, ks):
        return jax.lax.scan(lambda t, k: sampler.hmc_trajectory(model, t, k),
                            th, ks)

    ks = jax.vmap(lambda i: prng.trajectory_key(key, i))(jnp.arange(n_therm))
    theta, _ = block(theta, ks)
    ks = jax.vmap(lambda i: prng.trajectory_key(key, i))(
        jnp.arange(n_therm, n_therm + n_meas))
    theta, st = block(theta, ks)
    return theta, st


def _assert_expmdh_unity(st, n_sigma=4.0, floor=5e-3):
    x = np.asarray(st.exp_mdH, dtype=np.float64)
    mean = x.mean()
    err = x.std(ddof=1) / np.sqrt(len(x))
    assert bool(np.asarray(st.cg_converged).all())
    assert abs(mean - 1.0) <= n_sigma * max(err, floor), (mean, err)


def test_hasenbusch_expmdh_unity_f64():
    _, st = _run_chain(_model(md_steps=12), n_therm=15, n_meas=50)
    _assert_expmdh_unity(st)


@pytest.mark.slow
def test_hasenbusch_expmdh_unity_f32_refined():
    """The shipped f32 + refinement contract with the split active."""
    model = _model(dtype="float32", tol=1e-10, refine=True, md_steps=12)
    _, st = _run_chain(model, n_therm=15, n_meas=50)
    _assert_expmdh_unity(st)


def test_hasenbusch_reversibility(rng):
    model = _model(md_steps=8, tau=0.8)
    theta = jnp.asarray(random_theta(rng, 8, 8))
    key = jax.random.PRNGKey(3)
    pi, chi, _ = sampler.draw_noise(model, theta.shape, key)
    phi, _ = model.pseudofermion_fields(theta, chi, SolveStats.zero())
    th1, pi1, _, _ = leapfrog(model, theta, pi, phi)
    th0, pi0, _, _ = leapfrog(model, th1, -pi1, phi)
    np.testing.assert_allclose(np.asarray(th0), np.asarray(theta), atol=1e-9)
    np.testing.assert_allclose(np.asarray(-pi0), np.asarray(pi), atol=1e-9)


def test_hasenbusch_reduces_dH_near_critical():
    """The point of the split: at equal (coarse) step size near m_crit the
    two-pseudofermion force gives a much smaller energy violation, hence
    restored acceptance. Same seeds, same thermalized ensemble protocol."""
    dH = {}
    for tag, dm_off in (("hb", False), ("plain", True)):
        model = _model(md_steps=5, tau=1.0, dm_off=dm_off)
        _, st = _run_chain(model, n_therm=15, n_meas=25, seed=11)
        dH[tag] = np.abs(np.asarray(st.delta_H, np.float64))
    # coarse md=5 at m0=-0.19: the plain algorithm's |dH| is O(1); the
    # split cuts it by well over 2x (typically ~5x). Medians are robust
    # to single spikes.
    assert np.median(dH["hb"]) < 0.5 * np.median(dH["plain"]), (
        np.median(dH["hb"]), np.median(dH["plain"]))


def test_hasenbusch_sharded_trajectory_matches_single(rng):
    """Full Hasenbusch trajectory under shard_map (2x2 lattice mesh) ==
    single-device to tight tolerance (the ratio force's autodiff transposes
    the packed-stencil ppermutes; only psum reduction order differs --
    same contract as test_sharded.test_sharded_trajectory_matches_single)."""
    from schwingermodel_tpu.parallel import lattice_mesh, make_sharded_step

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    model = _model(md_steps=4, tau=0.4)
    mesh = lattice_mesh((2, 2))
    theta = jnp.asarray(random_theta(rng, 8, 8))
    key = prng.trajectory_key(prng.root_key(5), 0)

    th_single, st_single = jax.jit(
        lambda th, k: sampler.hmc_trajectory(model, th, k))(theta, key)
    th_shard, st_shard = make_sharded_step(model, mesh)(theta, key)

    np.testing.assert_allclose(
        np.asarray(th_shard), np.asarray(th_single), rtol=0, atol=1e-11)
    np.testing.assert_allclose(
        float(st_shard.delta_H), float(st_single.delta_H),
        rtol=1e-8, atol=1e-10)
    assert bool(st_shard.accepted) == bool(st_single.accepted)
