"""Even-odd (Schur-complement) preconditioning tests (ops/eo.py).

The key guarantee: HMC on the even-odd action samples *exactly* the same
gauge distribution as the reference's full-D pseudofermions, because
det D = (m0+2)^(2 N_odd) det Dhat with a gauge-independent prefactor. The
dense tests below verify that identity operator-by-operator on a small
lattice; the force test checks the AD-derived force against finite
differences of the actual action; the sharded test checks the packed
stencil's ppermute halos against the single-device path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from schwingermodel_tpu.config import CGParams, HMCParams, LatticeParams
from schwingermodel_tpu.hmc import sampler
from schwingermodel_tpu.hmc.integrators import leapfrog
from schwingermodel_tpu.models.schwinger import SchwingerModel, SolveStats
from schwingermodel_tpu.ops import dirac as dops
from schwingermodel_tpu.ops import eo
from schwingermodel_tpu.ops import gauge as gops
from schwingermodel_tpu.ops.geometry import Geometry, ShardedGeometry
from schwingermodel_tpu.parallel import lattice_mesh, make_sharded_step
from schwingermodel_tpu.solvers.cg import cg_solve

from tests.conftest import random_theta

GEOM = Geometry()


def _model(Nx=4, Nt=6, m0=0.1, beta=2.0, even_odd=True, **kw):
    lat = LatticeParams(Nx=Nx, Nt=Nt, real_dtype="float64")
    hmc = HMCParams(beta=beta, m0=m0, even_odd=even_odd,
                    cg=CGParams(tol=1e-13, max_iter=10000), **kw)
    return SchwingerModel(lattice=lat, hmc=hmc)


def _dense(op, shape):
    """Dense matrix of a linear operator on complex fields of `shape`."""
    n = int(np.prod(shape))
    cols = []
    for i in range(n):
        e = np.zeros(n, dtype=np.complex128)
        e[i] = 1.0
        cols.append(np.asarray(op(jnp.asarray(e.reshape(shape)))).reshape(n))
    return np.stack(cols, axis=1)


def _parity_indices(Nx, Nt):
    """Flat indices (into [2, Nx, Nt] fields) of even/odd sites, both spins."""
    x, t = np.meshgrid(np.arange(Nx), np.arange(Nt), indexing="ij")
    par = (x + t) % 2
    even, odd = [], []
    for s in range(2):
        base = s * Nx * Nt
        flat = base + x * Nt + t
        even.append(flat[par == 0])
        odd.append(flat[par == 1])
    return np.concatenate(even), np.concatenate(odd)


def _packed_to_dense_perm(Nx, Nt):
    """Map packed even-field flat index -> full-field flat index.

    Packed layout E[s, x, k] = a[s, x, 2k + (x % 2)] (ops/eo.py); the dense
    Schur blocks above use even-site flat order. Returns the permutation
    such that full_flat_even_order == packed_flat[perm] ... actually returns
    the list of full flat indices in packed (s, x, k) order.
    """
    idx = []
    for s in range(2):
        for x in range(Nx):
            off = x % 2
            for k in range(Nt // 2):
                idx.append(s * Nx * Nt + x * Nt + (2 * k + off))
    return np.asarray(idx)


def test_pack_unpack_roundtrip(rng):
    a = jnp.asarray(rng.standard_normal((3, 2, 8, 6)))
    e = eo.pack(GEOM, a, eo.EVEN)
    o = eo.pack(GEOM, a, eo.ODD)
    assert e.shape == (3, 2, 8, 3)
    back = eo.unpack(GEOM, e, o)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(a))


def test_pack_selects_correct_parity(rng):
    Nx, Nt = 6, 8
    a = jnp.asarray(rng.standard_normal((Nx, Nt)))
    e = np.asarray(eo.pack(GEOM, a, eo.EVEN))
    o = np.asarray(eo.pack(GEOM, a, eo.ODD))
    an = np.asarray(a)
    for x in range(Nx):
        for k in range(Nt // 2):
            assert e[x, k] == an[x, 2 * k + (x % 2)]
            assert o[x, k] == an[x, 2 * k + ((x + 1) % 2)]


def test_schur_complement_matches_dense(rng):
    """Dhat (packed stencil) == m - D_eo D_oe / m from the dense full D."""
    Nx, Nt = 4, 6
    model = _model(Nx, Nt)
    theta = jnp.asarray(random_theta(rng, Nx, Nt))
    m = model.hmc.m0 + 2.0

    D = _dense(lambda v: model.D(theta, v), (2, Nx, Nt))
    ei, oi = _parity_indices(Nx, Nt)
    D_ee, D_eo, D_oe, D_oo = (D[np.ix_(ei, ei)], D[np.ix_(ei, oi)],
                              D[np.ix_(oi, ei)], D[np.ix_(oi, oi)])
    # Wilson diagonal blocks are the bare mass term -- gauge independent
    np.testing.assert_allclose(D_ee, m * np.eye(len(ei)), atol=1e-13)
    np.testing.assert_allclose(D_oo, m * np.eye(len(oi)), atol=1e-13)
    schur = m * np.eye(len(ei)) - (D_eo @ D_oe) / m

    ops = model.eo_ops(theta)
    Dhat = _dense(ops.dhat, (2, Nx, Nt // 2))
    # reorder dense Schur (even-site flat order) into packed order
    perm = _packed_to_dense_perm(Nx, Nt)
    pos = {f: i for i, f in enumerate(ei)}
    reorder = np.asarray([pos[f] for f in perm])
    schur_packed = schur[np.ix_(reorder, reorder)]
    np.testing.assert_allclose(Dhat, schur_packed, atol=1e-12)


def test_dhat_dagger_is_adjoint(rng):
    Nx, Nt = 4, 6
    model = _model(Nx, Nt)
    theta = jnp.asarray(random_theta(rng, Nx, Nt))
    ops = model.eo_ops(theta)
    shape = (2, Nx, Nt // 2)
    Dhat = _dense(ops.dhat, shape)
    Dhat_dag = _dense(ops.dhat_dag, shape)
    np.testing.assert_allclose(Dhat_dag, Dhat.conj().T, atol=1e-12)


def test_normal_operator_hermitian_positive(rng):
    Nx, Nt = 4, 6
    model = _model(Nx, Nt)
    theta = jnp.asarray(random_theta(rng, Nx, Nt))
    ops = model.eo_ops(theta)
    A = _dense(ops.normal, (2, Nx, Nt // 2))
    np.testing.assert_allclose(A, A.conj().T, atol=1e-12)
    w = np.linalg.eigvalsh(A)
    assert w.min() > 0


def test_eo_force_matches_finite_difference(rng):
    """F = -dS_f/dtheta for S_f = Phi^+(Dhat Dhat^+)^{-1}Phi, Phi fixed."""
    Nx, Nt = 4, 4
    model = _model(Nx, Nt)
    theta = jnp.asarray(random_theta(rng, Nx, Nt))
    shape = (2, Nx, Nt // 2)
    phi = jnp.asarray(
        (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)))

    def S_f(th):
        ops = model.eo_ops(th)
        res = cg_solve(ops.normal, phi, model._dot_re, tol=1e-14,
                       max_iter=10000)
        return float(model._dot_re(phi, res.x))

    ops = model.eo_ops(theta)
    res = cg_solve(ops.normal, phi, model._dot_re, tol=1e-14, max_iter=10000)
    psi = res.x
    chi_p = ops.dhat_dag(psi)
    F = np.asarray(eo.eo_fermion_force(
        model.fermion_links, model.geom, model.hmc.m0, theta, psi, chi_p))

    eps = 1e-6
    for (mu, x, t) in [(0, 0, 0), (0, 3, 1), (1, 2, 3), (1, 1, 2), (0, 2, 2)]:
        dtheta = np.zeros((2, Nx, Nt))
        dtheta[mu, x, t] = eps
        num = (S_f(theta + dtheta) - S_f(theta - dtheta)) / (2 * eps)
        np.testing.assert_allclose(F[mu, x, t], -num, rtol=1e-5, atol=1e-8)


def test_eo_trajectory_runs_and_conserves(rng):
    """ddH small at fine steps; reversibility of the EO leapfrog."""
    model = _model(8, 8, md_steps=24, trajectory_length=0.6)
    theta = jnp.asarray(random_theta(rng, 8, 8))
    key = jax.random.PRNGKey(3)
    theta2, stats = jax.jit(
        lambda th, k: sampler.hmc_trajectory(model, th, k))(theta, key)
    assert bool(stats.cg_converged)
    assert abs(float(stats.delta_H)) < 0.1

    # reversibility: integrate forward, negate momenta, integrate back
    pi, chi, _ = sampler.draw_noise(model, theta.shape, key)
    phi = model.pseudofermion(theta, chi)
    th1, pi1, _, _ = leapfrog(model, theta, pi, phi)
    th0, pi0, _, _ = leapfrog(model, th1, -pi1, phi)
    np.testing.assert_allclose(np.asarray(th0), np.asarray(theta), atol=1e-9)
    np.testing.assert_allclose(np.asarray(-pi0), np.asarray(pi), atol=1e-9)


def test_eo_initial_action_identity(rng):
    """Phi = Dhat chi implies Phi^+(Dhat Dhat^+)^{-1}Phi == |chi|^2 exactly
    (the exact_initial_fermion_action shortcut is valid in EO mode too)."""
    model = _model(6, 6)
    theta = jnp.asarray(random_theta(rng, 6, 6))
    shape = (2, 6, 3)
    chi = jnp.asarray(
        (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)))
    phi = model.pseudofermion(theta, chi)
    sf, _ = model.fermion_action(theta, phi, SolveStats.zero())
    np.testing.assert_allclose(
        float(sf), float(jnp.sum(jnp.abs(chi) ** 2)), rtol=1e-10)


def test_eo_cg_iterations_fewer(rng):
    """The Schur system converges in roughly half the iterations."""
    Nx = Nt = 16
    model_eo = _model(Nx, Nt, m0=0.0)
    model_full = _model(Nx, Nt, m0=0.0, even_odd=False)
    theta = jnp.asarray(random_theta(rng, Nx, Nt)) * 0.5

    shape_full = (2, Nx, Nt)
    b_full = jnp.asarray((rng.standard_normal(shape_full)
                          + 1j * rng.standard_normal(shape_full)))
    res_full = model_full.solve_normal(theta, b_full)

    ops = model_eo.eo_ops(theta)
    b_eo = eo.pack(GEOM, b_full, eo.EVEN)
    res_eo = cg_solve(ops.normal, b_eo, model_eo._dot_re, tol=1e-13,
                      max_iter=10000)
    assert bool(res_eo.converged) and bool(res_full.converged)
    assert int(res_eo.iters) < 0.7 * int(res_full.iters)


@pytest.mark.parametrize("mesh_shape", [(2, 2), (1, 4), (4, 2)])
def test_sharded_eo_trajectory_matches_single_device(rng, mesh_shape):
    """Packed-stencil halos: sharded EO trajectory == single-device EO."""
    if int(np.prod(mesh_shape)) > len(jax.devices()):
        pytest.skip("not enough devices")
    mesh = lattice_mesh(mesh_shape)
    model = _model(8, 8, md_steps=6, trajectory_length=0.6)

    key = jax.random.PRNGKey(17)
    theta = jnp.asarray(random_theta(rng, 8, 8))

    theta_1, stats_1 = jax.jit(
        lambda th, k: sampler.hmc_trajectory(model, th, k))(theta, key)
    step = make_sharded_step(model, mesh)
    theta_n, stats_n = step(theta, key)

    np.testing.assert_allclose(
        np.asarray(theta_n), np.asarray(theta_1), rtol=0, atol=1e-11)
    assert bool(stats_n.accepted) == bool(stats_1.accepted)
    np.testing.assert_allclose(
        float(stats_n.delta_H), float(stats_1.delta_H), rtol=1e-8, atol=1e-10)


@pytest.mark.slow
def test_eo_statistics_match_full(rng):
    """Short 8x8 runs: EO and full-D actions give the same plaquette within
    combined statistical errors (same physics, different algorithm)."""
    from schwingermodel_tpu.config import RunParams
    from schwingermodel_tpu.runner import run_hmc

    lat = LatticeParams(Nx=8, Nt=8, real_dtype="float64")
    kw = dict(beta=2.0, m0=0.1, md_steps=10, trajectory_length=1.0,
              cg=CGParams(tol=1e-10, max_iter=10000))
    run = RunParams(n_therm=100, n_meas=150, n_steps=0, seed=7)

    r_full = run_hmc(lat, HMCParams(even_odd=False, **kw), run)
    r_eo = run_hmc(lat, HMCParams(even_odd=True, **kw), run)

    sigma = np.hypot(r_full.dEp, r_eo.dEp)
    assert abs(r_full.Ep - r_eo.Ep) < 4 * sigma, (
        f"EO plaquette {r_eo.Ep}+-{r_eo.dEp} vs full {r_full.Ep}+-{r_full.dEp}")
    assert r_eo.acceptance_rate > 0.5
