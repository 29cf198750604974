"""Fused Pallas CG kernel (ops/pallas_eo.py) vs the jnp solver.

These run the kernel in interpret mode (CPU CI); the on-TPU compiled path
was validated on real hardware to produce identical iteration counts and
residuals (0.62 us/iter vs ~10 us/iter at 64x64 -- see the module
docstring and bench.py).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from schwingermodel_tpu.config import CGParams, HMCParams, LatticeParams
from schwingermodel_tpu.hmc import sampler
from schwingermodel_tpu.models.schwinger import SchwingerModel
from schwingermodel_tpu.ops.pallas_eo import cg_solve_eo_fused
from schwingermodel_tpu.solvers.cg import cg_solve
from schwingermodel_tpu.utils import prng


def _setup(Nx=8, Nt=8, m0=0.1, seed=0):
    """f32 model + random theta + random even-packed spinor."""
    rng = np.random.default_rng(seed)
    lat = LatticeParams(Nx=Nx, Nt=Nt, real_dtype="float32")
    hmc = HMCParams(beta=2.0, m0=m0, even_odd=True,
                    cg=CGParams(tol=1e-5, max_iter=500))
    model = SchwingerModel(lattice=lat, hmc=hmc)
    theta = jnp.asarray(rng.uniform(-np.pi, np.pi, (2, Nx, Nt)),
                        dtype=jnp.float32)
    v = jnp.asarray(
        rng.standard_normal((2, Nx, Nt // 2))
        + 1j * rng.standard_normal((2, Nx, Nt // 2)), dtype=jnp.complex64)
    return model, theta, v


@pytest.mark.parametrize("shape", [(8, 8), (6, 12), (16, 8)])
def test_fused_cg_matches_jnp_solver(shape):
    model, theta, v = _setup(*shape)
    ops = model.eo_ops(theta)
    b = ops.dhat(v)
    ref = cg_solve(ops.normal, b,
                   lambda x, y: jnp.real(jnp.sum(jnp.conj(x) * y)),
                   tol=1e-5, max_iter=500)
    got = cg_solve_eo_fused(ops.Ue, ops.Uo, b, b, m0=float(model.hmc.m0),
                            tol=1e-5, max_iter=500, interpret=True)
    assert bool(got.converged)
    assert int(got.iters) == int(ref.iters)
    # both solutions solve the system to tolerance (checked with the jnp op)
    bn = float(jnp.linalg.norm(b.ravel()))
    for x in (ref.x, got.x):
        r = float(jnp.linalg.norm((ops.normal(x) - b).ravel())) / bn
        assert r < 2e-5
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               atol=1e-5, rtol=1e-4)


def test_fused_cg_nonconvergence_flag():
    model, theta, v = _setup()
    ops = model.eo_ops(theta)
    b = ops.dhat(v)
    got = cg_solve_eo_fused(ops.Ue, ops.Uo, b, b, m0=float(model.hmc.m0),
                            tol=1e-12, max_iter=3, interpret=True)
    assert not bool(got.converged)
    assert int(got.iters) == 3


def test_fused_cg_x0_forecasting():
    """A near-solution start converges in far fewer iterations."""
    model, theta, v = _setup()
    ops = model.eo_ops(theta)
    b = ops.dhat(v)
    cold = cg_solve_eo_fused(ops.Ue, ops.Uo, b, b, m0=float(model.hmc.m0),
                             tol=1e-5, max_iter=500, interpret=True)
    warm = cg_solve_eo_fused(ops.Ue, ops.Uo, b, cold.x,
                             m0=float(model.hmc.m0),
                             tol=1e-5, max_iter=500, interpret=True)
    assert int(warm.iters) <= 1


def test_fused_cg_vmap_chains():
    """pallas_call lifts over vmap: batched solves match per-item solves."""
    model, theta, _ = _setup()
    ops = model.eo_ops(theta)
    rng = np.random.default_rng(3)
    vs = jnp.asarray(
        rng.standard_normal((4, 2, 8, 4)) + 1j * rng.standard_normal((4, 2, 8, 4)),
        dtype=jnp.complex64)
    bs = jax.vmap(ops.dhat)(vs)

    def solve(b):
        return cg_solve_eo_fused(ops.Ue, ops.Uo, b, b,
                                 m0=float(model.hmc.m0), tol=1e-5,
                                 max_iter=500, interpret=True)
    batched = jax.vmap(solve)(bs)
    for i in range(4):
        single = solve(bs[i])
        np.testing.assert_allclose(np.asarray(batched.x[i]),
                                   np.asarray(single.x), atol=1e-5, rtol=1e-4)
        assert int(batched.iters[i]) == int(single.iters)


def test_fused_cg_vmap_per_chain_links():
    """Lane-packed vmap with DIFFERENT gauge configurations per chain (the
    HMC multi-chain case): every chain's packed solution and iteration
    count matches its standalone single solve -- in-chain time shifts and
    per-chain dots must not leak across the chain-block boundary."""
    rng = np.random.default_rng(11)
    C, Nx, Nt = 3, 8, 8
    lat = LatticeParams(Nx=Nx, Nt=Nt, real_dtype="float32")
    hmc = HMCParams(beta=2.0, m0=0.1, even_odd=True,
                    cg=CGParams(tol=1e-5, max_iter=500))
    model = SchwingerModel(lattice=lat, hmc=hmc)
    thetas = jnp.asarray(rng.uniform(-np.pi, np.pi, (C, 2, Nx, Nt)),
                         dtype=jnp.float32)
    vs = jnp.asarray(
        rng.standard_normal((C, 2, Nx, Nt // 2))
        + 1j * rng.standard_normal((C, 2, Nx, Nt // 2)), dtype=jnp.complex64)

    def solve(theta, v):
        ops = model.eo_ops(theta)
        b = ops.dhat(v)
        return cg_solve_eo_fused(ops.Ue, ops.Uo, b, b,
                                 m0=float(model.hmc.m0), tol=1e-5,
                                 max_iter=500, interpret=True)

    batched = jax.vmap(solve)(thetas, vs)
    # different configs -> different iteration counts; the packed kernel
    # must freeze early-converging chains, not run them to max-over-chains
    for i in range(C):
        single = solve(thetas[i], vs[i])
        assert int(batched.iters[i]) == int(single.iters)
        assert bool(batched.converged[i])
        np.testing.assert_allclose(np.asarray(batched.x[i]),
                                   np.asarray(single.x), atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_trajectory_fused_vs_jnp():
    """Full HMC trajectories agree (accept decisions and dH) when solves go
    through the fused kernel instead of the jnp CG."""
    model, theta, _ = _setup()
    m_fused = dataclasses.replace(
        model, hmc=dataclasses.replace(model.hmc, fused_cg=True))
    m_jnp = dataclasses.replace(
        model, hmc=dataclasses.replace(model.hmc, fused_cg=False))
    key = prng.root_key(5)
    for i in range(3):
        k = prng.trajectory_key(key, i)
        th_f, st_f = sampler.hmc_trajectory(m_fused, theta, k)
        th_j, st_j = sampler.hmc_trajectory(m_jnp, theta, k)
        assert bool(st_f.accepted) == bool(st_j.accepted)
        assert abs(float(st_f.delta_H) - float(st_j.delta_H)) < 1e-2
        np.testing.assert_allclose(np.asarray(th_f), np.asarray(th_j),
                                   atol=5e-4)
        theta = th_j


def test_fused_auto_resolution():
    """fused_cg=None resolves off on CPU, and never fuses sharded/full-D."""
    model, _, _ = _setup()
    assert model._use_fused_cg() is False          # auto: CPU backend
    m_on = dataclasses.replace(
        model, hmc=dataclasses.replace(model.hmc, fused_cg=True))
    assert m_on._use_fused_cg() is True
    m_full = dataclasses.replace(
        m_on, hmc=dataclasses.replace(m_on.hmc, even_odd=False))
    assert m_full._use_fused_cg() is False
    from schwingermodel_tpu.ops.geometry import ShardedGeometry
    m_shard = dataclasses.replace(m_on, geom=ShardedGeometry())
    assert m_shard._use_fused_cg() is False
