"""Distributed-path tests on fake CPU devices (SURVEY.md section 4).

The reference cannot test its MPI paths without a cluster; here 8 virtual
CPU devices exercise the shard_map/ppermute halo logic, asserting the
sharded stencils and the *entire sharded HMC trajectory* are bit-identical
(same dtype, same random fields) to the single-device path, for several
mesh shapes including degenerate ones (the reference's size==1 fast paths,
src/dirac_operator.cpp:28, are where such bugs hide).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from schwingermodel_tpu.config import CGParams, HMCParams, LatticeParams
from schwingermodel_tpu.hmc import sampler
from schwingermodel_tpu.models.schwinger import SchwingerModel
from schwingermodel_tpu.ops import dirac as dops
from schwingermodel_tpu.ops import gauge as gops
from schwingermodel_tpu.ops.geometry import Geometry, ShardedGeometry
from schwingermodel_tpu.parallel import lattice_mesh, make_sharded_step
from schwingermodel_tpu.parallel.sharded import make_sharded_observables

from tests.conftest import random_spinor, random_theta

# Representative shapes run by default: the degenerate 1x1 topology, one
# per-axis ring, and the 2D grid. The wider sweep (tall/wide/8-way) is
# compile-bound and runs under `pytest -m meshes` (cold-suite wall-clock,
# VERDICT r2 item 9).
MESH_SHAPES = [(2, 2)] + [
    pytest.param(s, marks=pytest.mark.meshes)
    for s in [(1, 1), (1, 2), (2, 1), (4, 2), (1, 8)]
]

GEOM = Geometry()
SGEOM = ShardedGeometry()


def _mesh(shape):
    if np.prod(shape) > len(jax.devices()):
        pytest.skip(f"needs {np.prod(shape)} devices")
    return lattice_mesh(shape)


@pytest.mark.parametrize("mesh_shape", MESH_SHAPES)
def test_sharded_dirac_bitwise(rng, mesh_shape):
    mesh = _mesh(mesh_shape)
    Nx = Nt = 8
    theta = jnp.asarray(random_theta(rng, Nx, Nt))
    phi = jnp.asarray(random_spinor(rng, Nx, Nt))
    U = gops.links(theta)
    mask = dops.make_sign_mask(GEOM, Nx, Nt, Nt, jnp.float64)
    Uf = dops.fermion_links(U, mask)
    want = np.asarray(dops.dirac_normal(GEOM, Uf, phi, 0.1))

    spec = P(None, "x", "t")

    def f(theta_l, phi_l):
        U_l = gops.links(theta_l)
        m_l = dops.make_sign_mask(
            SGEOM, theta_l.shape[-2], theta_l.shape[-1], Nt, jnp.float64
        )
        Uf_l = dops.fermion_links(U_l, m_l)
        return dops.dirac_normal(SGEOM, Uf_l, phi_l, 0.1)

    got = jax.shard_map(
        f, mesh=mesh, in_specs=(spec, spec), out_specs=spec, check_vma=False
    )(theta, phi)
    # bit-identical: both paths do the same local adds/multiplies in the
    # same order; only the operand routing differs.
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize("mesh_shape", MESH_SHAPES)
def test_sharded_staples_bitwise(rng, mesh_shape):
    mesh = _mesh(mesh_shape)
    Nx = Nt = 8
    theta = jnp.asarray(random_theta(rng, Nx, Nt))
    want = np.asarray(gops.staples(GEOM, gops.links(theta)))
    spec = P(None, "x", "t")
    got = jax.shard_map(
        lambda th: gops.staples(SGEOM, gops.links(th)),
        mesh=mesh, in_specs=(spec,), out_specs=spec, check_vma=False,
    )(theta)
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize("mesh_shape", [
    (2, 2),
    pytest.param((1, 4), marks=pytest.mark.meshes),
    pytest.param((4, 2), marks=pytest.mark.meshes),
])
def test_sharded_trajectory_matches_single_device(rng, mesh_shape):
    """Full HMC trajectory: sharded == single-device to tight tolerance.

    Noise fields are drawn from the same key outside shard_map, so the only
    differences are psum reduction order in the CG dots (not bit-identical,
    but equal to ~1e-12 relative in f64)."""
    mesh = _mesh(mesh_shape)
    lat = LatticeParams(Nx=8, Nt=8, real_dtype="float64")
    hmc = HMCParams(beta=2.0, m0=0.1, md_steps=6, trajectory_length=0.6,
                    cg=CGParams(tol=1e-12, max_iter=10000))
    model = SchwingerModel(lattice=lat, hmc=hmc)

    key = jax.random.PRNGKey(11)
    theta = jnp.asarray(random_theta(rng, 8, 8))

    theta_1, stats_1 = jax.jit(
        lambda th, k: sampler.hmc_trajectory(model, th, k)
    )(theta, key)

    step = make_sharded_step(model, mesh)
    theta_n, stats_n = step(theta, key)

    np.testing.assert_allclose(
        np.asarray(theta_n), np.asarray(theta_1), rtol=0, atol=1e-11
    )
    assert bool(stats_n.accepted) == bool(stats_1.accepted)
    np.testing.assert_allclose(
        float(stats_n.delta_H), float(stats_1.delta_H), rtol=1e-8, atol=1e-10
    )
    assert bool(stats_n.cg_converged) and bool(stats_1.cg_converged)


@pytest.mark.parametrize("mesh_shape", [(2, 2, 2), (4, 1, 2), (2, 1, 1)])
@pytest.mark.slow
def test_chain_sharded_trajectory_matches_vmap(rng, mesh_shape):
    """Chain data parallelism x lattice sharding on a 3D ('chain','x','t')
    mesh == plain vmapped single-device chains, same per-chain keys.

    The reference has no multi-chain capability at all (one chain per MPI
    job); this validates the combined dp+domain-decomposition sharding."""
    mesh = _mesh(mesh_shape)
    rc = mesh_shape[0]
    n_chains = 2 * rc  # exercise the local vmap inside shard_map too
    lat = LatticeParams(Nx=8, Nt=8, real_dtype="float64")
    hmc = HMCParams(beta=2.0, m0=0.1, md_steps=6, trajectory_length=0.6,
                    cg=CGParams(tol=1e-12, max_iter=10000))
    model = SchwingerModel(lattice=lat, hmc=hmc)

    keys = jax.random.split(jax.random.PRNGKey(7), n_chains)
    theta = jnp.asarray(random_theta(rng, 8, 8, batch=(n_chains,)))

    theta_v, stats_v = jax.jit(jax.vmap(
        lambda th, k: sampler.hmc_trajectory(model, th, k)
    ))(theta, keys)

    step = make_sharded_step(model, mesh)
    theta_s, stats_s = step(theta, keys)

    np.testing.assert_allclose(
        np.asarray(theta_s), np.asarray(theta_v), rtol=0, atol=1e-11
    )
    np.testing.assert_array_equal(
        np.asarray(stats_s.accepted), np.asarray(stats_v.accepted)
    )
    np.testing.assert_allclose(
        np.asarray(stats_s.delta_H), np.asarray(stats_v.delta_H),
        rtol=1e-8, atol=1e-10,
    )
    assert bool(jnp.all(stats_s.cg_converged))

    # per-chain sharded observables agree with the unsharded model
    measure = make_sharded_observables(model, mesh)
    obs = measure(theta_s)
    want = jax.vmap(model.plaquette_sum)(theta_s)
    np.testing.assert_allclose(
        np.asarray(obs["plaquette_sum"]), np.asarray(want), rtol=1e-12
    )


@pytest.mark.slow
def test_chain_sharded_runner_end_to_end(tmp_path, rng):
    """run_hmc with n_chains sharded over a 3D mesh runs and matches the
    vmapped (unsharded) runner's observable chains."""
    from schwingermodel_tpu.config import RunParams
    from schwingermodel_tpu.runner import run_hmc

    mesh = _mesh((2, 1, 2))
    lat = LatticeParams(Nx=8, Nt=8, real_dtype="float64")
    hmc = HMCParams(beta=2.0, m0=0.1, md_steps=6, trajectory_length=0.6,
                    cg=CGParams(tol=1e-12, max_iter=10000))
    run = RunParams(n_therm=4, n_meas=6, n_steps=1, n_chains=4, seed=3,
                    out_dir=str(tmp_path))

    res_sharded = run_hmc(lat, hmc, run, mesh=mesh)
    res_plain = run_hmc(lat, hmc, run)

    np.testing.assert_allclose(
        res_sharded.chains["plaquette"], res_plain.chains["plaquette"],
        rtol=0, atol=1e-10,
    )
    assert res_sharded.acceptance_rate == res_plain.acceptance_rate


def test_sharded_observables(rng):
    mesh = _mesh((2, 4))
    lat = LatticeParams(Nx=8, Nt=8, real_dtype="float64")
    hmc = HMCParams(beta=2.0, m0=0.1)
    model = SchwingerModel(lattice=lat, hmc=hmc)
    theta = jnp.asarray(random_theta(rng, 8, 8))
    measure = make_sharded_observables(model, mesh)
    obs = measure(theta)
    np.testing.assert_allclose(
        float(obs["plaquette_sum"]), float(model.plaquette_sum(theta)), rtol=1e-12
    )
    np.testing.assert_allclose(
        float(obs["gauge_action"]), float(model.gauge_action(theta)), rtol=1e-12
    )
