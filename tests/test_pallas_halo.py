"""Fused per-shard halo apply (ops/pallas_halo.py): the sharded fast path.

Equality against the jnp wide-halo composite (which test_eo_halo.py pins
to the per-hop sharded operator at 1e-12) in interpret mode on virtual
meshes, plus end-to-end sharded CG equality through the model dispatch.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from schwingermodel_tpu.config import CGParams, HMCParams, LatticeParams
from schwingermodel_tpu.models.schwinger import SchwingerModel
from schwingermodel_tpu.ops import eo_halo, pallas_halo
from schwingermodel_tpu.parallel.mesh import lattice_mesh
from schwingermodel_tpu.parallel.sharded import sharded_model
from tests.conftest import random_spinor, random_theta


def _model32(Nx=16, Nt=16, fused=None):
    return SchwingerModel(
        lattice=LatticeParams(Nx=Nx, Nt=Nt, real_dtype="float32"),
        hmc=HMCParams(beta=2.0, m0=0.1, even_odd=True, fused_cg=fused,
                      cg=CGParams(tol=1e-5, max_iter=2000)),
    )


@pytest.mark.parametrize("mesh_shape", [(2, 2), (4, 1)])
def test_fused_halo_normal_equals_jnp_composite(rng, mesh_shape):
    """Planar-kernel apply == complex jnp wide-halo apply (f32, interpret),
    for every site including the shard skirts and corners."""
    model = _model32()
    theta = jnp.asarray(random_theta(rng, 16, 16), jnp.float32)
    v = jnp.asarray(random_spinor(rng, 16, 8)).astype(jnp.complex64)
    mesh = lattice_mesh(mesh_shape)
    inner = sharded_model(model)

    def jnp_halo(th, vv):
        ops = inner.eo_ops(th)
        return eo_halo.EOOperatorsHalo(inner.geom, ops.Uf, ops.m0).normal(vv)

    def fused(th, vv):
        ops = inner.eo_ops(th)
        return pallas_halo.EOOperatorsHaloFused(
            inner.geom, ops.Uf, ops.m0, interpret=True).normal(vv)

    spec = P(None, "x", "t")
    a = jax.jit(jax.shard_map(jnp_halo, mesh=mesh, in_specs=(spec, spec),
                              out_specs=spec, check_vma=False))(theta, v)
    b = jax.jit(jax.shard_map(fused, mesh=mesh, in_specs=(spec, spec),
                              out_specs=spec, check_vma=False))(theta, v)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=0, atol=2e-5)


def test_fused_halo_cg_solution_matches_jnp(rng):
    """End-to-end sharded CG through the model dispatch: forcing the fused
    sharded operator (fused_cg=True -> interpret on CPU) solves to the same
    solution as the jnp composite (fused_cg=False)."""
    Nx = Nt = 16
    theta = jnp.asarray(random_theta(rng, Nx, Nt), jnp.float32)
    b = jnp.asarray(random_spinor(rng, Nx, Nt // 2)).astype(jnp.complex64)
    mesh = lattice_mesh((2, 2))
    spec = P(None, "x", "t")

    def solve(fused):
        model = _model32(fused=fused)
        inner = sharded_model(model)

        def run(th, bb):
            ops = inner.eo_ops(th)
            res = inner._solve_eo_lo(ops, bb)
            return res.x, res.iters, res.converged

        return jax.jit(jax.shard_map(
            run, mesh=mesh, in_specs=(spec, spec),
            out_specs=(spec, P(), P()), check_vma=False))(theta, b)

    x_f, it_f, conv_f = solve(True)
    x_j, it_j, conv_j = solve(False)
    assert bool(conv_f) and bool(conv_j)
    # identical math module different op fusion: same iteration count and
    # solutions equal to f32 roundoff
    assert int(it_f) == int(it_j)
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_j),
                               rtol=0, atol=2e-4)


def test_fused_supported_gates():
    """dtype/mesh gating: f64 never fuses; tiny local blocks never fuse."""
    model64 = SchwingerModel(
        lattice=LatticeParams(Nx=16, Nt=16, real_dtype="float64"),
        hmc=HMCParams(even_odd=True))
    mesh = lattice_mesh((2, 2))
    inner = sharded_model(model64)

    def probe(th):
        g = inner.geom
        return (
            jnp.asarray(pallas_halo.fused_supported(g, 8, 4, jnp.float64)),
            jnp.asarray(pallas_halo.fused_supported(g, 8, 4, jnp.float32)),
            jnp.asarray(pallas_halo.fused_supported(g, 2, 2, jnp.float32)),
        )

    theta = jnp.zeros((2, 16, 16))
    f64_ok, f32_ok, tiny_ok = jax.jit(jax.shard_map(
        probe, mesh=mesh, in_specs=(P(None, "x", "t"),),
        out_specs=(P(), P(), P()), check_vma=False))(theta)
    assert not bool(f64_ok)
    assert bool(f32_ok)
    assert not bool(tiny_ok)


@pytest.mark.parametrize("mesh_shape", [(2, 2), (4, 1)])
def test_fused_halo_force_equals_jnp(rng, mesh_shape):
    """Fused per-shard force kernel (force_halo_fused: chi' + fermion force
    + staple force in one program, round-4 verdict item 5) == the jnp
    force (eo_fermion_force autodiff + gauge_force) per site, including
    shard skirts, on virtual meshes."""
    from schwingermodel_tpu.ops import eo
    from schwingermodel_tpu.ops import gauge as gops

    model = _model32()
    beta, m0 = 2.0, 0.1
    theta = jnp.asarray(random_theta(rng, 16, 16), jnp.float32)
    psi = jnp.asarray(random_spinor(rng, 16, 8)).astype(jnp.complex64)
    mesh = lattice_mesh(mesh_shape)
    inner = sharded_model(model)

    def jnp_force(th, ps):
        ops = inner.eo_ops(th)
        chi_p = ops.dhat_dag(ps)
        F = eo.eo_fermion_force(
            inner.fermion_links, inner.geom, m0, th, ps, chi_p)
        return F + gops.gauge_force(inner.geom, inner.links(th), beta)

    def fused_force(th, ps):
        ops = inner.eo_ops(th)
        return pallas_halo.force_halo_fused(
            inner.geom, ops.Uf, m0, ps, beta, interpret=True)

    spec_t = P(None, "x", "t")
    a = jax.jit(jax.shard_map(jnp_force, mesh=mesh, in_specs=(spec_t, spec_t),
                              out_specs=spec_t, check_vma=False))(theta, psi)
    b = jax.jit(jax.shard_map(fused_force, mesh=mesh,
                              in_specs=(spec_t, spec_t),
                              out_specs=spec_t, check_vma=False))(theta, psi)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=0, atol=2e-5)


def test_sharded_f32_trajectory_uses_fused_force(rng):
    """End-to-end f32 lattice-sharded trajectory with the fused path forced
    (fused_cg=True -> interpret kernels on CPU): dH matches the jnp sharded
    path (fused_cg=False) to f32 roundoff, and the dispatch actually takes
    the kernel branch (model gate probe)."""
    from schwingermodel_tpu.hmc import sampler
    from schwingermodel_tpu.parallel.sharded import make_sharded_step
    from schwingermodel_tpu.utils import prng

    Nx = Nt = 16
    theta = jnp.asarray(random_theta(rng, Nx, Nt), jnp.float32)
    key = prng.trajectory_key(prng.root_key(9), 0)

    def run(fused):
        model = SchwingerModel(
            lattice=LatticeParams(Nx=Nx, Nt=Nt, real_dtype="float32"),
            hmc=HMCParams(beta=2.0, m0=0.1, even_odd=True, md_steps=4,
                          trajectory_length=0.4, fused_cg=fused,
                          cg=CGParams(tol=1e-6, max_iter=2000)))
        mesh = lattice_mesh((2, 2))
        return make_sharded_step(model, mesh)(theta, key)

    th_f, st_f = run(True)
    th_j, st_j = run(False)
    assert bool(st_f.cg_converged) and bool(st_j.cg_converged)
    np.testing.assert_allclose(float(st_f.delta_H), float(st_j.delta_H),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(th_f), np.asarray(th_j),
                               rtol=0, atol=5e-3)
