"""Lane-packed fused trajectory (ops/pallas_traj.py, hmc/packed.py).

Every packed-plane building block is checked against the reference XLA
path (interpret-mode kernels on CPU); the end gate injects IDENTICAL noise
into the packed and the standard vmapped trajectory and compares dH and
the accept decision chain by chain.
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from schwingermodel_tpu.config import CGParams, HMCParams, LatticeParams
from schwingermodel_tpu.hmc import packed as hp
from schwingermodel_tpu.hmc.sampler import draw_noise, trajectory_given_noise
from schwingermodel_tpu.models.schwinger import SchwingerModel, SolveStats
from schwingermodel_tpu.ops import eo, pallas_traj as pt
from schwingermodel_tpu.utils import prng


def _model32(Nx=8, Nt=8, m0=0.1, beta=2.0, integrator="leapfrog",
             md_steps=6, hasenbusch_dm=None):
    return SchwingerModel(
        lattice=LatticeParams(Nx=Nx, Nt=Nt, real_dtype="float32"),
        hmc=HMCParams(beta=beta, m0=m0, even_odd=True, md_steps=md_steps,
                      trajectory_length=0.6, integrator=integrator,
                      packed=True,      # force the path off-TPU (interpret)
                      hasenbusch_dm=hasenbusch_dm,
                      cg=CGParams(tol=1e-6, max_iter=2000)),
    )


def _rand_theta(rng, C, Nx, Nt, scale=np.pi):
    return jnp.asarray(
        rng.uniform(-scale, scale, (C, 2, Nx, Nt)), jnp.float32)


def test_pack_unpack_roundtrip(rng):
    model = _model32()
    v = _rand_theta(rng, 3, 8, 8)
    E, O = pt.pack_chains(model.geom, v)
    assert E.shape == (2, 8, 3 * 4)
    back = pt.unpack_chains(model.geom, E, O, 3)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(v))


def test_pack_even_roundtrip(rng):
    C, Nx, Nth = 3, 8, 4
    v = jnp.asarray(rng.standard_normal((C, 2, Nx, Nth))
                    + 1j * rng.standard_normal((C, 2, Nx, Nth)), jnp.complex64)
    p = pt.pack_even(v)
    assert p.shape == (2, 2, Nx, C * Nth)
    np.testing.assert_array_equal(np.asarray(pt.unpack_even(p, C)),
                                  np.asarray(v))


def test_packed_gauge_action_and_plaquette(rng):
    import schwingermodel_tpu.ops.gauge as gops

    model = _model32()
    C = 3
    theta = _rand_theta(rng, C, 8, 8)
    E, O = pt.pack_chains(model.geom, theta)
    Sg = pt.gauge_action_packed(E, O, 2.0, C, 4)
    Sp = pt.plaquette_sum_packed(E, O, C, 4)
    ref_S = jax.vmap(lambda t: gops.gauge_action(
        model.geom, gops.links(t, jnp.complex64), 2.0))(theta)
    ref_P = jax.vmap(lambda t: gops.plaquette_sum(
        model.geom, gops.links(t, jnp.complex64)))(theta)
    np.testing.assert_allclose(np.asarray(Sg), np.asarray(ref_S), rtol=2e-5,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(Sp), np.asarray(ref_P), rtol=2e-5,
                               atol=2e-4)


def test_packed_dhat_matches_eo(rng):
    model = _model32()
    C, Nx, Nt, Nth = 2, 8, 8, 4
    theta = _rand_theta(rng, C, Nx, Nt)
    v = jnp.asarray(rng.standard_normal((C, 2, Nx, Nth))
                    + 1j * rng.standard_normal((C, 2, Nx, Nth)), jnp.complex64)
    E, O = pt.pack_chains(model.geom, theta)
    got = pt.unpack_even(
        pt.dhat_packed(E, O, pt.pack_even(v), 0.1, Nth), C)
    ref = jax.vmap(lambda t, w: model.eo_ops(t).dhat(w))(theta, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_force_step_fused_matches_model_force(rng):
    """The decisive gate: in-kernel fermion+gauge force == model.force
    (analytic checkerboard force vs the autodiff EO force + XLA staples)."""
    model = _model32()
    C, Nx, Nt, Nth = 2, 8, 8, 4
    theta = _rand_theta(rng, C, Nx, Nt)
    chi = jnp.asarray(rng.standard_normal((C, 2, Nx, Nth))
                      + 1j * rng.standard_normal((C, 2, Nx, Nth)),
                      jnp.complex64)
    phi = jax.vmap(lambda t, w: model.eo_ops(t).dhat(w))(theta, chi)

    E, O = pt.pack_chains(model.geom, theta)
    phi_p = pt.pack_even(phi)
    res = pt.force_step_fused(E, O, phi_p, phi_p, m0=0.1, beta=2.0,
                              tol=1e-6, max_iter=2000, Nth=Nth,
                              interpret=True)
    assert bool(jnp.all(res.converged))
    F_got = pt.unpack_chains(model.geom, res.FE, res.FO, C)

    def ref_force(t, p):
        F, stats, psi = model.force(t, p, SolveStats.zero())
        return F, psi

    F_ref, psi_ref = jax.vmap(ref_force)(theta, phi)
    scale = np.abs(np.asarray(F_ref)).max()
    np.testing.assert_allclose(np.asarray(F_got), np.asarray(F_ref),
                               rtol=0, atol=3e-5 * max(scale, 1.0))
    psi_got = pt.unpack_even(res.psi, C)
    np.testing.assert_allclose(np.asarray(psi_got), np.asarray(psi_ref),
                               rtol=0, atol=2e-4)


def test_force_step_without_solve(rng):
    """with_solve=False: forces assembled from an externally provided psi."""
    model = _model32()
    C, Nx, Nt, Nth = 2, 8, 8, 4
    theta = _rand_theta(rng, C, Nx, Nt)
    chi = jnp.asarray(rng.standard_normal((C, 2, Nx, Nth))
                      + 1j * rng.standard_normal((C, 2, Nx, Nth)),
                      jnp.complex64)
    phi = jax.vmap(lambda t, w: model.eo_ops(t).dhat(w))(theta, chi)
    E, O = pt.pack_chains(model.geom, theta)
    phi_p = pt.pack_even(phi)
    full = pt.force_step_fused(E, O, phi_p, phi_p, m0=0.1, beta=2.0,
                               tol=1e-6, max_iter=2000, Nth=Nth,
                               interpret=True)
    nosolve = pt.force_step_fused(E, O, phi_p, full.psi, m0=0.1, beta=2.0,
                                  tol=1e-6, max_iter=2000, Nth=Nth,
                                  with_solve=False, interpret=True)
    np.testing.assert_allclose(np.asarray(nosolve.FE), np.asarray(full.FE),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(nosolve.FO), np.asarray(full.FO),
                               rtol=0, atol=1e-6)
    assert int(jnp.sum(nosolve.iters)) == 0


def test_solve_fused_matches_jnp_cg(rng):
    model = _model32()
    C, Nx, Nt, Nth = 2, 8, 8, 4
    theta = _rand_theta(rng, C, Nx, Nt)
    b = jnp.asarray(rng.standard_normal((C, 2, Nx, Nth))
                    + 1j * rng.standard_normal((C, 2, Nx, Nth)), jnp.complex64)
    E, O = pt.pack_chains(model.geom, theta)
    sol = pt.solve_fused(E, O, pt.pack_even(b), pt.pack_even(b), m0=0.1,
                         tol=1e-6, max_iter=2000, Nth=Nth, interpret=True)
    assert bool(jnp.all(sol.converged))
    x_got = pt.unpack_even(sol.x, C)

    def ref(t, bb):
        ops = model.eo_ops(t)
        return model._solve_eo_lo(ops, bb).x

    x_ref = jax.vmap(ref)(theta, b)
    np.testing.assert_allclose(np.asarray(x_got), np.asarray(x_ref),
                               rtol=0, atol=2e-4)


@pytest.mark.parametrize("integrator", ["leapfrog", "omelyan"])
def test_packed_trajectory_matches_standard(rng, integrator):
    """Same noise in -> same dH/accept (to f32 summation-order noise) as the
    standard vmapped trajectory."""
    model = _model32(integrator=integrator)
    C, Nx, Nt = 2, 8, 8
    theta = _rand_theta(rng, C, Nx, Nt)
    keys = jax.vmap(lambda i: prng.trajectory_key(prng.root_key(7), i))(
        jnp.arange(C))
    pi, chi, r = jax.vmap(
        lambda k: draw_noise(model, (2, Nx, Nt), k))(keys)

    th_ref, st_ref = jax.vmap(
        lambda t, p, c, u: trajectory_given_noise(model, t, p, c, u))(
        theta, pi, chi, r)

    th0 = hp.pack_theta(model, theta)
    piE, piO = pt.pack_chains(model.geom, pi)
    th1, st = hp.trajectory_packed_given_noise(model, th0, piE, piO, chi, r)

    assert bool(jnp.all(st.cg_converged))
    np.testing.assert_allclose(np.asarray(st.delta_H),
                               np.asarray(st_ref.delta_H), rtol=0, atol=5e-3)
    assert np.array_equal(np.asarray(st.accepted), np.asarray(st_ref.accepted))
    th1_full = hp.unpack_theta(model, th1, C)
    np.testing.assert_allclose(np.asarray(th1_full), np.asarray(th_ref),
                               rtol=0, atol=2e-4)


OPT0 = {"xla_backend_optimization_level": "0"}
jit0 = partial(jax.jit, compiler_options=OPT0)


def _model32_refined(Nx=8, Nt=8, m0=0.1, beta=2.0):
    from schwingermodel_tpu.config import CGParams

    return SchwingerModel(
        lattice=LatticeParams(Nx=Nx, Nt=Nt, real_dtype="float32"),
        hmc=HMCParams(beta=beta, m0=m0, even_odd=True, md_steps=6,
                      trajectory_length=0.6,
                      cg=CGParams(tol=1e-10, max_iter=2000, refine=True,
                                  refine_impl="x64")),
    )


def test_ratio_force_fused_matches_model(rng):
    """The Hasenbusch MD force on packed kernels (heavy force_step at m1
    with_gauge=False + ratio_force_fused) == models._force_hasenbusch
    (autodiff bilinears + XLA staples), same pre-solved fields."""
    dm = 0.4
    model = _model32(m0=-0.19, hasenbusch_dm=dm)
    m0f, m1f = -0.19, -0.19 + dm
    C, Nx, Nt, Nth = 2, 8, 8, 4
    theta = _rand_theta(rng, C, Nx, Nt)
    chi = jnp.asarray(rng.standard_normal((C, 2, 2, Nx, Nth))
                      + 1j * rng.standard_normal((C, 2, 2, Nx, Nth)),
                      jnp.complex64)

    def heat_bath(t, c):
        return model.pseudofermion_fields(t, c, SolveStats.zero())[0]

    phi1, phi2 = jax.vmap(heat_bath)(theta, chi)

    def ref_force(t, p1, p2):
        F, _, psis = model.force(t, (p1, p2), SolveStats.zero())
        return F, psis

    F_ref, (psi1_ref, psi2_ref) = jax.vmap(ref_force)(theta, phi1, phi2)

    E, O = pt.pack_chains(model.geom, theta)
    phi1_p = pt.pack_even(phi1)
    phi2_p = pt.pack_even(phi2)
    res1 = pt.force_step_fused(E, O, phi1_p, phi1_p, m0=m1f, beta=2.0,
                               tol=1e-6, max_iter=2000, Nth=Nth,
                               with_gauge=False, interpret=True)
    b2 = pt.dhat_packed(E, O, phi2_p, m1f, Nth)
    sol2 = pt.solve_fused(E, O, b2, b2, m0=m0f, tol=1e-6, max_iter=2000,
                          Nth=Nth, interpret=True)
    FE2, FO2 = pt.ratio_force_fused(E, O, sol2.x, phi2_p, m0=m0f, m1=m1f,
                                    beta=2.0, Nth=Nth, interpret=True)
    assert bool(jnp.all(res1.converged)) and bool(jnp.all(sol2.converged))
    F_got = pt.unpack_chains(model.geom, res1.FE + FE2, res1.FO + FO2, C)
    scale = np.abs(np.asarray(F_ref)).max()
    np.testing.assert_allclose(np.asarray(F_got), np.asarray(F_ref),
                               rtol=0, atol=5e-5 * max(scale, 1.0))


@pytest.mark.parametrize("integrator", ["leapfrog", "omelyan"])
def test_packed_hasenbusch_trajectory_matches_standard(rng, integrator):
    """Same noise in -> same dH/accept as the vmapped Hasenbusch sampler
    (the packed two-pseudofermion fast path, loose contract)."""
    model = _model32(m0=-0.19, hasenbusch_dm=0.4, integrator=integrator,
                     md_steps=4)
    C, Nx, Nt = 2, 8, 8
    theta = _rand_theta(rng, C, Nx, Nt)
    keys = jax.vmap(lambda i: prng.trajectory_key(prng.root_key(7), i))(
        jnp.arange(C))
    pi, chi, r = jax.vmap(
        lambda k: draw_noise(model, (2, Nx, Nt), k))(keys)

    th_ref, st_ref = jax.vmap(
        lambda t, p, c, u: trajectory_given_noise(model, t, p, c, u))(
        theta, pi, chi, r)

    th0 = hp.pack_theta(model, theta)
    piE, piO = pt.pack_chains(model.geom, pi)
    th1, st = hp.trajectory_packed_given_noise(model, th0, piE, piO, chi, r)

    assert bool(jnp.all(st.cg_converged))
    np.testing.assert_allclose(np.asarray(st.delta_H),
                               np.asarray(st_ref.delta_H), rtol=0, atol=5e-3)
    assert np.array_equal(np.asarray(st.accepted), np.asarray(st_ref.accepted))
    th1_full = hp.unpack_theta(model, th1, C)
    np.testing.assert_allclose(np.asarray(th1_full), np.asarray(th_ref),
                               rtol=0, atol=2e-4)


def test_df_lanes_normal_matches_c128(rng):
    """EODFLanes (the df kernel's math, run directly as jnp -- the
    interpret-mode pallas inlining of the df arithmetic produces a jaxpr
    XLA:CPU takes hours to compile, so the kernel wrapper itself is
    asserted in the TPU tier, tests_tpu/) == b - A x in complex128."""
    from schwingermodel_tpu.ops import pallas_df as pdf
    from schwingermodel_tpu.solvers.dfloat import dfc_sub

    model = _model32_refined()
    C, Nx, Nt, Nth = 2, 8, 8, 4
    theta = _rand_theta(rng, C, Nx, Nt, scale=2 * np.pi)  # incl. MD drift
    x = jnp.asarray(rng.standard_normal((C, 2, Nx, Nth))
                    + 1j * rng.standard_normal((C, 2, Nx, Nth)), jnp.complex64)
    b = jnp.asarray(rng.standard_normal((C, 2, Nx, Nth))
                    + 1j * rng.standard_normal((C, 2, Nx, Nth)), jnp.complex64)

    E, O = pt.pack_chains(model.geom, theta)
    xp = pt.pack_even(x)
    bp = pt.pack_even(b)

    def resid(E, O, bp, xp):
        ops = pdf.EODFLanes(E, O, 0.1, Nth)
        r = dfc_sub(pdf.dfc_from_c_planes(bp),
                    ops.normal(pdf.dfc_from_c_planes(xp)))
        return pdf._planes_dfc(r)

    # eager: EFTs hold per-op without opt-level-0, and the df jaxpr is too
    # large for XLA:CPU's unoptimized LLVM path (hour-scale compiles)
    with jax.disable_jit():
        r_hi, r_lo = resid(E, O, bp, xp)
    got = np.asarray(pt.unpack_even(r_hi, C), np.complex128) \
        + np.asarray(pt.unpack_even(r_lo, C), np.complex128)

    def ref_one(th, xx, bb):
        ops_hi = eo.EOOperators(model.geom, model.fermion_links_hi(th),
                                model.hmc.m0)
        return bb.astype(jnp.complex128) - ops_hi.normal(
            xx.astype(jnp.complex128))

    ref = np.asarray(jax.vmap(ref_one)(theta, x, b))
    assert np.abs(got - ref).max() < 1e-11 * max(np.abs(ref).max(), 1.0)


@pytest.mark.slow
def test_packed_df_hamiltonian_terms_match_f64(rng):
    """The packed df Hamiltonian terms (kinetic, gauge action, dots) match
    f64 references (the full refined solve/trajectory run on the TPU tier;
    see test_df_lanes_normal_matches_c128 for why not interpret here)."""
    import schwingermodel_tpu.ops.gauge as gops
    from schwingermodel_tpu.ops import pallas_df as pdf

    model = _model32_refined()
    C, Nx, Nt, Nth = 3, 8, 8, 4
    theta = _rand_theta(rng, C, Nx, Nt, scale=2 * np.pi)
    pi = jnp.asarray(rng.standard_normal((C, 2, Nx, Nt)), jnp.float32)
    E, O = pt.pack_chains(model.geom, theta)
    piE, piO = pt.pack_chains(model.geom, pi)

    kin_h, kin_l = jit0(partial(pdf.kinetic_packed_df, C=C))(piE, piO)
    ref_kin = 0.5 * np.sum(np.asarray(pi, np.float64) ** 2, axis=(1, 2, 3))
    np.testing.assert_allclose(
        np.asarray(kin_h, np.float64) + np.asarray(kin_l, np.float64),
        ref_kin, rtol=1e-12)

    sg_h, sg_l = jit0(partial(
        pdf.gauge_action_packed_df, beta=2.7, C=C, Nth=Nth))(E, O)
    ref_sg = jax.vmap(lambda t: gops.gauge_action(
        model.geom, gops.links(t.astype(jnp.float64), jnp.complex128),
        2.7))(theta)
    np.testing.assert_allclose(
        np.asarray(sg_h, np.float64) + np.asarray(sg_l, np.float64),
        np.asarray(ref_sg), rtol=1e-10)


@pytest.mark.slow
def test_packed_chain_detailed_balance(rng):
    """<exp(-dH)> = 1 over a short packed multi-chain run (8x8, f32)."""
    model = _model32()
    C, Nx, Nt = 8, 8, 8
    theta = _rand_theta(rng, C, Nx, Nt)
    th = hp.pack_theta(model, theta)
    key = prng.root_key(11)

    @partial(jax.jit, static_argnames=("n",))
    def block(th, k0, n):
        def body(carry, i):
            th = carry
            keys = jax.vmap(lambda c: jax.random.fold_in(
                prng.trajectory_key(k0, i), c))(jnp.arange(C))
            th, st = hp.hmc_trajectory_packed(model, th, keys)
            return th, (st.exp_mdH, st.accepted)
        return jax.lax.scan(body, th, jnp.arange(n))

    th, (e, acc) = block(th, key, 40)      # thermalize
    th, (e, acc) = block(th, jax.random.fold_in(key, 1), 60)
    em = float(jnp.mean(e))
    assert 0.7 < em < 1.3, em
    assert float(jnp.mean(acc)) > 0.5


def test_chain_sharded_packed_matches_vmapped(rng):
    """The packed fused trajectory under shard_map over a chain-only mesh
    (the multihost DCN layout) == the same chains run unsharded, with the
    same per-chain keys."""
    from schwingermodel_tpu.parallel.mesh import lattice_mesh
    from schwingermodel_tpu.parallel.sharded import (
        chain_packed_supported,
        make_chain_sharded_packed_traj_fn,
    )

    model = _model32(md_steps=4)
    C, Nx, Nt = 2, 8, 8
    theta = _rand_theta(rng, C, Nx, Nt)
    keys = jax.vmap(lambda i: prng.trajectory_key(prng.root_key(31), i))(
        jnp.arange(C))

    # unsharded packed reference
    th_ref, st_ref = hp.hmc_trajectory_packed(
        model, hp.pack_theta(model, theta), keys)
    th_ref_full = hp.unpack_theta(model, th_ref, C)

    mesh = lattice_mesh((2, 1, 1))
    assert chain_packed_supported(model, mesh)
    step = jax.jit(make_chain_sharded_packed_traj_fn(model, mesh))
    th_sh, st_sh = step(theta, keys)

    np.testing.assert_allclose(np.asarray(th_sh), np.asarray(th_ref_full),
                               rtol=0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(st_sh.accepted),
                                  np.asarray(st_ref.accepted))
    np.testing.assert_allclose(np.asarray(st_sh.delta_H),
                               np.asarray(st_ref.delta_H),
                               rtol=0, atol=1e-4)
    assert bool(jnp.all(st_sh.cg_converged))
