"""On-hardware correctness: the claims previously verified only in
interpret mode or by bench scripts, now asserted on the real chip.

  - error-free transforms survive the real backend's compiler
    (dfloat.eft_selfcheck -- the CPU tier can only assert the False case)
  - the fused Pallas CG (non-interpret, 32 MB VMEM request) equals the jnp
    CG solution
  - the lane-packed C>1 kernel equals per-chain single solves
  - the dfloat-refined solve's TRUE residual < 1e-10, measured in numpy
    float64 on the host against an INDEPENDENT numpy operator (built from
    tests/reference_impl.dirac_ref via Dhat = m - c * even(H(H(.))))
  - the packed fused trajectory satisfies <exp(-dH)> ~ 1 on-device
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from schwingermodel_tpu.config import CGParams, HMCParams, LatticeParams
from schwingermodel_tpu.models.schwinger import SchwingerModel
from schwingermodel_tpu.ops import eo
from schwingermodel_tpu.ops.pallas_eo import cg_solve_eo_fused
from schwingermodel_tpu.solvers import dfloat as D
from schwingermodel_tpu.utils import prng
from tests.reference_impl import dirac_ref, dirac_dagger_ref


def _model(refine=False, tol=None, Nx=8, Nt=8):
    cg = CGParams(tol=tol or (1e-10 if refine else 1e-6), max_iter=4000,
                  refine=refine, refine_impl="dfloat")
    return SchwingerModel(
        lattice=LatticeParams(Nx=Nx, Nt=Nt, real_dtype="float32"),
        hmc=HMCParams(beta=2.0, m0=0.1, even_odd=True, md_steps=8,
                      trajectory_length=1.0, cg=cg),
    )


def _theta(rng, shape=(2, 8, 8)):
    # dtype conversion must happen host-side: an eager on-device convert
    # (or any eager primitive) is unsupported by this tunneled backend
    return jnp.asarray(np.asarray(
        rng.uniform(-np.pi, np.pi, shape), np.float32))


def _thetas(rng, C, shape=(2, 8, 8)):
    # one host-side stack + one transfer (eager device stacks are
    # unsupported here)
    return jnp.asarray(np.asarray(
        rng.uniform(-np.pi, np.pi, (C,) + shape), np.float32))


def _spinor(rng, shape):
    re = jnp.asarray(np.asarray(rng.standard_normal(shape), np.float32))
    im = jnp.asarray(np.asarray(rng.standard_normal(shape), np.float32))
    return jax.jit(jax.lax.complex)(re, im)



# this backend cannot transfer complex arrays host<->device; split into
# f32 planes on the right side of the wire
@jax.jit
def _split_ri(z):
    return jnp.real(z), jnp.imag(z)


def to_host_c(z) -> np.ndarray:
    re, im = _split_ri(z)
    return np.asarray(re, np.float64) + 1j * np.asarray(im, np.float64)


def to_dev_c(a: np.ndarray):
    re = jnp.asarray(np.asarray(a.real, np.float32))
    im = jnp.asarray(np.asarray(a.imag, np.float32))
    return jax.jit(jax.lax.complex)(re, im)


# ---------- numpy float64 EO oracle (independent of all jax code) ----------

def _np_pack(a, parity):
    Nx, Nt = a.shape[-2:]
    out = np.empty(a.shape[:-1] + (Nt // 2,), a.dtype)
    for x in range(Nx):
        off = (x + parity) % 2
        out[..., x, :] = a[..., x, off::2]
    return out


def _np_unpack_even(e):
    Nx, Nth = e.shape[-2:]
    full = np.zeros(e.shape[:-1] + (2 * Nth,), e.dtype)
    for x in range(Nx):
        off = x % 2
        full[..., x, off::2] = e[..., x, :]
    return full


def _np_eo_normal(U, v_e, m0):
    """(Dhat Dhat^+) v via the full-D oracle: H phi = 2(m phi - D phi),
    Dhat v = m v - c * even(H_eo H_oe v)."""
    m = m0 + 2.0
    c = 1.0 / (4.0 * m)

    def H(phi):
        return 2.0 * (m * phi - dirac_ref(U, phi, m0))

    def Hdag(phi):
        return 2.0 * (m * phi - dirac_dagger_ref(U, phi, m0))

    def dhat(v):
        full = _np_unpack_even(v)
        return m * v - c * _np_pack(H(H(full)), 0)

    def dhat_dag(v):
        full = _np_unpack_even(v)
        return m * v - c * _np_pack(Hdag(Hdag(full)), 0)

    return dhat(dhat_dag(v_e))


def _np_links(theta, Nt):
    """f64 PLAIN links from the exact f32 angles (dirac_ref applies the
    antiperiodic time signs itself -- do not fold them here)."""
    del Nt
    return np.exp(1j * np.asarray(theta, np.float64))


# ---------- the tests ----------

def test_eft_selfcheck_true_on_tpu():
    """The dfloat contract's foundation: this backend preserves EFTs."""
    assert D.eft_selfcheck() is True


def test_fused_kernel_matches_jnp_cg(rng):
    model = _model()
    theta = _theta(rng)
    v = _spinor(rng, (2, 8, 4))

    @jax.jit
    def setup(th, vv):
        ops = model.eo_ops(th)
        return ops.Ue, ops.Uo, ops.dhat(vv)

    Ue, Uo, b = setup(theta, v)
    res = cg_solve_eo_fused(Ue, Uo, b, b, m0=0.1, tol=1e-6,
                            max_iter=4000, interpret=False)
    assert bool(res.converged)
    # jnp CG reference on the same device
    from schwingermodel_tpu.solvers.cg import cg_solve

    @jax.jit
    def solve_ref(th, bb):
        ops = model.eo_ops(th)
        return cg_solve(ops.normal, bb, model._dot_re, tol=1e-6,
                        max_iter=4000)

    ref = solve_ref(theta, b)
    assert bool(ref.converged)
    np.testing.assert_allclose(to_host_c(res.x), to_host_c(ref.x),
                               rtol=0, atol=5e-4)


def test_lane_packed_chains_match_single_solves(rng):
    """C=8 lane-packed kernel == 8 independent single-kernel solves."""
    model = _model()
    C = 8
    thetas = _thetas(rng, C)

    @jax.jit
    def setup(th):
        Uf = jax.vmap(model.fermion_links)(th)
        Ue = jax.vmap(lambda u: eo.pack(model.geom, u, eo.EVEN))(Uf)
        Uo = jax.vmap(lambda u: eo.pack(model.geom, u, eo.ODD))(Uf)
        return Ue, Uo

    Ue, Uo = setup(thetas)
    b = _spinor(rng, (C, 2, 8, 4))

    packed = jax.jit(jax.vmap(
        lambda ue, uo, bb: cg_solve_eo_fused(
            ue, uo, bb, bb, m0=0.1, tol=1e-6, max_iter=4000)))(Ue, Uo, b)
    assert bool(jnp.all(packed.converged))
    # host copies first: eager device indexing is unsupported on this
    # backend (compiled programs only)
    px = to_host_c(packed.x)
    Ue_h, Uo_h, b_h = to_host_c(Ue), to_host_c(Uo), to_host_c(b)
    for c in range(C):
        single = cg_solve_eo_fused(
            to_dev_c(Ue_h[c]), to_dev_c(Uo_h[c]),
            to_dev_c(b_h[c]), to_dev_c(b_h[c]), m0=0.1,
            tol=1e-6, max_iter=4000)
        np.testing.assert_allclose(px[c], to_host_c(single.x),
                                   rtol=0, atol=5e-4)


def test_refined_solve_true_residual_on_device(rng):
    """The 1e-10 contract ON THE CHIP: dfloat-refined solve, residual
    measured in host numpy f64 with an independent operator."""
    model = _model(refine=True)
    theta = _theta(rng)
    v = _spinor(rng, (2, 8, 4))
    b = jax.jit(lambda th, vv: model.eo_ops(th).dhat(vv))(theta, v)

    res, x_df = jax.jit(
        lambda th, bb: model._solve_eo_refined(th, model.eo_ops(th), bb)
    )(theta, b)
    assert bool(res.converged)

    x64 = (np.asarray(x_df.re[0], np.float64)
           + np.asarray(x_df.re[1], np.float64)
           + 1j * (np.asarray(x_df.im[0], np.float64)
                   + np.asarray(x_df.im[1], np.float64)))
    U = _np_links(np.asarray(theta), 8)
    b_h = to_host_c(b)
    r = _np_eo_normal(U, x64, 0.1) - b_h
    rel = np.linalg.norm(r.ravel()) / np.linalg.norm(b_h.ravel())
    assert rel < 1e-10, rel


def test_packed_trajectory_detailed_balance_on_device(rng):
    """<exp(-dH)> = 1 for the fused packed trajectory on the real chip
    (8 chains x 120 measured trajectories, 8x8)."""
    from functools import partial

    from schwingermodel_tpu.hmc import packed as hp

    model = _model()
    C = 8
    thetas = _thetas(rng, C)
    th = jax.jit(lambda t: hp.pack_theta(model, t))(thetas)
    key = prng.root_key(3)

    @partial(jax.jit, static_argnames=("n",))
    def block(th, k0, n):
        def body(carry, i):
            th = carry
            keys = jax.vmap(lambda c: jax.random.fold_in(
                prng.trajectory_key(k0, i), c))(jnp.arange(C))
            th, st = hp.hmc_trajectory_packed(model, th, keys)
            return th, (st.exp_mdH, st.accepted, st.cg_converged)
        return jax.lax.scan(body, th, jnp.arange(n))

    th, _ = block(th, key, 40)
    th, (e, acc, conv) = block(th, jax.random.fold_in(key, 1), 120)
    assert bool(jnp.all(conv))
    em = float(jnp.mean(e))
    assert 0.8 < em < 1.2, em
    assert float(jnp.mean(acc)) > 0.5


def test_df_residual_kernel_on_device(rng):
    """The fused df residual kernel (real Mosaic compile) == b - A x
    measured against the independent numpy f64 oracle."""
    from schwingermodel_tpu.ops import pallas_traj as pt
    from schwingermodel_tpu.ops import pallas_df as pdf

    model = _model(refine=True)
    C, Nx, Nt, Nth = 2, 8, 8, 4
    theta = _thetas(rng, C)
    x = _spinor(rng, (C, 2, Nx, Nth))
    b = _spinor(rng, (C, 2, Nx, Nth))

    @jax.jit
    def go(th, xx, bb):
        E, O = pt.pack_chains(model.geom, th)
        xp = pt.pack_even(xx)
        bp = pt.pack_even(bb)
        r_hi, r_lo = pdf.df_residual_fused(
            E, O, bp, jnp.zeros_like(bp), xp, jnp.zeros_like(xp),
            m0=0.1, Nth=Nth)
        return pt.unpack_even(r_hi, C), pt.unpack_even(r_lo, C)

    r_hi, r_lo = go(theta, x, b)
    got = to_host_c(r_hi) + to_host_c(r_lo)

    th_h = np.asarray(theta)
    x_h, b_h = to_host_c(x), to_host_c(b)
    for c in range(C):
        U = _np_links(th_h[c], Nt)
        ref = b_h[c] - _np_eo_normal(U, x_h[c], 0.1)
        assert np.abs(got[c] - ref).max() < 1e-11 * max(
            np.abs(ref).max(), 1.0), c


def test_solve_refined_packed_contract_on_device(rng):
    """The packed 1e-10-contract solve on the chip: true residual checked
    against the independent numpy f64 oracle."""
    from schwingermodel_tpu.ops import pallas_traj as pt
    from schwingermodel_tpu.ops import pallas_df as pdf

    model = _model(refine=True)
    C, Nx, Nt, Nth = 2, 8, 8, 4
    theta = _thetas(rng, C)
    v = _spinor(rng, (C, 2, Nx, Nth))

    @jax.jit
    def go(th, vv):
        phi = jax.vmap(lambda t, w: model.eo_ops(t).dhat(w))(th, vv)
        E, O = pt.pack_chains(model.geom, th)
        phi_p = pt.pack_even(phi)
        sol = pdf.solve_refined_packed(
            E, O, phi_p, phi_p, m0=0.1, tol=1e-10, inner_tol=1e-5,
            max_iter=2000, max_outer=8, Nth=Nth)
        return (phi, pt.unpack_even(sol.x_hi, C),
                pt.unpack_even(sol.x_lo, C), sol.converged)

    phi, x_hi, x_lo, conv = go(theta, v)
    assert bool(jnp.all(conv))
    x128 = to_host_c(x_hi) + to_host_c(x_lo)
    th_h = np.asarray(theta)
    phi_h = to_host_c(phi)
    for c in range(C):
        U = _np_links(th_h[c], Nt)
        r = _np_eo_normal(U, x128[c], 0.1) - phi_h[c]
        rel = np.linalg.norm(r.ravel()) / np.linalg.norm(phi_h[c].ravel())
        assert rel < 1e-10, (c, rel)


def test_packed_refined_trajectory_on_device(rng):
    """The refined packed trajectory (the shipped contract's fast path):
    runs, converges, and satisfies <exp(-dH)> ~ 1 over a short chain."""
    from functools import partial

    import dataclasses

    from schwingermodel_tpu.hmc import packed as hp

    model = _model(refine=True)
    model = dataclasses.replace(
        model, hmc=dataclasses.replace(
            model.hmc, md_steps=6, trajectory_length=0.6))
    C = 4
    thetas = _thetas(rng, C)
    th = jax.jit(lambda t: hp.pack_theta(model, t))(thetas)
    key = prng.root_key(9)

    @partial(jax.jit, static_argnames=("n",))
    def block(th, k0, n):
        def body(carry, i):
            th = carry
            keys = jax.vmap(lambda c: jax.random.fold_in(
                prng.trajectory_key(k0, i), c))(jnp.arange(C))
            th, st = hp.hmc_trajectory_packed(model, th, keys)
            return th, (st.exp_mdH, st.accepted, st.cg_converged)
        return jax.lax.scan(body, th, jnp.arange(n))

    th, _ = block(th, key, 25)
    th, (e, acc, conv) = block(th, jax.random.fold_in(key, 1), 60)
    assert bool(jnp.all(conv))
    em = float(jnp.mean(e))
    assert 0.7 < em < 1.3, em
    assert float(jnp.mean(acc)) > 0.5


def test_condensate_refined_on_device(rng):
    """The condensate chain under the SHIPPED contract (f32 + cg.refine,
    tol=1e-10, even-odd) on the real chip: every solve converges and the
    residual of D w = z, measured host-side in numpy f64 against the
    independent reference operator, certifies the solve (round-3 verdict
    weakness 1: this path used to stall at the f32 floor)."""
    from schwingermodel_tpu import observables as obs

    model = _model(refine=True, tol=1e-10)
    theta = _theta(rng)
    zs = obs.condensate_noise(model, jax.random.PRNGKey(3), theta.shape,
                              n_noise=2)

    @jax.jit
    def measure(th, zs):
        res = obs.chiral_condensate_given_noise(model, th, zs)
        return res.value, res.solves.iters, res.solves.all_converged

    @jax.jit
    def inv_one(th, z):
        w, r = model.dirac_inverse(th, z)
        return w, r.converged

    val, iters, conv = jax.device_get(measure(theta, zs))
    assert bool(conv), "condensate solves must converge at tol=1e-10"
    assert np.isfinite(val)

    # host-side f64 certification on one noise vector: ||D w - z|| / ||z||
    # (complex transfers are unsupported on this tunneled backend -- split
    # real/imag through to_host_c)
    w, c1 = inv_one(theta, zs[0])
    w = to_host_c(w)
    U64 = _np_links(np.asarray(jax.device_get(theta)), 8)
    z64 = to_host_c(zs[0])
    Dw = dirac_ref(U64, np.asarray(w, np.complex128), model.hmc.m0)
    rel = np.linalg.norm(Dw - z64) / np.linalg.norm(z64)
    # the inner normal solve is 1e-10-certified; the assembly (hops, D^+)
    # runs in f32, bounding the end-to-end inverse at ~kappa * eps_f32
    assert rel < 1e-4, rel


def test_solve_refined_fused_ru_contract_on_device(rng):
    """The reliable-update single-kernel 1e-10 solve (pallas_df.
    solve_refined_fused -- the trajectory's solver since round 4): true
    residual certified against the independent numpy f64 oracle, and
    cheaper than the restart-based refinement it replaced."""
    from schwingermodel_tpu.ops import pallas_traj as pt
    from schwingermodel_tpu.ops import pallas_df as pdf

    model = _model(refine=True)
    C, Nx, Nt, Nth = 2, 8, 8, 4
    theta = _thetas(rng, C)
    v = _spinor(rng, (C, 2, Nx, Nth))

    @jax.jit
    def go(th, vv):
        phi = jax.vmap(lambda t, w: model.eo_ops(t).dhat(w))(th, vv)
        E, O = pt.pack_chains(model.geom, th)
        phi_p = pt.pack_even(phi)
        ru = pdf.solve_refined_fused(
            E, O, phi_p, phi_p, m0=0.1, tol=1e-10, tau=1e-5,
            max_iter=2000, max_outer=8, Nth=Nth)
        old = pdf.solve_refined_packed(
            E, O, phi_p, phi_p, m0=0.1, tol=1e-10, inner_tol=1e-5,
            max_iter=2000, max_outer=8, Nth=Nth)
        return (phi, pt.unpack_even(ru.x_hi, C), pt.unpack_even(ru.x_lo, C),
                ru.converged, ru.iters, old.iters)

    phi, x_hi, x_lo, conv, it_ru, it_old = go(theta, v)
    assert bool(jnp.all(conv))
    assert int(jnp.sum(it_ru)) <= int(jnp.sum(it_old)), (
        np.asarray(it_ru), np.asarray(it_old))
    x128 = to_host_c(x_hi) + to_host_c(x_lo)
    th_h = np.asarray(theta)
    phi_h = to_host_c(phi)
    for c in range(C):
        U = _np_links(th_h[c], Nt)
        r = _np_eo_normal(U, x128[c], 0.1) - phi_h[c]
        rel = np.linalg.norm(r.ravel()) / np.linalg.norm(phi_h[c].ravel())
        assert rel < 1e-10, (c, rel)


def test_solve_refined_fused_mre_history_on_device(rng):
    """The in-kernel MRE forecast (hist K=4, difference-space Gram-Schmidt)
    produces a certified solve that is never worse than the K=1 start:
    same contract, iterations <= the plain-start solve + GS noise slack."""
    from schwingermodel_tpu.ops import pallas_traj as pt
    from schwingermodel_tpu.ops import pallas_df as pdf

    model = _model(refine=True)
    C, Nx, Nt, Nth = 2, 8, 8, 4
    theta = _thetas(rng, C)
    v = _spinor(rng, (C, 2, Nx, Nth))

    @jax.jit
    def go(th, vv):
        phi = jax.vmap(lambda t, w: model.eo_ops(t).dhat(w))(th, vv)
        E, O = pt.pack_chains(model.geom, th)
        phi_p = pt.pack_even(phi)
        base = pdf.solve_refined_fused(
            E, O, phi_p, phi_p, m0=0.1, tol=1e-10, tau=1e-5,
            max_iter=2000, max_outer=8, Nth=Nth)
        # history: the exact solution, a perturbed copy, and junk -- MRE
        # must pick the good directions and start essentially converged
        hist = jnp.stack([
            base.x,
            base.x * jnp.float32(1.001),
            phi_p,
            jnp.zeros_like(phi_p),
        ])
        mre = pdf.solve_refined_fused(
            E, O, phi_p, hist, m0=0.1, tol=1e-10, tau=1e-5,
            max_iter=2000, max_outer=8, Nth=Nth)
        return base.converged, base.iters, mre.converged, mre.iters

    bc, bi, mc, mi = go(theta, v)
    assert bool(jnp.all(bc)) and bool(jnp.all(mc))
    # starting from span{x*, ...} the MRE solve needs only the df cleanup
    assert int(jnp.max(mi)) <= int(jnp.max(bi)), (
        np.asarray(mi), np.asarray(bi))


def test_df_cg_fallback_on_device(rng):
    """The double-float CG fallback kernel (pallas_df.solve_df_cg_fused,
    engaged by solve_refined_fused's df_fallback cond) lifts the RU
    solver's f32 conditioning envelope on the real chip: at a mass 1e-2
    from a dense-eig singular point of chain 0's configuration
    (kappa ~ 2e5) the plain RU solve stagnates with converged=False, the
    fallback converges and its solution certifies the 1e-10 true-residual
    contract against the independent numpy f64 oracle. Chain 1 stays
    well-conditioned, covering the per-lane masking (converged lanes must
    pass through the fallback kernel untouched)."""
    from schwingermodel_tpu.ops import pallas_traj as pt
    from schwingermodel_tpu.ops import pallas_df as pdf

    C, Nx, Nt, Nth = 2, 8, 8, 4
    theta = _thetas(rng, C)
    th_h = np.asarray(theta, np.float64)

    # host-side: find a real eigenvalue crossing of chain 0's Wilson
    # operator (D = (m0+2) - H/2 is singular when m0+2 meets a real
    # eigenvalue of H/2, i.e. dirac_ref at m0 = -2 gives -H/2)
    U0 = _np_links(th_h[0], Nt)
    dim = 2 * Nx * Nt
    cols = np.empty((dim, dim), np.complex128)
    basis = np.eye(dim, dtype=np.complex128)
    for j in range(dim):
        cols[:, j] = dirac_ref(
            U0, basis[:, j].reshape(2, Nx, Nt), -2.0).reshape(-1)
    lam = np.linalg.eigvals(cols)
    real = np.sort(lam[np.abs(lam.imag) < 1e-9].real)
    m0s = -2.0 - real
    sel = m0s[(m0s > -1.0) & (m0s < 0.5)]
    assert len(sel) > 0
    m0 = float(sel[0]) + 1e-2

    v = _spinor(rng, (C, 2, Nx, Nth))
    model = SchwingerModel(
        lattice=LatticeParams(Nx=Nx, Nt=Nt, real_dtype="float32"),
        hmc=HMCParams(beta=2.0, m0=m0, even_odd=True,
                      cg=CGParams(tol=1e-10, max_iter=4000, refine=True,
                                  refine_impl="dfloat")))

    @jax.jit
    def go(th, vv):
        phi = jax.vmap(lambda t, w: model.eo_ops(t).dhat(w))(th, vv)
        E, O = pt.pack_chains(model.geom, th)
        phi_p = pt.pack_even(phi)
        plain = pdf.solve_refined_fused(
            E, O, phi_p, phi_p, m0=m0, tol=1e-10, tau=1e-5,
            max_iter=4000, max_outer=8, Nth=Nth, df_fallback=False)
        fb = pdf.solve_refined_fused(
            E, O, phi_p, phi_p, m0=m0, tol=1e-10, tau=1e-5,
            max_iter=4000, max_outer=8, Nth=Nth, df_fallback=True)
        return (phi, plain.converged,
                pt.unpack_even(fb.x_hi, C), pt.unpack_even(fb.x_lo, C),
                fb.converged, plain.iters, fb.iters)

    phi, conv0, x_hi, x_lo, conv1, it0, it1 = go(theta, v)
    assert not bool(np.asarray(conv0)[0])       # ill chain stagnates
    assert bool(jnp.all(conv1)), np.asarray(conv1)
    x128 = to_host_c(x_hi) + to_host_c(x_lo)
    phi_h = to_host_c(phi)
    for c in range(C):
        U = _np_links(th_h[c], Nt)
        r = _np_eo_normal(U, x128[c], m0) - phi_h[c]
        rel = np.linalg.norm(r.ravel()) / np.linalg.norm(phi_h[c].ravel())
        assert rel < 1e-10, (c, rel)


def test_depth_gated_force_certification_on_device(rng):
    """Depth-gated df certification of force-tolerance solves
    (cg.certify_forces; pallas_df cert_k): on a deep recursion (an
    eigenvalue-crossing mass + 5e-2, hundreds of f32 iterations) the
    certify=False solve with the default cert_k=192 must return a
    solution whose TRUE residual (independent numpy f64 oracle) meets
    the force tolerance -- the pure-trusted exit (cert_k=max_iter, the
    pre-round-5 behavior) drifts past it (measured 3.9e-7 on a
    claimed-1e-8 32x32 near-critical solve). One-sided contract: gated
    true residual <= tol and <= the trusted exit's."""
    from schwingermodel_tpu.ops import pallas_traj as pt
    from schwingermodel_tpu.ops import pallas_df as pdf

    C, Nx, Nt, Nth = 2, 8, 8, 4
    theta = _thetas(rng, C)
    th_h = np.asarray(theta, np.float64)

    U0 = _np_links(th_h[0], Nt)
    dim = 2 * Nx * Nt
    cols = np.empty((dim, dim), np.complex128)
    basis = np.eye(dim, dtype=np.complex128)
    for j in range(dim):
        cols[:, j] = dirac_ref(
            U0, basis[:, j].reshape(2, Nx, Nt), -2.0).reshape(-1)
    lam = np.linalg.eigvals(cols)
    real = np.sort(lam[np.abs(lam.imag) < 1e-9].real)
    m0s = -2.0 - real
    sel = m0s[(m0s > -1.0) & (m0s < 0.5)]
    assert len(sel) > 0
    m0 = float(sel[0]) + 5e-2
    tol = 1e-8

    model = SchwingerModel(
        lattice=LatticeParams(Nx=Nx, Nt=Nt, real_dtype="float32"),
        hmc=HMCParams(beta=2.0, m0=m0, even_odd=True,
                      cg=CGParams(tol=tol, max_iter=8000, refine=True,
                                  refine_impl="dfloat")))
    v = _spinor(rng, (C, 2, Nx, Nth))

    @jax.jit
    def go(th, vv):
        phi = jax.vmap(lambda t, w: model.eo_ops(t).dhat(w))(th, vv)
        E, O = pt.pack_chains(model.geom, th)
        phi_p = pt.pack_even(phi)
        gated = pdf.solve_refined_fused(
            E, O, phi_p, phi_p, m0=m0, tol=tol, tau=1e-5,
            max_iter=8000, max_outer=12, Nth=Nth, certify=False,
            cert_k=192, df_fallback=True)
        trusted = pdf.solve_refined_fused(
            E, O, phi_p, phi_p, m0=m0, tol=tol, tau=1e-5,
            max_iter=8000, max_outer=12, Nth=Nth, certify=False,
            cert_k=8000, df_fallback=False)
        return (phi,
                pt.unpack_even(gated.x_hi, C), pt.unpack_even(gated.x_lo, C),
                gated.converged, gated.iters,
                pt.unpack_even(trusted.x_hi, C),
                pt.unpack_even(trusted.x_lo, C), trusted.iters)

    phi, gh, gl, gconv, git, th_x, tl, tit = go(theta, v)
    assert bool(jnp.all(gconv)), np.asarray(gconv)
    # the gate must actually have engaged on the ill chain
    assert int(np.asarray(git)[0]) > 192, np.asarray(git)
    g128 = to_host_c(gh) + to_host_c(gl)
    t128 = to_host_c(th_x) + to_host_c(tl)
    phi_h = to_host_c(phi)
    for c in range(C):
        U = _np_links(th_h[c], Nt)
        bn = np.linalg.norm(phi_h[c].ravel())
        rg = np.linalg.norm(
            (_np_eo_normal(U, g128[c], m0) - phi_h[c]).ravel()) / bn
        rt = np.linalg.norm(
            (_np_eo_normal(U, t128[c], m0) - phi_h[c]).ravel()) / bn
        assert rg < tol, (c, rg)
        assert rg <= rt * 1.01, (c, rg, rt)
