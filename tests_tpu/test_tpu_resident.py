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
    return jnp.asarray(rng.uniform(-np.pi, np.pi, shape), jnp.float32)


def _spinor(rng, shape):
    return jnp.asarray(rng.standard_normal(shape)
                       + 1j * rng.standard_normal(shape), jnp.complex64)


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
    """f64 antiperiodic-folded links from the exact f32 angles."""
    th = np.asarray(theta, np.float64)
    U = np.exp(1j * th)
    t = np.arange(Nt)
    U[0, :, :] *= np.where(t == Nt - 1, -1.0, 1.0)
    return U


# ---------- the tests ----------

def test_eft_selfcheck_true_on_tpu():
    """The dfloat contract's foundation: this backend preserves EFTs."""
    assert D.eft_selfcheck() is True


def test_fused_kernel_matches_jnp_cg(rng):
    model = _model()
    theta = _theta(rng)
    ops = model.eo_ops(theta)
    b = ops.dhat(_spinor(rng, (2, 8, 4)))
    res = cg_solve_eo_fused(ops.Ue, ops.Uo, b, b, m0=0.1, tol=1e-6,
                            max_iter=4000, interpret=False)
    assert bool(res.converged)
    # jnp CG reference on the same device
    from schwingermodel_tpu.solvers.cg import cg_solve

    ref = cg_solve(ops.normal, b, model._dot_re, tol=1e-6, max_iter=4000)
    assert bool(ref.converged)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=0, atol=5e-4)


def test_lane_packed_chains_match_single_solves(rng):
    """C=8 lane-packed kernel == 8 independent single-kernel solves."""
    model = _model()
    C = 8
    thetas = jnp.stack([_theta(rng) for _ in range(C)])
    Uf = jax.vmap(model.fermion_links)(thetas)
    Ue = jax.vmap(lambda u: eo.pack(model.geom, u, eo.EVEN))(Uf)
    Uo = jax.vmap(lambda u: eo.pack(model.geom, u, eo.ODD))(Uf)
    b = _spinor(rng, (C, 2, 8, 4))

    packed = jax.jit(jax.vmap(
        lambda ue, uo, bb: cg_solve_eo_fused(
            ue, uo, bb, bb, m0=0.1, tol=1e-6, max_iter=4000)))(Ue, Uo, b)
    assert bool(jnp.all(packed.converged))
    for c in range(C):
        single = cg_solve_eo_fused(Ue[c], Uo[c], b[c], b[c], m0=0.1,
                                   tol=1e-6, max_iter=4000)
        np.testing.assert_allclose(np.asarray(packed.x[c]),
                                   np.asarray(single.x),
                                   rtol=0, atol=5e-4)


def test_refined_solve_true_residual_on_device(rng):
    """The 1e-10 contract ON THE CHIP: dfloat-refined solve, residual
    measured in host numpy f64 with an independent operator."""
    model = _model(refine=True)
    theta = _theta(rng)
    ops = model.eo_ops(theta)
    b = ops.dhat(_spinor(rng, (2, 8, 4)))

    res, x_df = jax.jit(
        lambda th, bb: model._solve_eo_refined(th, model.eo_ops(th), bb)
    )(theta, b)
    assert bool(res.converged)

    x64 = (np.asarray(x_df.re[0], np.float64)
           + np.asarray(x_df.re[1], np.float64)
           + 1j * (np.asarray(x_df.im[0], np.float64)
                   + np.asarray(x_df.im[1], np.float64)))
    U = _np_links(theta, 8)
    r = _np_eo_normal(U, x64, 0.1) - np.asarray(b, np.complex128)
    rel = np.linalg.norm(r.ravel()) / np.linalg.norm(
        np.asarray(b, np.complex128).ravel())
    assert rel < 1e-10, rel


def test_packed_trajectory_detailed_balance_on_device(rng):
    """<exp(-dH)> = 1 for the fused packed trajectory on the real chip
    (8 chains x 120 measured trajectories, 8x8)."""
    from functools import partial

    from schwingermodel_tpu.hmc import packed as hp

    model = _model()
    C = 8
    thetas = jnp.stack([_theta(rng) for _ in range(C)])
    th = hp.pack_theta(model, thetas)
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
