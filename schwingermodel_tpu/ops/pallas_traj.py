"""Lane-packed trajectory layout + fused MD force-step Pallas kernel.

Round-2 analysis (VERDICT r2): the lane-packed fused CG kernel
(ops/pallas_eo.py) runs near its VPU roofline, but the *rest* of each MD
step -- fermion-force assembly (an autodiff-transposed stencil of dozens of
small XLA fusions), staple force, link construction, and the pack/unpack
around every fused solve -- still runs as small per-chain-batch XLA ops.
This module removes that Amdahl tail two ways at once:

1. **The trajectory STATE lives permanently in the lane-packed layout**:
   theta and pi are kept as even/odd checkerboard f32 planes [2, Nx, N]
   (N = C * Nth lanes, chain-major blocks -- the same layout the fused CG
   packs into). Integrator axpys are then full-lane-utilization elementwise
   ops and the per-solve pack/unpack disappears entirely; fields are
   unpacked only for I/O and checkpointing.

2. **One Pallas kernel per MD force step**: link construction (sin/cos of
   the angle planes with the antiperiodic sign folded in-kernel), the whole
   CG solve, chi' = Dhat^+ psi, and BOTH force terms (fermion + staple) run
   as a single TPU program with everything pinned in VMEM.

Mathematics of the in-kernel forces (validated against the XLA path in
tests/test_pallas_traj.py):

  Fermion force. With Dhat = m - c H_eo H_oe (c = 1/(4m), ops/eo.py) and
  psi = (Dhat Dhat^+)^{-1} Phi, chi' = Dhat^+ psi,
      dS_f = -2 Re<psi, dDhat chi'>
           = 2c Re[<psi, dH_eo a> + <b, dH_oe chi'>],
  where a = H_oe chi' (odd), b = (H_eo)^+ psi (odd). Because H only couples
  opposite parities, both terms together equal Re<x, dH y> on the FULL
  lattice with x = psi (+) b and y = a (+) chi', so
      F_mu(n) = -dS_f/dtheta_mu(n) = 2c * f_mu(x, y)
  with f_mu the reference force stencil (phi_dag_partialD_phi, reference
  src/dirac_operator.cpp:486-505, doc Eqs (37)-(38); the same expression
  ops/dirac.fermion_force evaluates). Evaluated checkerboard-wise: for even
  n the stencil reads (x_e, y_e) on-site and gathered (x_o, y_o) neighbors,
  and vice versa.

  Gauge force. F_0(n) = -beta [sin P(n) - sin P(n - x)],
  F_1(n) = beta [sin P(n) - sin P(n - t)] with P the plaquette angle
  (algebraically identical to -beta Im[U conj(staple)], reference Force_G
  src/hmc.cpp:32-39 -- see ops/gauge.py). The antiperiodic sign folded into
  u0 cancels inside every plaquette product (u0 enters twice at equal t),
  so folded links are used throughout.

Scope: single-device (the flagship dense-chip path). The sharded lattice
path keeps the jnp stencils with ppermute halos (ops/eo.py, solvers/cg.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from schwingermodel_tpu.ops import eo
from schwingermodel_tpu.ops.geometry import Geometry
from schwingermodel_tpu.ops.pallas_eo import (
    _VMEM_LIMIT_BYTES,
    _cadd,
    _cmul,
    _cmuli,
    _csel,
    _cshift,
    _csub,
    _hop,
    _hop_dag,
    _shift_m_x,
    _shift_p_x,
    _spinor_axpbv,
)


# ---------- lane geometry (module level, shared kernel <-> XLA) ----------

def lane_tshifts(N: int, Nth: int):
    """(shift_p_k, shift_m_k): in-chain periodic time shifts on [.., Nx, N]
    planes -- one global lane roll fixed up at each chain-block boundary
    (the nested closures of pallas_eo._cg_kernel_mc, factored out so the
    XLA-level packed ops reuse them)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
    col = jax.lax.rem(lane, jnp.int32(Nth))
    last_col = col == jnp.int32(Nth - 1)
    first_col = col == jnp.int32(0)

    def shift_p_k(a):
        nxt = jnp.concatenate([a[..., :, 1:], a[..., :, :1]], axis=-1)
        if N == Nth:
            return nxt
        wrap = jnp.concatenate(
            [a[..., :, N - (Nth - 1):], a[..., :, :N - (Nth - 1)]], axis=-1)
        return jnp.where(last_col, wrap, nxt)

    def shift_m_k(a):
        prv = jnp.concatenate([a[..., :, -1:], a[..., :, :-1]], axis=-1)
        if N == Nth:
            return prv
        wrap = jnp.concatenate(
            [a[..., :, Nth - 1:], a[..., :, :Nth - 1]], axis=-1)
        return jnp.where(first_col, wrap, prv)

    return shift_p_k, shift_m_k


def parity_masks(Nx: int):
    """(mask_e, mask_o): [Nx, 1] bool, True where the row's packed t-offset
    is 1 (eo.row_offset semantics: off_e(x) = x mod 2, off_o = (x+1) mod 2)."""
    mask_x = jax.lax.rem(
        jax.lax.broadcasted_iota(jnp.int32, (Nx, 1), 0), jnp.int32(2))
    return mask_x == jnp.int32(1), mask_x == jnp.int32(0)


def _g_pt(a, mask_tgt, sp):
    """Real plane at the target site's t+1 neighbor (eo._gather_pt)."""
    return jnp.where(mask_tgt, sp(a), a)


def _g_mt(a, mask_tgt, sm):
    """Real plane at the target site's t-1 neighbor (eo._gather_mt)."""
    return jnp.where(mask_tgt, a, sm(a))


def _cg_pt(z, mask_tgt, sp):
    return _csel(mask_tgt, _cshift(sp, z), z)


def _im(z):
    return z[1]


def _cconj(z):
    return (z[0], -z[1])


def _cneg(z):
    return (-z[0], -z[1])


# ---------- links from angle planes ----------

def links_from_theta_planes(th0e, th1e, th0o, th1o, Nth: int):
    """(ue, uo) = ((u0, u1) complex pairs) from per-direction angle planes
    [Nx, N], with the antiperiodic time sign folded into u0
    (dirac.fermion_links: negate u0 where global t == Nt-1, i.e. packed col
    Nth-1 of the rows whose packed offset is 1 -- Nt-1 is odd)."""
    Nx, N = th0e.shape[-2:]
    mask_e, mask_o = parity_masks(Nx)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
    last = jax.lax.rem(lane, jnp.int32(Nth)) == jnp.int32(Nth - 1)
    one = jnp.float32(1.0)
    sE = jnp.where(jnp.logical_and(mask_e, last), -one, one)
    sO = jnp.where(jnp.logical_and(mask_o, last), -one, one)
    ue = ((jnp.cos(th0e) * sE, jnp.sin(th0e) * sE),
          (jnp.cos(th1e), jnp.sin(th1e)))
    uo = ((jnp.cos(th0o) * sO, jnp.sin(th0o) * sO),
          (jnp.cos(th1o), jnp.sin(th1o)))
    return ue, uo


def links_from_theta(thE, thO, Nth: int):
    """As links_from_theta_planes, from stacked [2, Nx, N] angle arrays."""
    return links_from_theta_planes(thE[0], thE[1], thO[0], thO[1], Nth)


# ---------- forces on packed planes ----------

def _fermion_force_p(u_p, x_p, y_p, x_q, y_q, mask_p, tsh):
    """(f0, f1) real planes at parity-p sites: the reference force stencil
    f_mu (ops/dirac.fermion_force spin combos) with left=x, right=y; the
    opposite-parity operands x_q/y_q are gathered to n+t / n+x."""
    sp, _ = tsh
    u0, u1 = u_p
    x0, x1 = x_p
    y0, y1 = y_p
    x0q, x1q = x_q
    y0q, y1q = y_q

    yt = _cg_pt(_csub(y0q, y1q), mask_p, sp)            # (y0-y1)(n+t)
    xt = _cg_pt(_cadd(x0q, x1q), mask_p, sp)            # (x0+x1)(n+t)
    yx = _cshift(_shift_p_x, _cadd(y0q, _cmuli(y1q)))   # (y0+iy1)(n+x)
    xx = _cshift(_shift_p_x, _csub(x0q, _cmuli(x1q)))   # (x0-ix1)(n+x)

    f0 = (_im(_cmul(u0, _cmul(_cconj(_csub(x0, x1)), yt)))
          - _im(_cmul(_cconj(u0), _cmul(_cconj(xt), _cadd(y0, y1)))))
    f1 = (_im(_cmul(u1, _cmul(_cconj(_cadd(x0, _cmuli(x1))), yx)))
          + _im(_cmul(_cconj(u1),
                      _cmul(_cconj(xx), _cadd(_cneg(y0), _cmuli(y1))))))
    return f0, f1


def fermion_force_planes(ue, uo, psi, chi_p, mask_e, mask_o, tsh, c):
    """(FE, FO) = 2c * f(x = psi(+)b, y = a(+)chi') on both parities;
    a = H_oe chi', b = (H_eo)^+ psi (see module docstring)."""
    a_o = _hop(uo, ue, chi_p, mask_o, tsh)
    b_o = _hop_dag(uo, ue, psi, mask_o, tsh)
    two_c = jnp.float32(2.0) * c
    f0e, f1e = _fermion_force_p(ue, psi, chi_p, b_o, a_o, mask_e, tsh)
    f0o, f1o = _fermion_force_p(uo, b_o, a_o, psi, chi_p, mask_o, tsh)
    return ((two_c * f0e, two_c * f1e), (two_c * f0o, two_c * f1o))


def plaquette_planes(ue, uo, mask_e, mask_o, tsh):
    """(Pe, Po) complex plaquette products anchored at even/odd sites:
    P(n) = u0(n) u1(n+t) conj(u0(n+x)) conj(u1(n)) (ops/gauge.py). The
    time-boundary sign folded into u0 cancels (u0 twice at equal t)."""
    sp, _ = tsh
    u0e, u1e = ue
    u0o, u1o = uo
    pe = _cmul(_cmul(u0e, _cg_pt(u1o, mask_e, sp)),
               _cconj(_cmul(_cshift(_shift_p_x, u0o), u1e)))
    po = _cmul(_cmul(u0o, _cg_pt(u1e, mask_o, sp)),
               _cconj(_cmul(_cshift(_shift_p_x, u0e), u1o)))
    return pe, po


def gauge_force_planes(ue, uo, mask_e, mask_o, tsh, beta):
    """(FE, FO) staple force planes: F0(n) = -beta[sinP(n) - sinP(n-x)],
    F1(n) = beta[sinP(n) - sinP(n-t)] (== ops/gauge.gauge_force)."""
    _, sm = tsh
    pe, po = plaquette_planes(ue, uo, mask_e, mask_o, tsh)
    se, so = pe[1], po[1]
    beta = jnp.float32(beta) if isinstance(beta, float) else beta
    f0e = -beta * (se - _shift_m_x(so))
    f0o = -beta * (so - _shift_m_x(se))
    f1e = beta * (se - _g_mt(so, mask_e, sm))
    f1o = beta * (so - _g_mt(se, mask_o, sm))
    return (f0e, f1e), (f0o, f1o)


# ---------- per-chain reductions ----------

def block_dot(N: int, Nth: int):
    """dot_pc(u, v) -> [1, N] block-constant per-chain Re<u, v>: row-reduce
    then one [1,N]x[N,N] block-indicator matmul on the MXU (sums within each
    chain block AND broadcasts the chain scalar back across its block)."""
    blk_r = jax.lax.div(
        jax.lax.broadcasted_iota(jnp.int32, (N, N), 0), jnp.int32(Nth))
    blk_c = jax.lax.div(
        jax.lax.broadcasted_iota(jnp.int32, (N, N), 1), jnp.int32(Nth))
    bmat = (blk_r == blk_c).astype(jnp.float32)

    def dot_pc(u, v):
        s = None
        for a, w in zip(u, v):
            t = jnp.sum(a[0] * w[0] + a[1] * w[1], axis=0, keepdims=True)
            s = t if s is None else s + t
        return jax.lax.dot_general(
            s, bmat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def sum_pc(p):
        """[Nx, N] real plane -> [1, N] block-constant per-chain sum."""
        s = jnp.sum(p, axis=0, keepdims=True)
        return jax.lax.dot_general(
            s, bmat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    return dot_pc, sum_pc


# ---------- the fused force-step kernel ----------

def _read_spinor(ref):
    return ((ref[0, 0], ref[0, 1]), (ref[1, 0], ref[1, 1]))


def _write_spinor(ref, s):
    ref[0, 0], ref[0, 1] = s[0]
    ref[1, 0], ref[1, 1] = s[1]


def _cg_planes(apply_A, b, x0, dot_pc, tol, max_iter):
    """Lane-packed lockstep CG (pallas_eo._cg_kernel_mc loop, factored):
    returns (x, iters, rho, bnorm2) with [1, N] block-constant scalars."""
    one = jnp.float32(1.0)
    bnorm2 = dot_pc(b, b)
    stop2 = jnp.float32(tol * tol) * bnorm2
    max_k = jnp.int32(max_iter)
    N = bnorm2.shape[-1]

    r0 = _spinor_axpbv(one, b, -one, apply_A(x0))
    rho0 = dot_pc(r0, r0)
    iters0 = jnp.zeros((1, N), jnp.int32)
    # breakdown mask carried as f32 0/1 (Mosaic cannot carry i1 vectors
    # through scf loop yields): chains whose f32 curvature <d, Ad> stops
    # being positive, or whose residual norm overflows, are frozen instead
    # of NaN-poisoning alpha/beta -- they exit with converged=False (the
    # near-singular-operator regime at the critical mass)
    dead0 = jnp.zeros_like(rho0)

    def cond(carry):
        _, _, _, rho, dead, _, k = carry
        live = jnp.logical_and(rho >= stop2, dead < jnp.float32(0.5))
        return jnp.logical_and(jnp.any(live), k < max_k)

    def body(carry):
        x, r, d, rho, dead, iters, k = carry
        active = jnp.logical_and(rho >= stop2, dead < jnp.float32(0.5))
        Ad = apply_A(d)
        dAd = dot_pc(d, Ad)
        alpha_raw = rho / dAd
        # guards checked BEFORE the x/r updates so a dead chain's state
        # stays finite (non-positive curvature, alpha overflow)
        broke = jnp.logical_and(
            active,
            jnp.logical_or(jnp.logical_not(dAd > jnp.float32(0.0)),
                           jnp.logical_not(jnp.isfinite(alpha_raw))))
        dead = jnp.maximum(dead, broke.astype(jnp.float32))
        active = jnp.logical_and(active, jnp.logical_not(broke))
        alpha = jnp.where(active, alpha_raw, jnp.float32(0.0))
        x = _spinor_axpbv(one, x, alpha, d)
        r = _spinor_axpbv(one, r, -alpha, Ad)
        rho_c = dot_pc(r, r)
        dead = jnp.maximum(
            dead, jnp.logical_and(
                active, jnp.logical_not(jnp.isfinite(rho_c))
            ).astype(jnp.float32))
        # drop overflowed chains from `active` NOW so the beta/d/rho
        # updates can't store inf into d (next iteration's x += 0*d would
        # turn it into NaN)
        active = jnp.logical_and(active, jnp.isfinite(rho_c))
        beta = jnp.where(active, rho_c / rho, jnp.float32(0.0))
        d = tuple(
            _csel(active, (rs[0] + beta * ds[0], rs[1] + beta * ds[1]), ds)
            for rs, ds in zip(r, d))
        rho = jnp.where(active, rho_c, rho)
        iters = iters + jnp.where(active, jnp.int32(1), jnp.int32(0))
        return (x, r, d, rho, dead, iters, k + jnp.int32(1))

    x, _, _, rho, _, iters, _ = jax.lax.while_loop(
        cond, body, (x0, r0, r0, rho0, dead0, iters0, jnp.int32(0)))
    return x, iters, rho, bnorm2


def _force_step_kernel(the_ref, tho_ref, phi_ref, x0_ref,
                       fe_ref, fo_ref, psi_ref, iters_ref, rho_ref,
                       bnorm_ref,
                       *, m: float, beta: float, tol: float, max_iter: int,
                       Nth: int, with_solve: bool, with_gauge: bool = True):
    """One fused MD force step: links + [CG solve] + chi' + fermion force +
    staple force. with_solve=False turns the CG off (psi comes in via
    x0_ref -- the refined path solves outside and only needs the forces)."""
    Nx, N = the_ref.shape[-2:]
    mask_e, mask_o = parity_masks(Nx)
    tsh = lane_tshifts(N, Nth)
    dot_pc, _ = block_dot(N, Nth)
    c = jnp.float32(1.0 / (4.0 * m))
    m = jnp.float32(m)

    ue, uo = links_from_theta_planes(
        the_ref[0], the_ref[1], tho_ref[0], tho_ref[1], Nth)

    def dhat(v):
        w = _hop(uo, ue, v, mask_o, tsh)
        return _spinor_axpbv(m, v, -c, _hop(ue, uo, w, mask_e, tsh))

    def dhat_dag(v):
        w = _hop_dag(uo, ue, v, mask_o, tsh)
        return _spinor_axpbv(m, v, -c, _hop_dag(ue, uo, w, mask_e, tsh))

    x0 = _read_spinor(x0_ref)
    if with_solve:
        b = _read_spinor(phi_ref)
        psi, iters, rho, bnorm2 = _cg_planes(
            lambda v: dhat(dhat_dag(v)), b, x0, dot_pc, tol, max_iter)
    else:
        psi = x0
        N_ = x0[0][0].shape[-1]
        iters = jnp.zeros((1, N_), jnp.int32)
        rho = jnp.zeros((1, N_), jnp.float32)
        bnorm2 = jnp.ones((1, N_), jnp.float32)

    chi_p = dhat_dag(psi)
    (ffe, ffo) = fermion_force_planes(
        ue, uo, psi, chi_p, mask_e, mask_o, tsh, c)
    if with_gauge:
        (gfe, gfo) = gauge_force_planes(
            ue, uo, mask_e, mask_o, tsh, jnp.float32(beta))
    else:
        # Hasenbusch heavy term: the staple force rides the ratio-force
        # kernel instead
        z = jnp.zeros_like(ffe[0])
        (gfe, gfo) = (z, z), (z, z)

    fe_ref[0] = ffe[0] + gfe[0]
    fe_ref[1] = ffe[1] + gfe[1]
    fo_ref[0] = ffo[0] + gfo[0]
    fo_ref[1] = ffo[1] + gfo[1]
    _write_spinor(psi_ref, psi)
    iters_ref[...] = iters
    rho_ref[...] = rho
    bnorm_ref[...] = bnorm2


class ForceStepResult(NamedTuple):
    FE: jax.Array            # f32 [2, Nx, N] force at even sites
    FO: jax.Array            # f32 [2, Nx, N] force at odd sites
    psi: jax.Array           # f32 [2, 2, Nx, N] planar CG solution
    iters: jax.Array         # int32 [C] per-chain iterations
    converged: jax.Array     # bool [C]


@functools.partial(
    jax.jit,
    static_argnames=("m0", "beta", "tol", "max_iter", "Nth", "with_solve",
                     "with_gauge", "interpret"))
def force_step_fused(thE: jax.Array, thO: jax.Array, phi_p: jax.Array,
                     x0_p: jax.Array, *, m0: float, beta: float, tol: float,
                     max_iter: int, Nth: int, with_solve: bool = True,
                     with_gauge: bool = True,
                     interpret: bool = False) -> ForceStepResult:
    """One MD force evaluation on lane-packed planes as ONE TPU program.

    thE/thO: f32 [2, Nx, N] angle planes (N = C*Nth chain-major lanes).
    phi_p/x0_p: f32 [2, 2, Nx, N] planar spinors (spin, re/im). When
    with_solve, solves (Dhat Dhat^+) psi = phi from guess x0 and returns
    the total force F = F_fermion(psi) + F_gauge; otherwise treats x0 as
    psi (pre-solved outside, e.g. by the dfloat refinement) and only
    assembles forces.
    """
    _, Nx, N = thE.shape
    C = N // Nth
    m = float(m0) + 2.0

    kernel = functools.partial(
        _force_step_kernel, m=m, beta=float(beta), tol=float(tol),
        max_iter=int(max_iter), Nth=Nth, with_solve=with_solve,
        with_gauge=with_gauge)

    out_shape = (
        jax.ShapeDtypeStruct((2, Nx, N), jnp.float32),      # FE
        jax.ShapeDtypeStruct((2, Nx, N), jnp.float32),      # FO
        jax.ShapeDtypeStruct((2, 2, Nx, N), jnp.float32),   # psi
        jax.ShapeDtypeStruct((1, N), jnp.int32),            # iters
        jax.ShapeDtypeStruct((1, N), jnp.float32),          # rho
        jax.ShapeDtypeStruct((1, N), jnp.float32),          # bnorm2
    )
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    FE, FO, psi, iters, rho, bnorm2 = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[vspec] * 4,
        out_specs=(vspec,) * 6,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
    )(thE, thO, phi_p, x0_p)

    iters_c = iters.reshape(C, Nth)[:, 0]
    rho_c = rho.reshape(C, Nth)[:, 0]
    bn_c = bnorm2.reshape(C, Nth)[:, 0]
    conv = rho_c < jnp.float32(tol * tol) * bn_c
    if not with_solve:
        conv = jnp.ones_like(conv, bool)
    return ForceStepResult(FE=FE, FO=FO, psi=psi, iters=iters_c,
                           converged=conv)


# ---------- Hasenbusch ratio-force kernel ----------

def _ratio_force_kernel(the_ref, tho_ref, psi_ref, phi2_ref,
                        fe_ref, fo_ref,
                        *, m0: float, m1: float, beta: float, Nth: int):
    """Force of the Hasenbusch RATIO term + the staple force, fused.

    For S2 = (Dhat1 phi2)^+ (Dhat0 Dhat0^+)^{-1} (Dhat1 phi2) at fixed
    psi = (Dhat0 Dhat0^+)^{-1} Dhat1 phi2 (solved outside) and
    chi' = Dhat0^+ psi (computed here),
        F2 = grad[2Re<psi, Dhat0 chi'> - 2Re<psi, Dhat1 phi2>]
           = ff(psi, chi'; c0) - ff(psi, phi2; c1)
    by linearity of the force bilinear in its Schur prefactor c_m =
    1/(4(m+2)) (ops.eo.eo_ratio_force, packed-plane form). The staple
    force is added here (the heavy term's kernel runs with_gauge=False)."""
    Nx, N = the_ref.shape[-2:]
    mask_e, mask_o = parity_masks(Nx)
    tsh = lane_tshifts(N, Nth)
    c0 = jnp.float32(1.0 / (4.0 * (float(m0) + 2.0)))
    c1 = jnp.float32(1.0 / (4.0 * (float(m1) + 2.0)))
    mf0 = jnp.float32(float(m0) + 2.0)

    ue, uo = links_from_theta_planes(
        the_ref[0], the_ref[1], tho_ref[0], tho_ref[1], Nth)
    psi = _read_spinor(psi_ref)
    phi2 = _read_spinor(phi2_ref)

    w = _hop_dag(uo, ue, psi, mask_o, tsh)
    chi_p = _spinor_axpbv(mf0, psi, -c0, _hop_dag(ue, uo, w, mask_e, tsh))

    (f0e, f0o) = fermion_force_planes(
        ue, uo, psi, chi_p, mask_e, mask_o, tsh, c0)
    (f1e, f1o) = fermion_force_planes(
        ue, uo, psi, phi2, mask_e, mask_o, tsh, c1)
    (gfe, gfo) = gauge_force_planes(
        ue, uo, mask_e, mask_o, tsh, jnp.float32(beta))

    fe_ref[0] = f0e[0] - f1e[0] + gfe[0]
    fe_ref[1] = f0e[1] - f1e[1] + gfe[1]
    fo_ref[0] = f0o[0] - f1o[0] + gfo[0]
    fo_ref[1] = f0o[1] - f1o[1] + gfo[1]


@functools.partial(
    jax.jit, static_argnames=("m0", "m1", "beta", "Nth", "interpret"))
def ratio_force_fused(thE: jax.Array, thO: jax.Array, psi_p: jax.Array,
                      phi2_p: jax.Array, *, m0: float, m1: float,
                      beta: float, Nth: int, interpret: bool = False):
    """(FE, FO) [2, Nx, N]: Hasenbusch ratio-term force + staple force as
    one TPU program (see _ratio_force_kernel)."""
    _, Nx, N = thE.shape
    kernel = functools.partial(
        _ratio_force_kernel, m0=float(m0), m1=float(m1), beta=float(beta),
        Nth=Nth)
    out_shape = (
        jax.ShapeDtypeStruct((2, Nx, N), jnp.float32),
        jax.ShapeDtypeStruct((2, Nx, N), jnp.float32),
    )
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, out_shape=out_shape, in_specs=[vspec] * 4,
        out_specs=(vspec, vspec), interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
    )(thE, thO, psi_p, phi2_p)


# ---------- solve-only kernel (action solves, refined inner solves) ----------

def _solve_kernel(the_ref, tho_ref, b_ref, x0_ref,
                  x_ref, iters_ref, rho_ref, bnorm_ref,
                  *, m: float, tol: float, max_iter: int, Nth: int):
    Nx, N = the_ref.shape[-2:]
    mask_e, mask_o = parity_masks(Nx)
    tsh = lane_tshifts(N, Nth)
    dot_pc, _ = block_dot(N, Nth)
    c = jnp.float32(1.0 / (4.0 * m))
    m = jnp.float32(m)

    ue, uo = links_from_theta(
        jnp.stack((the_ref[0], the_ref[1])),
        jnp.stack((tho_ref[0], tho_ref[1])), Nth)

    def apply_A(v):
        w = _hop_dag(uo, ue, v, mask_o, tsh)
        vv = _spinor_axpbv(m, v, -c, _hop_dag(ue, uo, w, mask_e, tsh))
        w2 = _hop(uo, ue, vv, mask_o, tsh)
        return _spinor_axpbv(m, vv, -c, _hop(ue, uo, w2, mask_e, tsh))

    x, iters, rho, bnorm2 = _cg_planes(
        apply_A, _read_spinor(b_ref), _read_spinor(x0_ref), dot_pc,
        tol, max_iter)
    _write_spinor(x_ref, x)
    iters_ref[...] = iters
    rho_ref[...] = rho
    bnorm_ref[...] = bnorm2


class SolveResult(NamedTuple):
    x: jax.Array             # f32 [2, 2, Nx, N]
    iters: jax.Array         # int32 [C]
    converged: jax.Array     # bool [C]
    rel_residual: jax.Array  # f32 [C]


@functools.partial(
    jax.jit, static_argnames=("m0", "tol", "max_iter", "Nth", "interpret"))
def solve_fused(thE: jax.Array, thO: jax.Array, b_p: jax.Array,
                x0_p: jax.Array, *, m0: float, tol: float, max_iter: int,
                Nth: int, interpret: bool = False) -> SolveResult:
    """(Dhat Dhat^+)^{-1} b on lane-packed planes, links built in-kernel."""
    _, Nx, N = thE.shape
    C = N // Nth
    m = float(m0) + 2.0
    kernel = functools.partial(
        _solve_kernel, m=m, tol=float(tol), max_iter=int(max_iter), Nth=Nth)
    out_shape = (
        jax.ShapeDtypeStruct((2, 2, Nx, N), jnp.float32),
        jax.ShapeDtypeStruct((1, N), jnp.int32),
        jax.ShapeDtypeStruct((1, N), jnp.float32),
        jax.ShapeDtypeStruct((1, N), jnp.float32),
    )
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    x, iters, rho, bnorm2 = pl.pallas_call(
        kernel, out_shape=out_shape, in_specs=[vspec] * 4,
        out_specs=(vspec,) * 4, interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
    )(thE, thO, b_p, x0_p)
    iters_c = iters.reshape(C, Nth)[:, 0]
    rho_c = rho.reshape(C, Nth)[:, 0]
    bn_c = bnorm2.reshape(C, Nth)[:, 0]
    rel = jnp.sqrt(rho_c) * jax.lax.rsqrt(
        jnp.maximum(bn_c, jnp.finfo(jnp.float32).tiny))
    return SolveResult(x=x, iters=iters_c,
                       converged=rho_c < jnp.float32(tol * tol) * bn_c,
                       rel_residual=rel)


# ---------- XLA-level packed state utilities ----------

def pack_chains(geom: Geometry, v: jax.Array):
    """[C, A.., Nx, Nt] -> (E, O) packed planes [A.., Nx, C*Nth] (chain-major
    lane blocks, the fused-kernel layout). Real dtype in, f32 out."""
    E = jax.vmap(lambda a: eo.pack(geom, a, eo.EVEN))(v)
    O = jax.vmap(lambda a: eo.pack(geom, a, eo.ODD))(v)

    def lanes(p):
        C = p.shape[0]
        Nth = p.shape[-1]
        q = jnp.moveaxis(p, 0, -2)
        return q.reshape(*q.shape[:-2], C * Nth)

    return lanes(E).astype(jnp.float32), lanes(O).astype(jnp.float32)


def unpack_chains(geom: Geometry, E: jax.Array, O: jax.Array, C: int):
    """(E, O) packed planes [A.., Nx, C*Nth] -> [C, A.., Nx, Nt]."""
    def unlanes(p):
        *lead, Nx, N = p.shape
        q = p.reshape(*lead, Nx, C, N // C)
        return jnp.moveaxis(q, -2, 0)

    Ec, Oc = unlanes(E), unlanes(O)
    return jax.vmap(lambda e, o: eo.unpack(geom, e, o))(Ec, Oc)


def pack_even(v: jax.Array):
    """Even-parity complex field [C, 2, Nx, Nth] -> planar [2, 2, Nx, C*Nth]."""
    C, A, Nx, Nth = v.shape
    q = jnp.moveaxis(v, 0, -2).reshape(A, Nx, C * Nth)
    return jnp.stack(
        [jnp.real(q).astype(jnp.float32), jnp.imag(q).astype(jnp.float32)],
        axis=1)


def unpack_even(p: jax.Array, C: int):
    """planar [2, 2, Nx, N] -> complex64 [C, 2, Nx, Nth]."""
    A, _, Nx, N = p.shape
    z = jax.lax.complex(p[:, 0], p[:, 1])
    return jnp.moveaxis(z.reshape(A, Nx, C, N // C), -2, 0)


def chain_sum(p: jax.Array, C: int) -> jax.Array:
    """Per-chain sum of a real packed plane [A.., Nx, N] -> [C]."""
    *lead, Nx, N = p.shape
    q = p.reshape(*lead, Nx, C, N // C)
    axes = tuple(range(len(lead))) + (len(lead), len(lead) + 2)
    return jnp.sum(q, axis=axes)


def kinetic_packed(piE: jax.Array, piO: jax.Array, C: int) -> jax.Array:
    """0.5 sum pi^2 per chain (models.kinetic on packed planes)."""
    return 0.5 * (chain_sum(piE * piE, C) + chain_sum(piO * piO, C))


def gauge_action_packed(thE: jax.Array, thO: jax.Array, beta, C: int,
                        Nth: int) -> jax.Array:
    """beta * sum(1 - Re P) per chain from packed angle planes."""
    Nx, N = thE.shape[-2:]
    mask_e, mask_o = parity_masks(Nx)
    tsh = lane_tshifts(N, Nth)
    ue, uo = links_from_theta(thE, thO, Nth)
    pe, po = plaquette_planes(ue, uo, mask_e, mask_o, tsh)
    one = jnp.float32(1.0)
    return beta * (chain_sum(one - pe[0], C) + chain_sum(one - po[0], C))


def plaquette_sum_packed(thE: jax.Array, thO: jax.Array, C: int,
                         Nth: int) -> jax.Array:
    """sum Re P per chain (gops.plaquette_sum on packed planes)."""
    Nx, N = thE.shape[-2:]
    mask_e, mask_o = parity_masks(Nx)
    tsh = lane_tshifts(N, Nth)
    ue, uo = links_from_theta(thE, thO, Nth)
    pe, po = plaquette_planes(ue, uo, mask_e, mask_o, tsh)
    return chain_sum(pe[0], C) + chain_sum(po[0], C)


def dhat_packed(thE: jax.Array, thO: jax.Array, v_p: jax.Array, m0,
                Nth: int) -> jax.Array:
    """Phi = Dhat chi on packed planes (XLA level; pseudofermion setup,
    once per trajectory). v_p planar [2, 2, Nx, N] -> same."""
    Nx, N = thE.shape[-2:]
    mask_e, mask_o = parity_masks(Nx)
    tsh = lane_tshifts(N, Nth)
    ue, uo = links_from_theta(thE, thO, Nth)
    m = jnp.float32(float(m0) + 2.0)
    c = jnp.float32(1.0 / (4.0 * (float(m0) + 2.0)))
    v = ((v_p[0, 0], v_p[0, 1]), (v_p[1, 0], v_p[1, 1]))
    w = _hop(uo, ue, v, mask_o, tsh)
    r = _spinor_axpbv(m, v, -c, _hop(ue, uo, w, mask_e, tsh))
    return jnp.stack([jnp.stack(r[0]), jnp.stack(r[1])])


def dhat_dag_packed(thE: jax.Array, thO: jax.Array, v_p: jax.Array, m0,
                    Nth: int) -> jax.Array:
    """Dhat^+ v on packed planes (XLA level; the Hasenbusch heat bath's
    phi2 = Dhat1^+ y assembly, once per trajectory)."""
    Nx, N = thE.shape[-2:]
    mask_e, mask_o = parity_masks(Nx)
    tsh = lane_tshifts(N, Nth)
    ue, uo = links_from_theta(thE, thO, Nth)
    m = jnp.float32(float(m0) + 2.0)
    c = jnp.float32(1.0 / (4.0 * (float(m0) + 2.0)))
    v = ((v_p[0, 0], v_p[0, 1]), (v_p[1, 0], v_p[1, 1]))
    w = _hop_dag(uo, ue, v, mask_o, tsh)
    r = _spinor_axpbv(m, v, -c, _hop_dag(ue, uo, w, mask_e, tsh))
    return jnp.stack([jnp.stack(r[0]), jnp.stack(r[1])])


def dot_re_packed(a_p: jax.Array, b_p: jax.Array, C: int) -> jax.Array:
    """Per-chain Re<a, b> of planar spinors [2, 2, Nx, N] -> [C]."""
    return chain_sum(jnp.sum(a_p * b_p, axis=(0, 1)), C)


def fold_packed(th: jax.Array) -> jax.Array:
    """Fold packed angle planes to [-pi, pi] (sampler invariant)."""
    two_pi = jnp.float32(2.0 * jnp.pi)
    return th - two_pi * jnp.round(th / two_pi)
