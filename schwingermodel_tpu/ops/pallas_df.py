"""Double-float even-odd normal apply on lane-packed planes + its kernel.

The dfloat refinement's true-residual evaluator (ops/eo_df.py) runs at the
XLA level, where every error-free transform is pinned by an
optimization_barrier -- correct, but the barriers also stop XLA from
fusing, so a df apply decomposes into hundreds of tiny HBM-round-trip
kernels. Inside a Pallas program the operands live in VMEM regardless of
fusion, so the SAME df arithmetic (solvers/dfloat.py is pure jnp and runs
unchanged under Mosaic, which preserves EFTs on TPU -- the
tests_tpu eft_selfcheck gate) costs its raw VPU flops.

This module provides:
  - LaneGeometry: a duck-typed Geometry whose shifts act on lane-packed
    [.., Nx, N] planes (N = C*Nth chain-major lanes), so ops/eo_df.py's
    hop_df/hop_dag_df run UNCHANGED on the packed layout;
  - EODFLanes: df links (folded, from the packed angle planes) + the
    Dhat Dhat^+ df composite;
  - df_normal_fused: the whole df normal apply as ONE Pallas kernel
    (planar pair in / planar pair out);
  - solve_refined_packed: restart-based refinement on packed planes --
    f32 inner solves (ops/pallas_traj.solve_fused) + df true-residual
    refinement (this kernel), mirroring solvers/refine.cg_refine_df;
  - solve_refined_fused: the round-4 production solver -- the WHOLE
    1e-10 solve as one reliable-update mixed-precision CG kernel (one
    continuous f32 Krylov recursion, df solution accumulation, df
    true-residual replacements, optional in-kernel MRE forecasting).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from schwingermodel_tpu.ops import eo_df
from schwingermodel_tpu.ops import pallas_traj as pt
from schwingermodel_tpu.ops.geometry import T_AXIS, X_AXIS
from schwingermodel_tpu.ops.pallas_eo import _VMEM_LIMIT_BYTES
from schwingermodel_tpu.solvers.dfloat import (
    DFComplex,
    df_add,
    df_sum_all,
    dfc_add,
    dfc_from_c,
    dfc_sub,
    dfc_to_c,
    two_prod,
)


class LaneGeometry:
    """Geometry duck type for lane-packed planes: x-shifts slice rows,
    t-shifts are the in-chain periodic lane shifts of pallas_traj."""

    is_sharded = False

    def __init__(self, N: int, Nth: int):
        self._sp, self._sm = pt.lane_tshifts(N, Nth)

    def shift(self, a: jax.Array, axis: int, delta: int) -> jax.Array:
        if axis % a.ndim == (X_AXIS % a.ndim):
            if delta == 1:
                return jnp.concatenate(
                    [a[..., 1:, :], a[..., :1, :]], axis=-2)
            return jnp.concatenate(
                [a[..., -1:, :], a[..., :-1, :]], axis=-2)
        assert axis % a.ndim == (T_AXIS % a.ndim)
        return self._sp(a) if delta == 1 else self._sm(a)


def _dfc_planes(p_hi: jax.Array, p_lo: jax.Array) -> DFComplex:
    """planar pairs [2, 2, Nx, N] (spin, re/im) -> DFComplex with the
    eo_df convention (components shaped [2(spin), Nx, N])."""
    return DFComplex((p_hi[:, 0], p_lo[:, 0]), (p_hi[:, 1], p_lo[:, 1]))


def _planes_dfc(z: DFComplex):
    hi = jnp.stack([z.re[0], z.im[0]], axis=1)
    lo = jnp.stack([z.re[1], z.im[1]], axis=1)
    return hi, lo


class EODFLanes:
    """Dhat / Dhat^+ / normal in df arithmetic on lane-packed planes.

    thE/thO: f32 angle planes [2, Nx, N]. Reuses ops/eo_df.py's hop code
    verbatim through LaneGeometry; the antiperiodic sign is folded into
    the df links exactly as links_from_theta folds the f32 ones."""

    def __init__(self, thE: jax.Array, thO: jax.Array, m0: float, Nth: int):
        from schwingermodel_tpu.solvers.dfloat import dfc_expi

        Nx, N = thE.shape[-2:]
        self.geom = LaneGeometry(N, Nth)
        mask_e, mask_o = pt.parity_masks(Nx)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
        last = jax.lax.rem(lane, jnp.int32(Nth)) == jnp.int32(Nth - 1)

        def links(th, mask):
            u0 = dfc_expi(th[0])
            u1 = dfc_expi(th[1])
            neg = jnp.logical_and(mask, last)

            def fold(p):
                return jnp.where(neg, -p, p)

            u0f = DFComplex((fold(u0.re[0]), fold(u0.re[1])),
                            (fold(u0.im[0]), fold(u0.im[1])))
            return DFComplex(
                (jnp.stack([u0f.re[0], u1.re[0]], axis=-3),
                 jnp.stack([u0f.re[1], u1.re[1]], axis=-3)),
                (jnp.stack([u0f.im[0], u1.im[0]], axis=-3),
                 jnp.stack([u0f.im[1], u1.im[1]], axis=-3)),
            )

        self.Ue = links(thE, mask_e)
        self.Uo = links(thO, mask_o)
        # eo_df gathers select on off == 1; the parity masks are exactly
        # that predicate
        self.off_e = mask_e
        self.off_o = mask_o
        self.m = float(m0) + 2.0
        self.c = 1.0 / (4.0 * self.m)

    def dhat(self, v: DFComplex) -> DFComplex:
        w = eo_df.hop_df(self.geom, self.Uo, self.Ue, v, self.off_o)
        h = eo_df.hop_df(self.geom, self.Ue, self.Uo, w, self.off_e)
        return dfc_sub(eo_df._scale_f(v, self.m), eo_df._scale_f(h, self.c))

    def dhat_dag(self, v: DFComplex) -> DFComplex:
        w = eo_df.hop_dag_df(self.geom, self.Uo, self.Ue, v, self.off_o)
        h = eo_df.hop_dag_df(self.geom, self.Ue, self.Uo, w, self.off_e)
        return dfc_sub(eo_df._scale_f(v, self.m), eo_df._scale_f(h, self.c))

    def normal(self, v: DFComplex) -> DFComplex:
        return self.dhat(self.dhat_dag(v))


# ---------- the fused df residual kernel ----------

def _df_residual_kernel(the_ref, tho_ref, bhi_ref, blo_ref, xhi_ref, xlo_ref,
                        rhi_ref, rlo_ref,
                        *, m0: float, Nth: int):
    """r = b - (Dhat Dhat^+) x, everything in df: ONE TPU program.

    Traced with EFT barriers OFF: Mosaic cannot lower
    optimization_barrier and does not need it (dfloat.unsafe_no_barriers;
    the on-device oracle tests in tests_tpu/ verify the df accuracy)."""
    from schwingermodel_tpu.solvers.dfloat import unsafe_no_barriers

    with unsafe_no_barriers():
        thE = jnp.stack([the_ref[0], the_ref[1]])
        thO = jnp.stack([tho_ref[0], tho_ref[1]])
        ops = EODFLanes(thE, thO, m0, Nth)
        x = _dfc_planes(xhi_ref[...], xlo_ref[...])
        b = _dfc_planes(bhi_ref[...], blo_ref[...])
        r = dfc_sub(b, ops.normal(x))
        hi, lo = _planes_dfc(r)
    rhi_ref[...] = hi
    rlo_ref[...] = lo


@functools.partial(jax.jit, static_argnames=("m0", "Nth", "interpret"))
def df_residual_fused(thE, thO, b_hi, b_lo, x_hi, x_lo, *, m0: float,
                      Nth: int, interpret: bool = False):
    """(r_hi, r_lo) planar [2, 2, Nx, N] = b - A x in double-float."""
    _, Nx, N = thE.shape
    kernel = functools.partial(_df_residual_kernel, m0=m0, Nth=Nth)
    out_shape = (
        jax.ShapeDtypeStruct((2, 2, Nx, N), jnp.float32),
        jax.ShapeDtypeStruct((2, 2, Nx, N), jnp.float32),
    )
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, out_shape=out_shape, in_specs=[vspec] * 6,
        out_specs=(vspec, vspec), interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
    )(thE, thO, b_hi, b_lo, x_hi, x_lo)


# ---------- packed 1e-10-contract solve ----------

class RefinedSolveResult(NamedTuple):
    x: jax.Array          # f32 planar [2, 2, Nx, N] (df collapse)
    x_hi: jax.Array       # df solution, hi planes
    x_lo: jax.Array       # df solution, lo planes
    iters: jax.Array      # int32 [C] total inner iterations
    converged: jax.Array  # bool [C] (df true-residual criterion)


def _chain_dot(p: jax.Array, q: jax.Array, C: int) -> jax.Array:
    """Per-chain Re<p, q> of planar spinors (f32) -> [C]."""
    return pt.chain_sum(jnp.sum(p * q, axis=(0, 1)), C)


def solve_refined_packed(thE, thO, b_p, x0_p, *, m0: float, tol: float,
                         inner_tol: float, max_iter: int, max_outer: int,
                         Nth: int, interpret: bool = False,
                         ) -> RefinedSolveResult:
    """(Dhat Dhat^+)^{-1} b meeting `tol` at f64 grade on packed planes:
    f32 inner solves in the fused CG kernel + df true residuals in the
    fused df kernel (solvers/refine.cg_refine_df semantics, incl. the
    stagnation early-exit; per-chain convergence)."""
    _, Nx, N = thE.shape
    C = N // Nth
    zeros = jnp.zeros_like(b_p)

    b_norm2 = _chain_dot(b_p, b_p, C)
    stop2 = jnp.float32(tol * tol) * b_norm2

    x_hi, x_lo = x0_p, jnp.zeros_like(x0_p)
    r_hi, r_lo = df_residual_fused(thE, thO, b_p, zeros, x_hi, x_lo,
                                   m0=m0, Nth=Nth, interpret=interpret)
    r_c = r_hi + r_lo
    rho = _chain_dot(r_c, r_c, C)

    def cond(carry):
        _, _, _, _, rho, rho_prev, k, _ = carry
        active = jnp.logical_and(jnp.any(rho >= stop2), k < max_outer)
        progressing = jnp.logical_or(
            k == 0, jnp.any(rho * 4.0 <= rho_prev))
        return jnp.logical_and(active, progressing)

    def body(carry):
        x_hi, x_lo, r_hi, r_lo, rho, _, k, it = carry
        r_c = r_hi + r_lo
        d = pt.solve_fused(thE, thO, r_c, jnp.zeros_like(r_c), m0=m0,
                           tol=inner_tol, max_iter=max_iter, Nth=Nth,
                           interpret=interpret)
        # x += d in df (two_sum per plane element)
        x_df = dfc_add(_dfc_planes(x_hi, x_lo), dfc_from_c_planes(d.x))
        x_hi, x_lo = _planes_dfc(x_df)
        r_hi, r_lo = df_residual_fused(
            thE, thO, b_p, zeros, x_hi, x_lo,
            m0=m0, Nth=Nth, interpret=interpret)
        r_c2 = r_hi + r_lo
        rho_new = _chain_dot(r_c2, r_c2, C)
        return (x_hi, x_lo, r_hi, r_lo, rho_new, rho, k + 1, it + d.iters)

    x_hi, x_lo, r_hi, r_lo, rho, _, k, iters = jax.lax.while_loop(
        cond, body,
        (x_hi, x_lo, r_hi, r_lo, rho, jnp.full_like(rho, jnp.inf),
         jnp.int32(0), jnp.zeros((C,), jnp.int32)))

    return RefinedSolveResult(
        x=x_hi + x_lo, x_hi=x_hi, x_lo=x_lo,
        iters=iters, converged=rho < stop2)


def dfc_from_c_planes(p: jax.Array) -> DFComplex:
    """planar f32 [2, 2, Nx, N] -> DFComplex (lo = 0)."""
    z = jnp.zeros_like(p)
    return _dfc_planes(p, z)


# ---------- per-chain df reductions + Hamiltonian terms (XLA level) ----------

def df_sum_chain(pair, C: int):
    """Per-chain df sum of a (hi, lo) plane pair [.., Nx, N] -> ([C], [C])."""
    hi, lo = pair

    def chunks(a):
        *lead, Nx, N = a.shape
        a = a.reshape(*lead, Nx, C, N // C)
        a = jnp.moveaxis(a, -2, 0)
        return a.reshape(C, -1)

    return jax.vmap(lambda h, l: df_sum_all((h, l)))(chunks(hi), chunks(lo))


def kinetic_packed_df(piE: jax.Array, piO: jax.Array, C: int):
    """0.5 sum pi^2 per chain in df: the squares are exact two_prods."""
    he, le = df_sum_chain(two_prod(piE, piE), C)
    ho, lo = df_sum_chain(two_prod(piO, piO), C)
    s = df_add((he, le), (ho, lo))
    return 0.5 * s[0], 0.5 * s[1]           # *0.5 exact in f32


def norm2_packed_df(p: jax.Array, C: int):
    """sum |z|^2 per chain in df for a planar field [2, 2, Nx, N]."""
    h, l = df_sum_chain(two_prod(p, p), C)
    return h, l


def dot_re_packed_df(a_p: jax.Array, x_hi: jax.Array, x_lo: jax.Array,
                     C: int):
    """Per-chain Re<a, x> with a exact f32 planar and x a df planar pair
    (solvers/dfloat.df_dot_re on the packed layout)."""
    from schwingermodel_tpu.solvers.dfloat import df_mul

    prod = df_mul((a_p, jnp.zeros_like(a_p)), (x_hi, x_lo))
    return df_sum_chain(prod, C)


def gauge_action_packed_df(thE: jax.Array, thO: jax.Array, beta: float,
                           C: int, Nth: int):
    """beta * sum(1 - cos th_P) per chain in df from packed angle planes
    (the packed twin of ops/eo_df.gauge_action_df). Returns a [C] df pair.
    """
    from schwingermodel_tpu.solvers.dfloat import (
        _opaque, df_fold_2pi, df_sincos, df_sub, two_sum,
    )

    Nx, N = thE.shape[-2:]
    mask_e, mask_o = pt.parity_masks(Nx)
    sp, sm = pt.lane_tshifts(N, Nth)

    def shift_px(a):
        return jnp.concatenate([a[..., 1:, :], a[..., :1, :]], axis=-2)

    def plaq_summand(th_p, th_q, mask_p):
        # th_P(n) = th0_p(n) + th1_q(n+t) - th0_q(n+x) - th1_p(n), n in p
        t1q_pt = pt._g_pt(th_q[1], mask_p, sp)
        t0q_px = shift_px(th_q[0])
        s, e = two_sum(th_p[0], t1q_pt)
        s2, e2 = two_sum(s, -t0q_px)
        s3, e3 = two_sum(s2, -th_p[1])
        _, cos_a = df_sincos(*df_fold_2pi(s3, e + e2 + e3))
        one = (_opaque(jnp.ones_like(cos_a[0])), jnp.zeros_like(cos_a[0]))
        return df_sub(one, cos_a)

    se = df_sum_chain(plaq_summand(thE, thO, mask_e), C)
    so = df_sum_chain(plaq_summand(thO, thE, mask_o), C)
    s = df_add(se, so)
    from schwingermodel_tpu.solvers.dfloat import _df_const, df_mul

    total = df_mul(s, _df_const(float(beta)))
    return total


# ---------- single-kernel reliable-update solve (the 1e-10 contract) ----------
#
# solve_refined_packed above mirrors classic iterative refinement: each
# outer pass RESTARTS the f32 CG on the new residual, throwing away the
# Krylov subspace (and its deflation of the low modes) that the previous
# pass built -- measured at 665 vs 182 iterations/trajectory against the
# loose contract (docs/PERF.md round 3). The standard lattice-QCD answer
# (mixed-precision CG with "reliable updates": van der Vorst/Ye residual
# replacement; the scheme production GPU solvers use) keeps ONE continuous
# CG recursion in f32 -- same direction vector d throughout -- while
#   - accumulating x in double-float (error-free two_prod/two_sum axpy), and
#   - replacing the recursive residual with the df TRUE residual
#     b - A_df x whenever ||r|| has contracted by `tau` since the last
#     replacement (a handful of df applies per solve),
# so the recursion converges to 1e-10 as one solve instead of 2-4 restarted
# ones. With certify=True (the Metropolis ACTION solves) the convergence
# flag certifies the df true residual -- the reference's own criterion
# (src/conjugate_gradient.cpp:45) at ~1e-15 resolution. With certify=False
# (the MD FORCE solves) the final contraction phase trusts the f32
# recursive residual: the initial residual was df-exact and the recursion
# drifts only by ~eps * the accumulated corrections, far below the looser
# force tolerance for the short forecast-seeded recursions -- but the flag
# is then "trusted", not df-certified (deep 1000+-iteration solves could in
# principle drift past force_tol undetected; the accept/reject absorbs any
# force error regardless). Everything (f32 links, df links, CG loop,
# replacements) is ONE Pallas program with state pinned in VMEM.


# The RU kernel holds df links (16 planes) + df x (8) + f32 CG state
# (12) + f32 links (8) + stencil temporaries: ~40 MB at 64x64 C=32, above
# the 32 MB request the single-purpose kernels use. v5e has 128 MB VMEM;
# request 64 MB (measured fine; the graceful fallback for larger lattices
# is the chunked custom_vmap of pallas_eo).
_VMEM_LIMIT_RU_BYTES = 64 << 20


def _xdf_to_dfc(x):
    """df spinor (((reh,rel),(imh,iml)) per spin) -> DFComplex [2, Nx, N]."""
    ((r0h, r0l), (i0h, i0l)), ((r1h, r1l), (i1h, i1l)) = x
    return DFComplex((jnp.stack([r0h, r1h]), jnp.stack([r0l, r1l])),
                     (jnp.stack([i0h, i1h]), jnp.stack([i0l, i1l])))


def _dfc_to_xdf(z: DFComplex):
    return (((z.re[0][0], z.re[1][0]), (z.im[0][0], z.im[1][0])),
            ((z.re[0][1], z.re[1][1]), (z.im[0][1], z.im[1][1])))


def _xdf_collapse(x):
    """df spinor -> f32 spinor tuple ((re0,im0),(re1,im1))."""
    ((r0h, r0l), (i0h, i0l)), ((r1h, r1l), (i1h, i1l)) = x
    return ((r0h + r0l, i0h + i0l), (r1h + r1l, i1h + i1l))


def _xdf_axpy(x, alpha, d):
    """x_df += alpha * d, error-free: two_prod for the product, df_add for
    the accumulate. alpha: [1, N] block-constant f32; d: f32 spinor."""
    out = []
    for xs, ds in zip(x, d):
        comps = []
        for (hi, lo), p in zip(xs, ds):
            comps.append(df_add((hi, lo), two_prod(alpha, p)))
        out.append(tuple(comps))
    return tuple(out)


def _solve_ru_kernel(the_ref, tho_ref, b_ref, hist_ref,
                     xhi_ref, xlo_ref, iters_ref, rho_ref, bnorm_ref,
                     *, m0: float, tol: float, tau: float, max_iter: int,
                     max_outer: int, Nth: int, K: int, certify: bool,
                     cert_k: int = 192):
    from schwingermodel_tpu.ops.pallas_eo import _hop, _hop_dag, _spinor_axpbv, _csel
    from schwingermodel_tpu.solvers.dfloat import unsafe_no_barriers

    Nx, N = the_ref.shape[-2:]
    mask_e, mask_o = pt.parity_masks(Nx)
    tsh = pt.lane_tshifts(N, Nth)
    dot_pc, _ = pt.block_dot(N, Nth)
    m = jnp.float32(float(m0) + 2.0)
    c = jnp.float32(1.0 / (4.0 * (float(m0) + 2.0)))
    one = jnp.float32(1.0)

    thE = jnp.stack([the_ref[0], the_ref[1]])
    thO = jnp.stack([tho_ref[0], tho_ref[1]])
    ue, uo = pt.links_from_theta(thE, thO, Nth)

    def apply_A(v):
        w = _hop_dag(uo, ue, v, mask_o, tsh)
        vv = _spinor_axpbv(m, v, -c, _hop_dag(ue, uo, w, mask_e, tsh))
        w2 = _hop(uo, ue, vv, mask_o, tsh)
        return _spinor_axpbv(m, vv, -c, _hop(ue, uo, w2, mask_e, tsh))

    with unsafe_no_barriers():
        ops_df = EODFLanes(thE, thO, m0, Nth)
        b = pt._read_spinor(b_ref)
        b_df = _xdf_to_dfc((((b[0][0], jnp.zeros_like(b[0][0])),
                             (b[0][1], jnp.zeros_like(b[0][1]))),
                            ((b[1][0], jnp.zeros_like(b[1][0])),
                             (b[1][1], jnp.zeros_like(b[1][1])))))
        bnorm2 = dot_pc(b, b)
        stop2 = jnp.float32(tol * tol) * bnorm2
        tau2 = jnp.float32(tau * tau)
        max_k = jnp.int32(max_iter)

        # x0: K == 1 -> hist[0] verbatim; K > 1 -> in-kernel MRE forecast
        # (chronological inversion, Brower et al. hep-lat/9509012), done in
        # the DIFFERENCE space about the newest solution: x0 = psi_1 + d,
        # d = argmin ||r_1 - A d|| over span{psi_i - psi_1}, r_1 = b - A
        # psi_1. Projecting raw solutions instead would push the dominant
        # common component through f32 dot products and floor x0 near 1e-5
        # relative (measured WORSE than the pointwise 2nd-order
        # extrapolation); in difference space the dominant part transfers
        # elementwise-exactly and the f32 Gram-Schmidt noise is relative to
        # the small corrections only.
        def read_hist(i):
            return ((hist_ref[i, 0, 0], hist_ref[i, 0, 1]),
                    (hist_ref[i, 1, 0], hist_ref[i, 1, 1]))

        if K == 1:
            x0 = read_hist(0)
        else:
            tiny = jnp.float32(jnp.finfo(jnp.float32).tiny)

            def scale(s, v):
                return tuple((s * a[0], s * a[1]) for a in v)

            base = read_hist(0)                # newest solution
            w0 = apply_A(base)
            r1 = _spinor_axpbv(one, b, -one, w0)
            x0 = base
            vs, ws = [], []
            nrm_max = None
            for i in range(1, K):
                hi = read_hist(i)
                # difference about the FIXED base (not the accumulating
                # x0): v and w = A v must stay a consistent pair
                v = _spinor_axpbv(one, hi, -one, base)   # psi_i - psi_1
                w = _spinor_axpbv(one, apply_A(hi), -one, w0)
                for vj, wj in zip(vs, ws):
                    cij = dot_pc(w, wj)
                    w = _spinor_axpbv(one, w, -cij, wj)
                    v = _spinor_axpbv(one, v, -cij, vj)
                nrm = dot_pc(w, w)
                nrm_max = nrm if nrm_max is None else jnp.maximum(
                    nrm_max, nrm)
                # drop directions degenerate beyond the f32 GS noise floor
                # (duplicate history early in the trajectory)
                keep = nrm > jnp.float32(1e-8) * nrm_max
                inv = jnp.where(keep,
                                jax.lax.rsqrt(jnp.maximum(nrm, tiny)),
                                jnp.float32(0.0))
                w = scale(inv, w)
                v = scale(inv, v)
                x0 = _spinor_axpbv(one, x0, dot_pc(r1, w), v)
                vs.append(v)
                ws.append(w)
            del vs, ws

        z = jnp.zeros_like(x0[0][0])
        x = (((x0[0][0], z), (x0[0][1], z)), ((x0[1][0], z), (x0[1][1], z)))

        def true_residual(x):
            r_df = dfc_sub(b_df, ops_df.normal(_xdf_to_dfc(x)))
            return _xdf_collapse(_dfc_to_xdf(r_df))

        r = true_residual(x)
        rho = dot_pc(r, r)
        # forecast sanitizer: if the starting guess is WORSE than x = 0
        # (e.g. the history was poisoned by a failed near-critical solve),
        # fall back to x = 0 whose residual is b exactly -- free, and it
        # breaks failure cascades through the chronological history
        bad = rho > bnorm2
        good = jnp.logical_not(bad)

        def sel_plane(p, q):
            return jnp.where(bad, p, q)

        x = tuple(
            tuple((sel_plane(jnp.zeros_like(hi), hi),
                   sel_plane(jnp.zeros_like(lo), lo))
                  for hi, lo in comps)
            for comps in x)
        r = tuple(
            (sel_plane(bs[0], rs[0]), sel_plane(bs[1], rs[1]))
            for bs, rs in zip(b, r))
        rho = jnp.where(bad, bnorm2, rho)
        del good
        rho_df = rho
        iters0 = jnp.zeros((1, N), jnp.int32)

        def inner(x, r, d, rho, tgt, iters, k_tot):
            """f32 CG sweeps (df x-accumulation) until every chain's
            recursive rho is under its target. Chains whose f32 curvature
            <d, Ad> stops being positive (near-singular operators at the
            critical mass -- f32 breakdown) are frozen as `dead` instead
            of propagating NaN through alpha/beta; they exit with
            converged=False and the Metropolis rejects their
            trajectory."""

            # dead carried as an f32 0/1 mask: Mosaic fails to
            # legalize i1 vectors in nested scf loop yields
            dead0 = jnp.zeros_like(rho)

            def cond(carry):
                _, _, _, rho, dead, _, k = carry
                live = jnp.logical_and(rho >= tgt,
                                       dead < jnp.float32(0.5))
                return jnp.logical_and(jnp.any(live), k < max_k)

            def body(carry):
                x, r, d, rho, dead, iters, k = carry
                active = jnp.logical_and(rho >= tgt,
                                         dead < jnp.float32(0.5))
                Ad = apply_A(d)
                dAd = dot_pc(d, Ad)
                alpha_raw = rho / dAd
                # breakdown guards: non-positive f32 curvature, or alpha
                # overflow on near-singular curvature (checked BEFORE the
                # x/r updates so a dead chain's state stays finite)
                broke = jnp.logical_and(
                    active,
                    jnp.logical_or(jnp.logical_not(dAd > jnp.float32(0.0)),
                                   jnp.logical_not(jnp.isfinite(alpha_raw))))
                dead = jnp.maximum(dead, broke.astype(jnp.float32))
                active = jnp.logical_and(active, jnp.logical_not(broke))
                alpha = jnp.where(active, alpha_raw, jnp.float32(0.0))
                x = _xdf_axpy(x, alpha, d)
                r = _spinor_axpbv(one, r, -alpha, Ad)
                rho_c = dot_pc(r, r)
                # a finite alpha can still overflow r through alpha*Ad, and
                # a near-singular operator can diverge SLOWLY with finite
                # positive curvature (observed: thousands of iterations to
                # relative residual 1e17 before any overflow): freeze both,
                # and drop them from `active` NOW so the beta/d/rho updates
                # below can't store inf into d (which would NaN the next
                # iteration's x += 0*d)
                bad_c = jnp.logical_or(
                    jnp.logical_not(jnp.isfinite(rho_c)),
                    rho_c > jnp.float32(1e6) * bnorm2)
                dead = jnp.maximum(
                    dead, jnp.logical_and(active, bad_c).astype(jnp.float32))
                active = jnp.logical_and(active, jnp.logical_not(bad_c))
                beta = jnp.where(active, rho_c / rho, jnp.float32(0.0))
                d = tuple(
                    _csel(active,
                          (rs[0] + beta * ds[0], rs[1] + beta * ds[1]), ds)
                    for rs, ds in zip(r, d))
                rho = jnp.where(active, rho_c, rho)
                iters = iters + jnp.where(active, jnp.int32(1),
                                          jnp.int32(0))
                return (x, r, d, rho, dead, iters, k + jnp.int32(1))

            x, r, d, rho, _, iters, k_tot = jax.lax.while_loop(
                cond, body, (x, r, d, rho, dead0, iters, k_tot))
            return x, r, d, rho, iters, k_tot

        def cond_outer(carry):
            _, _, _, _, rho_df, rho_df_prev, iters, k_tot, _, ko = carry
            active = jnp.logical_and(jnp.any(rho_df >= stop2),
                                     ko < jnp.int32(max_outer))
            progressing = jnp.logical_or(
                ko == 0, jnp.any(rho_df * 4.0 <= rho_df_prev))
            return jnp.logical_and(
                jnp.logical_and(active, progressing), k_tot < max_k)

        def body_outer(carry):
            x, r, d, rho, rho_df, _, iters, k_tot, k_rep, ko = carry
            # chase each chain tau^2 below its CERTIFIED residual (or to
            # the final target if that is nearer)
            tgt = jnp.maximum(stop2, tau2 * rho_df)
            x, r, d, rho, iters, k_tot = inner(x, r, d, rho, tgt, iters,
                                               k_tot)
            if certify:
                # reliable update: replace the drifted recursive residual
                # with the df true residual; x and d carry un-restarted
                r_new = true_residual(x)
                rho_new = dot_pc(r_new, r_new)
            else:
                # certify=False (force solves): the INITIAL residual was
                # df-exact and the f32 recursion drifts from the truth by
                # ~eps_f32 * ||accumulated corrections|| per iteration --
                # provably negligible for SHORT recursions, but measured
                # at 3.9e-7 true residual on a 2.6k-iteration solve whose
                # recursive exit claimed 1e-8 (round-5 near-critical
                # probe). So the recursive exit is trusted only while the
                # segment since the last df replacement is shallow
                # (< cert_k iterations); deeper segments -- and genuine
                # multi-phase contractions (tgt above stop2) -- replace
                # with the df true residual, which the outer loop then
                # chases below the target like the certified path. Easy
                # solves (the tau=0.1 demo regime, <200 iters) never pay
                # a df apply; deep near-critical solves are df-accurate.
                def rep(_):
                    rn = true_residual(x)
                    return rn, dot_pc(rn, rn)

                do_rep = jnp.logical_or(
                    jnp.any(tgt > stop2),
                    k_tot - k_rep >= jnp.int32(cert_k))
                r_new, rho_new = jax.lax.cond(
                    do_rep, rep, lambda _: (r, rho), operand=None)
                k_rep = jnp.where(do_rep, k_tot, k_rep)
            if certify:
                k_rep = k_tot
            return (x, r_new, d, rho_new, rho_new, rho_df, iters, k_tot,
                    k_rep, ko + jnp.int32(1))

        x, r, d, rho, rho_df, _, iters, k_tot, _, ko = jax.lax.while_loop(
            cond_outer, body_outer,
            (x, r, r, rho, rho_df, jnp.full_like(rho, jnp.inf), iters0,
             jnp.int32(0), jnp.int32(0), jnp.int32(0)))

    ((r0h, r0l), (i0h, i0l)), ((r1h, r1l), (i1h, i1l)) = x
    xhi_ref[0, 0], xhi_ref[0, 1] = r0h, i0h
    xhi_ref[1, 0], xhi_ref[1, 1] = r1h, i1h
    xlo_ref[0, 0], xlo_ref[0, 1] = r0l, i0l
    xlo_ref[1, 0], xlo_ref[1, 1] = r1l, i1l
    iters_ref[...] = iters
    rho_ref[...] = rho_df
    bnorm_ref[...] = bnorm2


# ---------- double-float CG fallback kernel (conditioning envelope) ----------
#
# When the RU solver's f32 recursion stagnates (kappa(A) * eps_f32 >~ 1:
# the near-critical exceptional configurations, docs/PERF.md round-4
# envelope note), this kernel continues the solve as a CG recursion whose
# VECTOR state runs in double-float: Ad and the residual update in df, x
# accumulated error-free, the search direction and scalars in f32 (x and r
# share each rounded alpha, so r = b - A x holds to the df vector
# precision regardless of scalar precision). That lifts the attainable
# residual from ~kappa*eps_f32 to ~kappa*eps_df -- f64 grade -- so the
# shipped 1e-10 contract converges wherever the reference's own plain f64
# CG does (src/conjugate_gradient.cpp:4-66). Cost ~10x an f32 iteration;
# engaged ONLY on breakdown via a host-level lax.cond around the kernel
# (solve_refined_fused wrapper), so the common path pays nothing.


def _df_cg_fb_kernel(the_ref, tho_ref, b_ref, xhi_ref, xlo_ref,
                     ohi_ref, olo_ref, iters_ref, rho_ref, bnorm_ref,
                     *, m0: float, tol: float, tau: float, max_iter: int,
                     max_rounds: int, Nth: int):
    from schwingermodel_tpu.ops.pallas_eo import _spinor_axpbv, _csel
    from schwingermodel_tpu.solvers.dfloat import unsafe_no_barriers

    Nx, N = the_ref.shape[-2:]
    dot_pc, _ = pt.block_dot(N, Nth)
    one = jnp.float32(1.0)

    with unsafe_no_barriers():
        ops_df = EODFLanes(jnp.stack([the_ref[0], the_ref[1]]),
                           jnp.stack([tho_ref[0], tho_ref[1]]), m0, Nth)
        b = pt._read_spinor(b_ref)
        bnorm2 = dot_pc(b, b)
        stop2 = jnp.float32(tol * tol) * bnorm2
        tau2 = jnp.float32(tau * tau)
        x = (((xhi_ref[0, 0], xlo_ref[0, 0]), (xhi_ref[0, 1], xlo_ref[0, 1])),
             ((xhi_ref[1, 0], xlo_ref[1, 0]), (xhi_ref[1, 1], xlo_ref[1, 1])))
        b_df = _xdf_to_dfc((((b[0][0], jnp.zeros_like(b[0][0])),
                             (b[0][1], jnp.zeros_like(b[0][1]))),
                            ((b[1][0], jnp.zeros_like(b[1][0])),
                             (b[1][1], jnp.zeros_like(b[1][1])))))

        def true_residual_df(x):
            return dfc_sub(b_df, ops_df.normal(_xdf_to_dfc(x)))

        def collapse(r_df):
            return _xdf_collapse(_dfc_to_xdf(r_df))

        def d_to_dfc(d):
            z = jnp.zeros_like(d[0][0])
            return _xdf_to_dfc((((d[0][0], z), (d[0][1], z)),
                                ((d[1][0], z), (d[1][1], z))))

        # entry certification: the RU solution's df true residual
        r_df = true_residual_df(x)
        r = collapse(r_df)
        rho = dot_pc(r, r)
        # zero-restart lanes whose entry solution is worse than x = 0 (a
        # diverged RU recursion): x = 0 has residual exactly b -- the df
        # recursion then converges from a clean start instead of dying on
        # the poisoned state's overflowed dots
        bad0 = rho > bnorm2

        def z_plane(p):
            return jnp.where(bad0, jnp.zeros_like(p), p)

        x = tuple(tuple((z_plane(h), z_plane(l)) for h, l in comps)
                  for comps in x)
        r_df = DFComplex(
            (jnp.where(bad0, b_df.re[0], r_df.re[0]),
             jnp.where(bad0, b_df.re[1], r_df.re[1])),
            (jnp.where(bad0, b_df.im[0], r_df.im[0]),
             jnp.where(bad0, b_df.im[1], r_df.im[1])))
        r = collapse(r_df)
        rho = jnp.where(bad0, bnorm2, rho)
        x_entry, rho_entry = x, rho
        iters0 = jnp.zeros((1, N), jnp.int32)

        def inner(x, r_df, d, rho, tgt, dead, iters, k_tot):
            """df-recursion sweeps until every live lane is under tgt.
            Same per-lane guard discipline as the RU kernel's f32 inner."""

            def cond(carry):
                _, _, _, rho, dead, _, k = carry
                live = jnp.logical_and(rho >= tgt,
                                       dead < jnp.float32(0.5))
                return jnp.logical_and(jnp.any(live), k < max_iter)

            def body(carry):
                x, r_df, d, rho, dead, iters, k = carry
                active = jnp.logical_and(rho >= tgt,
                                         dead < jnp.float32(0.5))
                Ad_df = ops_df.normal(d_to_dfc(d))
                Ad = collapse(Ad_df)
                dAd = dot_pc(d, Ad)
                alpha_raw = rho / dAd
                broke = jnp.logical_and(
                    active,
                    jnp.logical_or(
                        jnp.logical_not(dAd > jnp.float32(0.0)),
                        jnp.logical_not(jnp.isfinite(alpha_raw))))
                dead = jnp.maximum(dead, broke.astype(jnp.float32))
                active = jnp.logical_and(active, jnp.logical_not(broke))
                alpha = jnp.where(active, alpha_raw, jnp.float32(0.0))
                x = _xdf_axpy(x, alpha, d)
                # r -= alpha * Ad in df (exact alpha*Ad products)
                r_df = dfc_sub(
                    r_df, DFComplex(
                        (alpha * Ad_df.re[0], alpha * Ad_df.re[1]),
                        (alpha * Ad_df.im[0], alpha * Ad_df.im[1])))
                r = collapse(r_df)
                rho_c = dot_pc(r, r)
                # freeze overflowed AND runaway-diverging lanes (a slow
                # divergence at extreme kappa would otherwise burn
                # max_iter before the sanitizer discards it)
                bad = jnp.logical_or(
                    jnp.logical_not(jnp.isfinite(rho_c)),
                    rho_c > jnp.float32(1e6) * bnorm2)
                dead = jnp.maximum(
                    dead, jnp.logical_and(active, bad).astype(jnp.float32))
                active = jnp.logical_and(active, jnp.logical_not(bad))
                beta = jnp.where(active, rho_c / rho, jnp.float32(0.0))
                d = tuple(
                    _csel(active,
                          (rs[0] + beta * ds[0], rs[1] + beta * ds[1]), ds)
                    for rs, ds in zip(r, d))
                rho = jnp.where(active, rho_c, rho)
                iters = iters + jnp.where(active, jnp.int32(1),
                                          jnp.int32(0))
                return (x, r_df, d, rho, dead, iters, k + jnp.int32(1))

            x, r_df, d, rho, dead, iters, k_tot = jax.lax.while_loop(
                cond, body, (x, r_df, d, rho, dead, iters, k_tot))
            return x, r_df, d, rho, dead, iters, k_tot

        def cond_outer(carry):
            _, _, _, _, rho_cert, rho_prev, dead, _, k_tot, ko = carry
            live = jnp.logical_and(rho_cert >= stop2,
                                   dead < jnp.float32(0.5))
            progressing = jnp.logical_or(
                ko == 0, jnp.any(rho_cert * 4.0 <= rho_prev))
            return jnp.logical_and(
                jnp.logical_and(jnp.any(live), progressing),
                jnp.logical_and(k_tot < max_iter, ko < max_rounds))

        def body_outer(carry):
            x, r_df, d, rho, rho_cert, _, dead, iters, k_tot, ko = carry
            tgt = jnp.maximum(stop2 * jnp.float32(0.0625), tau2 * rho_cert)
            x, r_df, d, rho, dead, iters, k_tot = inner(
                x, r_df, d, rho, tgt, dead, iters, k_tot)
            # reliable update: re-certify with the df true residual and
            # restart the direction on it (live lanes only)
            rt_df = true_residual_df(x)
            rt = collapse(rt_df)
            rho_t = dot_pc(rt, rt)
            live = dead < jnp.float32(0.5)
            d = tuple(_csel(live, rs, ds) for rs, ds in zip(rt, d))
            return (x, rt_df, d, rho_t, rho_t, rho_cert, dead, iters,
                    k_tot, ko + jnp.int32(1))

        carry = (x, r_df, r, rho, rho, jnp.full_like(rho, jnp.inf),
                 jnp.zeros_like(rho), iters0, jnp.int32(0), jnp.int32(0))
        x, r_df, d, rho, rho_cert, _, dead, iters, k_tot, ko = \
            jax.lax.while_loop(cond_outer, body_outer, carry)

        # per-lane sanitizer: never return worse than the entry solution
        # (a diverged recursion at extreme kappa must not poison the
        # caller's x; cf. the RU kernel's forecast sanitizer)
        better = rho_cert < rho_entry
        x = tuple(
            tuple((jnp.where(better, h, h0), jnp.where(better, l, l0))
                  for (h, l), (h0, l0) in zip(comps, comps0))
            for comps, comps0 in zip(x, x_entry))
        rho_cert = jnp.minimum(rho_cert, rho_entry)

    ((r0h, r0l), (i0h, i0l)), ((r1h, r1l), (i1h, i1l)) = x
    ohi_ref[0, 0], ohi_ref[0, 1] = r0h, i0h
    ohi_ref[1, 0], ohi_ref[1, 1] = r1h, i1h
    olo_ref[0, 0], olo_ref[0, 1] = r0l, i0l
    olo_ref[1, 0], olo_ref[1, 1] = r1l, i1l
    iters_ref[...] = iters
    rho_ref[...] = rho_cert
    bnorm_ref[...] = bnorm2


@functools.partial(
    jax.jit,
    static_argnames=("m0", "tol", "tau", "max_iter", "max_rounds", "Nth",
                     "interpret"))
def solve_df_cg_fused(thE, thO, b_p, x_hi, x_lo, *, m0: float, tol: float,
                      tau: float = 1e-5, max_iter: int = 10000,
                      max_rounds: int = 4, Nth: int = 0,
                      interpret: bool = False):
    """Double-float CG continuation from the RU solution (x_hi, x_lo):
    one Pallas program (see block comment above). Returns
    (x_hi, x_lo, iters [1,N], rho_cert [1,N], bnorm2 [1,N]); rho_cert is
    the df TRUE-residual norm^2, so `rho_cert < tol^2 * bnorm2` is the
    certified convergence criterion."""
    _, Nx, N = thE.shape
    kernel = functools.partial(
        _df_cg_fb_kernel, m0=float(m0), tol=float(tol), tau=float(tau),
        max_iter=int(max_iter), max_rounds=int(max_rounds), Nth=Nth)
    out_shape = (
        jax.ShapeDtypeStruct((2, 2, Nx, N), jnp.float32),   # x_hi
        jax.ShapeDtypeStruct((2, 2, Nx, N), jnp.float32),   # x_lo
        jax.ShapeDtypeStruct((1, N), jnp.int32),
        jax.ShapeDtypeStruct((1, N), jnp.float32),          # rho_cert
        jax.ShapeDtypeStruct((1, N), jnp.float32),          # bnorm2
    )
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, out_shape=out_shape, in_specs=[vspec] * 5,
        out_specs=(vspec,) * 5, interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_RU_BYTES),
    )(thE, thO, b_p, x_hi, x_lo)


@functools.partial(
    jax.jit,
    static_argnames=("m0", "tol", "tau", "max_iter", "max_outer", "Nth",
                     "certify", "df_fallback", "cert_k", "interpret"))
def solve_refined_fused(thE, thO, b_p, hist_p, *, m0: float, tol: float,
                        tau: float = 1e-5, max_iter: int = 10000,
                        max_outer: int = 12, Nth: int = 0,
                        certify: bool = True, df_fallback: bool = False,
                        cert_k: int = 192,
                        interpret: bool = False) -> RefinedSolveResult:
    """(Dhat Dhat^+)^{-1} b to `tol` at f64 grade: ONE Pallas program
    running reliable-update mixed-precision CG (see block comment above).

    hist_p: [K, 2, 2, Nx, N] forecast history. K == 1: hist_p[0] is the
    plain starting guess. K > 1: the kernel MRE-projects b onto
    span(hist_p) for x0 (chronological inversion; duplicates dropped).
    A bare [2, 2, Nx, N] guess is promoted to K == 1.
    tau: contract the recursive residual by this factor between df
    true-residual replacements (config cg.inner_tol reused: same per-phase
    contraction, but the Krylov recursion is never restarted).
    max_outer: cap on replacement rounds (stagnation also exits).
    df_fallback: on any unconverged chain, continue the solve with the
    double-float CG kernel (solve_df_cg_fused) behind a host-level
    lax.cond -- f64-grade conditioning envelope at zero cost on the
    common (all-converged) path. cg.fallback in config.py.
    """
    if hist_p.ndim == 4:
        hist_p = hist_p[None]
    K = hist_p.shape[0]
    _, Nx, N = thE.shape
    C = N // Nth
    kernel = functools.partial(
        _solve_ru_kernel, m0=float(m0), tol=float(tol), tau=float(tau),
        max_iter=int(max_iter), max_outer=int(max_outer), Nth=Nth, K=K,
        certify=bool(certify), cert_k=int(cert_k))
    out_shape = (
        jax.ShapeDtypeStruct((2, 2, Nx, N), jnp.float32),   # x_hi
        jax.ShapeDtypeStruct((2, 2, Nx, N), jnp.float32),   # x_lo
        jax.ShapeDtypeStruct((1, N), jnp.int32),
        jax.ShapeDtypeStruct((1, N), jnp.float32),          # rho_df
        jax.ShapeDtypeStruct((1, N), jnp.float32),          # bnorm2
    )
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    x_hi, x_lo, iters, rho, bnorm2 = pl.pallas_call(
        kernel, out_shape=out_shape, in_specs=[vspec] * 4,
        out_specs=(vspec,) * 5, interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_RU_BYTES),
    )(thE, thO, b_p, hist_p)

    if df_fallback:
        tol2 = jnp.float32(float(tol) * float(tol))
        need = jnp.logical_not(jnp.all(rho < tol2 * bnorm2))

        def fb(args):
            x_hi, x_lo, iters, rho = args
            o_hi, o_lo, it2, rho2, _ = solve_df_cg_fused(
                thE, thO, b_p, x_hi, x_lo, m0=m0, tol=tol, tau=tau,
                max_iter=max_iter, Nth=Nth, interpret=interpret)
            return o_hi, o_lo, iters + it2, rho2

        def keep(args):
            return args

        x_hi, x_lo, iters, rho = jax.lax.cond(
            need, fb, keep, (x_hi, x_lo, iters, rho))

    iters_c = iters.reshape(C, Nth)[:, 0]
    rho_c = rho.reshape(C, Nth)[:, 0]
    bn_c = bnorm2.reshape(C, Nth)[:, 0]
    return RefinedSolveResult(
        x=x_hi + x_lo, x_hi=x_hi, x_lo=x_lo, iters=iters_c,
        converged=rho_c < jnp.float32(float(tol) * float(tol)) * bn_c)
