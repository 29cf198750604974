"""Fused Pallas TPU kernel: the entire CG solve of (Dhat Dhat^+) x = b.

Motivation (measured on TPU v5e at the 64x64 flagship config): one CG
iteration costs ~10 us at the XLA level -- the even-odd normal apply lowers
to a chain of small fusions whose per-kernel launch overhead dominates for
[2, 64, 32] fields, and ~90% of trajectory time is CG iterations. This
kernel runs the *whole solver* -- stencil, dots, axpys, and the convergence
while-loop -- as ONE Pallas program with every vector pinned in VMEM, so an
iteration costs a few microseconds of pure VPU work with zero kernel-launch
or HBM round trips.

Mathematics is identical to ops/eo.py (hop / hop_dag / Dhat Dhat^+ on the
even-packed checkerboard -- see that module and the reference mapping in its
docstring) and solver semantics identical to solvers/cg.py (x0 start,
relative ||r|| < tol ||b|| criterion matching the reference
src/conjugate_gradient.cpp:45, iteration cap, convergence flag).

Representation inside the kernel: complex fields as planar float32 pairs
(re, im) of [Nx, Nth] planes (Nth = Nt/2, packed time axis); a spinor is a
2-tuple of complex planes. Periodic shifts are slice+concatenate (exactly
periodic; the antiperiodic time sign is already folded into the links by
ops.dirac.fermion_links). The parity-dependent packed-axis gathers of
ops/eo.py become selects against an x-parity mask built from a broadcasted
iota.

Scope: single-device (or per-shard-local) f32 solves. The sharded path
keeps the jnp solver with ppermute halos (solvers/cg.py); quenched and
full-D modes never reach this kernel.

Multi-chain (vmap) packing: a TPU vector register is (8 sublanes x 128
lanes); a single 64x64 chain's packed planes are [64, 32] -- only 32 of 128
lanes carry data, so the VPU idles at 25% on the flagship lattice. Instead
of lifting vmap to a (sequential) pallas grid, the custom_vmap rule on
cg_solve_eo_fused CONCATENATES the chains along the lane axis: planes
become [Nx, C*Nth] (chain-major blocks), in-chain periodic time shifts are
two global rolls + a block-boundary select, and the per-chain CG dots are
one [1,N] x [N,N] block-indicator matmul on the MXU that also broadcasts
each chain's scalar back across its block. All C solves then advance in
lockstep with full lane utilization; converged chains are frozen by
masking their alpha/beta to zero until every chain meets tolerance.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------- planar complex helpers (tuples of (re, im) f32 planes) ----------

def _cmul(a, b):
    return (a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0])


def _cmulc(a, b):
    """conj(a) * b"""
    return (a[0] * b[0] + a[1] * b[1], a[0] * b[1] - a[1] * b[0])


def _cadd(a, b):
    return (a[0] + b[0], a[1] + b[1])


def _csub(a, b):
    return (a[0] - b[0], a[1] - b[1])


def _cmuli(a):
    """i * a"""
    return (-a[1], a[0])


def _caxpy(alpha, x, y):
    """y + alpha * x, alpha real scalar."""
    return (y[0] + alpha * x[0], y[1] + alpha * x[1])


def _cscale(s, a):
    return (s * a[0], s * a[1])


# ---------- periodic shifts on [Nx, Nth] planes (slice + concat) ----------

def _shift_p_x(a):
    """b[x] = a[x+1] (periodic)."""
    return jnp.concatenate([a[1:, :], a[:1, :]], axis=0)


def _shift_m_x(a):
    """b[x] = a[x-1]."""
    return jnp.concatenate([a[-1:, :], a[:-1, :]], axis=0)


def _shift_p_k(a):
    """b[k] = a[k+1] along the packed time axis."""
    return jnp.concatenate([a[:, 1:], a[:, :1]], axis=1)


def _shift_m_k(a):
    return jnp.concatenate([a[:, -1:], a[:, :-1]], axis=1)


def _csel(mask, a, b):
    return (jnp.where(mask, a[0], b[0]), jnp.where(mask, a[1], b[1]))


def _cshift(fn, a):
    return (fn(a[0]), fn(a[1]))


# ---------- the packed even-odd stencil (mirrors ops/eo.py) ----------

def _gather_pt(s, mask_tgt, tsh=None):
    """Source field at the target site's t+1 neighbor (eo._gather_pt)."""
    sp = tsh[0] if tsh else _shift_p_k
    return _csel(mask_tgt, _cshift(sp, s), s)


def _gather_mt(w, mask_tgt, tsh=None):
    """Source field at the target site's t-1 neighbor (eo._gather_mt)."""
    sm = tsh[1] if tsh else _shift_m_k
    return _csel(mask_tgt, w, _cshift(sm, w))


def _hop(u_t, u_s, s, mask_tgt, tsh=None):
    """Wilson hopping source-parity -> target-parity (eo.hop)."""
    u0t, u1t = u_t
    u0s, u1s = u_s
    s0, s1 = s

    p0_pt = _gather_pt(s0, mask_tgt, tsh)
    p1_pt = _gather_pt(s1, mask_tgt, tsh)
    bt = _gather_mt(_cmulc(u0s, _cadd(s0, s1)), mask_tgt, tsh)
    p0_px = _cshift(_shift_p_x, s0)
    p1_px = _cshift(_shift_p_x, s1)
    bx0 = _cshift(_shift_m_x, _cmulc(u1s, _csub(s0, _cmuli(s1))))
    bx1 = _cshift(_shift_m_x, _cmulc(u1s, _cadd(_cmuli(s0), s1)))

    h0 = _cadd(_cadd(_cmul(u0t, _csub(p0_pt, p1_pt)),
                     _cmul(u1t, _cadd(p0_px, _cmuli(p1_px)))),
               _cadd(bt, bx0))
    h1 = _cadd(_cadd(_cmul(u0t, _csub(p1_pt, p0_pt)),
                     _cmul(u1t, _csub(p1_px, _cmuli(p0_px)))),
               _cadd(bt, bx1))
    return (h0, h1)


def _hop_dag(u_t, u_s, s, mask_tgt, tsh=None):
    """Adjoint hopping source-parity -> target-parity (eo.hop_dag)."""
    u0t, u1t = u_t
    u0s, u1s = u_s
    s0, s1 = s

    p0_pt = _gather_pt(s0, mask_tgt, tsh)
    p1_pt = _gather_pt(s1, mask_tgt, tsh)
    fwd_t = _cmul(u0t, _cadd(p0_pt, p1_pt))
    bt0 = _gather_mt(_cmulc(u0s, _csub(s0, s1)), mask_tgt, tsh)
    bt1 = _gather_mt(_cmulc(u0s, _csub(s1, s0)), mask_tgt, tsh)
    p0_px = _cshift(_shift_p_x, s0)
    p1_px = _cshift(_shift_p_x, s1)
    bx0 = _cshift(_shift_m_x, _cmulc(u1s, _cadd(s0, _cmuli(s1))))
    bx1 = _cshift(_shift_m_x, _cmulc(u1s, _csub(s1, _cmuli(s0))))

    h0 = _cadd(_cadd(bt0, bx0),
               _cadd(fwd_t, _cmul(u1t, _csub(p0_px, _cmuli(p1_px)))))
    h1 = _cadd(_cadd(bt1, bx1),
               _cadd(fwd_t, _cmul(u1t, _cadd(p1_px, _cmuli(p0_px)))))
    return (h0, h1)


def _spinor_axpbv(alpha, u, beta, v):
    """alpha*u + beta*v per spin component; alpha/beta real scalars."""
    return tuple(
        (alpha * a[0] + beta * b[0], alpha * a[1] + beta * b[1])
        for a, b in zip(u, v)
    )


def _dot_re(u, v):
    """Re<u, v> summed over both spins and the plane."""
    acc = None
    for a, b in zip(u, v):
        t = jnp.sum(a[0] * b[0] + a[1] * b[1])
        acc = t if acc is None else acc + t
    return acc


# ---------- the kernel ----------

def _read_spinor(ref):
    return ((ref[0, 0], ref[0, 1]), (ref[1, 0], ref[1, 1]))


def _read_links(ref):
    return ((ref[0, 0], ref[0, 1]), (ref[1, 0], ref[1, 1]))


def _write_spinor(ref, s):
    ref[0, 0], ref[0, 1] = s[0]
    ref[1, 0], ref[1, 1] = s[1]


def _cg_kernel(ue_ref, uo_ref, b_ref, x0_ref,
               x_ref, iters_ref, rho_ref, bnorm_ref,
               *, m: float, tol: float, max_iter: int, Nx: int):
    # All scalars explicitly f32/int32: under jax_enable_x64 (the
    # mixed-precision refinement mode) weak-typed Python scalars trace as
    # f64/i64, and Mosaic's f64 conversion lowering recurses fatally.
    mask_x = jax.lax.rem(
        jax.lax.broadcasted_iota(jnp.int32, (Nx, 1), 0), jnp.int32(2))
    mask_e = mask_x == jnp.int32(1)  # off_e(x) = x mod 2 (eo.row_offset, EVEN)
    mask_o = mask_x == jnp.int32(0)  # off_o(x) = (x+1) mod 2
    c = jnp.float32(1.0 / (4.0 * m))
    m = jnp.float32(m)
    one = jnp.float32(1.0)

    ue = _read_links(ue_ref)
    uo = _read_links(uo_ref)

    def dhat(v):
        w = _hop(uo, ue, v, mask_o)                   # H_oe v
        return _spinor_axpbv(m, v, -c, _hop(ue, uo, w, mask_e))

    def dhat_dag(v):
        w = _hop_dag(uo, ue, v, mask_o)               # (H_eo)^+ v
        return _spinor_axpbv(m, v, -c, _hop_dag(ue, uo, w, mask_e))

    def apply_A(v):
        return dhat(dhat_dag(v))

    b = _read_spinor(b_ref)
    x0 = _read_spinor(x0_ref)

    bnorm2 = _dot_re(b, b)
    stop2 = jnp.float32(tol * tol) * bnorm2
    max_k = jnp.int32(max_iter)

    r0 = _spinor_axpbv(one, b, -one, apply_A(x0))
    rho0 = _dot_re(r0, r0)

    def cond(carry):
        _, _, _, rho, k = carry
        return jnp.logical_and(rho >= stop2, k < max_k)

    def body(carry):
        x, r, d, rho, k = carry
        Ad = apply_A(d)
        alpha = rho / _dot_re(d, Ad)
        x = _spinor_axpbv(one, x, alpha, d)
        r = _spinor_axpbv(one, r, -alpha, Ad)
        rho_new = _dot_re(r, r)
        beta = rho_new / rho
        d = _spinor_axpbv(one, r, beta, d)
        return (x, r, d, rho_new, k + jnp.int32(1))

    x, r, d, rho, k = jax.lax.while_loop(
        cond, body, (x0, r0, r0, rho0, jnp.int32(0)))

    _write_spinor(x_ref, x)
    iters_ref[0, 0] = k
    rho_ref[0, 0] = rho
    bnorm_ref[0, 0] = bnorm2


class PallasCGResult(NamedTuple):
    x: jax.Array            # solution, complex64 [2, Nx, Nth]
    iters: jax.Array        # int32
    converged: jax.Array    # bool
    rel_residual: jax.Array # f32


def _planar(v: jax.Array) -> jax.Array:
    """complex[..., A, Nx, Nth] -> f32[..., A, 2, Nx, Nth]."""
    return jnp.stack(
        [jnp.real(v).astype(jnp.float32), jnp.imag(v).astype(jnp.float32)],
        axis=-3)


def _unplanar(p: jax.Array) -> jax.Array:
    return jax.lax.complex(p[..., 0, :, :], p[..., 1, :, :])


def _cg_fused_single(Ue: jax.Array, Uo: jax.Array, b: jax.Array,
                     x0: jax.Array, *, m0: float, tol: float,
                     max_iter: int, interpret: bool = False,
                     ) -> PallasCGResult:
    """Single-solve fused CG (see cg_solve_eo_fused)."""
    _, Nx, Nth = b.shape
    m = float(m0) + 2.0

    kernel = functools.partial(
        _cg_kernel, m=m, tol=float(tol), max_iter=int(max_iter), Nx=Nx)

    out_shape = (
        jax.ShapeDtypeStruct((2, 2, Nx, Nth), jnp.float32),   # x
        jax.ShapeDtypeStruct((1, 1), jnp.int32),              # iters
        jax.ShapeDtypeStruct((1, 1), jnp.float32),            # rho
        jax.ShapeDtypeStruct((1, 1), jnp.float32),            # bnorm2
    )
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    xp, iters, rho, bnorm2 = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[vspec, vspec, vspec, vspec],
        out_specs=(vspec, sspec, sspec, sspec),
        interpret=interpret,
    )(_planar(Ue), _planar(Uo), _planar(b), _planar(x0))

    iters = iters[0, 0]
    rho = rho[0, 0]
    bnorm2 = bnorm2[0, 0]
    stop2 = (tol * tol) * bnorm2
    rel = jnp.sqrt(rho) * jax.lax.rsqrt(
        jnp.maximum(bnorm2, jnp.finfo(jnp.float32).tiny))
    return PallasCGResult(
        x=_unplanar(xp).astype(b.dtype), iters=iters,
        converged=rho < stop2, rel_residual=rel)


# ---------- multi-chain lane packing ----------

def _cg_kernel_mc(ue_ref, uo_ref, b_ref, x0_ref,
                  x_ref, iters_ref, rho_ref, bnorm_ref,
                  *, m: float, tol: float, max_iter: int, Nx: int, Nth: int):
    """C independent CG solves packed along the lane axis (planes [Nx, N],
    N = C*Nth, chain-major blocks of width Nth). See the module docstring.
    All scalars explicitly f32/int32 (x64-emulation safety, _cg_kernel)."""
    N = b_ref.shape[-1]
    mask_x = jax.lax.rem(
        jax.lax.broadcasted_iota(jnp.int32, (Nx, 1), 0), jnp.int32(2))
    mask_e = mask_x == jnp.int32(1)
    mask_o = mask_x == jnp.int32(0)
    c = jnp.float32(1.0 / (4.0 * m))
    m = jnp.float32(m)
    one = jnp.float32(1.0)

    # in-chain periodic time shifts: one global lane roll, fixed up at the
    # chain-block boundary with the element Nth-1 lanes the other way
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
    col = jax.lax.rem(lane, jnp.int32(Nth))
    last_col = col == jnp.int32(Nth - 1)
    first_col = col == jnp.int32(0)

    def shift_p_k(a):
        nxt = jnp.concatenate([a[:, 1:], a[:, :1]], axis=1)
        if N == Nth:
            return nxt
        wrap = jnp.concatenate(
            [a[:, N - (Nth - 1):], a[:, :N - (Nth - 1)]], axis=1)
        return jnp.where(last_col, wrap, nxt)

    def shift_m_k(a):
        prv = jnp.concatenate([a[:, -1:], a[:, :-1]], axis=1)
        if N == Nth:
            return prv
        wrap = jnp.concatenate([a[:, Nth - 1:], a[:, :Nth - 1]], axis=1)
        return jnp.where(first_col, wrap, prv)

    tsh = (shift_p_k, shift_m_k)

    # per-chain dot: reduce rows to a [1, N] lane vector, then one
    # [1,N]x[N,N] block-indicator matmul on the MXU sums within each chain
    # block AND broadcasts the chain scalar back across its block
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

    ue = _read_links(ue_ref)
    uo = _read_links(uo_ref)

    def dhat(v):
        w = _hop(uo, ue, v, mask_o, tsh)
        return _spinor_axpbv(m, v, -c, _hop(ue, uo, w, mask_e, tsh))

    def dhat_dag(v):
        w = _hop_dag(uo, ue, v, mask_o, tsh)
        return _spinor_axpbv(m, v, -c, _hop_dag(ue, uo, w, mask_e, tsh))

    def apply_A(v):
        return dhat(dhat_dag(v))

    b = _read_spinor(b_ref)
    x0 = _read_spinor(x0_ref)

    bnorm2 = dot_pc(b, b)                       # [1, N], block-constant
    stop2 = jnp.float32(tol * tol) * bnorm2
    max_k = jnp.int32(max_iter)

    r0 = _spinor_axpbv(one, b, -one, apply_A(x0))
    rho0 = dot_pc(r0, r0)
    iters0 = jnp.zeros((1, N), jnp.int32)

    def cond(carry):
        _, _, _, rho, _, k = carry
        return jnp.logical_and(jnp.any(rho >= stop2), k < max_k)

    def body(carry):
        x, r, d, rho, iters, k = carry
        active = rho >= stop2                   # [1, N] bool, block-constant
        Ad = apply_A(d)
        alpha = jnp.where(active, rho / dot_pc(d, Ad), jnp.float32(0.0))
        x = _spinor_axpbv(one, x, alpha, d)     # frozen chains: alpha = 0
        r = _spinor_axpbv(one, r, -alpha, Ad)
        rho_c = dot_pc(r, r)
        beta = jnp.where(active, rho_c / rho, jnp.float32(0.0))
        d = tuple(
            _csel(active, (rs[0] + beta * ds[0], rs[1] + beta * ds[1]), ds)
            for rs, ds in zip(r, d))
        rho = jnp.where(active, rho_c, rho)
        iters = iters + jnp.where(active, jnp.int32(1), jnp.int32(0))
        return (x, r, d, rho, iters, k + jnp.int32(1))

    x, r, d, rho, iters, k = jax.lax.while_loop(
        cond, body, (x0, r0, r0, rho0, iters0, jnp.int32(0)))

    _write_spinor(x_ref, x)
    iters_ref[...] = iters
    rho_ref[...] = rho
    bnorm_ref[...] = bnorm2


# VMEM budget for the packed solve. Measured on v5e: 64x64 C=32 (N=1024)
# allocates 19.56 MB of scoped vmem -> ~75 f32-plane-equivalents of [Nx, N]
# (CG carries + stencil temporaries + Mosaic double buffering). The default
# scoped limit is 16 MB but v5e can run with it raised (C=32 measured 1.6x
# better aggregate than C=16), so the packed call requests
# _VMEM_LIMIT_BYTES and the budget gates against it with headroom. Past it
# the custom_vmap rule splits the batch into lane-packed chunks (or single
# solves).
_VMEM_LIMIT_BYTES = 32 << 20
_VMEM_BUDGET_BYTES = 30 << 20


def _packed_vmem_bytes(Nx: int, N: int) -> int:
    return 75 * Nx * N * 4


def cg_solve_eo_fused_chains(Ue: jax.Array, Uo: jax.Array, b: jax.Array,
                             x0: jax.Array, *, m0: float, tol: float,
                             max_iter: int, interpret: bool = False,
                             ) -> PallasCGResult:
    """C independent solves (leading chain axis) as ONE lane-packed kernel.

    Ue/Uo/b/x0: complex[C, 2, Nx, Nth]. Returns PallasCGResult with leading
    chain axis on every field. The kernel iterates until EVERY chain meets
    tolerance (converged chains are frozen), so per-chain iteration counts
    are exact but wall time is max-over-chains."""
    C, _, Nx, Nth = b.shape
    N = C * Nth
    m = float(m0) + 2.0

    def pack(v):        # [C, A, Nx, Nth] -> [A, Nx, N] chain-major lanes
        return jnp.moveaxis(v, 0, -2).reshape(v.shape[1], Nx, N)

    kernel = functools.partial(
        _cg_kernel_mc, m=m, tol=float(tol), max_iter=int(max_iter),
        Nx=Nx, Nth=Nth)

    out_shape = (
        jax.ShapeDtypeStruct((2, 2, Nx, N), jnp.float32),     # x
        jax.ShapeDtypeStruct((1, N), jnp.int32),              # iters
        jax.ShapeDtypeStruct((1, N), jnp.float32),            # rho
        jax.ShapeDtypeStruct((1, N), jnp.float32),            # bnorm2
    )
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    xp, iters, rho, bnorm2 = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[vspec, vspec, vspec, vspec],
        out_specs=(vspec, vspec, vspec, vspec),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
    )(_planar(pack(Ue)), _planar(pack(Uo)), _planar(pack(b)),
      _planar(pack(x0)))

    x = jnp.moveaxis(_unplanar(xp).reshape(2, Nx, C, Nth), 2, 0)
    iters = iters.reshape(C, Nth)[:, 0]
    rho = rho.reshape(C, Nth)[:, 0]
    bnorm2 = bnorm2.reshape(C, Nth)[:, 0]
    stop2 = jnp.float32(tol * tol) * bnorm2
    rel = jnp.sqrt(rho) * jax.lax.rsqrt(
        jnp.maximum(bnorm2, jnp.finfo(jnp.float32).tiny))
    return PallasCGResult(
        x=x.astype(b.dtype), iters=iters,
        converged=rho < stop2, rel_residual=rel)


@functools.partial(jax.jit, static_argnames=("m0", "tol", "max_iter", "interpret"))
def cg_solve_eo_fused(Ue: jax.Array, Uo: jax.Array, b: jax.Array,
                      x0: jax.Array, *, m0: float, tol: float,
                      max_iter: int, interpret: bool = False,
                      ) -> PallasCGResult:
    """Solve (Dhat Dhat^+) x = b in one fused TPU kernel.

    Ue/Uo: even/odd-packed fermion links complex[2, Nx, Nth] (eo.pack of
    dirac.fermion_links). b/x0: even-packed spinors complex[2, Nx, Nth].
    m0/tol/max_iter are compile-time constants of the kernel. Semantics
    match solvers/cg.py exactly (same criterion, same flag).

    Under vmap (HMC chains) the solves are packed along the TPU lane axis
    into a single kernel with full vector-unit utilization (see module
    docstring) instead of a sequential pallas grid; past the VMEM budget
    the rule falls back to sequential per-chain solves.
    """

    @jax.custom_batching.custom_vmap
    def solve(Ue, Uo, b, x0):
        return _cg_fused_single(Ue, Uo, b, x0, m0=m0, tol=tol,
                                max_iter=max_iter, interpret=interpret)

    @solve.def_vmap
    def _vmap_rule(axis_size, in_batched, Ue, Uo, b, x0):
        def ensure(v, batched):
            return v if batched else jnp.broadcast_to(v, (axis_size,) + v.shape)

        Ue_b, Uo_b, b_b, x0_b = (
            ensure(v, f) for v, f in zip((Ue, Uo, b, x0), in_batched))
        C, _, Nx, Nth = b_b.shape

        def fits(c):
            return _packed_vmem_bytes(Nx, c * Nth) <= _VMEM_BUDGET_BYTES

        # largest divisor of C whose lane-packed solve fits in VMEM
        cg_ = max((d for d in range(1, C + 1) if C % d == 0 and fits(d)),
                  default=1)
        if cg_ == C:
            res = cg_solve_eo_fused_chains(
                Ue_b, Uo_b, b_b, x0_b, m0=m0, tol=tol,
                max_iter=max_iter, interpret=interpret)
        elif cg_ == 1:
            res = jax.lax.map(lambda a: solve(*a), (Ue_b, Uo_b, b_b, x0_b))
        else:
            g = C // cg_
            chunked = tuple(
                v.reshape(g, cg_, *v.shape[1:])
                for v in (Ue_b, Uo_b, b_b, x0_b))
            res = jax.lax.map(
                lambda a: cg_solve_eo_fused_chains(
                    *a, m0=m0, tol=tol, max_iter=max_iter,
                    interpret=interpret),
                chunked)
            res = jax.tree.map(
                lambda v: v.reshape(C, *v.shape[2:]), res)
        batched = PallasCGResult(x=True, iters=True, converged=True,
                                 rel_residual=True)
        return res, batched

    return solve(Ue, Uo, b, x0)
