"""Mixed-precision CG: f32 inner solves + f64 iterative refinement.

The reference's solver contract is a relative residual of 1e-10 in double
precision (src/main.cpp:26-27; criterion ||r|| < tol*||b||,
src/conjugate_gradient.cpp:45). A plain f32 CG cannot reach that: the
attainable relative residual is floored near kappa(A) * eps_f32 ~ 1e-6.
TPUs are f32-native, so running the whole solve in (emulated, ~10x slower)
f64 would forfeit the hardware. Standard mixed-precision iterative
refinement gets both:

    x_0 = x0 (f64);  repeat:
        r_k = b - A x_k          computed in f64   (the TRUE residual)
        solve A d = r_k          in f32 to a loose inner tolerance
                                 (the existing fused Pallas kernel or the
                                 jnp CG -- hundreds of fast iterations)
        x_{k+1} = x_k + d        accumulated in f64
    until ||r|| < tol * ||b||  (measured in f64)

Each pass contracts the true residual by ~max(inner_tol, kappa * eps_f32),
so 2-4 passes reach 1e-10; the f64 work is two operator applies and a few
axpys per pass -- negligible next to the f32 inner iterations even with
TPU f64 emulation. The returned convergence flag is measured on the f64
residual, i.e. it certifies the reference's own criterion.

Requires jax_enable_x64 (the CLI enables it when --cg-refine is active on
an f32 run; tests always run with x64 on).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from schwingermodel_tpu.solvers.cg import CGResult


def to_c128(v: jax.Array) -> jax.Array:
    """complex64 -> complex128 via split real/imag casts.

    A direct astype lowers to a c64->c128 convert-element-type, which the
    TPU x64-emulation rewriter cannot expand ("Unsupported CVT X64
    expansion", x64_rewriter.cc); f32->f64 converts are supported, so we
    route the cast through the real planes. Identity-cheap if v is
    already complex128."""
    return jax.lax.complex(jnp.real(v).astype(jnp.float64),
                           jnp.imag(v).astype(jnp.float64))


def to_c64(v: jax.Array) -> jax.Array:
    """complex128 -> complex64, split-real for the same TPU reason."""
    return jax.lax.complex(jnp.real(v).astype(jnp.float32),
                           jnp.imag(v).astype(jnp.float32))


def cg_refine(
    apply_A_hi: Callable[[jax.Array], jax.Array],
    inner_solve: Callable[[jax.Array, jax.Array], Tuple[jax.Array, jax.Array]],
    b: jax.Array,
    dot_re_hi: Callable[[jax.Array, jax.Array], jax.Array],
    *,
    tol: float = 1e-10,
    max_outer: int = 8,
    x0: jax.Array | None = None,
) -> CGResult:
    """Solve A x = b to f64 relative tolerance `tol` via iterative refinement.

    apply_A_hi : the operator in f64 (complex128 in / complex128 out).
    inner_solve: (rhs_lo, x0_lo) -> (dx_lo, inner_iters); an f32 solver for
                 A d = rhs to its own (loose) relative tolerance. rhs_lo and
                 x0_lo are complex64; dx_lo may be any precision (cast here).
    b          : right-hand side (any complex dtype; promoted to f64).
    dot_re_hi  : Re<x,y> global reduction (geometry-aware), f64 operands.

    Returns CGResult with x in complex128, iters = total inner iterations,
    converged/rel_residual measured on the f64 true residual. Stagnation
    (a pass contracting the residual by < 2x) terminates early with
    converged=False rather than burning max_outer passes.
    """
    b_hi = to_c128(b)
    if x0 is None:
        x0 = jnp.zeros_like(b_hi)
    x = to_c128(x0)

    b_norm2 = dot_re_hi(b_hi, b_hi)
    stop2 = (tol * tol) * b_norm2

    r = b_hi - apply_A_hi(x)
    rho = dot_re_hi(r, r)

    def cond(carry):
        _, _, rho, rho_prev, k, iters = carry
        active = jnp.logical_and(rho >= stop2, k < max_outer)
        # stagnation: the last pass failed to contract ||r||^2 by >= 4x
        progressing = jnp.logical_or(k == 0, rho * 4.0 <= rho_prev)
        return jnp.logical_and(active, progressing)

    def body(carry):
        x, r, rho, _, k, iters = carry
        r_lo = to_c64(r)
        d_lo, inner_iters = inner_solve(r_lo, jnp.zeros_like(r_lo))
        x = x + to_c128(d_lo)
        r = b_hi - apply_A_hi(x)
        rho_new = dot_re_hi(r, r)
        return (x, r, rho_new, rho, k + 1, iters + inner_iters)

    x, r, rho, _, k, iters = lax.while_loop(
        cond, body,
        (x, r, rho, jnp.full_like(rho, jnp.inf), jnp.int32(0), jnp.int32(0)))

    rel = jnp.sqrt(rho) * lax.rsqrt(
        jnp.maximum(b_norm2, jnp.finfo(rho.dtype).tiny))
    return CGResult(x=x, iters=iters, converged=rho < stop2, rel_residual=rel)


def cg_refine_df(
    normal_df: Callable,
    inner_solve: Callable[[jax.Array, jax.Array], Tuple[jax.Array, jax.Array]],
    b: jax.Array,
    dot_re: Callable[[jax.Array, jax.Array], jax.Array],
    *,
    tol: float = 1e-10,
    max_outer: int = 8,
    x0: jax.Array | None = None,
):
    """Iterative refinement with the TRUE residual in double-float (df)
    arithmetic -- f64-grade accuracy with only f32 ops, for TPUs where x64
    emulation is unavailable (solvers/dfloat.py rationale; the backend must
    preserve error-free transforms -- dfloat.eft_selfcheck).

    normal_df  : DFComplex -> DFComplex apply of A (ops/eo_df.EOOperatorsDF
                 .normal) at ~1e-14 relative accuracy.
    inner_solve: (rhs_c64, x0_c64) -> (dx_c64, iters); the f32 solver (fused
                 Pallas kernel or jnp CG) at its loose tolerance.
    b          : complex64 right-hand side (exact f32 values).
    dot_re     : geometry-aware Re<x,y> on complex64 (residual norms only
                 need f32 relative accuracy; the STATE is what must be df).

    Returns (CGResult with x = complex64 round of the df solution, x_df).
    The convergence flag certifies ||r||_df < tol ||b|| -- the reference's
    own criterion (src/conjugate_gradient.cpp:45) measured at ~1e-15
    resolution. Same stagnation early-exit as cg_refine.
    """
    from schwingermodel_tpu.solvers.dfloat import (
        DFComplex, dfc_from_c, dfc_sub, dfc_to_c, dfc_add,
    )

    b_df = dfc_from_c(b)
    if x0 is None:
        x0 = jnp.zeros_like(b)
    x = dfc_from_c(x0)

    b_norm2 = dot_re(b, b)
    stop2 = jnp.asarray(tol * tol, b_norm2.dtype) * b_norm2

    r = dfc_sub(b_df, normal_df(x))
    r_c = dfc_to_c(r)
    rho = dot_re(r_c, r_c)

    def cond(carry):
        _, _, rho, rho_prev, k, iters = carry
        active = jnp.logical_and(rho >= stop2, k < max_outer)
        progressing = jnp.logical_or(k == 0, rho * 4.0 <= rho_prev)
        return jnp.logical_and(active, progressing)

    def body(carry):
        x, r, rho, _, k, iters = carry
        r_c = dfc_to_c(r)
        d, inner_iters = inner_solve(r_c, jnp.zeros_like(r_c))
        x = dfc_add(x, dfc_from_c(d))
        r = dfc_sub(b_df, normal_df(x))
        r_c2 = dfc_to_c(r)
        rho_new = dot_re(r_c2, r_c2)
        return (x, r, rho_new, rho, k + 1, iters + inner_iters)

    x, r, rho, _, k, iters = lax.while_loop(
        cond, body,
        (x, r, rho, jnp.full_like(rho, jnp.inf), jnp.int32(0), jnp.int32(0)))

    rel = jnp.sqrt(rho) * lax.rsqrt(
        jnp.maximum(b_norm2, jnp.finfo(rho.dtype).tiny))
    res = CGResult(x=dfc_to_c(x), iters=iters, converged=rho < stop2,
                   rel_residual=rel)
    return res, x
