"""Conjugate gradient for hermitian positive-definite operators (DD^+).

Re-design of the reference src/conjugate_gradient.cpp:4-66 for the XLA
compilation model: the iteration is a `lax.while_loop` (traceable, jittable,
vmappable -- under vmap, JAX automatically freezes converged lanes while
others continue, replacing the reference's scalar early-exit at
conjugate_gradient.cpp:45-49 which does not vectorize), and all inner
products go through the geometry reduction so the same solver runs on one
device or psum-reduced across a mesh (the reference's MPI_Allreduce'd dot(),
include/variables.h:181-192).

Semantics matched to the reference:
  - initial guess x0 = b (conjugate_gradient.cpp:16)
  - relative convergence criterion ||r|| < tol * ||b|| (:45)
  - plain (unpreconditioned) CG on the normal operator; alpha/beta from
    the standard rho ratios (:31-63)
  - returns a convergence flag instead of aborting (:48, :66); the caller
    decides what to do (the reference dumps an "illConf" gauge config,
    src/hmc.cpp:48-56 -- see the driver).

The operator is passed as a closure so the same solver serves the plain
normal operator and the even-odd preconditioned system.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class CGResult(NamedTuple):
    x: jax.Array            # solution
    iters: jax.Array        # iterations taken (int32)
    converged: jax.Array    # bool
    rel_residual: jax.Array # ||r|| / ||b|| at exit


def cg_solve(
    apply_A: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    dot_re: Callable[[jax.Array, jax.Array], jax.Array],
    *,
    x0: jax.Array | None = None,
    tol: float = 1e-10,
    max_iter: int = 10000,
    sync_pred: Callable[[jax.Array], jax.Array] | None = None,
) -> CGResult:
    """Solve A x = b for hermitian positive-definite A.

    dot_re(x, y) must return Re<x, y> summed over the *global* lattice
    (a geometry-aware reduction). For hermitian A all CG scalars are real,
    so we keep them real (the reference carries complex alpha/beta whose
    imaginary parts are rounding noise, conjugate_gradient.cpp:14).

    sync_pred (e.g. Geometry.sync_any): ORs the continue-predicate across
    data-parallel device groups so every group runs the same number of
    iterations -- required when apply_A contains collectives whose schedule
    must stay aligned across groups (mismatched ppermute counts deadlock).
    Extra iterations on already-converged groups are harmless, exactly like
    JAX's frozen vmap lanes.
    """
    if x0 is None:
        x0 = b
    b_norm2 = dot_re(b, b)
    # tolerance on ||r||^2: ||r|| < tol * ||b||  <=>  rho < tol^2 * ||b||^2
    stop2 = (tol * tol) * b_norm2

    r0 = b - apply_A(x0)
    rho0 = dot_re(r0, r0)

    def cond(carry):
        _, _, _, rho, k = carry
        cont = jnp.logical_and(rho >= stop2, k < max_iter)
        return sync_pred(cont) if sync_pred is not None else cont

    def body(carry):
        x, r, d, rho, k = carry
        Ad = apply_A(d)
        alpha = rho / dot_re(d, Ad)
        x = x + alpha.astype(x.dtype) * d
        r = r - alpha.astype(r.dtype) * Ad
        rho_new = dot_re(r, r)
        beta = rho_new / rho
        d = r + beta.astype(d.dtype) * d
        return (x, r, d, rho_new, k + 1)

    x, r, d, rho, k = lax.while_loop(cond, body, (x0, r0, r0, rho0, jnp.int32(0)))
    rel = jnp.sqrt(rho) * lax.rsqrt(jnp.maximum(b_norm2, jnp.finfo(rho.dtype).tiny))
    return CGResult(x=x, iters=k, converged=rho < stop2, rel_residual=rel)


def cg_solve_single_reduction(
    apply_A: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    dot_re: Callable[[jax.Array, jax.Array], jax.Array],
    dot_batch_re: Callable,
    *,
    x0: jax.Array | None = None,
    tol: float = 1e-10,
    max_iter: int = 10000,
    sync_pred: Callable[[jax.Array], jax.Array] | None = None,
) -> CGResult:
    """CG with ONE global reduction per iteration (Chronopoulos/Gear-style).

    The classic loop needs two sequentially-dependent reductions per
    iteration (<d,Ad> before the x/r updates, then <r',r'>). Here all four
    inner products <r,r>, <d,Ad>, <Ad,Ad>, <r,Ad> are available as soon as
    Ad is, so they ride ONE batched reduction (dot_batch_re, e.g.
    ops.dirac.spinor_dot_re_batch -- a single psum on a sharded mesh), and
    the next residual norm follows from the exact expansion
        ||r - alpha Ad||^2 = <r,r> - 2 alpha <r,Ad> + alpha^2 <Ad,Ad>.
    Because <r,r> is re-measured exactly every iteration, the expansion
    error never accumulates (it is one cancellation deep, ~eps * <r,r>
    absolute -- far below any usable tol^2 floor); alpha uses the exact
    <r,r>, identical to classic CG. Per sharded CG iteration: 1 psum
    instead of 2 (the reference pays 2 MPI_Allreduce,
    src/conjugate_gradient.cpp:33-44). The convergence FLAG and residual
    are re-measured with an exact <r,r> after the loop.
    """
    if x0 is None:
        x0 = b
    b_norm2 = dot_re(b, b)
    stop2 = (tol * tol) * b_norm2

    r0 = b - apply_A(x0)
    rho0 = dot_re(r0, r0)

    def cond(carry):
        _, _, _, rho, k = carry
        cont = jnp.logical_and(rho >= stop2, k < max_iter)
        return sync_pred(cont) if sync_pred is not None else cont

    def body(carry):
        x, r, d, _, k = carry
        Ad = apply_A(d)
        rr, dAd, AdAd, rAd = dot_batch_re(
            [(r, r), (d, Ad), (Ad, Ad), (r, Ad)])
        alpha = rr / dAd
        x = x + alpha.astype(x.dtype) * d
        r = r - alpha.astype(r.dtype) * Ad
        rho_new = rr - 2.0 * alpha * rAd + alpha * alpha * AdAd
        beta = rho_new / rr
        d = r + beta.astype(d.dtype) * d
        return (x, r, d, rho_new, k + 1)

    x, r, d, rho, k = lax.while_loop(
        cond, body, (x0, r0, r0, rho0, jnp.int32(0)))
    rho_exact = dot_re(r, r)                     # un-drifted exit check
    rel = jnp.sqrt(jnp.abs(rho_exact)) * lax.rsqrt(
        jnp.maximum(b_norm2, jnp.finfo(b_norm2.dtype).tiny))
    return CGResult(x=x, iters=k, converged=rho_exact < stop2,
                    rel_residual=rel)
