"""Wilson-Dirac operator, its adjoint, the normal operator, and the fermion
force kernel for the two-flavor Schwinger model.

Implements the same mathematics as the reference src/dirac_operator.cpp
(D_phi at :24, Eqs (34) of HMC_doc.pdf; D_dagger_phi at :247, Eqs (35)-(36);
phi_dag_partialD_phi at :486, Eqs (37)-(38)) but as whole-array shifted
products against the geometry abstraction instead of per-site neighbor-table
loops with hand-rolled halo exchange. The reference's interior/edge/corner
case splits and its 8 MPI_Send/Recv per apply (dirac_operator.cpp:49-238)
do not exist here: a shift is a shift, on one device or on a mesh.

Antiperiodic-in-time fermion boundary conditions (reference SignR/SignL
tables, include/dirac_operator.h:51-58) are folded *into the links once per
force evaluation*: `fermion_links` negates the mu=0 links on the last global
time slice. Folding is exact because every Sign factor the reference applies
equals the sign of the link the term traverses:
  - forward-t hop at site n uses U_0(n) * SignR_0(n), and SignR_0(n) = -1 iff
    t(n) = Nt-1, i.e. iff the traversed link is on the last slice;
  - backward-t hop uses conj(U_0(n-t)) * SignL_0(n), and SignL_0(n) = -1 iff
    t(n) = 0, i.e. iff the traversed link U_0(n-t) is on the last slice.
After folding, all hops are plain periodic shifts -- zero masking inside the
CG hot loop.

Field layout: spinor phi = complex[..., 2, Nx, Nt] (spin, x, t); links
U = complex[..., 2, Nx, Nt] (direction mu, x, t) with mu=0 the time direction
(t -> t+1) and mu=1 the space direction (x -> x+1), matching the reference's
axis convention (src/dirac_operator.cpp:5-21).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from schwingermodel_tpu.ops.geometry import (
    Geometry,
    shift_m_t,
    shift_m_x,
    shift_p_t,
    shift_p_x,
)


def make_sign_mask(geom: Geometry, local_Nx: int, local_Nt: int, global_Nt: int, rdtype) -> jax.Array:
    """(local_Nx, local_Nt) mask: -1 where global t == global_Nt - 1, else +1.

    Built from *global* coordinates so it is shard-oblivious (the reference
    instead conditions on MPI rank position, include/dirac_operator.h:53-58).
    local_Nx/local_Nt are the per-shard extents when geom is sharded.
    """
    _, t = geom.global_coords(local_Nx, local_Nt)
    return jnp.where(t == global_Nt - 1, -1.0, 1.0).astype(rdtype)


def fermion_links(U: jax.Array, sign_mask: jax.Array) -> jax.Array:
    """Fold the antiperiodic time boundary into the mu=0 links.

    U: complex[..., 2, Nx, Nt]; sign_mask: real (Nx, Nt) from make_sign_mask.
    """
    u0 = U[..., 0, :, :] * sign_mask
    u1 = U[..., 1, :, :]
    return jnp.stack([u0, u1], axis=-3)


def dirac(geom: Geometry, Uf: jax.Array, phi: jax.Array, m0) -> jax.Array:
    """D phi (reference D_phi, src/dirac_operator.cpp:24-45, doc Eq (34)).

    Uf must be *fermion* links (antiperiodic sign folded; see fermion_links).
    """
    u0 = Uf[..., 0, :, :]
    u1 = Uf[..., 1, :, :]
    p0 = phi[..., 0, :, :]
    p1 = phi[..., 1, :, :]
    m = m0 + 2.0

    # one shift per direction: same-direction operands ride one array so a
    # sharded apply costs exactly 4 ppermutes (the collective count, not the
    # halo bandwidth, dominates small-shard exchange)
    p_pt = shift_p_t(geom, phi)
    p0_pt = p_pt[..., 0, :, :]
    p1_pt = p_pt[..., 1, :, :]
    p_px = shift_p_x(geom, phi)
    p0_px = p_px[..., 0, :, :]
    p1_px = p_px[..., 1, :, :]
    # backward hops ship the link-multiplied, spin-projected product, the
    # same quantity the reference sends through its halos
    # (dirac_operator.cpp:49-52): conj(U) * (projected spinor), then shift.
    u0c = jnp.conj(u0)
    u1c = jnp.conj(u1)
    bt = shift_m_t(geom, u0c * (p0 + p1))             # spin structure (1+g0)
    bx = shift_m_x(geom, jnp.stack(
        [u1c * (p0 - 1j * p1), u1c * (1j * p0 + p1)], axis=-3))
    bx0 = bx[..., 0, :, :]
    bx1 = bx[..., 1, :, :]

    d0 = m * p0 - 0.5 * (u0 * (p0_pt - p1_pt) + u1 * (p0_px + 1j * p1_px) + bt + bx0)
    d1 = m * p1 - 0.5 * (u0 * (p1_pt - p0_pt) + u1 * (p1_px - 1j * p0_px) + bt + bx1)
    return jnp.stack([d0, d1], axis=-3)


def dirac_dagger(geom: Geometry, Uf: jax.Array, phi: jax.Array, m0) -> jax.Array:
    """D^+ phi (reference D_dagger_phi, src/dirac_operator.cpp:247-269,
    doc Eqs (35)-(36))."""
    u0 = Uf[..., 0, :, :]
    u1 = Uf[..., 1, :, :]
    p0 = phi[..., 0, :, :]
    p1 = phi[..., 1, :, :]
    m = m0 + 2.0

    # one shift per direction (4 ppermutes sharded) -- see dirac()
    p_pt = shift_p_t(geom, phi)
    p0_pt = p_pt[..., 0, :, :]
    p1_pt = p_pt[..., 1, :, :]
    p_px = shift_p_x(geom, phi)
    p0_px = p_px[..., 0, :, :]
    p1_px = p_px[..., 1, :, :]
    u0c = jnp.conj(u0)
    u1c = jnp.conj(u1)
    bt0 = shift_m_t(geom, u0c * (p0 - p1))
    bt1 = -bt0                                        # exact: (p1-p0) = -(p0-p1)
    bx = shift_m_x(geom, jnp.stack(
        [u1c * (p0 + 1j * p1), u1c * (p1 - 1j * p0)], axis=-3))
    bx0 = bx[..., 0, :, :]
    bx1 = bx[..., 1, :, :]

    fwd_t = u0 * (p0_pt + p1_pt)                      # same for both spins
    d0 = m * p0 - 0.5 * (bt0 + bx0 + fwd_t + u1 * (p0_px - 1j * p1_px))
    d1 = m * p1 - 0.5 * (bt1 + bx1 + fwd_t + u1 * (p1_px + 1j * p0_px))
    return jnp.stack([d0, d1], axis=-3)


def dirac_normal(geom: Geometry, Uf: jax.Array, phi: jax.Array, m0) -> jax.Array:
    """(D D^+) phi (reference D_D_dagger_phi, src/dirac_operator.cpp:477-480)."""
    return dirac(geom, Uf, dirac_dagger(geom, Uf, phi, m0), m0)


def fermion_force(geom: Geometry, Uf: jax.Array, left: jax.Array, right: jax.Array) -> jax.Array:
    """Fermion force field F_mu(n) (reference phi_dag_partialD_phi,
    src/dirac_operator.cpp:486-505, doc Eqs (37)-(38)).

    left = psi = (DD^+)^{-1} Phi, right = chi' = D^+ psi. The antiperiodic
    sign SignR multiplies both terms at site n in the reference; with the
    sign folded into Uf it appears as Uf and conj(Uf) here (sign is real).
    Returns real[..., 2, Nx, Nt].
    """
    u0 = Uf[..., 0, :, :]
    u1 = Uf[..., 1, :, :]
    l0 = left[..., 0, :, :]
    l1 = left[..., 1, :, :]
    r0 = right[..., 0, :, :]
    r1 = right[..., 1, :, :]

    sh_t = shift_p_t(geom, jnp.stack([r0 - r1, l0 + l1], axis=-3))
    sh_x = shift_p_x(geom, jnp.stack([r0 + 1j * r1, l0 - 1j * l1], axis=-3))
    f0 = jnp.imag(
        u0 * jnp.conj(l0 - l1) * sh_t[..., 0, :, :]
        - jnp.conj(u0) * jnp.conj(sh_t[..., 1, :, :]) * (r0 + r1)
    )
    f1 = jnp.imag(
        u1 * jnp.conj(l0 + 1j * l1) * sh_x[..., 0, :, :]
        + jnp.conj(u1) * jnp.conj(sh_x[..., 1, :, :]) * (-r0 + 1j * r1)
    )
    return jnp.stack([f0, f1], axis=-3)


def spinor_dot(geom: Geometry, x: jax.Array, y: jax.Array) -> jax.Array:
    """Global inner product <x, y> = sum conj(x) * y.

    NB: the reference's dot() conjugates the *second* argument
    (include/variables.h:181-192); we use the standard convention
    (conjugate first). All uses in the algorithm are norms or real parts,
    which agree under either convention.
    """
    return geom.gsum(jnp.sum(jnp.conj(x) * y, axis=-3))


def spinor_dot_re_batch(geom: Geometry, pairs) -> jax.Array:
    """Re<a_i, b_i> for several spinor pairs with ONE global reduction.

    Returns the stacked results along axis 0. On a sharded mesh this costs
    a single psum instead of one per dot -- the collective-count lever the
    single-reduction CG uses (solvers/cg.py; the reference pays one
    MPI_Allreduce per inner product, include/variables.h:181-192)."""
    locs = [
        jnp.sum(jnp.real(a) * jnp.real(b) + jnp.imag(a) * jnp.imag(b),
                axis=(-3, -2, -1))
        for a, b in pairs
    ]
    return geom.gsum_stack(locs)


def spinor_norm2(geom: Geometry, x: jax.Array) -> jax.Array:
    """Global ||x||^2 as a real scalar (per leading batch element)."""
    a = jnp.real(x) ** 2 + jnp.imag(x) ** 2
    return geom.gsum(jnp.sum(a, axis=-3))
