"""U(1) gauge-field operations: plaquettes, staples, action, force.

Implements the mathematics of the reference src/gauge_conf.cpp as whole-array
shifted products. The gauge field is canonically stored as real link *angles*
theta[..., 2, Nx, Nt] with U = exp(i theta): unitarity is then exact in any
precision, and the leapfrog link update U *= exp(i dt pi) (reference
src/hmc.cpp:79-87, which compounds multiplicative rounding error in complex
arithmetic) becomes the exact addition theta += dt * pi.

Gauge links are periodic in both directions (only *fermions* are antiperiodic
in time), matching the reference where SignR/SignL apply only inside the
Dirac operator.
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


def links(theta: jax.Array, cdtype=None) -> jax.Array:
    """U = exp(i theta); complex links from angles."""
    U = jax.lax.complex(jnp.cos(theta), jnp.sin(theta))
    return U.astype(cdtype) if cdtype is not None else U


def plaquette_field(geom: Geometry, U: jax.Array) -> jax.Array:
    """P_01(n) = U_0(n) U_1(n+t) U*_0(n+x) U*_1(n)
    (reference Compute_Plaquette01, src/gauge_conf.cpp:41-48)."""
    u0 = U[..., 0, :, :]
    u1 = U[..., 1, :, :]
    return u0 * shift_p_t(geom, u1) * jnp.conj(shift_p_x(geom, u0)) * jnp.conj(u1)


def plaquette_sum(geom: Geometry, U: jax.Array) -> jax.Array:
    """Sp = sum_n Re P_01(n) (reference MeasureSp_HMC, gauge_conf.cpp:427-437).

    Note: *sum* over the lattice, not the average; the reference divides by
    the volume only at the very end (hmc.cpp:213).
    """
    return geom.gsum(jnp.real(plaquette_field(geom, U)))


def gauge_action(geom: Geometry, U: jax.Array, beta) -> jax.Array:
    """S_g = beta * sum_n (1 - Re P_01(n))
    (reference Compute_gaugeAction, gauge_conf.cpp:441-449)."""
    return beta * geom.gsum(1.0 - jnp.real(plaquette_field(geom, U)))


def staples(geom: Geometry, U: jax.Array) -> jax.Array:
    """Staple field A_mu(n) (reference Compute_Staple, gauge_conf.cpp:89-133).

    mu=0: U_1(n) U_0(n+x) U*_1(n+t)  +  [U*_1 U_0 (U_1 shifted +t)](n-x)
    mu=1: U_0(n) U_1(n+t) U*_0(n+x)  +  [U*_0 U_1 (U_0 shifted +x)](n-t)

    The reference needs dedicated diagonal-rank corner messages for the
    (n-x+t) and (n+x-t) links (gauge_conf.cpp:226-227, :359-360); here those
    are just compositions of two shifts applied to a locally-formed product.
    """
    u0 = U[..., 0, :, :]
    u1 = U[..., 1, :, :]
    u0_px = shift_p_x(geom, u0)
    u1_pt = shift_p_t(geom, u1)
    s0 = u1 * u0_px * jnp.conj(u1_pt) + shift_m_x(geom, jnp.conj(u1) * u0 * u1_pt)
    s1 = u0 * u1_pt * jnp.conj(u0_px) + shift_m_t(geom, jnp.conj(u0) * u1 * u0_px)
    return jnp.stack([s0, s1], axis=-3)


def gauge_force(geom: Geometry, U: jax.Array, beta) -> jax.Array:
    """F^g_mu(n) = -beta * Im[U_mu(n) * conj(A_mu(n))]
    (reference Force_G, src/hmc.cpp:32-39). Real field, same shape as theta."""
    return -beta * jnp.imag(U * jnp.conj(staples(geom, U)))
