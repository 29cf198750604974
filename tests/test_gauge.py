"""Gauge-sector tests: plaquettes, staples, action, force."""

import jax
import jax.numpy as jnp
import numpy as np

from schwingermodel_tpu.ops import gauge as gops
from schwingermodel_tpu.ops.geometry import Geometry

from tests import reference_impl as ref
from tests.conftest import random_theta

GEOM = Geometry()


def test_cold_plaquette_is_one():
    theta = jnp.zeros((2, 8, 8))
    P = gops.plaquette_field(GEOM, gops.links(theta))
    np.testing.assert_allclose(np.asarray(P), np.ones((8, 8)), rtol=1e-15)
    assert float(gops.gauge_action(GEOM, gops.links(theta), 2.0)) == 0.0


def test_plaquette_matches_oracle(rng):
    theta = random_theta(rng, 6, 10)
    U = np.asarray(gops.links(jnp.asarray(theta)))
    got = np.asarray(gops.plaquette_field(GEOM, jnp.asarray(U)))
    np.testing.assert_allclose(got, ref.plaquette_ref(U), rtol=1e-12)


def test_staples_match_oracle(rng):
    theta = random_theta(rng, 6, 10)
    U = np.asarray(gops.links(jnp.asarray(theta)))
    got = np.asarray(gops.staples(GEOM, jnp.asarray(U)))
    np.testing.assert_allclose(got, ref.staples_ref(U), rtol=1e-12)


def test_gauge_force_is_minus_grad_action(rng):
    """F_mu(n) = -dS_g/dtheta_mu(n): the analytic staple force must equal
    the autodiff gradient of the gauge action -- an oracle the C++ reference
    never had (SURVEY.md section 7 design stance)."""
    theta = jnp.asarray(random_theta(rng, 6, 8))
    beta = 1.7

    def S(th):
        return gops.gauge_action(GEOM, gops.links(th), beta)

    grad = jax.grad(S)(theta)
    F = gops.gauge_force(GEOM, gops.links(theta), beta)
    np.testing.assert_allclose(np.asarray(F), -np.asarray(grad), rtol=1e-10, atol=1e-12)


def test_plaquette_gauge_invariance(rng):
    """P is invariant under U_mu(n) -> g(n) U_mu(n) g*(n+mu)."""
    theta = jnp.asarray(random_theta(rng, 6, 8))
    U = gops.links(theta)
    alpha = jnp.asarray(random_theta(rng, 6, 8))[0]  # (6,8) angles
    g = jax.lax.complex(jnp.cos(alpha), jnp.sin(alpha))
    g_pt = jnp.roll(g, -1, axis=-1)
    g_px = jnp.roll(g, -1, axis=-2)
    U0 = g * U[0] * jnp.conj(g_pt)
    U1 = g * U[1] * jnp.conj(g_px)
    Ug = jnp.stack([U0, U1])
    P1 = gops.plaquette_sum(GEOM, U)
    P2 = gops.plaquette_sum(GEOM, Ug)
    np.testing.assert_allclose(float(P1), float(P2), rtol=1e-11)
