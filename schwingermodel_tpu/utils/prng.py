"""PRNG key discipline.

Replaces the reference's four ad-hoc RNG streams (srand((rank+1)*time(0)) at
src/main.cpp:17, std::random_device engines at src/hmc.cpp:7-8 and 20-21, and
rand() for Metropolis at include/statistics.h:20-24) with a single threefry
key tree: one root key per run, folded per chain and per trajectory. The
Metropolis uniform draw is derived from the same key on every shard, which
makes the reference's explicit MPI_Bcast of the accept random number
(src/hmc.cpp:166-169) unnecessary under SPMD: replicated computation of the
same key yields the same draw for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def root_key(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


def chain_keys(key: jax.Array, n_chains: int) -> jax.Array:
    """One independent key per vmapped chain."""
    return jax.random.split(key, n_chains)


def trajectory_key(key: jax.Array, traj_index) -> jax.Array:
    """Deterministic per-trajectory key (checkpoint/resume safe)."""
    return jax.random.fold_in(key, traj_index)


def split_fields(key: jax.Array, n: int = 3):
    """Split a trajectory key into per-field subkeys (pi, chi, metropolis)."""
    return jax.random.split(key, n)


def normal_real(key: jax.Array, shape, dtype) -> jax.Array:
    """pi ~ N(0, 1) per momentum component (reference src/hmc.cpp:5-16)."""
    return jax.random.normal(key, shape, dtype=dtype)


def normal_complex(key: jax.Array, shape, rdtype) -> jax.Array:
    """chi with real and imaginary parts each ~ N(0, 1/sqrt(2))
    (reference src/hmc.cpp:19-28), so E|chi|^2 = 1 per component."""
    z = jax.random.normal(key, (2,) + tuple(shape), dtype=rdtype)
    return jax.lax.complex(z[0], z[1]) * jnp.asarray(2.0 ** -0.5, dtype=rdtype)


def uniform_scalar(key: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Metropolis draw r in [0,1) (reference rand_range(0,1), statistics.h:20-24)."""
    return jax.random.uniform(key, (), dtype=dtype)


def z2_complex(key: jax.Array, shape, rdtype) -> jax.Array:
    """Complex Z2xZ2 noise: entries (+-1 +- i)/sqrt(2), so E[z z^+] = I.

    Standard variance-minimal noise for stochastic trace estimation
    (chiral condensate); not present in the reference.
    """
    bits = jax.random.bernoulli(key, 0.5, (2,) + tuple(shape))
    s = jnp.where(bits, 1.0, -1.0).astype(rdtype)
    return jax.lax.complex(s[0], s[1]) * jnp.asarray(2.0 ** -0.5, dtype=rdtype)
