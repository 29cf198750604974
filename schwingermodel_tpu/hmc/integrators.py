"""Molecular-dynamics integrators.

`leapfrog` reproduces the reference integrator structure exactly
(HMC::Leapfrog, src/hmc.cpp:63-103): a position-first scheme

    theta += dt/2 * pi ;  F
    repeat MD_steps-2 times:  pi += dt*F ; theta += dt*pi ; F
    pi += dt*F ; theta += dt/2 * pi

Note the reference convention integrates an *effective* trajectory length of
(MD_steps-1)/MD_steps * trajectory_length with MD_steps-1 force evaluations;
we match it so acceptance statistics are comparable run-for-run.

In angle representation the link update U *= exp(i dt pi)
(src/hmc.cpp:70-71, :82-86) is the exact addition theta += dt * pi; no
unitarity drift accumulates in low precision.

The inner loop is a `lax.scan` with a static trip count, so the whole
trajectory traces once under jit regardless of MD_steps.
"""

from __future__ import annotations

from typing import Tuple

import jax
from jax import lax

from schwingermodel_tpu.models.schwinger import SchwingerModel, SolveStats


def leapfrog(model: SchwingerModel, theta: jax.Array, pi: jax.Array,
             phi: jax.Array, dt=None, beta=None):
    """One MD trajectory; returns (theta', pi', solve_stats, psi_last).

    `dt` / `beta` may be traced scalars overriding the static hmc values
    (step-size autotuning, beta scans) -- the compiled program is reused
    across values; only md_steps (the trip count) stays static.

    Chronological forecasting (hmc.cg_forecast, default on): each force CG
    starts from the previous step's solution psi -- theta moves O(dt) per
    step so psi is an excellent guess, typically saving ~1/3 of the solver
    iterations. The reference always restarts CG from b
    (src/conjugate_gradient.cpp:16). psi_last (the final force solve's
    solution, None in quenched mode) is returned so the Hamiltonian's action
    solve can forecast too."""
    dt = model.hmc.step_size if dt is None else dt
    n_inner = model.hmc.md_steps - 2
    forecast = model.hmc.cg_forecast and not model.hmc.quenched and phi is not None

    stats = SolveStats.zero()
    theta = theta + (0.5 * dt) * pi
    F, stats, psi = model.force(theta, phi, stats, beta)

    def body(carry, _):
        theta, pi, F, psi, stats = carry
        pi = pi + dt * F
        theta = theta + dt * pi
        F, stats, psi = model.force(theta, phi, stats, beta,
                                    x0=psi if forecast else None)
        return (theta, pi, F, psi, stats), None

    if n_inner > 0:
        (theta, pi, F, psi, stats), _ = lax.scan(
            body, (theta, pi, F, psi, stats), None, length=n_inner
        )

    pi = pi + dt * F
    theta = theta + (0.5 * dt) * pi
    return theta, pi, stats, psi
