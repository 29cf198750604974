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


# Omelyan/Mryglod/Folk 2nd-order minimum-norm coefficient (2MN),
# Comput. Phys. Commun. 151 (2003) 272, Eq. (31): minimizes the norm of the
# O(dt^2) error operator; ~10x smaller |dH| than leapfrog per step.
LAMBDA_2MN = 0.1931833275037836


def omelyan(model: SchwingerModel, theta: jax.Array, pi: jax.Array,
            phi: jax.Array, dt=None, beta=None):
    """2MN position-version integrator; returns (theta', pi', stats, psi).

    One step of size dt (two force evaluations):

        theta += lam*dt*pi ; pi += dt/2*F ; theta += (1-2 lam)*dt*pi ;
        pi += dt/2*F ; theta += lam*dt*pi

    md_steps steps integrate the FULL trajectory_length (unlike the
    reference's leapfrog convention, which integrates
    (MD_steps-1)/MD_steps of it -- see the module docstring). Trailing and
    leading theta-updates of adjacent steps are merged, so the per-step
    cost is two forces + five axpys. Chronological forecasting threads the
    previous solution through both force solves per step.

    New capability beyond the reference: at equal force-evaluation budget
    (md_steps_omelyan = md_steps_leapfrog / 2) the acceptance rate is
    strictly higher (tests/test_balance.py)."""
    dt = model.hmc.step_size if dt is None else dt
    lam = LAMBDA_2MN
    forecast = (model.hmc.cg_forecast and not model.hmc.quenched
                and phi is not None)
    n = model.hmc.md_steps

    stats = SolveStats.zero()

    theta = theta + (lam * dt) * pi
    F, stats, psi = model.force(theta, phi, stats, beta)

    def half_step(theta, pi, F, psi, stats, merge):
        pi = pi + (0.5 * dt) * F
        theta = theta + ((1.0 - 2.0 * lam) * dt) * pi
        F, stats, psi = model.force(theta, phi, stats, beta,
                                    x0=psi if forecast else None)
        pi = pi + (0.5 * dt) * F
        theta = theta + ((2.0 if merge else 1.0) * lam * dt) * pi
        if merge:
            F, stats, psi = model.force(theta, phi, stats, beta,
                                        x0=psi if forecast else None)
        return theta, pi, F, psi, stats

    def body(carry, _):
        theta, pi, F, psi, stats = carry
        theta, pi, F, psi, stats = half_step(theta, pi, F, psi, stats, True)
        return (theta, pi, F, psi, stats), None

    if n > 1:
        (theta, pi, F, psi, stats), _ = lax.scan(
            body, (theta, pi, F, psi, stats), None, length=n - 1)
    theta, pi, F, psi, stats = half_step(theta, pi, F, psi, stats, False)
    return theta, pi, stats, psi


def integrate(model: SchwingerModel, theta: jax.Array, pi: jax.Array,
              phi: jax.Array, dt=None, beta=None):
    """Dispatch on hmc.integrator ("leapfrog" | "omelyan")."""
    name = model.hmc.integrator
    if name == "leapfrog":
        return leapfrog(model, theta, pi, phi, dt, beta)
    if name == "omelyan":
        return omelyan(model, theta, pi, phi, dt, beta)
    raise ValueError(f"unknown integrator {name!r}")
