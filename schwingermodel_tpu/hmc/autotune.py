"""Step-size auto-tuning via dual averaging on pooled acceptance.

The reference leaves integrator tuning to the user: README.md:87-94 tells
them to aim for an acceptance rate of 0.6-0.8 by hand-picking MD_steps and
the trajectory length per (beta, m0, volume). Here a short warmup phase
tunes the leapfrog step size automatically with Nesterov dual averaging
(the scheme NUTS uses for its step size), driving the *expected* Metropolis
acceptance probability min(1, exp(-dH)) to a target (default 0.7, the middle
of the reference's band). Acceptance statistics are pooled across vmapped
chains, so many chains tune faster than one.

The warmup runs as one compiled device program: `dt` is a traced scalar
argument of the trajectory (hmc/sampler.py), so every dual-averaging update
reuses the same executable. Afterwards `finalize()` re-quantizes the tuned
step into the reference's (md_steps, trajectory_length) convention, keeping
the trajectory length fixed and rounding md_steps = tau/eps to an integer.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from schwingermodel_tpu.config import HMCParams
from schwingermodel_tpu.hmc import sampler
from schwingermodel_tpu.models.schwinger import SchwingerModel
from schwingermodel_tpu.utils import prng


class DualAveragingState(NamedTuple):
    """Nesterov dual averaging (Hoffman & Gelman 2014, Algorithm 5)."""

    log_eps: jax.Array      # current (exploring) log step size
    log_eps_bar: jax.Array  # averaged iterate -- the tuned result
    h_bar: jax.Array        # running average of (target - accept_prob)
    t: jax.Array            # iteration count
    mu: jax.Array           # shrinkage point log(10 * eps0)


def da_init(eps0: float, dtype=jnp.float32) -> DualAveragingState:
    log_eps0 = jnp.asarray(jnp.log(eps0), dtype=dtype)
    return DualAveragingState(
        log_eps=log_eps0,
        log_eps_bar=log_eps0,
        h_bar=jnp.zeros((), dtype=dtype),
        t=jnp.zeros((), dtype=dtype),
        mu=jnp.asarray(jnp.log(10.0 * eps0), dtype=dtype),
    )


def da_update(state: DualAveragingState, accept_prob: jax.Array,
              target: float = 0.7, gamma: float = 0.05, t0: float = 10.0,
              kappa: float = 0.75) -> DualAveragingState:
    t = state.t + 1.0
    w = 1.0 / (t + t0)
    h_bar = (1.0 - w) * state.h_bar + w * (target - accept_prob)
    log_eps = state.mu - jnp.sqrt(t) / gamma * h_bar
    eta = t ** (-kappa)
    log_eps_bar = eta * log_eps + (1.0 - eta) * state.log_eps_bar
    return DualAveragingState(log_eps, log_eps_bar, h_bar, t, state.mu)


class TuneResult(NamedTuple):
    theta: jax.Array        # configuration after the warmup trajectories
    eps: jax.Array          # tuned step size (averaged iterate)
    accept_prob_last: jax.Array  # pooled accept prob of the final iteration


def tune_step_size(
    model: SchwingerModel,
    theta: jax.Array,
    key: jax.Array,
    n_tune: int = 100,
    target: float = 0.7,
    eps0: float | None = None,
    traj_fn=None,
    traj_handles_chains: bool = False,
) -> TuneResult:
    """Dual-averaging warmup; one compiled lax.scan over n_tune trajectories.

    theta may carry a leading chain axis (then the trajectory is vmapped and
    acceptance probabilities are pooled by mean across chains -- the
    on-device analog of pooling across ranks). `traj_fn(theta, key, dt)`
    defaults to the single-device sampler; pass a shard_map-wrapped step for
    sharded lattices. A chain-sharded step (parallel.sharded over a 3D
    'chain' mesh) consumes the whole chain batch itself -- pass
    traj_handles_chains=True so it gets the [C] key batch directly instead
    of being vmapped from outside (vmap cannot cross shard_map).
    jit-compatible (returns traced values).
    """
    rdtype = model.lattice.rdtype
    eps0 = float(model.hmc.step_size) if eps0 is None else eps0
    chains = theta.ndim == 4

    if traj_fn is None:
        def traj_fn(th, k, dt):
            return sampler.hmc_trajectory(model, th, k, dt=dt)

    def one(th, k, dt):
        if chains and traj_handles_chains:
            ks = jax.random.split(k, th.shape[0])
            th, st = traj_fn(th, ks, dt)
            p = jnp.mean(jnp.minimum(1.0, st.exp_mdH))
        elif chains:
            ks = jax.random.split(k, th.shape[0])
            th, st = jax.vmap(lambda t_, k_: traj_fn(t_, k_, dt))(th, ks)
            # pooled expected acceptance: mean over chains of min(1, exp(-dH))
            p = jnp.mean(jnp.minimum(1.0, st.exp_mdH))
        else:
            th, st = traj_fn(th, k, dt)
            p = jnp.minimum(1.0, st.exp_mdH)
        return th, p

    def body(carry, k):
        th, da = carry
        dt = jnp.exp(da.log_eps).astype(rdtype)
        th, p = one(th, k, dt)
        da = da_update(da, p.astype(da.h_bar.dtype), target=target)
        return (th, da), p

    keys = jax.vmap(lambda i: prng.trajectory_key(key, i))(jnp.arange(n_tune))
    (theta, da), probs = jax.lax.scan(body, (theta, da_init(eps0)), keys)
    return TuneResult(
        theta=theta, eps=jnp.exp(da.log_eps_bar), accept_prob_last=probs[-1])


def finalize(hmc: HMCParams, eps: float, max_md_steps: int = 1000) -> HMCParams:
    """Re-quantize a tuned step into the reference's fixed-length convention:
    keep trajectory_length, set md_steps = clip(round(tau/eps), min, max).

    The tuned eps is the per-step size of whichever integrator ran the
    warmup, so round(tau/eps) reproduces the tuned acceptance for both
    schemes. `max_md_steps` is a *force-evaluation* budget cap: an Omelyan
    2MN step costs TWO force evaluations (hmc/integrators.py:76-130) vs
    leapfrog's one, so the step-count cap is halved there -- otherwise a
    tune run with --integrator omelyan could silently commit to twice the
    intended compute. Omelyan is also well-defined at a single step
    (leapfrog's structure needs >= 2).
    """
    tau = hmc.trajectory_length
    if hmc.integrator == "omelyan":
        lo, hi = 1, max(1, max_md_steps // 2)
    else:
        lo, hi = 2, max_md_steps
    md = int(max(lo, min(hi, round(tau / float(eps)))))
    return dataclasses.replace(hmc, md_steps=md)


def autotune(model: SchwingerModel, theta, key, n_tune: int = 100,
             target: float = 0.7, traj_fn=None,
             traj_handles_chains: bool = False,
             ) -> Tuple[jax.Array, HMCParams, float]:
    """Convenience wrapper: tune, then return (theta, finalized HMCParams, eps)."""
    res = jax.jit(
        lambda th, k: tune_step_size(
            model, th, k, n_tune=n_tune, target=target, traj_fn=traj_fn,
            traj_handles_chains=traj_handles_chains)
    )(theta, key)
    eps = float(res.eps)
    return res.theta, finalize(model.hmc, eps), eps
