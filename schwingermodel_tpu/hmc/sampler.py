"""One HMC trajectory: momentum/noise refresh, MD evolution, Metropolis.

Reference: HMC::HMC_Update, src/hmc.cpp:151-181. Differences by design:

  - RNG: threefry subkeys instead of four ad-hoc C RNG streams; the
    Metropolis uniform is derived from the (replicated) trajectory key, so
    all shards of an SPMD program draw the same number without the explicit
    MPI_Bcast the reference needs (src/hmc.cpp:166-169).
  - H_old: the reference evaluates the old Hamiltonian with a full CG solve
    (hmc.cpp:162 calling Action, :105-133). Since Phi = D chi, the old
    fermion action is Phi^+(DD^+)^{-1}Phi = |chi|^2 *exactly*, so with
    `exact_initial_fermion_action` (default) we skip that solve -- one fewer
    CG per trajectory, and H_old is exact rather than tol-limited.
  - CG failure: instead of writing an "illConf" file from inside the update
    (hmc.cpp:48-56, impossible and undesirable under jit), the trajectory
    reports `all_converged` in its stats; the driver dumps the configuration
    on the host side.

The trajectory is split in two layers:

  trajectory_given_noise(model, theta, pi, chi, r)
      the deterministic physics given pre-drawn noise fields. This is the
      function that runs *inside* shard_map on a device mesh (see
      schwingermodel_tpu.parallel.sharded) -- noise is drawn outside with
      the global key, so the sharded and single-device paths are
      bit-identical by construction.

  hmc_trajectory(model, theta, key)
      single-device convenience wrapper: splits the key, draws the fields,
      calls trajectory_given_noise.

Both are jit-compatible and vmap over leading chain axes.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from schwingermodel_tpu.hmc.integrators import integrate
from schwingermodel_tpu.models.schwinger import SchwingerModel, SolveStats
from schwingermodel_tpu.utils import prng


class TrajectoryStats(NamedTuple):
    accepted: jax.Array       # bool
    delta_H: jax.Array        # H' - H
    exp_mdH: jax.Array        # exp(-dH), for <exp(-dH)>=1 diagnostics
    cg_iters: jax.Array       # total CG iterations this trajectory
    cg_converged: jax.Array   # bool: all solves converged


def draw_noise(model: SchwingerModel, shape, key: jax.Array):
    """Draw (pi, chi, r) for one trajectory from a trajectory key.

    shape is theta.shape; returns momentum field pi ~ N(0,1), pseudofermion
    noise chi ~ complex N(0, 1/sqrt(2)) per component (even-packed half
    lattice in even-odd mode), Metropolis uniform r.
    """
    rdtype = model.lattice.rdtype
    k_pi, k_chi, k_acc = prng.split_fields(key, 3)
    pi = prng.normal_real(k_pi, shape, rdtype)
    chi = prng.normal_complex(k_chi, model.chi_shape(shape), rdtype)
    r = prng.uniform_scalar(k_acc, dtype=rdtype)
    return pi, chi, r


def trajectory_given_noise(
    model: SchwingerModel,
    theta: jax.Array,
    pi: jax.Array,
    chi: jax.Array,
    r: jax.Array,
    dt=None,
    beta=None,
) -> Tuple[jax.Array, TrajectoryStats]:
    """Deterministic HMC update given pre-drawn noise. Returns (theta', stats).

    `dt` / `beta` may be traced scalar overrides of the static hmc values
    (step-size autotuning, beta scans share one compiled program)."""
    quenched = model.hmc.quenched
    stats = SolveStats.zero()
    if quenched:
        phi = None
    else:
        # Phi = D chi (src/hmc.cpp:159-160); a (phi1, phi2) pair under
        # Hasenbusch (one heavy heat-bath solve, models.pseudofermion_fields)
        phi, stats = model.pseudofermion_fields(theta, chi, stats)

    # --- old Hamiltonian ---
    kin_old = model.kinetic(pi)
    sg_old = model.gauge_action(theta, beta)
    if quenched:
        sf_old = 0.0
    elif model.hmc.exact_initial_fermion_action:
        if model._refine_active() and model._refine_impl() == "dfloat":
            # double-float accumulation (Metropolis-grade dH, no x64):
            # the component squares are exact in two_prod
            from schwingermodel_tpu.solvers.dfloat import df_add, df_sum_all, two_prod

            t = df_add(two_prod(jnp.real(chi), jnp.real(chi)),
                       two_prod(jnp.imag(chi), jnp.imag(chi)))
            s_hi, s_lo = df_sum_all(t)
            if model.geom.is_sharded:
                s_hi = model.geom.gsum_all(s_hi)
                s_lo = model.geom.gsum_all(s_lo)
            sf_old = s_hi + s_lo
        else:
            # f64 accumulation under x64 refinement; the squares of the
            # f32 components are exact in f64. Under Hasenbusch chi carries
            # the (chi1, chi2) pair axis: S1_old + S2_old = |chi1|^2 +
            # |chi2|^2 exactly (models.pseudofermion_fields), so both axes
            # sum here.
            acc_t = jnp.float64 if model._refine_active() else chi.real.dtype
            axes = (-4, -3) if model.hasenbusch_active else -3
            sf_old = model.geom.gsum(jnp.sum(
                jnp.real(chi).astype(acc_t) ** 2
                + jnp.imag(chi).astype(acc_t) ** 2, axis=axes))
    else:
        sf_old, stats = model.fermion_action(theta, phi, stats)
    H_old = kin_old + sg_old + sf_old

    # --- MD evolution ---
    theta_new, pi_new, stats, psi_last = integrate(model, theta, pi, phi, dt, beta)

    # --- new Hamiltonian ---
    if quenched:
        sf_new = 0.0
    else:
        x0 = psi_last if model.hmc.cg_forecast else None
        sf_new, stats = model.fermion_action(theta_new, phi, stats, x0=x0)
    H_new = model.kinetic(pi_new) + model.gauge_action(theta_new, beta) + sf_new

    dH = H_new - H_old
    accept = r <= jnp.exp(-dH)                      # hmc.cpp:171

    theta_next = jnp.where(accept, theta_new, theta)
    # keep angles bounded over long runs (exact gauge-field periodicity;
    # cheap, and prevents f32 angle magnitude growth over 1e5 trajectories)
    theta_next = jnp.mod(theta_next + jnp.pi, 2 * jnp.pi) - jnp.pi

    return theta_next, TrajectoryStats(
        accepted=accept,
        delta_H=dH,
        exp_mdH=jnp.exp(-dH),
        cg_iters=stats.iters,
        cg_converged=stats.all_converged,
    )


def hmc_trajectory(model: SchwingerModel, theta: jax.Array,
                   key: jax.Array, dt=None, beta=None,
                   ) -> Tuple[jax.Array, TrajectoryStats]:
    """Evolve one trajectory from `theta` and accept/reject.

    Returns (theta_next, stats). `dt`/`beta` are optional traced overrides
    (see trajectory_given_noise).
    """
    pi, chi, r = draw_noise(model, theta.shape, key)
    return trajectory_given_noise(model, theta, pi, chi, r, dt, beta)
