"""Headline benchmark: HMC trajectories/second at 64x64 (reference demo config).

Prints one JSON line per metric; the LAST line is the headline: aggregate
trajectories/s/chip AT THE SHIPPED SOLVER CONTRACT (cg tol 1e-10 measured
on a double-precision-grade true residual -- the reference's own contract,
src/main.cpp:26-27 / src/conjugate_gradient.cpp:45 -- met on this f32-only
TPU by double-float iterative refinement, solvers/dfloat.py; the CLI
defaults to exactly this configuration, cli.py:174-197). The loose-mode
(tol 1e-6, refinement off, --no-cg-refine) numbers are printed alongside,
each labeled by its "contract" field.

Both contracts run on the lane-packed fused path (hmc/packed.py; the
runner's fast path, i.e. what the CLI executes): the state lives in
checkerboard plane layout and each MD force step -- link construction, the
whole CG solve, fermion + staple forces -- is ONE Pallas kernel
(ops/pallas_traj.py). Refined mode adds the fused double-float
true-residual kernel between f32 inner solves (ops/pallas_df.py), with
the Hamiltonian terms accumulated in df and dH formed in df.

Baseline: the C++/MPI reference (Fabian2598/SchwingerModel) publishes no
performance numbers (BASELINE.md), so the anchor is our measurement of the
reference compiled -O3, single rank, on this machine's CPU at the same
config -- 64x64, beta=4, m0=0.2, 10 MD steps, tau=0.1 (run.sh:4-17) at its
shipped tol 1e-10 in f64: CPP_BASELINE_TRAJ_PER_S below. vs_baseline = our
traj/s divided by that. The refined-contract rows are the apples-to-apples
comparison; the loose rows are labeled as such.

Methodology:
  - Timed trajectories run as ONE device program (lax.scan); a host
    readback of the outputs is the timing fence (on tunneled backends
    block_until_ready can return early).
  - even_odd=True everywhere: the Schur-preconditioned action samples the
    same gauge distribution as the reference's full-D pseudofermions
    (ops/eo.py) at ~2.4x fewer CG iterations.
  - Chronological forecasting on (second order on the packed path).
"""

import functools
import json
import time

import jax
import jax.numpy as jnp

from schwingermodel_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from schwingermodel_tpu.config import CGParams, HMCParams, LatticeParams
from schwingermodel_tpu.hmc import packed as hp
from schwingermodel_tpu.models.schwinger import SchwingerModel
from schwingermodel_tpu.utils import prng

# Measured 2026-08-17 on this container: reference @ g++ -O3, single rank,
# 64x64, beta=4, m0=0.2, MD_steps=10, tau=0.1, CG tol 1e-10 (f64),
# 100 therm + 100 meas trajectories from hot start: 200 traj / 112.04 s
# (thermalized CG is the dominant cost; Ep=0.8522(16), gS=0.5910(65), acc=1).
CPP_BASELINE_TRAJ_PER_S = 1.785

BLOCK = 100      # thermalization trajectories (one device program)
N_CHAINS = 32    # lane-packed chains (32*32 = 1024 lanes = 8 vector tiles)


def _models():
    lat = LatticeParams(Nx=64, Nt=64, real_dtype="float32")
    base = dict(beta=4.0, m0=0.2, md_steps=10, trajectory_length=0.1,
                even_odd=True)
    loose = SchwingerModel(lattice=lat, hmc=HMCParams(
        **base, cg=CGParams(tol=1e-6, max_iter=2000)))
    refined = SchwingerModel(lattice=lat, hmc=HMCParams(
        **base, cg=CGParams(tol=1e-10, max_iter=2000, refine=True, certify_forces=False,
                            refine_impl="auto")))
    return lat, loose, refined


def emit(metric, value, unit, vs_baseline=None, **extra):
    row = {"metric": metric, "value": value, "unit": unit,
           "vs_baseline": vs_baseline}
    row.update(extra)
    print(json.dumps(row), flush=True)


def run_packed(model, C, n_therm, n_timed, seed=0):
    """Packed-path throughput: returns (traj/s, acc, iters/traj)."""
    key = prng.root_key(seed)
    thetas = jax.random.uniform(
        jax.random.fold_in(key, 7), (C, 2, 64, 64),
        minval=-jnp.pi, maxval=jnp.pi, dtype=jnp.float32)
    th = hp.pack_theta(model, thetas)

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(th, k0, n):
        def body(carry, i):
            th = carry
            keys = jax.vmap(lambda c: jax.random.fold_in(
                prng.trajectory_key(k0, i), c))(jnp.arange(C))
            th, st = hp.hmc_trajectory_packed(model, th, keys)
            return th, (jnp.sum(st.accepted), jnp.sum(st.cg_iters))
        th, (acc, it) = jax.lax.scan(body, th, jnp.arange(n))
        return th, jnp.sum(acc), jnp.sum(it)

    th, a, it = run(th, key, n_therm)
    float(a)                                    # readback fence
    th2, a, it = run(th, jax.random.fold_in(key, 1), n_timed)
    float(a)                                    # compile the timed program
    t0 = time.perf_counter()
    th2, a, it = run(th, jax.random.fold_in(key, 2), n_timed)
    acc = float(a); iters = float(it)           # readback fence
    dt = time.perf_counter() - t0
    return n_timed * C / dt, acc / (n_timed * C), iters / (n_timed * C)


def main():
    from schwingermodel_tpu.utils.metrics import cg_iteration_flops

    _, loose, refined = _models()

    # ---- loose contract (tol 1e-6, --no-cg-refine), packed fused path ----
    v1, acc1, _ = run_packed(loose, 1, BLOCK, 500, seed=0)
    emit("hmc_traj_per_s_64x64", round(v1, 3), "traj/s",
         round(v1 / CPP_BASELINE_TRAJ_PER_S, 2),
         contract="loose_f32_tol1e-6", acceptance=round(acc1, 3))

    vl, accl, itl = run_packed(loose, N_CHAINS, BLOCK, 200, seed=1)
    emit("hmc_traj_per_s_64x64_agg_c32", round(vl, 3), "traj/s/chip",
         round(vl / CPP_BASELINE_TRAJ_PER_S, 2),
         contract="loose_f32_tol1e-6", acceptance=round(accl, 3),
         cg_iters_per_traj=round(itl, 1))

    # ---- shipped contract (tol 1e-10 via dfloat refinement; CLI default,
    # runner fast path = packed df kernels, hmc/packed.py + ops/pallas_df) --
    vr1, accr1, _ = run_packed(refined, 1, BLOCK, 200, seed=2)
    emit("hmc_traj_per_s_64x64_refined", round(vr1, 3), "traj/s",
         round(vr1 / CPP_BASELINE_TRAJ_PER_S, 2),
         contract="refined_1e-10_dfloat", acceptance=round(accr1, 3),
         force_tol=refined.hmc.cg.resolved_force_tol())

    vr, accr, itr = run_packed(refined, N_CHAINS, BLOCK, 100, seed=3)
    gflops = (itr * 100 * N_CHAINS) * cg_iteration_flops(64 * 64, True) \
        / (100 * N_CHAINS / vr) / 1e9
    emit("cg_sustained_gflops_64x64_c32", round(gflops, 1), "GFLOP/s",
         None, contract="refined_1e-10_dfloat(inner f32 iters)")
    emit("hmc_traj_per_s_64x64_agg_c32_refined", round(vr, 3), "traj/s/chip",
         round(vr / CPP_BASELINE_TRAJ_PER_S, 2),
         contract="refined_1e-10_dfloat", acceptance=round(accr, 3),
         force_tol=refined.hmc.cg.resolved_force_tol(),
         cg_iters_per_traj=round(itr, 1),
         loose_aggregate=round(vl, 1),
         refined_over_loose=round(vr / vl, 3))


if __name__ == "__main__":
    main()
