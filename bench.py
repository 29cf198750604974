"""Headline benchmark: HMC trajectories/second at 64x64 (reference demo config).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the C++/MPI reference (Fabian2598/SchwingerModel) publishes no
performance numbers (BASELINE.md), so the anchor is our own measurement of the
reference compiled -O3 and run single-rank on this machine's CPU at the same
config (64x64, beta=4, m0=0.2, 10 MD steps, trajectory length 0.1 -- the
repo's demo config, run.sh:4-17): CPP_BASELINE_TRAJ_PER_S below.
vs_baseline = our traj/s divided by that.

Precision note: the reference runs f64 with CG tol 1e-10; on TPU the gauge
field/solver run f32 with CG tol 1e-6 (f32 residual floor). The angle
representation keeps links exactly unitary regardless, and detailed-balance
diagnostics (<exp(-dH)> = 1) hold at f32 -- see tests and VERIFY skill.
"""

import json
import time

import jax
import jax.numpy as jnp

from schwingermodel_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from schwingermodel_tpu.config import CGParams, HMCParams, LatticeParams
from schwingermodel_tpu.hmc.sampler import hmc_trajectory
from schwingermodel_tpu.models.schwinger import SchwingerModel
from schwingermodel_tpu.utils import prng

# Measured 2026-08-17 on this container: reference @ g++ -O3, single rank,
# 64x64, beta=4, m0=0.2, MD_steps=10, tau=0.1, CG tol 1e-10 (f64),
# 100 therm + 100 meas trajectories from hot start: 200 traj / 112.04 s
# (thermalized CG is the dominant cost; Ep=0.8522(16), gS=0.5910(65), acc=1).
CPP_BASELINE_TRAJ_PER_S = 1.785

N_WARMUP = 100   # thermalize so CG iteration counts are equilibrium-typical
N_BENCH = 100


def main():
    lat = LatticeParams(Nx=64, Nt=64, real_dtype="float32")
    hmc = HMCParams(
        beta=4.0, m0=0.2, md_steps=10, trajectory_length=0.1,
        cg=CGParams(tol=1e-6, max_iter=2000),
    )
    model = SchwingerModel(lattice=lat, hmc=hmc)

    step = jax.jit(lambda th, k: hmc_trajectory(model, th, k))

    key = prng.root_key(0)
    theta = jax.random.uniform(
        key, (2, 64, 64), minval=-jnp.pi, maxval=jnp.pi, dtype=lat.rdtype
    )

    # warmup: compile + thermalize a little so CG cost is typical
    for i in range(N_WARMUP):
        theta, stats = step(theta, prng.trajectory_key(key, i))
    jax.block_until_ready(theta)

    t0 = time.perf_counter()
    for i in range(N_WARMUP, N_WARMUP + N_BENCH):
        theta, stats = step(theta, prng.trajectory_key(key, i))
    jax.block_until_ready(theta)
    dt = time.perf_counter() - t0

    traj_per_s = N_BENCH / dt
    print(json.dumps({
        "metric": "hmc_traj_per_s_64x64",
        "value": round(traj_per_s, 3),
        "unit": "traj/s",
        "vs_baseline": round(traj_per_s / CPP_BASELINE_TRAJ_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
