"""Headline benchmark: HMC trajectories/second at 64x64 (reference demo config).

Prints one JSON line per metric; the LAST line is the headline: aggregate
trajectories/s/chip with the lane-packed multi-chain kernel (chains are the
TPU-native way to fill the vector unit at this lattice size -- a single
64x64 chain's packed planes use 32 of 128 lanes; see ops/pallas_eo.py).
The single-chain number and the sustained CG GFLOP/s are the lines before.

Baseline: the C++/MPI reference (Fabian2598/SchwingerModel) publishes no
performance numbers (BASELINE.md), so the anchor is our own measurement of the
reference compiled -O3 and run single-rank on this machine's CPU at the same
config (64x64, beta=4, m0=0.2, 10 MD steps, trajectory length 0.1 -- the
repo's demo config, run.sh:4-17): CPP_BASELINE_TRAJ_PER_S below.
vs_baseline = our traj/s divided by that.

Methodology notes:
  - The 500 benchmark trajectories run as ONE device program (lax.scan), the
    same shape the production runner uses, so host dispatch is out of the
    measurement.
  - Timing is bounded by a host *readback* of the outputs, not
    block_until_ready: on tunneled backends block_until_ready can return
    before execution finishes, which inflates throughput by orders of
    magnitude. Readback is the only trustworthy fence.
  - even_odd=True: the Schur-complement preconditioned action (ops/eo.py)
    samples exactly the same gauge distribution as the reference's full-D
    pseudofermions at ~2.4x fewer CG iterations (see tests/test_eo.py).
  - cg_forecast=True (default): chronological forecasting starts each force
    CG from the previous MD step's solution, saving a further ~28% of CG
    iterations at this config (tests/test_tuning_scan.py).
  - fused_cg auto-on (TPU backend): every (Dhat Dhat^+) solve runs as ONE
    Pallas kernel -- stencil, dots, and the convergence while-loop with all
    vectors pinned in VMEM (ops/pallas_eo.py) -- measured ~0.6 us/CG-iter
    vs ~10 us/iter for the XLA-level solver at this lattice size.

Precision note: the reference runs f64 with CG tol 1e-10; on TPU the gauge
field/solver run f32 with CG tol 1e-6 (f32 residual floor). The angle
representation keeps links exactly unitary regardless, and detailed-balance
diagnostics (<exp(-dH)> = 1) hold at f32 -- see tests and the verify skill.
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

BLOCK = 100      # thermalization trajectories (one device program)
N_TIMED = 500    # timed trajectories, ONE device program + one readback
                 # fence (the tunnel costs ~100 ms per unpipelined dispatch,
                 # so per-block host loops would measure the tunnel, not
                 # the chip)
N_CHAINS = 32    # lane-packed chains for the aggregate number (32*32 = 1024
                 # lanes -> 8 full vector tiles; ~19.6 MB scoped VMEM with the
                 # raised 32 MB limit -- measured 1.6x better than C=16)
N_TIMED_MC = 200


def main():
    lat = LatticeParams(Nx=64, Nt=64, real_dtype="float32")
    hmc = HMCParams(
        beta=4.0, m0=0.2, md_steps=10, trajectory_length=0.1,
        cg=CGParams(tol=1e-6, max_iter=2000), even_odd=True,
    )
    model = SchwingerModel(lattice=lat, hmc=hmc)

    def make_run(n, n_chains=1):
        traj = hmc_trajectory if n_chains == 1 else jax.vmap(
            lambda th, k: hmc_trajectory(model, th, k), in_axes=(0, 0))

        @jax.jit
        def run(theta, k0):
            keys = jax.vmap(lambda i: prng.trajectory_key(k0, i))(jnp.arange(n))
            if n_chains > 1:
                keys = jax.vmap(
                    lambda k: jax.vmap(
                        lambda c: jax.random.fold_in(k, c))(jnp.arange(n_chains))
                )(keys)

            def body(th, k):
                if n_chains == 1:
                    th, st = hmc_trajectory(model, th, k)
                else:
                    th, st = traj(th, k)
                return th, (jnp.sum(st.accepted), jnp.sum(st.cg_iters))
            th, (acc, it) = jax.lax.scan(body, theta, keys)
            return th, jnp.sum(acc), jnp.sum(it)
        return run

    key = prng.root_key(0)
    theta = jax.random.uniform(
        key, (2, 64, 64), minval=-jnp.pi, maxval=jnp.pi, dtype=lat.rdtype
    )
    theta, a, _ = make_run(BLOCK)(theta, key)  # compile + thermalize
    float(a)                                   # readback fence

    run_timed = make_run(N_TIMED)
    theta2, a, _ = run_timed(theta, jax.random.fold_in(key, 1))  # compile
    float(a)
    t0 = time.perf_counter()
    theta2, a, _ = run_timed(theta, jax.random.fold_in(key, 2))
    assert float(a) >= 0                       # readback fence
    dt = time.perf_counter() - t0

    traj_per_s = N_TIMED / dt
    print(json.dumps({
        "metric": "hmc_traj_per_s_64x64",
        "value": round(traj_per_s, 3),
        "unit": "traj/s",
        "vs_baseline": round(traj_per_s / CPP_BASELINE_TRAJ_PER_S, 2),
    }), flush=True)

    # ---- aggregate: N_CHAINS lane-packed chains on the one chip ----
    from schwingermodel_tpu.utils.metrics import cg_iteration_flops

    thetas = jax.random.uniform(
        jax.random.fold_in(key, 7), (N_CHAINS, 2, 64, 64),
        minval=-jnp.pi, maxval=jnp.pi, dtype=lat.rdtype)
    therm_mc = make_run(BLOCK, N_CHAINS)
    thetas, a, _ = therm_mc(thetas, jax.random.fold_in(key, 8))
    float(a)
    run_mc = make_run(N_TIMED_MC, N_CHAINS)
    th2, a, it = run_mc(thetas, jax.random.fold_in(key, 9))
    float(a)
    t0 = time.perf_counter()
    th2, a, it = run_mc(thetas, jax.random.fold_in(key, 10))
    iters = float(it)                          # readback fence
    dt_mc = time.perf_counter() - t0

    agg = N_TIMED_MC * N_CHAINS / dt_mc
    gflops = iters * cg_iteration_flops(64 * 64, True) / dt_mc / 1e9
    print(json.dumps({
        "metric": "cg_sustained_gflops_64x64_c32",
        "value": round(gflops, 1),
        "unit": "GFLOP/s",
        "vs_baseline": None,
    }), flush=True)
    print(json.dumps({
        "metric": "hmc_traj_per_s_64x64_agg_c32",
        "value": round(agg, 3),
        "unit": "traj/s/chip",
        "vs_baseline": round(agg / CPP_BASELINE_TRAJ_PER_S, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
