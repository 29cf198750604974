"""Headline benchmark: HMC trajectories/second at 64x64 (reference demo config).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

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


def main():
    lat = LatticeParams(Nx=64, Nt=64, real_dtype="float32")
    hmc = HMCParams(
        beta=4.0, m0=0.2, md_steps=10, trajectory_length=0.1,
        cg=CGParams(tol=1e-6, max_iter=2000), even_odd=True,
    )
    model = SchwingerModel(lattice=lat, hmc=hmc)

    def make_run(n):
        @jax.jit
        def run(theta, k0):
            keys = jax.vmap(lambda i: prng.trajectory_key(k0, i))(jnp.arange(n))
            def body(th, k):
                th, st = hmc_trajectory(model, th, k)
                return th, st.accepted
            th, acc = jax.lax.scan(body, theta, keys)
            return th, jnp.sum(acc)
        return run

    key = prng.root_key(0)
    theta = jax.random.uniform(
        key, (2, 64, 64), minval=-jnp.pi, maxval=jnp.pi, dtype=lat.rdtype
    )
    theta, a = make_run(BLOCK)(theta, key)   # compile + thermalize
    float(a)                                 # readback fence

    run_timed = make_run(N_TIMED)
    theta2, a = run_timed(theta, jax.random.fold_in(key, 1))  # compile
    float(a)
    t0 = time.perf_counter()
    theta2, a = run_timed(theta, jax.random.fold_in(key, 2))
    assert float(a) >= 0                     # readback fence
    dt = time.perf_counter() - t0

    traj_per_s = N_TIMED / dt
    print(json.dumps({
        "metric": "hmc_traj_per_s_64x64",
        "value": round(traj_per_s, 3),
        "unit": "traj/s",
        "vs_baseline": round(traj_per_s / CPP_BASELINE_TRAJ_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
