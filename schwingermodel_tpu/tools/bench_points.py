"""Operating-point benches beyond the demo config (round-3 verdict item 3).

The headline bench (bench.py) anchors on the reference demo config --
64x64, beta=4, m0=0.2, tau=0.1 -- which thermalizes at acceptance ~0.998,
the easiest point. This tool commits rows at the operating points where
the solver contracts are actually stressed:

  - 128x128 beta=4 m0=0.2 tau=0.1      (the flagship volume, BASELINE
                                        configs[5]; Nth=64 lane geometry,
                                        C=8 chains/block)
  - 64x64  beta=4 m0=0.2  tau=1        (physics trajectory length,
                                        acceptance 0.6-0.8 band,
                                        reference README.md:87-94)
  - 64x64  beta=2 m0=-0.19 tau=1       (near-critical: m_crit(beta=2) =
                                        -0.1968(9); CG iteration counts
                                        blow up, README.md:94)

Each point runs BOTH solver contracts on the packed fused path and prints
one JSON row: traj/s/chip, acceptance, CG iters/traj.

    python -m schwingermodel_tpu.tools.bench_points [--json BENCH_POINTS.json]
"""

from __future__ import annotations

import argparse
import functools
import json
import time


POINTS = [
    # name, Nx, Nt, beta, m0, md_steps, tau, chains, timed trajectories
    ("128x128_b4_tau0.1", 128, 128, 4.0, 0.2, 10, 0.1, 8, 60),
    ("64x64_b4_tau1", 64, 64, 4.0, 0.2, 10, 1.0, 32, 40),
    ("64x64_b2_m-0.19_tau1", 64, 64, 2.0, -0.19, 14, 1.0, 32, 24),
]


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m schwingermodel_tpu.tools.bench_points")
    p.add_argument("--json", default=None)
    p.add_argument("--only", default=None,
                   help="substring filter on point names")
    p.add_argument("--n-therm", type=int, default=60)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from schwingermodel_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from schwingermodel_tpu.config import CGParams, HMCParams, LatticeParams
    from schwingermodel_tpu.hmc import packed as hp
    from schwingermodel_tpu.models.schwinger import SchwingerModel
    from schwingermodel_tpu.utils import prng

    rows = []

    def run_packed(model, C, Nx, Nt, n_therm, n_timed, seed=0):
        key = prng.root_key(seed)
        thetas = jax.random.uniform(
            jax.random.fold_in(key, 7), (C, 2, Nx, Nt),
            minval=-jnp.pi, maxval=jnp.pi, dtype=jnp.float32)
        th = hp.pack_theta(model, thetas)

        @functools.partial(jax.jit, static_argnames=("n",))
        def run(th, k0, n):
            def body(carry, i):
                th = carry
                keys = jax.vmap(lambda c: jax.random.fold_in(
                    prng.trajectory_key(k0, i), c))(jnp.arange(C))
                th, st = hp.hmc_trajectory_packed(model, th, keys)
                return th, (jnp.sum(st.accepted), jnp.sum(st.cg_iters),
                            jnp.sum(st.cg_converged))
            th, (acc, it, cv) = jax.lax.scan(body, th, jnp.arange(n))
            return th, jnp.sum(acc), jnp.sum(it), jnp.sum(cv)

        th, a, it, cv = run(th, key, n_therm)
        float(a)
        th2, a, it, cv = run(th, jax.random.fold_in(key, 1), n_timed)
        float(a)                             # compile the timed program
        t0 = time.perf_counter()
        th2, a, it, cv = run(th, jax.random.fold_in(key, 2), n_timed)
        acc = float(a)
        iters = float(it)
        conv = float(cv)
        dt = time.perf_counter() - t0
        return (n_timed * C / dt, acc / (n_timed * C), iters / (n_timed * C),
                conv == n_timed * C)

    for (name, Nx, Nt, beta, m0, md, tau, C, n_timed) in POINTS:
        if args.only and args.only not in name:
            continue
        lat = LatticeParams(Nx=Nx, Nt=Nt, real_dtype="float32")
        base = dict(beta=beta, m0=m0, md_steps=md, trajectory_length=tau,
                    even_odd=True)
        for contract, cg in (
            ("loose_f32_tol1e-6",
             CGParams(tol=1e-6, max_iter=10000)),
            ("refined_1e-10_dfloat",
             CGParams(tol=1e-10, max_iter=10000, refine=True)),
        ):
            model = SchwingerModel(
                lattice=lat, hmc=HMCParams(**base, cg=cg))
            v, acc, iters, conv = run_packed(
                model, C, Nx, Nt, args.n_therm, n_timed)
            row = {"metric": f"hmc_traj_per_s_{name}",
                   "value": round(v, 3), "unit": "traj/s/chip",
                   "contract": contract, "lattice": f"{Nx}x{Nt}",
                   "beta": beta, "m0": m0, "md_steps": md, "tau": tau,
                   "chains": C, "acceptance": round(acc, 3),
                   "cg_iters_per_traj": round(iters, 1),
                   "all_converged": bool(conv),
                   "backend": jax.default_backend()}
            rows.append(row)
            print(json.dumps(row), flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
