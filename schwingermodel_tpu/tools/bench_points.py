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
    # name, Nx, Nt, beta, m0, md_steps, tau, chains, n_timed,
    #   integrator, max_iter, extras
    ("128x128_b4_tau0.1", 128, 128, 4.0, 0.2, 10, 0.1, 8, 60,
     "leapfrog", 10000, {}),
    # tau=1 at 64x64 needs dt fine enough for the 0.6-0.8 acceptance
    # band (dH ~ dt^4 * V; the reference's "MD_steps=10, tau=1" advice is
    # calibrated on its 8x8/16x16 validation lattices, README.md:87-94)
    ("64x64_b4_tau1", 64, 64, 4.0, 0.2, 40, 1.0, 32, 40,
     "leapfrog", 10000, {}),
    # the same point with the dual-averaging autotuner choosing the step
    # (hmc/autotune.py; target 0.7 = mid reference band README.md:87-94):
    # the committed evidence that the tuner picks a better operating
    # point than the hand-set md=40 row above (round-4 verdict item 4)
    ("64x64_b4_tau1_tuned", 64, 64, 4.0, 0.2, 40, 1.0, 32, 40,
     "leapfrog", 10000, {"tune": True}),
    # MRE forecasting A/B at the rough-trajectory point (round-4 verdict
    # item 7): K=4 in-kernel chronological inversion vs the default
    # 2nd-order extrapolation, refined contract (the knob's only scope)
    ("64x64_b4_tau1_mre4", 64, 64, 4.0, 0.2, 40, 1.0, 32, 40,
     "leapfrog", 10000, {"mre_history": 4, "refined_only": True}),
    # near-critical AT m_crit(beta=2) = -0.1968(9): the lowest Dirac
    # eigenvalue scales ~1/V; single-pseudofermion HMC acceptance
    # collapses with volume here (the reference's own 32x32 golden runs
    # at acceptance 0.002, tests/golden/refphys.json). These rows run the
    # production cure -- Hasenbusch mass preconditioning (two
    # pseudofermions, config.HMCParams.hasenbusch_dm) on the packed fused
    # path -- at 32x32 AND the 64x64 volume the reference cannot reach.
    ("32x32_b2_m-0.19_tau1_hb", 32, 32, 2.0, -0.19, 26, 1.0, 32, 40,
     "leapfrog", 20000, {"hasenbusch_dm": 0.4}),
    ("64x64_b2_m-0.19_tau1_hb", 64, 64, 2.0, -0.19, 36, 1.0, 16, 30,
     "leapfrog", 20000, {"hasenbusch_dm": 0.4}),
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

    def run_packed(model, C, Nx, Nt, n_therm, n_timed, seed=0,
                   anneal=(), tune=False):
        """anneal: sequence of intermediate m0 values to thermalize
        through before the target mass -- near m_crit a hot start sits on
        exceptional (near-singular-D) configurations that reject forever;
        annealing from a safe mass reaches the target distribution the
        way production near-critical runs do. tune: run the dual-averaging
        step-size warmup after thermalization and time at the tuned
        md_steps (the committed autotuner evidence)."""
        import dataclasses

        key = prng.root_key(seed)
        thetas = jax.random.uniform(
            jax.random.fold_in(key, 7), (C, 2, Nx, Nt),
            minval=-jnp.pi, maxval=jnp.pi, dtype=jnp.float32)
        th = hp.pack_theta(model, thetas)

        def make_run(model):
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
            return run

        run = make_run(model)

        # chunked host fences: near-critical iteration counts make a
        # 100-trajectory device program minutes long, which can trip the
        # TPU worker watchdog (observed worker crash) -- bound each
        # program to `chunk` trajectories
        chunk = 20

        def run_chunks(th, k0, n, fence=True):
            acc = iters = conv = 0.0
            done = 0
            while done < n:
                m = min(chunk, n - done)
                th, a, it, cv = run(th, jax.random.fold_in(k0, done), m)
                if fence:
                    acc += float(a); iters += float(it); conv += float(cv)
                done += m
            return th, acc, iters, conv

        for k, m0_a in enumerate(anneal):
            m_a = dataclasses.replace(
                model, hmc=dataclasses.replace(model.hmc, m0=m0_a))

            @functools.partial(jax.jit, static_argnames=("n",))
            def run_a(th, k0, n, m_a=m_a):
                def body(carry, i):
                    th = carry
                    keys = jax.vmap(lambda c: jax.random.fold_in(
                        prng.trajectory_key(k0, i), c))(jnp.arange(C))
                    th, st = hp.hmc_trajectory_packed(m_a, th, keys)
                    return th, jnp.sum(st.accepted)
                th, acc = jax.lax.scan(body, th, jnp.arange(n))
                return th, jnp.sum(acc)

            done = 0
            while done < n_therm:
                m = min(chunk, n_therm - done)
                th, a_ = run_a(th, jax.random.fold_in(key, 500 + k), m)
                float(a_)
                done += m

        th, *_ = run_chunks(th, key, n_therm)

        tune_info = {}
        if tune:
            from schwingermodel_tpu.hmc import autotune as at
            from schwingermodel_tpu.runner import _packed_traj_adapter

            thetas_full = hp.unpack_theta(model, th, C)
            s = _packed_traj_adapter(model)
            thetas_full, hmc_tuned, eps = at.autotune(
                model, thetas_full, jax.random.fold_in(key, 0x7E0E),
                n_tune=150, target=0.7,
                traj_fn=lambda t, k, dt_: s(t, k, dt=dt_),
                traj_handles_chains=True)
            tune_info = {"tuned": True, "tuned_eps": round(float(eps), 6),
                         "md_steps_tuned": int(hmc_tuned.md_steps)}
            model = dataclasses.replace(model, hmc=hmc_tuned)
            th = hp.pack_theta(model, thetas_full)
            run = make_run(model)
            # short re-thermalization at the tuned step
            th, *_ = run_chunks(th, jax.random.fold_in(key, 3),
                                min(40, n_therm))

        th2, *_ = run_chunks(th, jax.random.fold_in(key, 1), n_timed)
        t0 = time.perf_counter()
        th2, acc, iters, conv = run_chunks(
            th, jax.random.fold_in(key, 2), n_timed)
        dt = time.perf_counter() - t0
        return (n_timed * C / dt, acc / (n_timed * C), iters / (n_timed * C),
                conv == n_timed * C, tune_info)

    for (name, Nx, Nt, beta, m0, md, tau, C, n_timed, integ,
         max_it, extras) in POINTS:
        if args.only and args.only not in name:
            continue
        lat = LatticeParams(Nx=Nx, Nt=Nt, real_dtype="float32")
        hb_dm = extras.get("hasenbusch_dm")
        tune = bool(extras.get("tune"))
        mre = int(extras.get("mre_history", 0))
        base = dict(beta=beta, m0=m0, md_steps=md, trajectory_length=tau,
                    even_odd=True, integrator=integ, hasenbusch_dm=hb_dm,
                    mre_history=mre)
        contracts = [
            ("loose_f32_tol1e-6",
             CGParams(tol=1e-6, max_iter=max_it)),
            ("refined_1e-10_dfloat",
             CGParams(tol=1e-10, max_iter=max_it, refine=True)),
        ]
        if extras.get("refined_only"):
            contracts = contracts[1:]
        for contract, cg in contracts:
            model = SchwingerModel(
                lattice=lat, hmc=HMCParams(**base, cg=cg))
            anneal = (0.0, (0.0 + m0) / 2) if m0 < 0 else ()
            v, acc, iters, conv, tune_info = run_packed(
                model, C, Nx, Nt, args.n_therm, n_timed, anneal=anneal,
                tune=tune)
            row = {"metric": f"hmc_traj_per_s_{name}",
                   "value": round(v, 3), "unit": "traj/s/chip",
                   "contract": contract, "lattice": f"{Nx}x{Nt}",
                   "beta": beta, "m0": m0, "md_steps": md, "tau": tau,
                   "integrator": integ,
                   "chains": C, "acceptance": round(acc, 3),
                   "cg_iters_per_traj": round(iters, 1),
                   "all_converged": bool(conv),
                   "backend": jax.default_backend()}
            if hb_dm is not None:
                row["hasenbusch_dm"] = hb_dm
            if mre:
                row["mre_history"] = mre
            row.update(tune_info)
            rows.append(row)
            print(json.dumps(row), flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
