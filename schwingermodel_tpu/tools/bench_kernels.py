"""Kernel-level benchmark harness for the BASELINE.json metrics.

Emits one JSON line per metric:
  - dirac_apply_gflops     : full Wilson-Dirac apply throughput
  - eo_normal_us           : (Dhat Dhat^+) apply latency
  - cg_us_per_iter         : fused/jnp CG iteration latency
  - cg_iters_to_tol        : iterations for a thermalized solve to tolerance
  - hmc_traj_per_s         : end-to-end trajectory throughput

All timings are slope-based (two chained program lengths) with device
readback fences, so dispatch/tunnel latency cancels out -- see bench.py's
methodology notes. Usage:

    python -m schwingermodel_tpu.tools.bench_kernels [--nx 64 --nt 64]
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m schwingermodel_tpu.tools.bench_kernels")
    p.add_argument("--nx", type=int, default=64)
    p.add_argument("--nt", type=int, default=64)
    p.add_argument("--beta", type=float, default=4.0)
    p.add_argument("--m0", type=float, default=0.2)
    p.add_argument("--dtype", choices=["float32", "float64"], default=None)
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from schwingermodel_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    on_tpu = jax.default_backend() not in ("cpu",)
    dtype = args.dtype or ("float32" if on_tpu else "float64")
    if dtype == "float64" and not on_tpu:
        jax.config.update("jax_enable_x64", True)

    from schwingermodel_tpu.config import CGParams, HMCParams, LatticeParams
    from schwingermodel_tpu.hmc.sampler import hmc_trajectory
    from schwingermodel_tpu.models.schwinger import SchwingerModel
    from schwingermodel_tpu.ops import dirac as dops
    from schwingermodel_tpu.utils import prng
    from schwingermodel_tpu.utils.metrics import (
        DIRAC_FLOPS_PER_SITE, EO_NORMAL_FLOPS_PER_SITE)

    Nx, Nt = args.nx, args.nt
    tol = 1e-6 if dtype == "float32" else 1e-10
    lat = LatticeParams(Nx=Nx, Nt=Nt, real_dtype=dtype)
    hmc = HMCParams(beta=args.beta, m0=args.m0, md_steps=10,
                    trajectory_length=0.1, even_odd=True,
                    cg=CGParams(tol=tol, max_iter=2000))
    model = SchwingerModel(lattice=lat, hmc=hmc)
    key = prng.root_key(0)
    theta = jax.random.uniform(key, (2, Nx, Nt), minval=-jnp.pi,
                               maxval=jnp.pi, dtype=lat.rdtype)

    # thermalize so solver iteration counts are production-typical
    from functools import partial

    @partial(jax.jit, static_argnums=2)
    def run_n(theta, k, n):
        def body(th, i):
            th, st = hmc_trajectory(model, th, prng.trajectory_key(k, i))
            return th, st.cg_iters
        th, it = jax.lax.scan(body, theta, jnp.arange(n))
        return th, jnp.sum(it)

    theta, _ = run_n(theta, key, 100)
    jax.device_get(theta[0, 0, 0])

    def timed(fn, *a):
        out = fn(*a)
        jax.device_get(out)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(*a)
            jax.device_get(out)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def slope(make, n1, n2, *a):
        return (timed(make(n2), *a) - timed(make(n1), *a)) / (n2 - n1)

    def emit(metric, value, unit):
        print(json.dumps({"metric": metric, "value": round(value, 4),
                          "unit": unit, "lattice": f"{Nx}x{Nt}",
                          "dtype": dtype,
                          "backend": jax.default_backend()}))

    v_full = prng.normal_complex(jax.random.fold_in(key, 1), (2, Nx, Nt),
                                 lat.rdtype)

    # ---- full Dirac apply ----
    def make_dirac(n):
        @jax.jit
        def f(theta, v):
            Uf = model.fermion_links(theta)
            def body(x, _):
                y = dops.dirac(model.geom, Uf, x, model.hmc.m0)
                return y * jax.lax.rsqrt(
                    jnp.real(jnp.sum(jnp.conj(y) * y))), None
            y, _ = jax.lax.scan(body, v, None, length=n)
            return jnp.real(jnp.sum(y))
        return f

    # wide slope window: the per-apply time (~1 us) must integrate well
    # past the tunnel's ~ms dispatch jitter or the difference goes negative
    s = slope(make_dirac, 1000, 21000, theta, v_full)
    emit("dirac_apply_us", s * 1e6, "us/apply")
    emit("dirac_apply_gflops", Nx * Nt * DIRAC_FLOPS_PER_SITE / s / 1e9,
         "GFLOP/s")

    # ---- EO normal apply ----
    v_eo = prng.normal_complex(jax.random.fold_in(key, 2), (2, Nx, Nt // 2),
                               lat.rdtype)

    def make_eo(n):
        @jax.jit
        def f(theta, v):
            ops = model.eo_ops(theta)
            def body(x, _):
                y = ops.normal(x)
                return y * jax.lax.rsqrt(
                    jnp.real(jnp.sum(jnp.conj(y) * y))), None
            y, _ = jax.lax.scan(body, v, None, length=n)
            return jnp.real(jnp.sum(y))
        return f

    s = slope(make_eo, 1000, 11000, theta, v_eo)
    emit("eo_normal_apply_us", s * 1e6, "us/apply")
    emit("eo_normal_gflops", Nx * Nt * EO_NORMAL_FLOPS_PER_SITE / s / 1e9,
         "GFLOP/s")

    # ---- CG: iteration latency and iters-to-tol ----
    # Chain production-tolerance solves, each with a fresh RHS (the previous
    # normalized solution -- random-like, so iteration counts stay typical),
    # and divide the slope time by the device-counted iteration total.
    def make_cg_counting(n_solves):
        @jax.jit
        def f(theta, v):
            ops = model.eo_ops(theta)
            def body(x, _):
                res = model._solve_eo(theta, ops, x)   # x0 = b restart
                y = res.x
                return y * jax.lax.rsqrt(
                    jnp.real(jnp.sum(jnp.conj(y) * y))), res.iters
            y, it = jax.lax.scan(body, v, None, length=n_solves)
            return jnp.real(jnp.sum(y)) + 0.0 * jnp.sum(it), jnp.sum(it)
        return f

    # wide window: ~30 iters/solve x 300 extra solves integrates the
    # per-iteration time well past the tunnel's ms-scale jitter
    n1, n2 = 20, 320
    f1, f2 = make_cg_counting(n1), make_cg_counting(n2)
    t1 = timed(lambda *a: f1(*a)[0], theta, v_eo)
    t2 = timed(lambda *a: f2(*a)[0], theta, v_eo)
    it1 = float(jax.device_get(f1(theta, v_eo)[1]))
    it2 = float(jax.device_get(f2(theta, v_eo)[1]))
    emit("cg_us_per_iter", (t2 - t1) / max(it2 - it1, 1) * 1e6, "us/iter")

    @jax.jit
    def iters_to_tol(theta, v):
        ops = model.eo_ops(theta)
        b = ops.dhat(v)
        res = model._solve_eo(theta, ops, b)
        return res.iters, res.converged

    it, conv = jax.device_get(iters_to_tol(theta, v_eo))
    emit("cg_iters_to_tol", float(it), f"iters to {tol:g} (converged={bool(conv)})")

    # ---- trajectories/s ----
    t1 = timed(lambda th: run_n(th, key, 5)[0][0, 0, 0], theta)
    t2 = timed(lambda th: run_n(th, key, 105)[0][0, 0, 0], theta)
    emit("hmc_traj_per_s", 100 / (t2 - t1), "traj/s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
