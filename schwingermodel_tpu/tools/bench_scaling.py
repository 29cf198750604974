"""Volume-scaling harness: trajectory throughput vs device-mesh shape.

Measures HMC traj/s for the same physics at a fixed global lattice across a
list of mesh shapes (1x1 = single device baseline, then rx x rt lattice
domain decompositions and optional rc x rx x rt chain meshes), printing one
JSON line per mesh with the ratio to the single-device number.

On CI this runs against N virtual CPU devices
(--platform cpu --devices 8), which cannot measure real ICI bandwidth but
does measure the full SPMD overhead stack the TPU path will see: ppermute
halo exchanges per Dirac hop, psum'd CG dots with cross-shard sync, and the
lockstep CG termination (solvers/cg.py sync_pred). On a real pod slice the
same tool reports ICI-attached scaling (BASELINE.md's >= 80% 1->N hosts
north star; the reference's analog is its ranks_x x ranks_t MPI grid,
include/mpi_setup.h:39-71).

    python -m schwingermodel_tpu.tools.bench_scaling \
        --platform cpu --devices 8 --nx 64 --nt 64 \
        --meshes 1x1,1x2,2x2,1x4,2x4
"""

from __future__ import annotations

import argparse
import json
import time


def _parse_meshes(spec: str):
    out = []
    for part in spec.split(","):
        dims = tuple(int(d) for d in part.strip().split("x"))
        if len(dims) not in (2, 3):
            raise ValueError(f"mesh {part!r}: want RXxRT or RCxRXxRT")
        out.append(dims)
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m schwingermodel_tpu.tools.bench_scaling")
    p.add_argument("--nx", type=int, default=64)
    p.add_argument("--nt", type=int, default=64)
    p.add_argument("--beta", type=float, default=4.0)
    p.add_argument("--m0", type=float, default=0.2)
    p.add_argument("--md-steps", type=int, default=10)
    p.add_argument("--tau", type=float, default=0.1)
    p.add_argument("--dtype", choices=["float32", "float64"], default="float32")
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--meshes", default="1x1,1x2,2x2,1x4")
    p.add_argument("--n-therm", type=int, default=30)
    p.add_argument("--n-timed", type=int, default=30)
    p.add_argument("--platform", default=None)
    p.add_argument("--devices", type=int, default=None,
                   help="virtual CPU device count (cpu platform only)")
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.devices:
        jax.config.update("jax_num_cpu_devices", args.devices)

    import jax.numpy as jnp

    from schwingermodel_tpu.config import CGParams, HMCParams, LatticeParams
    from schwingermodel_tpu.hmc.sampler import hmc_trajectory
    from schwingermodel_tpu.models.schwinger import SchwingerModel
    from schwingermodel_tpu.parallel.mesh import lattice_mesh
    from schwingermodel_tpu.parallel.sharded import (
        make_sharded_traj_fn, theta_sharding,
    )
    from schwingermodel_tpu.utils import prng
    from schwingermodel_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    lat = LatticeParams(Nx=args.nx, Nt=args.nt, real_dtype=args.dtype)
    hmc = HMCParams(beta=args.beta, m0=args.m0, md_steps=args.md_steps,
                    trajectory_length=args.tau, even_odd=True,
                    cg=CGParams(tol=args.tol, max_iter=2000))
    model = SchwingerModel(lattice=lat, hmc=hmc)
    key = prng.root_key(0)

    def block_fn(traj_fn, n, n_chains=1):
        @jax.jit
        def run(theta, k0):
            keys = jax.vmap(lambda i: prng.trajectory_key(k0, i))(
                jnp.arange(n))
            if n_chains > 1:
                keys = jax.vmap(lambda k: jax.vmap(
                    lambda c: jax.random.fold_in(k, c))(
                        jnp.arange(n_chains)))(keys)

            def body(th, k):
                th, st = traj_fn(th, k)
                return th, jnp.sum(st.cg_iters)

            th, it = jax.lax.scan(body, theta, keys)
            return th, jnp.sum(it)

        return run

    def measure(mesh_shape):
        n_chains = mesh_shape[0] if len(mesh_shape) == 3 else 1
        shape = ((n_chains,) if n_chains > 1 else ()) + (2, args.nx, args.nt)
        theta = jax.random.uniform(key, shape, minval=-jnp.pi,
                                   maxval=jnp.pi, dtype=lat.rdtype)
        if mesh_shape in ((1, 1), (1, 1, 1)):
            traj_fn = lambda th, k: hmc_trajectory(model, th, k)  # noqa: E731
        else:
            mesh = lattice_mesh(mesh_shape)
            theta = jax.device_put(theta, theta_sharding(mesh))
            traj_fn = make_sharded_traj_fn(model, mesh)
        therm = block_fn(traj_fn, args.n_therm, n_chains)
        theta, it = therm(theta, key)
        jax.device_get(it)
        timed = block_fn(traj_fn, args.n_timed, n_chains)
        th2, it = timed(theta, jax.random.fold_in(key, 1))
        jax.device_get(it)                      # compile + warm
        t0 = time.perf_counter()
        th2, it = timed(theta, jax.random.fold_in(key, 2))
        iters = int(jax.device_get(it))         # readback fence
        dt = time.perf_counter() - t0
        return args.n_timed * max(n_chains, 1) / dt, iters

    base = None
    for mesh_shape in _parse_meshes(args.meshes):
        n_dev = 1
        for d in mesh_shape:
            n_dev *= d
        if n_dev > len(jax.devices()):
            print(json.dumps({"mesh": "x".join(map(str, mesh_shape)),
                              "skipped": f"needs {n_dev} devices"}))
            continue
        tps, iters = measure(mesh_shape)
        if base is None:
            base = tps
        print(json.dumps({
            "metric": "hmc_traj_per_s",
            "mesh": "x".join(map(str, mesh_shape)),
            "lattice": f"{args.nx}x{args.nt}",
            "dtype": args.dtype,
            "backend": jax.default_backend(),
            "value": round(tps, 3),
            "unit": "traj/s",
            "cg_iters": iters,
            "vs_single_device": round(tps / base, 3),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
