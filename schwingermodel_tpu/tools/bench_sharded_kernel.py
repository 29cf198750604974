"""Per-shard sharded-solve kernel bench: quantify + close the per-device
compute cliff of the lattice-sharded path (round-3 verdict missing item 1).

Measures, on ONE chip, the local-compute cost of a sharded CG iteration at
the per-shard block size (what each device of an rx x rt pod executes
between collectives):

  - sharded_local_jnp_us    : the jnp wide-halo composite's local work
                              (ops/eo_halo.py body with the ppermutes
                              replaced by the equivalent periodic
                              self-extension -- a 1x1 mesh's halo content)
  - sharded_local_fused_us  : the same work as ONE Pallas kernel
                              (ops/pallas_halo.halo_normal_fused)
  - packed_fused_us_per_iter: the single-chip fused whole-CG iteration at
                              the same LOCAL volume (the per-device cost a
                              dense unsharded chip pays -- the cliff's
                              other side; C chains fill the lanes)

All slope-based timings (chained scans, host readback fences) so dispatch
and tunnel jitter cancel. Collectives are NOT included: on a real pod the
4 ppermutes + 1 psum ride ICI (~1-2 us); the committed claim is about the
compute between them.

    python -m schwingermodel_tpu.tools.bench_sharded_kernel \
        --local-nx 32 --local-nt 32 [--json BENCH_SHARDED_KERNEL.json]
"""

from __future__ import annotations

import argparse
import functools
import json
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m schwingermodel_tpu.tools.bench_sharded_kernel")
    p.add_argument("--local-nx", type=int, default=32,
                   help="per-shard lattice rows (64x64 over 2x2 -> 32)")
    p.add_argument("--local-nt", type=int, default=32)
    p.add_argument("--m0", type=float, default=0.2)
    p.add_argument("--json", default=None)
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from schwingermodel_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from schwingermodel_tpu.ops import eo
    from schwingermodel_tpu.ops import pallas_halo as ph
    from schwingermodel_tpu.ops.eo_halo import W
    from schwingermodel_tpu.ops.geometry import Geometry

    interpret = jax.default_backend() == "cpu"
    Nx, Nth = args.local_nx, args.local_nt // 2
    m0 = args.m0
    geom = Geometry()

    rng = np.random.default_rng(0)
    theta = jnp.asarray(rng.uniform(-np.pi, np.pi, (2, Nx, 2 * Nth)),
                        jnp.float32)
    v_np = (rng.normal(size=(2, Nx, Nth))
            + 1j * rng.normal(size=(2, Nx, Nth)))

    # per-shard inputs: periodic self-extension == a 1x1 mesh's halos, the
    # same data movement pattern (and exactly the same kernel) as a pod
    # shard; off_ext from "global" coords with this block at the origin
    def self_extend(a):
        pad = [(0, 0)] * (a.ndim - 2) + [(W, W), (W, W)]
        return jnp.pad(a, pad, mode="wrap")

    j = np.arange(-W, Nx + W)
    off_e = jnp.asarray((j % 2).astype(np.int32)[:, None])
    off_o = 1 - off_e

    @jax.jit
    def prep(theta, v_re, v_im):
        # antiperiodic-folded f32 links of this block
        from schwingermodel_tpu.ops import dirac as dops
        from schwingermodel_tpu.ops import gauge as gops

        U = gops.links(theta, jnp.complex64)
        sign = dops.make_sign_mask(geom, Nx, 2 * Nth, 2 * Nth, jnp.float32)
        Uf = dops.fermion_links(U, sign)
        Ue = eo.pack(geom, Uf, eo.EVEN)
        Uo = eo.pack(geom, Uf, eo.ODD)
        both = self_extend(ph._to_planes(
            jnp.concatenate([Ue, Uo], axis=-3)))
        v = jax.lax.complex(v_re, v_im)
        return both[:2], both[2:], v

    ue_ext, uo_ext, v0 = prep(
        theta, jnp.asarray(v_np.real, jnp.float32),
        jnp.asarray(v_np.imag, jnp.float32))

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

    rows = []

    def emit(metric, value, unit, **extra):
        row = {"metric": metric, "value": round(value, 4), "unit": unit,
               "local_block": f"{Nx}x{2 * Nth}",
               "backend": jax.default_backend()}
        row.update(extra)
        rows.append(row)
        print(json.dumps(row), flush=True)

    # ---- jnp local compute (what the round-3 sharded path paid) ----
    m = m0 + 2.0
    c = 1.0 / (4.0 * m)
    off_e_x = jnp.asarray(((np.arange(-W, Nx + W)) % 2)[:, None]
                          .astype(np.int32))
    off_o_x = 1 - off_e_x

    Ue_ext_c = jax.lax.complex(ue_ext[:, 0], ue_ext[:, 1])
    Uo_ext_c = jax.lax.complex(uo_ext[:, 0], uo_ext[:, 1])

    def jnp_local(vv):
        ve = self_extend(vv)
        w1 = eo.hop_dag(geom, Uo_ext_c, Ue_ext_c, ve, off_o_x)
        u = m * ve - c * eo.hop_dag(geom, Ue_ext_c, Uo_ext_c, w1, off_e_x)
        w2 = eo.hop(geom, Uo_ext_c, Ue_ext_c, u, off_o_x)
        out = m * u - c * eo.hop(geom, Ue_ext_c, Uo_ext_c, w2, off_e_x)
        return out[..., W:-W, W:-W]

    def make_jnp(n):
        @jax.jit
        def f(v):
            def body(x, _):
                y = jnp_local(x)
                return y * jax.lax.rsqrt(
                    jnp.real(jnp.sum(jnp.conj(y) * y))), None
            y, _ = jax.lax.scan(body, v, None, length=n)
            return jnp.real(jnp.sum(y))
        return f

    n1, n2 = (20, 120) if interpret else (2000, 12000)
    s_jnp = slope(make_jnp, n1, n2, v0)
    emit("sharded_local_jnp_us", s_jnp * 1e6, "us/apply")

    # ---- fused local kernel (the new fast path) ----
    def make_fused(n):
        @jax.jit
        def f(v):
            def body(x, _):
                x_ext = self_extend(ph._to_planes(x))
                y = ph._to_complex(ph.halo_normal_fused(
                    ue_ext, uo_ext, off_e, x_ext, m0=m0,
                    interpret=interpret))
                return y * jax.lax.rsqrt(
                    jnp.real(jnp.sum(jnp.conj(y) * y))), None
            y, _ = jax.lax.scan(body, v, None, length=n)
            return jnp.real(jnp.sum(y))
        return f

    s_fused = slope(make_fused, n1, n2, v0)
    emit("sharded_local_fused_us", s_fused * 1e6, "us/apply",
         speedup_vs_jnp=round(s_jnp / s_fused, 2))

    # ---- the dense-chip comparator: fused whole-CG at equal local volume --
    from schwingermodel_tpu.ops import pallas_traj as pt

    C = max(1, 1024 // Nth)     # fill the 128-lane tiles like the bench does
    thetas = jnp.asarray(
        rng.uniform(-np.pi, np.pi, (C, 2, Nx, 2 * Nth)), jnp.float32)
    thE, thO = pt.pack_chains(geom, thetas)
    b_np = (rng.normal(size=(C, 2, Nx, Nth))
            + 1j * rng.normal(size=(C, 2, Nx, Nth)))
    b_p = pt.pack_even(jnp.asarray(b_np, jnp.complex64))

    def make_cg(max_iter):
        @functools.partial(jax.jit)
        def f(b):
            sol = pt.solve_fused(thE, thO, b, b, m0=m0, tol=1e-30,
                                 max_iter=max_iter, Nth=Nth,
                                 interpret=interpret)
            return jnp.sum(sol.x), sol.iters
        return f

    i1, i2 = (5, 30) if interpret else (200, 1400)
    t1 = timed(lambda b: make_cg(i1)(b)[0], b_p)
    t2 = timed(lambda b: make_cg(i2)(b)[0], b_p)
    per_iter = (t2 - t1) / (i2 - i1)
    emit("packed_fused_us_per_iter_equal_volume", per_iter * 1e6,
         "us/iter", chains=C,
         note="whole-CG iteration, C chains at the same local volume")
    emit("sharded_local_cliff_x", s_fused / per_iter, "x",
         note="fused sharded local apply vs dense-chip fused CG iteration")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
