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
        for _ in range(7):
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

    def make_jnp(n):
        @jax.jit
        def f(v, ue, uo):
            Ue_c = jax.lax.complex(ue[:, 0], ue[:, 1])
            Uo_c = jax.lax.complex(uo[:, 0], uo[:, 1])

            def jnp_local(vv):
                ve = self_extend(vv)
                w1 = eo.hop_dag(geom, Uo_c, Ue_c, ve, off_o_x)
                u = m * ve - c * eo.hop_dag(geom, Ue_c, Uo_c, w1, off_e_x)
                w2 = eo.hop(geom, Uo_c, Ue_c, u, off_o_x)
                out = m * u - c * eo.hop(geom, Ue_c, Uo_c, w2, off_e_x)
                return out[..., W:-W, W:-W]

            def body(x, _):
                y = jnp_local(x)
                return y * jax.lax.rsqrt(
                    jnp.real(jnp.sum(jnp.conj(y) * y))), None
            y, _ = jax.lax.scan(body, v, None, length=n)
            return jnp.real(jnp.sum(y))
        return f

    # wide windows: per-apply ~1 us must integrate far past the
    # tunnel's ~ms dispatch jitter (BENCH_KERNELS round-3 lesson)
    n1, n2 = (20, 120) if interpret else (2000, 42000)
    s_jnp = slope(make_jnp, n1, n2, v0, ue_ext, uo_ext)
    emit("sharded_local_jnp_us", s_jnp * 1e6, "us/apply")

    # ---- fused local kernel (the new fast path) ----
    def make_fused(n):
        @jax.jit
        def f(v, ue, uo):
            def body(x, _):
                x_ext = self_extend(ph._to_planes(x))
                y = ph._to_complex(ph.halo_normal_fused(
                    ue, uo, off_e, x_ext, m0=m0,
                    interpret=interpret))
                return y * jax.lax.rsqrt(
                    jnp.real(jnp.sum(jnp.conj(y) * y))), None
            y, _ = jax.lax.scan(body, v, None, length=n)
            return jnp.real(jnp.sum(y))
        return f

    s_fused = slope(make_fused, n1, n2, v0, ue_ext, uo_ext)
    emit("sharded_local_fused_us", s_fused * 1e6, "us/apply",
         speedup_vs_jnp=round(s_jnp / s_fused, 2))

    # ---- full sharded CG iteration through the REAL path ----
    # cg_solve_sharded_fused under shard_map on a 1x1 mesh: the identical
    # program a pod shard runs (extend -> kernel with in-kernel dots ->
    # psum), minus only the cross-chip wire time of the 4 ppermutes +
    # 1 psum (~2-4 us on ICI). Solves chain over FRESH pre-drawn RHS
    # (realistic iteration counts), iteration-counted on device.
    from jax.sharding import PartitionSpec as P

    from schwingermodel_tpu.ops import pallas_halo as ph2
    from schwingermodel_tpu.ops.geometry import ShardedGeometry
    from schwingermodel_tpu.parallel.mesh import lattice_mesh

    sgeom = ShardedGeometry()
    mesh = lattice_mesh((1, 1))
    n_rhs1, n_rhs2 = (2, 5) if interpret else (5, 45)
    rhs_re = jnp.asarray(
        rng.normal(size=(n_rhs2, 2, Nx, Nth)), jnp.float32)
    rhs_im = jnp.asarray(
        rng.normal(size=(n_rhs2, 2, Nx, Nth)), jnp.float32)

    def make_solves(n):
        def run(th, rhs_re, rhs_im):
            from schwingermodel_tpu.ops import dirac as dops
            from schwingermodel_tpu.ops import gauge as gops

            U = gops.links(th, jnp.complex64)
            sign = dops.make_sign_mask(sgeom, Nx, 2 * Nth, 2 * Nth,
                                       jnp.float32)
            Uf = dops.fermion_links(U, sign)

            def body(carry, rr):
                b = jax.lax.complex(rr[0], rr[1])
                res = ph2.cg_solve_sharded_fused(
                    sgeom, Uf, m0, b, tol=1e-6, max_iter=2000,
                    interpret=interpret)
                return carry + jnp.real(jnp.sum(res.x)), res.iters
            tot, its = jax.lax.scan(
                body, jnp.float32(0.0),
                jnp.stack([rhs_re[:n], rhs_im[:n]], axis=1))
            return tot, jnp.sum(its)

        spec = P(None, "x", "t")
        return jax.jit(jax.shard_map(
            run, mesh=mesh,
            in_specs=(spec, P(None, None, "x", "t"), P(None, None, "x", "t")),
            out_specs=(P(), P()), check_vma=False))

    f1, f2 = make_solves(n_rhs1), make_solves(n_rhs2)
    t1 = timed(lambda *a: f1(*a)[0], theta, rhs_re, rhs_im)
    t2 = timed(lambda *a: f2(*a)[0], theta, rhs_re, rhs_im)
    it1 = float(jax.device_get(f1(theta, rhs_re, rhs_im)[1]))
    it2 = float(jax.device_get(f2(theta, rhs_re, rhs_im)[1]))
    per_iter = (t2 - t1) / max(it2 - it1, 1.0)
    emit("sharded_cg_iter_us", per_iter * 1e6, "us/iter",
         iters_per_solve=round((it2 - it1) / (n_rhs2 - n_rhs1), 1),
         note="cg_solve_sharded_fused on a 1x1 mesh (in-kernel dots); add "
              "~2-4 us ICI collectives on a real pod")

    # ---- full per-shard MD force step (round-4 verdict item 5) ----
    # force_halo_fused (chi' + fermion force + staple force as ONE kernel
    # on the width-4-extended block) vs the jnp composite a sharded MD
    # step otherwise pays (eo.hop stencils + autodiff fermion force +
    # staple sum), both through shard_map on a 1x1 mesh -- the identical
    # per-shard program of an rx x rt pod, minus cross-chip wire time.
    # Chained as MD-like half-steps (th += eps * F) so n applications
    # depend serially, slope-timed.
    from schwingermodel_tpu.config import (
        CGParams as _CGP, HMCParams as _HMCP, LatticeParams as _LP,
    )
    from schwingermodel_tpu.models.schwinger import SchwingerModel
    from schwingermodel_tpu.ops import gauge as gops
    from schwingermodel_tpu.parallel.sharded import sharded_model

    beta = 4.0
    model = SchwingerModel(
        lattice=_LP(Nx=Nx, Nt=2 * Nth, real_dtype="float32"),
        hmc=_HMCP(beta=beta, m0=m0, even_odd=True,
                  cg=_CGP(tol=1e-6, max_iter=2000)))
    inner = sharded_model(model)
    psi0 = jax.lax.complex(
        jnp.asarray(rng.normal(size=(2, Nx, Nth)), jnp.float32),
        jnp.asarray(rng.normal(size=(2, Nx, Nth)), jnp.float32))

    def make_force(n, fused):
        def run(th, ps):
            def body(th, _):
                ops = inner.eo_ops(th)
                if fused:
                    F = ph2.force_halo_fused(
                        inner.geom, ops.Uf, m0, ps, beta,
                        interpret=interpret)
                else:
                    chi_p = ops.dhat_dag(ps)
                    F = eo.eo_fermion_force(
                        inner.fermion_links, inner.geom, m0, th, ps, chi_p)
                    F = F + gops.gauge_force(inner.geom, inner.links(th),
                                             beta)
                return th + jnp.float32(1e-6) * F, None
            th, _ = jax.lax.scan(body, th, None, length=n)
            return jnp.sum(th)

        spec = P(None, "x", "t")
        return jax.jit(jax.shard_map(
            run, mesh=mesh, in_specs=(spec, spec), out_specs=P(),
            check_vma=False))

    nf1, nf2 = (3, 10) if interpret else (200, 3200)
    s_fjnp = slope(lambda n: make_force(n, False), nf1, nf2, theta, psi0)
    emit("sharded_force_jnp_us", s_fjnp * 1e6, "us/step",
         note="per-shard MD force (chi' + fermion + staple), jnp "
              "composite under shard_map on a 1x1 mesh")
    s_ffus = slope(lambda n: make_force(n, True), nf1, nf2, theta, psi0)
    emit("sharded_force_fused_us", s_ffus * 1e6, "us/step",
         speedup_vs_jnp=round(s_fjnp / s_ffus, 2),
         note="force_halo_fused: ONE kernel per shard; add ~2-4 us ICI "
              "halo ppermutes on a real pod")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
