"""MXU-stencil experiment (VERDICT r2 item 7): can the packed hop beat its
VPU formulation by phrasing data movement as matmuls?

Background: the packed CG kernel sustains ~O(20%) of VPU-class peak; the
stencil itself is elementwise complex arithmetic plus data movement
(rolls/selects), none of which touches the MXU (only the CG dots do, via
the block-indicator matmul). The candidate reformulation measured here:
execute the X-AXIS shifts as constant [Nx, Nx] permutation MATMULS on the
sublane axis (dot_general against a one-hot roll matrix), offloading the
roll copies from the VPU to the otherwise-idle MXU. The t-axis (lane)
shifts stay VPU (a lane-axis matmul would need an [N, N] one-hot -- 32x
the flops of the row case for the same movement).

Per [Nx=64, N=1024] f32 plane: a VPU roll moves 256 KB through VMEM
(~0.2 us); the MXU permutation costs 64*64*1024*2 = 8.4 MFLOP (~0.4 us at
f32 MXU rate) but can overlap VPU work if Mosaic schedules them
concurrently. This tool times three whole-CG variants at the flagship
64x64 C=32 shape and prints one JSON line each:

    python -m schwingermodel_tpu.tools.bench_mxu_stencil

Result is committed either way (win or documented negative) --
see BENCH_MXU_STENCIL.json.
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from schwingermodel_tpu.ops.pallas_eo import _VMEM_LIMIT_BYTES
from schwingermodel_tpu.ops import pallas_traj as pt
from schwingermodel_tpu.ops.pallas_eo import (
    _hop, _hop_dag, _spinor_axpbv, _read_spinor, _write_spinor,
)


def _mxu_roll_mats(Nx: int):
    """One-hot [Nx, Nx] matrices P+ (b = P+ a has b[x] = a[x+1]) and P-."""
    i = jax.lax.broadcasted_iota(jnp.int32, (Nx, Nx), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (Nx, Nx), 1)
    p_plus = (j == jax.lax.rem(i + 1, jnp.int32(Nx))).astype(jnp.float32)
    p_minus = (j == jax.lax.rem(i - 1 + Nx, jnp.int32(Nx))).astype(
        jnp.float32)
    return p_plus, p_minus


def _solve_kernel_variant(the_ref, tho_ref, b_ref, x0_ref,
                          x_ref, iters_ref, rho_ref, bnorm_ref,
                          *, m: float, tol: float, max_iter: int, Nth: int,
                          variant: str):
    Nx, N = the_ref.shape[-2:]
    mask_e, mask_o = pt.parity_masks(Nx)
    tsh = pt.lane_tshifts(N, Nth)
    dot_pc, _ = pt.block_dot(N, Nth)
    c = jnp.float32(1.0 / (4.0 * m))
    m = jnp.float32(m)

    if variant == "mxu_xshift":
        p_plus, p_minus = _mxu_roll_mats(Nx)

        def shift_p_x(a):
            return jax.lax.dot_general(
                p_plus, a, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        def shift_m_x(a):
            return jax.lax.dot_general(
                p_minus, a, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        import schwingermodel_tpu.ops.pallas_eo as pe

        # EXPERIMENT-ONLY module-global patch: redirects the shared _hop
    # helpers' x-shifts during THIS kernel trace. Safe only because this
    # tool runs standalone in its own process (never import it from
    # production code; concurrent kernel traces would pick up the patch).
    orig_p, orig_m = pe._shift_p_x, pe._shift_m_x
        pe._shift_p_x, pe._shift_m_x = shift_p_x, shift_m_x
        try:
            ue, uo = pt.links_from_theta_planes(
                the_ref[0], the_ref[1], tho_ref[0], tho_ref[1], Nth)

            def apply_A(v):
                w = _hop_dag(uo, ue, v, mask_o, tsh)
                vv = _spinor_axpbv(m, v, -c,
                                   _hop_dag(ue, uo, w, mask_e, tsh))
                w2 = _hop(uo, ue, vv, mask_o, tsh)
                return _spinor_axpbv(m, vv, -c,
                                     _hop(ue, uo, w2, mask_e, tsh))

            x, iters, rho, bnorm2 = pt._cg_planes(
                apply_A, _read_spinor(b_ref), _read_spinor(x0_ref),
                dot_pc, tol, max_iter)
        finally:
            pe._shift_p_x, pe._shift_m_x = orig_p, orig_m
    else:
        ue, uo = pt.links_from_theta_planes(
            the_ref[0], the_ref[1], tho_ref[0], tho_ref[1], Nth)

        def apply_A(v):
            w = _hop_dag(uo, ue, v, mask_o, tsh)
            vv = _spinor_axpbv(m, v, -c, _hop_dag(ue, uo, w, mask_e, tsh))
            w2 = _hop(uo, ue, vv, mask_o, tsh)
            return _spinor_axpbv(m, vv, -c, _hop(ue, uo, w2, mask_e, tsh))

        x, iters, rho, bnorm2 = pt._cg_planes(
            apply_A, _read_spinor(b_ref), _read_spinor(x0_ref),
            dot_pc, tol, max_iter)

    _write_spinor(x_ref, x)
    iters_ref[...] = iters
    rho_ref[...] = rho
    bnorm_ref[...] = bnorm2


@functools.partial(
    jax.jit, static_argnames=("m0", "tol", "max_iter", "Nth", "variant"))
def solve_variant(thE, thO, b_p, x0_p, *, m0, tol, max_iter, Nth, variant):
    _, Nx, N = thE.shape
    kernel = functools.partial(
        _solve_kernel_variant, m=float(m0) + 2.0, tol=float(tol),
        max_iter=int(max_iter), Nth=Nth, variant=variant)
    out_shape = (
        jax.ShapeDtypeStruct((2, 2, Nx, N), jnp.float32),
        jax.ShapeDtypeStruct((1, N), jnp.int32),
        jax.ShapeDtypeStruct((1, N), jnp.float32),
        jax.ShapeDtypeStruct((1, N), jnp.float32),
    )
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, out_shape=out_shape, in_specs=[vspec] * 4,
        out_specs=(vspec,) * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
    )(thE, thO, b_p, x0_p)


def main(argv=None) -> int:
    import numpy as np

    from schwingermodel_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    C, Nx, Nt = 32, 64, 64
    Nth = Nt // 2
    rng = np.random.default_rng(0)
    thE = jnp.asarray(np.asarray(
        rng.uniform(-np.pi, np.pi, (2, Nx, C * Nth)), np.float32))
    thO = jnp.asarray(np.asarray(
        rng.uniform(-np.pi, np.pi, (2, Nx, C * Nth)), np.float32))
    b = jnp.asarray(np.asarray(
        rng.standard_normal((2, 2, Nx, C * Nth)), np.float32))

    REP = 50
    bs = jnp.asarray(np.asarray(
        rng.standard_normal((REP, 2, 2, Nx, C * Nth)), np.float32))

    @functools.partial(jax.jit, static_argnames=("variant",))
    def run_all(thE, thO, bs, variant):
        # all REP solves in ONE device program: the tunneled backend costs
        # ~15 ms per un-pipelined dispatch, which would otherwise dominate
        def body(carry, bb):
            x, it, rho, bn = solve_variant(
                thE, thO, bb, bb, m0=0.2, tol=1e-6, max_iter=300,
                Nth=Nth, variant=variant)
            return carry, jnp.max(it)
        _, its = jax.lax.scan(body, 0, bs)
        return jnp.sum(its), its[0]

    rows = []
    for variant in ("vpu", "mxu_xshift"):
        tot, first = run_all(thE, thO, bs, variant)
        float(tot)                                # compile + warm
        t0 = time.perf_counter()
        tot, first = run_all(thE, thO, bs, variant)
        total_iters = float(tot)                  # readback fence
        dt = time.perf_counter() - t0
        us = dt / total_iters * 1e6
        row = {"metric": "cg_us_per_lockstep_iter", "variant": variant,
               "value": round(us, 3), "unit": "us/iter",
               "lockstep_iters": int(float(first)),
               "shape": f"{Nx}x{Nt} C={C}"}
        rows.append(row)
        print(json.dumps(row), flush=True)

    verdict = {
        "metric": "mxu_stencil_experiment",
        "speedup_mxu_over_vpu": round(rows[0]["value"] / rows[1]["value"], 3),
        "rows": rows,
    }
    print(json.dumps(verdict), flush=True)
    with open("BENCH_MXU_STENCIL.json", "w") as f:
        json.dump(verdict, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
