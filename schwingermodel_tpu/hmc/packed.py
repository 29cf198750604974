"""HMC trajectory on the lane-packed layout: the fused-kernel fast path.

Same Metropolis semantics as hmc/sampler.py (reference HMC::HMC_Update,
src/hmc.cpp:151-181) but the state never leaves the lane-packed plane
layout of ops/pallas_traj.py: theta and pi live as even/odd checkerboard
f32 planes [2, Nx, N] (N = C*Nth chain-major lanes), every MD force step is
ONE fused Pallas kernel (links + CG + both forces), and the integrator
axpys run at full lane utilization. C chains advance in lockstep -- the
whole-trajectory analog of the lane-packed CG of ops/pallas_eo.py.

Noise is drawn per chain exactly as the vmapped sampler draws it
(sampler.draw_noise semantics), then packed -- so this path equals the
unpacked vmapped trajectory in distribution, and tests can inject identical
noise fields into both and compare dH directly (tests/test_pallas_traj.py).

Scope (asserted in packed_supported): even-odd mode, unsharded, f32,
leapfrog/omelyan, static beta, BOTH solver contracts (the refined 1e-10
contract rides the reliable-update kernel, ops/pallas_df.py), with or
without the Hasenbusch two-pseudofermion split (heavy + ratio solves and
the fused ratio-force kernel, ops/pallas_traj.ratio_force_fused). Sharded
lattices keep hmc/sampler.py (with the fused sharded CG and force of
ops/pallas_halo.py underneath).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from schwingermodel_tpu.hmc.sampler import TrajectoryStats, draw_noise
from schwingermodel_tpu.models.schwinger import SchwingerModel
from schwingermodel_tpu.ops import pallas_traj as pt


class PackedTheta(NamedTuple):
    """Gauge state as packed angle planes."""
    E: jax.Array    # f32 [2, Nx, N]
    O: jax.Array    # f32 [2, Nx, N]


def packed_supported(model: SchwingerModel) -> bool:
    """True when the fused packed-trajectory path applies to this model.

    Covers BOTH solver contracts: loose (refine off, working-precision CG)
    and the shipped 1e-10 contract (cg.refine on f32) -- the packed
    refinement always uses the double-float kernels (ops/pallas_df.py)
    regardless of cg.refine_impl, which only selects the arithmetic of the
    UNPACKED path."""
    return (
        model.hmc.even_odd
        and not model.geom.is_sharded
        and not model.hmc.quenched
        and model.lattice.rdtype == jnp.float32
        and model.hmc.integrator in ("leapfrog", "omelyan")
    )


def packed_eligible(model: SchwingerModel) -> bool:
    """packed_supported AND the backend gate: hmc.packed resolves None (auto)
    to TPU-only -- off-TPU the kernels run in interpret mode, far slower than
    the XLA sampler path they would replace -- while True forces the path
    (tests) and False always defers to the sampler. The single gate used by
    the runner, the tune warmup, and the chain-sharded path."""
    if model.hmc.packed is False:
        return False
    if not packed_supported(model):
        return False
    if model.hmc.packed is None:
        return jax.default_backend() == "tpu"
    return True


def pack_theta(model: SchwingerModel, theta: jax.Array) -> PackedTheta:
    """[C, 2, Nx, Nt] (or [2, Nx, Nt] for C=1) -> packed planes."""
    if theta.ndim == 3:
        theta = theta[None]
    E, O = pt.pack_chains(model.geom, theta)
    return PackedTheta(E=E, O=O)


def unpack_theta(model: SchwingerModel, th: PackedTheta, C: int) -> jax.Array:
    """Packed planes -> [C, 2, Nx, Nt] angles."""
    return pt.unpack_chains(model.geom, th.E, th.O, C)


def _n_chains(model: SchwingerModel, th: PackedTheta) -> int:
    return th.E.shape[-1] // (model.lattice.Nt // 2)


def trajectory_packed_given_noise(
    model: SchwingerModel,
    th: PackedTheta,
    piE: jax.Array,
    piO: jax.Array,
    chi: jax.Array,
    r: jax.Array,
    dt=None,
) -> Tuple[PackedTheta, TrajectoryStats]:
    """Deterministic packed HMC update given pre-drawn noise.

    piE/piO: packed momentum planes [2, Nx, N]; chi: complex [C, 2, Nx, Nth]
    (the even-packed pseudofermion noise, exactly sampler.draw_noise's);
    r: [C] Metropolis uniforms. Returns (theta', per-chain TrajectoryStats).
    dt may be a traced scalar override (autotuning); beta is static.
    """
    assert packed_supported(model), "packed trajectory: unsupported config"
    Nth = model.lattice.Nt // 2
    C = _n_chains(model, th)
    m0 = float(model.hmc.m0)
    beta = float(model.hmc.beta)
    tol = float(model.hmc.cg.tol)
    max_iter = int(model.hmc.cg.max_iter)
    interpret = jax.default_backend() != "tpu"
    dt = model.hmc.step_size if dt is None else dt
    forecast = model.hmc.cg_forecast
    hb = model.hasenbusch_active
    m1 = m0 + float(model.hmc.hasenbusch_dm or 0.0)

    # the shipped 1e-10 contract: f32 inner solves + double-float true
    # residuals in the fused df kernel, Hamiltonian terms accumulated in df
    # and dH formed in df before collapsing (ops/pallas_df.py)
    refined = bool(model.hmc.cg.refine)
    inner_tol = float(model.hmc.cg.inner_tol)
    max_outer = int(model.hmc.cg.max_outer)

    ftol = float(model.hmc.cg.resolved_force_tol())

    # double-float CG fallback on f32 breakdown (cg.fallback; the kernel's
    # jaxpr is prohibitive to compile in interpret mode on CPU -- its
    # correctness is asserted on-device in tests_tpu/ -- so the gate is
    # TPU-only, matching where the packed path actually runs)
    df_fb = bool(model.hmc.cg.fallback) and not interpret

    # MD force solves run the depth-gated certification (cg.certify_forces,
    # default on): the RU kernel trusts the f32 recursive exit only while
    # the segment since the last df replacement is shallow (< cert_k
    # iterations -- drift provably below ftol), and replaces + chases the
    # df TRUE residual on deeper segments. Easy solves pay zero df applies
    # (measured: the always-certify variant cost 4.9% at the 64x64 demo
    # point); deep near-critical solves are df-accurate (the pure-trusted
    # exit measured 3.9e-7 true residual on a claimed-1e-8 solve).
    # certify_forces=False restores pure trust (cert_k = max_iter).
    cert_k = 192 if model.hmc.cg.certify_forces else int(max_iter)

    def solve_refined(thE, thO, b_p, hist_p, tol_, certify=True, mass=m0):
        from schwingermodel_tpu.ops import pallas_df as pdf

        # reliable-update mixed-precision CG: ONE kernel, one continuous
        # Krylov recursion with df true-residual replacements -- replaces
        # the restart-per-pass refinement (pdf.solve_refined_packed), which
        # cost ~3.7x the loose iteration count (docs/PERF.md round 3).
        # Force solves pass tol_ = cg.resolved_force_tol() (config.py);
        # the Metropolis action solves pass the full cg.tol contract.
        return pdf.solve_refined_fused(
            thE, thO, b_p, hist_p, m0=mass, tol=tol_, tau=inner_tol,
            max_iter=max_iter, max_outer=max_outer, Nth=Nth,
            certify=certify, df_fallback=df_fb, cert_k=cert_k,
            interpret=interpret)

    iters_hb = jnp.zeros((C,), jnp.int32)
    conv_hb = jnp.ones((C,), bool)
    if hb:
        # Hasenbusch heat bath (models.pseudofermion_fields, packed):
        #   phi1 = Dhat1 chi1 ;  phi2 = Dhat1^{-1} Dhat0 chi2
        # (one well-conditioned heavy solve at the full cg.tol contract,
        # so S1_old + S2_old = |chi1|^2 + |chi2|^2 holds exactly)
        chi1_p = pt.pack_even(chi[:, 0])
        chi2_p = pt.pack_even(chi[:, 1])
        phi_p = pt.dhat_packed(th.E, th.O, chi1_p, m1, Nth)    # phi1
        b_hb = pt.dhat_packed(th.E, th.O, chi2_p, m0, Nth)     # Dhat0 chi2
        if refined:
            sol_hb = solve_refined(th.E, th.O, b_hb, b_hb, tol, mass=m1)
        else:
            sol_hb = pt.solve_fused(
                th.E, th.O, b_hb, b_hb, m0=m1, tol=tol,
                max_iter=max_iter, Nth=Nth, interpret=interpret)
        iters_hb = sol_hb.iters
        conv_hb = sol_hb.converged
        phi2_p = pt.dhat_dag_packed(th.E, th.O, sol_hb.x, m1, Nth)
    else:
        chi_p = pt.pack_even(chi)
        phi_p = pt.dhat_packed(th.E, th.O, chi_p, m0, Nth)   # Phi = Dhat chi
        phi2_p = None

    # --- old Hamiltonian (sampler: exact S_f_old = |chi|^2) ---
    if refined:
        from schwingermodel_tpu.ops import pallas_df as pdf
        from schwingermodel_tpu.solvers.dfloat import df_add

        kin_df = pdf.kinetic_packed_df(piE, piO, C)
        sg_df = pdf.gauge_action_packed_df(th.E, th.O, beta, C, Nth)
        if hb:
            sf_df = df_add(pdf.norm2_packed_df(chi1_p, C),
                           pdf.norm2_packed_df(chi2_p, C))
        else:
            sf_df = pdf.norm2_packed_df(chi_p, C)
        H_old_df = df_add(df_add(kin_df, sg_df), sf_df)
    else:
        kin_old = pt.kinetic_packed(piE, piO, C)
        sg_old = pt.gauge_action_packed(th.E, th.O, beta, C, Nth)
        sf_old = jnp.sum(
            jnp.real(chi) ** 2 + jnp.imag(chi) ** 2,
            axis=tuple(range(1, chi.ndim)))
        H_old = kin_old + sg_old + sf_old

    # --- forecast state fc ---
    # Chronological forecasting (Brower et al., chronological inversion).
    # Loose contract: fc = [psi_1, psi_2] stack, x0 = 2 psi_1 - psi_2
    # (leapfrog) / psi_1 (omelyan) -- the round-3 scheme, unchanged.
    # Refined contract: hmc.mre_history >= 2 carries the last K df-collapsed
    # solutions and the RU solve kernel MRE-projects the start onto their
    # span (pallas_df); 0 keeps the fixed 2nd-order extrapolation.
    # Exactness is unaffected (x0 only seeds CG; the <exp(-dH)>=1 gates
    # cover forecasting bias).
    K_MRE = int(model.hmc.mre_history)
    use_mre = refined and forecast and K_MRE >= 2 and not hb
    leap = model.hmc.integrator == "leapfrog"
    if hb:
        # two forecast histories: the heavy system (rhs phi1) and the
        # light/ratio system (rhs Dhat1 phi2, which equals Dhat0 chi2 =
        # b_hb at the initial theta by the heat-bath construction)
        k0 = 2 if forecast else 1
        fc0 = (jnp.concatenate([phi_p[None]] * k0, axis=0),
               jnp.concatenate([b_hb[None]] * k0, axis=0))
    elif refined:
        fc0 = jnp.concatenate(
            [phi_p[None]] * (K_MRE if use_mre else 2 if forecast else 1),
            axis=0)
    else:
        fc0 = jnp.concatenate([phi_p[None]] * 2, axis=0)

    def fc_push(fc, psi):
        return jnp.concatenate([psi[None], fc[:-1]], axis=0)

    def _x0_of(fc1):
        if not forecast:
            return None
        return (2.0 * fc1[0] - fc1[1]) if leap else fc1[0]

    def force_hb(thE, thO, fc, iters, conv):
        """Hasenbusch MD force: heavy solve (mass m1) + fermion force, then
        the light/ratio solve (mass m0, rhs Dhat1 phi2) + the fused ratio
        force (+ staples) -- models._force_hasenbusch on packed kernels."""
        fc1, fc2 = fc
        x01 = _x0_of(fc1) if forecast else phi_p
        b2f = pt.dhat_packed(thE, thO, phi2_p, m1, Nth)
        x02 = _x0_of(fc2) if forecast else b2f
        if refined:
            sol1 = solve_refined(thE, thO, phi_p, x01[None], ftol,
                                 certify=False, mass=m1)
            res1 = pt.force_step_fused(
                thE, thO, phi_p, sol1.x, m0=m1, beta=beta, tol=tol,
                max_iter=max_iter, Nth=Nth, with_solve=False,
                with_gauge=False, interpret=interpret)
            psi1 = sol1.x
            sol2 = solve_refined(thE, thO, b2f, x02[None], ftol,
                                 certify=False)
            it = iters + sol1.iters + sol2.iters
            cv = jnp.logical_and(conv, jnp.logical_and(
                sol1.converged, sol2.converged))
        else:
            res1 = pt.force_step_fused(
                thE, thO, phi_p, x01, m0=m1, beta=beta, tol=tol,
                max_iter=max_iter, Nth=Nth, with_gauge=False,
                interpret=interpret)
            psi1 = res1.psi
            sol2 = pt.solve_fused(
                thE, thO, b2f, x02, m0=m0, tol=tol, max_iter=max_iter,
                Nth=Nth, interpret=interpret)
            it = iters + res1.iters + sol2.iters
            cv = jnp.logical_and(conv, jnp.logical_and(
                res1.converged, sol2.converged))
        FE2, FO2 = pt.ratio_force_fused(
            thE, thO, sol2.x, phi2_p, m0=m0, m1=m1, beta=beta, Nth=Nth,
            interpret=interpret)
        fc = (fc_push(fc1, psi1), fc_push(fc2, sol2.x)) if forecast else fc
        return res1.FE + FE2, res1.FO + FO2, fc, it, cv

    def force(thE, thO, fc, iters, conv):
        if hb:
            return force_hb(thE, thO, fc, iters, conv)
        if refined:
            if use_mre:
                hist = fc
            elif forecast:
                hist = ((2.0 * fc[0] - fc[1]) if leap else fc[0])[None]
            else:
                hist = phi_p[None]
            # force solves: looser tolerance, depth-gated certification
            # (cert_k above); the ACTION solve below keeps the fully
            # df-certified cg.tol contract either way
            sol = solve_refined(thE, thO, phi_p, hist, ftol, certify=False)
            res = pt.force_step_fused(
                thE, thO, phi_p, sol.x, m0=m0, beta=beta, tol=tol,
                max_iter=max_iter, Nth=Nth, with_solve=False,
                interpret=interpret)
            fc = fc_push(fc, sol.x) if forecast else fc   # !forecast: x0 = phi
            return (res.FE, res.FO, fc, iters + sol.iters,
                    jnp.logical_and(conv, sol.converged))
        if forecast:
            x0 = (2.0 * fc[0] - fc[1]) if leap else fc[0]
        else:
            x0 = phi_p
        res = pt.force_step_fused(
            thE, thO, phi_p, x0, m0=m0, beta=beta, tol=tol,
            max_iter=max_iter, Nth=Nth, interpret=interpret)
        return (res.FE, res.FO, fc_push(fc, res.psi), iters + res.iters,
                jnp.logical_and(conv, res.converged))

    iters0 = iters_hb                  # the Hasenbusch heat-bath solve
    conv0 = conv_hb

    # --- MD evolution (hmc/integrators.py structure, packed axpys) ---
    thE, thO, piE_n, piO_n = th.E, th.O, piE, piO
    if leap:
        n_inner = model.hmc.md_steps - 2
        thE = thE + (0.5 * dt) * piE_n
        thO = thO + (0.5 * dt) * piO_n
        FE, FO, fc, iters, conv = force(thE, thO, fc0, iters0, conv0)
        if not use_mre and forecast:
            # no history yet: x0 = psi_1
            if hb:
                fc = (fc[0].at[1].set(fc[0][0]), fc[1].at[1].set(fc[1][0]))
            else:
                fc = fc.at[1].set(fc[0])

        def body(carry, _):
            thE, thO, piE, piO, FE, FO, fc, iters, conv = carry
            piE = piE + dt * FE
            piO = piO + dt * FO
            thE = thE + dt * piE
            thO = thO + dt * piO
            FE, FO, fc, iters, conv = force(thE, thO, fc, iters, conv)
            return (thE, thO, piE, piO, FE, FO, fc, iters, conv), None

        if n_inner > 0:
            (thE, thO, piE_n, piO_n, FE, FO, fc, iters, conv), _ = \
                lax.scan(
                    body,
                    (thE, thO, piE_n, piO_n, FE, FO, fc, iters, conv),
                    None, length=n_inner)
        piE_n = piE_n + dt * FE
        piO_n = piO_n + dt * FO
        thE = thE + (0.5 * dt) * piE_n
        thO = thO + (0.5 * dt) * piO_n
        # action solve sits half a step beyond the last force solve
        if hb:
            psi_fc = (
                ((1.5 * fc[0][0] - 0.5 * fc[0][1]),
                 (1.5 * fc[1][0] - 0.5 * fc[1][1])) if forecast
                else (phi_p, None))
        else:
            psi_fc = (1.5 * fc[0] - 0.5 * fc[1]) if forecast else phi_p
    else:  # omelyan 2MN (integrators.omelyan structure)
        from schwingermodel_tpu.hmc.integrators import LAMBDA_2MN as lam

        n = model.hmc.md_steps
        thE = thE + (lam * dt) * piE_n
        thO = thO + (lam * dt) * piO_n
        FE, FO, fc, iters, conv = force(thE, thO, fc0, iters0, conv0)

        def half_step(thE, thO, piE, piO, FE, FO, fc, iters, conv, merge):
            piE = piE + (0.5 * dt) * FE
            piO = piO + (0.5 * dt) * FO
            thE = thE + ((1.0 - 2.0 * lam) * dt) * piE
            thO = thO + ((1.0 - 2.0 * lam) * dt) * piO
            FE, FO, fc, iters, conv = force(thE, thO, fc, iters, conv)
            piE = piE + (0.5 * dt) * FE
            piO = piO + (0.5 * dt) * FO
            s = (2.0 if merge else 1.0) * lam * dt
            thE = thE + s * piE
            thO = thO + s * piO
            if merge:
                FE, FO, fc, iters, conv = force(thE, thO, fc, iters, conv)
            return thE, thO, piE, piO, FE, FO, fc, iters, conv

        def body(carry, _):
            out = half_step(*carry, True)
            return out, None

        carry = (thE, thO, piE_n, piO_n, FE, FO, fc, iters, conv)
        if n > 1:
            carry, _ = lax.scan(body, carry, None, length=n - 1)
        thE, thO, piE_n, piO_n, FE, FO, fc, iters, conv = half_step(
            *carry, False)
        if hb:
            psi_fc = ((fc[0][0], fc[1][0]) if forecast else (phi_p, None))
        else:
            psi_fc = fc[0] if forecast else phi_p

    # --- new Hamiltonian ---
    if hb:
        # S_f(new) = phi1^+(A1)^{-1}phi1 + b2^+(A0)^{-1}b2, b2 = Dhat1 phi2
        # (models.fermion_action Hasenbusch branch, packed kernels)
        psi_fc1, psi_fc2 = psi_fc
        b2n = pt.dhat_packed(thE, thO, phi2_p, m1, Nth)
        if psi_fc2 is None:
            psi_fc2 = b2n
        if refined:
            from schwingermodel_tpu.ops import pallas_df as pdf
            from schwingermodel_tpu.solvers.dfloat import df_add, df_sub

            sol1 = solve_refined(thE, thO, phi_p, psi_fc1[None], tol,
                                 mass=m1)
            sol2 = solve_refined(thE, thO, b2n, psi_fc2[None], tol)
            iters = iters + sol1.iters + sol2.iters
            conv = jnp.logical_and(conv, jnp.logical_and(
                sol1.converged, sol2.converged))
            sf_new_df = df_add(
                pdf.dot_re_packed_df(phi_p, sol1.x_hi, sol1.x_lo, C),
                pdf.dot_re_packed_df(b2n, sol2.x_hi, sol2.x_lo, C))
            H_new_df = df_add(
                df_add(pdf.kinetic_packed_df(piE_n, piO_n, C),
                       pdf.gauge_action_packed_df(thE, thO, beta, C, Nth)),
                sf_new_df)
            dH_df = df_sub(H_new_df, H_old_df)
            dH = dH_df[0] + dH_df[1]
        else:
            sol1 = pt.solve_fused(
                thE, thO, phi_p, psi_fc1, m0=m1, tol=tol,
                max_iter=max_iter, Nth=Nth, interpret=interpret)
            sol2 = pt.solve_fused(
                thE, thO, b2n, psi_fc2, m0=m0, tol=tol,
                max_iter=max_iter, Nth=Nth, interpret=interpret)
            iters = iters + sol1.iters + sol2.iters
            conv = jnp.logical_and(conv, jnp.logical_and(
                sol1.converged, sol2.converged))
            sf_new = (pt.dot_re_packed(phi_p, sol1.x, C)
                      + pt.dot_re_packed(b2n, sol2.x, C))
            H_new = (pt.kinetic_packed(piE_n, piO_n, C)
                     + pt.gauge_action_packed(thE, thO, beta, C, Nth)
                     + sf_new)
            dH = H_new - H_old
    elif refined:
        from schwingermodel_tpu.ops import pallas_df as pdf
        from schwingermodel_tpu.solvers.dfloat import df_add, df_sub

        # action solve forecast: MRE over the force history at the final
        # theta, or the fixed half-step extrapolation (psi_fc) otherwise
        sol = solve_refined(thE, thO, phi_p,
                            fc if use_mre else psi_fc[None], tol)
        iters = iters + sol.iters
        conv = jnp.logical_and(conv, sol.converged)
        sf_new_df = pdf.dot_re_packed_df(phi_p, sol.x_hi, sol.x_lo, C)
        H_new_df = df_add(
            df_add(pdf.kinetic_packed_df(piE_n, piO_n, C),
                   pdf.gauge_action_packed_df(thE, thO, beta, C, Nth)),
            sf_new_df)
        dH_df = df_sub(H_new_df, H_old_df)
        dH = dH_df[0] + dH_df[1]            # f32 collapse of the df dH
    else:
        sol = pt.solve_fused(
            thE, thO, phi_p, psi_fc, m0=m0, tol=tol,
            max_iter=max_iter, Nth=Nth, interpret=interpret)
        iters = iters + sol.iters
        conv = jnp.logical_and(conv, sol.converged)
        sf_new = pt.dot_re_packed(phi_p, sol.x, C)
        H_new = (pt.kinetic_packed(piE_n, piO_n, C)
                 + pt.gauge_action_packed(thE, thO, beta, C, Nth) + sf_new)
        dH = H_new - H_old
    accept = r <= jnp.exp(-dH)                      # hmc.cpp:171
    acc_lane = jnp.repeat(accept, Nth)[None, :]     # [1, N] block mask
    thE_next = pt.fold_packed(jnp.where(acc_lane, thE, th.E))
    thO_next = pt.fold_packed(jnp.where(acc_lane, thO, th.O))

    return PackedTheta(E=thE_next, O=thO_next), TrajectoryStats(
        accepted=accept,
        delta_H=dH,
        exp_mdH=jnp.exp(-dH),
        cg_iters=iters,
        cg_converged=conv,
    )


def hmc_trajectory_packed(model: SchwingerModel, th: PackedTheta,
                          keys: jax.Array, dt=None,
                          ) -> Tuple[PackedTheta, TrajectoryStats]:
    """Packed trajectory from per-chain keys [C] (sampler.draw_noise per
    chain, then packed -- statistically identical to the vmapped sampler)."""
    C = _n_chains(model, th)
    Nx, Nt = model.lattice.Nx, model.lattice.Nt
    pi, chi, r = jax.vmap(
        lambda k: draw_noise(model, (2, Nx, Nt), k))(keys)
    piE, piO = pt.pack_chains(model.geom, pi)
    return trajectory_packed_given_noise(model, th, piE, piO, chi, r, dt)
