"""Near-critical refined-contract diagnostic at 32x32 b=2 m0=-0.19 (hb):
is converged=False recursive drift (df/f64 true residual fine) or genuine
stagnation?  Probes the LIGHT-mass solve directly on thermalized configs."""
import dataclasses, functools
import jax, jax.numpy as jnp, numpy as np

from schwingermodel_tpu.config import CGParams, HMCParams, LatticeParams
from schwingermodel_tpu.hmc import packed as hp
from schwingermodel_tpu.models.schwinger import SchwingerModel
from schwingermodel_tpu.ops import pallas_traj as pt
from schwingermodel_tpu.ops import pallas_df as pdf
from schwingermodel_tpu.utils import prng

Nx = Nt = 32; C = 32; Nth = Nt // 2; m0 = -0.19
model = SchwingerModel(
    lattice=LatticeParams(Nx=Nx, Nt=Nt, real_dtype="float32"),
    hmc=HMCParams(beta=2.0, m0=m0, md_steps=26, trajectory_length=1.0,
                  even_odd=True, hasenbusch_dm=0.4,
                  cg=CGParams(tol=1e-10, max_iter=20000, refine=True)))
key = prng.root_key(0)
thetas = jax.random.uniform(jax.random.fold_in(key, 7), (C, 2, Nx, Nt),
                            minval=-jnp.pi, maxval=jnp.pi, dtype=jnp.float32)
th = hp.pack_theta(model, thetas)

@functools.partial(jax.jit, static_argnames=("n", "m"))
def run(th, k0, n, m=model):
    def body(carry, i):
        th = carry
        keys = jax.vmap(lambda c: jax.random.fold_in(
            prng.trajectory_key(k0, i), c))(jnp.arange(C))
        th, st = hp.hmc_trajectory_packed(m, th, keys)
        return th, (jnp.sum(st.accepted), jnp.sum(st.cg_converged))
    th, (acc, cv) = jax.lax.scan(body, th, jnp.arange(n))
    return th, jnp.sum(acc), jnp.sum(cv)

for m0a in (0.0, -0.095):
    ma = dataclasses.replace(model, hmc=dataclasses.replace(model.hmc, m0=m0a))
    for s in range(3):
        th, *_ = run(th, jax.random.fold_in(key, 500 + s), 20, m=ma)
for s in range(4):
    th, a, cv = run(th, jax.random.fold_in(key, s), 20)
    print(f"therm acc {float(a)/(20*C):.3f} conv {int(cv)}/{20*C}", flush=True)

# ---- probe the light solve on the thermalized ensemble ----
E, O = th.E, th.O
z = jax.random.normal(jax.random.fold_in(key, 1234), (C, 2, 2, Nx, Nth),
                      dtype=jnp.float32)
zc = jax.lax.complex(z[:, 0], z[:, 1])
thetas_now = hp.unpack_theta(model, th, C)
phi = jax.jit(jax.vmap(lambda t, w: model.eo_ops(t).dhat(w)))(thetas_now, zc)
phi_p = pt.pack_even(phi)

for name, tol, certify in (("force(1e-8,trusted)", 1e-8, False),
                           ("action(1e-10,cert)", 1e-10, True)):
    @jax.jit
    def solve(E, O, phi_p):
        ru = pdf.solve_refined_fused(
            E, O, phi_p, phi_p, m0=m0, tol=tol, tau=1e-5,
            max_iter=20000, max_outer=12, Nth=Nth, certify=certify,
            df_fallback=True)
        return (pt.unpack_even(ru.x_hi, C), pt.unpack_even(ru.x_lo, C),
                ru.converged, ru.iters)
    xh, xl, convj, itj = solve(E, O, phi_p)
    conv = np.asarray(convj); it = np.asarray(itj)
    print(f"{name}: conv {conv.sum()}/{C}  iters mean {it.mean():.0f} "
          f"max {it.max()}", flush=True)
    # independent f64 true residual per chain
    from tests_tpu.test_tpu_resident import (
        _np_links, _np_eo_normal, to_host_c)
    x128 = to_host_c(xh) + to_host_c(xl)
    th_h = np.asarray(thetas_now); phi_h = to_host_c(phi)
    rels = []
    for c in range(C):
        U = _np_links(th_h[c], Nt)
        r = _np_eo_normal(U, x128[c], m0) - phi_h[c]
        rels.append(np.linalg.norm(r.ravel()) / np.linalg.norm(phi_h[c].ravel()))
    rels = np.array(rels)
    bad = ~conv
    print(f"  true-resid: max {rels.max():.2e}; on flagged-bad chains "
          f"({bad.sum()}): {rels[bad].max() if bad.any() else float('nan'):.2e}; "
          f"meets-tol-but-flagged {(bad & (rels < tol)).sum()}", flush=True)
