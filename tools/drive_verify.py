import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np

from schwingermodel_tpu.config import CGParams, HMCParams, LatticeParams
from schwingermodel_tpu.hmc.sampler import hmc_trajectory
from schwingermodel_tpu.models.schwinger import SchwingerModel
from schwingermodel_tpu.utils import prng
from schwingermodel_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def run(model, n_therm, n_meas, seed=0, theta=None):
    key = prng.root_key(seed)
    if theta is None:
        theta = jax.random.uniform(
            key, (2, model.lattice.Nx, model.lattice.Nt),
            minval=-np.pi, maxval=np.pi, dtype=model.lattice.rdtype)

    @jax.jit
    def block(th, idx):
        def body(t, i):
            t, st = hmc_trajectory(model, t, prng.trajectory_key(key, i))
            return t, st
        return jax.lax.scan(body, th, idx)

    theta, _ = block(theta, jnp.arange(n_therm))
    theta, st = block(theta, jnp.arange(n_therm, n_therm + n_meas))
    plaq = []
    # plaquette from final chain: measure along the way instead
    return theta, st


lat = LatticeParams(Nx=8, Nt=8, real_dtype="float64")
model = SchwingerModel(
    lattice=lat,
    hmc=HMCParams(beta=2.0, m0=0.1, md_steps=10, trajectory_length=1.0,
                  cg=CGParams(tol=1e-10, max_iter=10000), even_odd=True))

key = prng.root_key(0)
theta = jax.random.uniform(key, (2, 8, 8), minval=-np.pi, maxval=np.pi,
                           dtype=jnp.float64)


@jax.jit
def block(th, idx):
    def body(t, i):
        t, st = hmc_trajectory(model, t, prng.trajectory_key(key, i))
        return t, (st.exp_mdH, st.accepted, st.cg_converged, st.delta_H,
                   model.plaquette_sum(t))
    return jax.lax.scan(body, th, idx)


theta, _ = block(theta, jnp.arange(100))
theta, (e, acc, conv, dH, plaq) = block(theta, jnp.arange(100, 300))
V = 64
print(f"<exp(-dH)> = {float(jnp.mean(e)):.4f}")
print(f"acceptance = {float(jnp.mean(acc)):.3f}")
print(f"<plaquette> = {float(jnp.mean(plaq))/V:.4f} (expect ~0.72)")
print(f"all cg_converged: {bool(jnp.all(conv))}")

# dt^2 scaling
prev = None
for md in (8, 16, 32):
    import dataclasses
    m2 = dataclasses.replace(
        model, hmc=dataclasses.replace(model.hmc, md_steps=md))

    @jax.jit
    def one(t, k):
        return hmc_trajectory(m2, t, k)[1].delta_H

    vals = [abs(float(one(theta, prng.trajectory_key(prng.root_key(s), 0))))
            for s in range(1, 4)]
    cur = np.mean(vals)
    print(f"md_steps={md}: |dH| ~ {cur:.2e}" +
          (f" (ratio {prev/cur:.1f})" if prev else ""))
    prev = cur

# starved CG surfaces non-convergence without crashing
import dataclasses
m3 = dataclasses.replace(
    model, hmc=dataclasses.replace(
        model.hmc, cg=CGParams(tol=1e-10, max_iter=3)))
_, st3 = jax.jit(lambda t, k: hmc_trajectory(m3, t, k))(
    theta, prng.trajectory_key(key, 999))
print(f"starved CG converged flag: {bool(st3.cg_converged)} (expect False)")

# non-square lattice
m4 = SchwingerModel(
    lattice=LatticeParams(Nx=6, Nt=10, real_dtype="float64"),
    hmc=model.hmc)
t4 = jax.random.uniform(key, (2, 6, 10), minval=-np.pi, maxval=np.pi,
                        dtype=jnp.float64)
_, st4 = jax.jit(lambda t, k: hmc_trajectory(m4, t, k))(
    t4, prng.trajectory_key(key, 5))
print(f"6x10 lattice: dH = {float(st4.delta_H):.3e}, "
      f"converged = {bool(st4.cg_converged)}")
print("VERIFY DRIVE COMPLETE")
