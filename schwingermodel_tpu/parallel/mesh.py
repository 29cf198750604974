"""Device mesh construction for 2D lattice domain decomposition.

The reference builds a periodic 2D Cartesian MPI topology ranks_x x ranks_t
with eight neighbor ranks per rank (include/mpi_setup.h:39-71) and aborts
unless the lattice divides evenly (mpi_setup.h:6-23). Here the topology is a
jax.sharding.Mesh with axes ('x', 't'); neighbor relationships are implied by
lax.ppermute permutations, and divisibility is validated up front the same
way (shard_map requires even blocks).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh

X_AXIS_NAME = "x"
T_AXIS_NAME = "t"
# Data-parallel axis over independent Monte-Carlo chains (new capability; the
# reference runs exactly one chain per MPI job). Chains are embarrassingly
# parallel, so this axis carries no halo traffic -- only the acceptance
# pooling psum in the autotuner crosses it.
CHAIN_AXIS_NAME = "chain"


def choose_mesh_shape(n_devices: int, Nx: int, Nt: int) -> Tuple[int, int]:
    """Pick (rx, rt) with rx*rt == n_devices, blocks as square as possible.

    Mirrors the role of the reference's user-supplied ranks_x/ranks_t
    (src/main.cpp prompts; validated at mpi_setup.h:6-23) but chooses
    automatically: prefer the factorization that makes the local block
    closest to square (minimal halo surface per volume).
    """
    best = None
    for rx in range(1, n_devices + 1):
        if n_devices % rx:
            continue
        rt = n_devices // rx
        if Nx % rx or Nt % rt:
            continue
        wx, wt = Nx // rx, Nt // rt
        # surface-to-volume of the local block = 2(wx+wt)/(wx*wt)
        cost = (wx + wt) / (wx * wt)
        if best is None or cost < best[0]:
            best = (cost, rx, rt)
    if best is None:
        raise ValueError(
            f"cannot tile {Nx}x{Nt} lattice over {n_devices} devices: no "
            f"factorization rx*rt={n_devices} divides (Nx, Nt) evenly "
            f"(reference exits the same way, mpi_setup.h:12-19)"
        )
    return best[1], best[2]


def lattice_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh over the given (or all) devices.

    shape (rx, rt) gives axes ('x', 't'); shape (rc, rx, rt) prepends a
    'chain' data-parallel axis (independent chains sharded over rc device
    groups, each group domain-decomposing the lattice rx x rt).
    """
    if devices is None:
        devices = jax.devices()
    if shape is None:
        n = len(devices)
        # default: all devices along t (fastest-varying lattice axis)
        shape = (1, n)
    names = ((CHAIN_AXIS_NAME,) if len(shape) == 3 else ()) + (
        X_AXIS_NAME, T_AXIS_NAME)
    n_mesh = 1
    for s in shape:
        n_mesh *= s
    if n_mesh != len(devices):
        devices = devices[:n_mesh]
    import numpy as np

    dev_grid = np.asarray(devices).reshape(shape)
    return Mesh(dev_grid, names)
