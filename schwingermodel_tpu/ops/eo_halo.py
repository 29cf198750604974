"""Wide-halo composite even-odd normal apply: 4 ppermutes per CG iteration.

The per-hop sharded stencil (ops/eo.py through ShardedGeometry) exchanges
one halo slice per shift: the EO normal operator Dhat Dhat^+ is four hops,
so one CG iteration costs 16 ppermutes (+ dots). The reference pays 8
blocking MPI sends per Dirac apply (src/dirac_operator.cpp:66-88) -- 16 per
normal apply -- so matching it structurally is not enough; this module
beats it: exchange a WIDTH-4 halo ring ONCE per normal apply (4 ppermutes,
corners ride along by extending t first and then x of the t-extended
array), then run all four hops LOCALLY on the extended block, cropping the
4-site validity loss at the end. The gauge links are extended once per
SOLVE (they are loop constants), so a CG iteration costs

    4 ppermutes + 1 batched psum      (was 16 + 2; reference: 16 + 2)

at the price of redundant compute on the 4-wide skirt -- the right trade
whenever collective latency, not FLOPs, bounds small-shard iteration time
(BENCH_SCALING analysis, round 2).

Mechanics: the extended arrays use the plain single-device `Geometry`
(jnp.roll shifts) inside the hop code of ops/eo.py, so the stencil math is
literally the same code; roll wrap-around garbage only ever pollutes the
outermost ring consumed per hop, and the final crop removes it. The
checkerboard row offsets of the extended block are rebuilt from global
coordinates, and the antiperiodic time sign arrives pre-folded in the
extended links.

Requires halo width w <= the local packed extents (data beyond the
immediate neighbor shard would otherwise be needed); `supported()` checks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from schwingermodel_tpu.ops import eo
from schwingermodel_tpu.ops.geometry import Geometry, ShardedGeometry

# Dhat Dhat^+ = 4 hops; each hop consumes one ring of each axis.
W = 4

_LOCAL = Geometry()     # roll-shift geometry for the extended block


def supported(geom, local_Nx: int, local_Nth: int) -> bool:
    """True when the width-4 composite fits this shard size AND actually
    saves collectives: on a mesh whose lattice axes are both trivial
    (e.g. the chain-only multihost layout) the extension is pure local
    slicing, so the 4-wide redundant-compute skirt would be pure waste."""
    if not (isinstance(geom, ShardedGeometry)
            and local_Nx >= W and local_Nth >= W):
        return False
    return (lax.axis_size(geom.x_name) > 1
            or lax.axis_size(geom.t_name) > 1)


def _extend_axis(a: jax.Array, axis: int, name: str, w: int) -> jax.Array:
    """Prepend/append the w-slice halos from the ring neighbors along one
    mesh axis (2 ppermutes; pure local slicing when the axis has 1 shard)."""
    n = lax.axis_size(name)
    lo = lax.slice_in_dim(a, 0, w, axis=axis)          # our first w slices
    hi = lax.slice_in_dim(a, a.shape[axis] - w, a.shape[axis], axis=axis)
    if n == 1:
        left, right = hi, lo                            # periodic wrap
    else:
        # right halo = next shard's first w; left halo = prev shard's last w
        right = lax.ppermute(lo, name, [(i, (i - 1) % n) for i in range(n)])
        left = lax.ppermute(hi, name, [(i, (i + 1) % n) for i in range(n)])
    return jnp.concatenate([left, a, right], axis=axis)


def extend(geom: ShardedGeometry, a: jax.Array, w: int = W) -> jax.Array:
    """[..., Nx, K] -> [..., Nx+2w, K+2w] with genuine neighbor data in the
    skirt (4 ppermutes; corners correct because the x-extension acts on the
    already-t-extended array)."""
    a = _extend_axis(a, -1, geom.t_name, w)
    return _extend_axis(a, -2, geom.x_name, w)


def _ext_offsets(geom: ShardedGeometry, Nx: int, Nth: int, w: int):
    """(off_e, off_o) of the extended block, from global row coordinates."""
    ix = lax.axis_index(geom.x_name)
    j = lax.broadcasted_iota(jnp.int32, (Nx + 2 * w, 1), 0)
    x = ix * Nx + j - w                                 # global row index
    off_e = jnp.mod(x, 2).astype(jnp.int32)
    return off_e, 1 - off_e


class EOOperatorsHalo:
    """Sharded (Dhat Dhat^+) with one width-4 halo ring per apply.

    Drop-in CG operator for the sharded path: `normal(v)` takes and
    returns LOCAL [.., 2, Nx, Nth] blocks; links are extended once at
    construction (per solve). Mathematically identical to
    eo.EOOperators(...).normal under ShardedGeometry -- asserted to 1e-12
    in tests/test_eo_halo.py.
    """

    def __init__(self, geom: ShardedGeometry, Uf: jax.Array, m0):
        *_, Nx, Nt = Uf.shape
        Nth = Nt // 2
        self.geom = geom
        self.Nx, self.Nth = Nx, Nth
        Ue = eo.pack(geom, Uf, eo.EVEN)
        Uo = eo.pack(geom, Uf, eo.ODD)
        # one stacked extension for both parities: 4 ppermutes, not 8
        both = extend(geom, jnp.concatenate([Ue, Uo], axis=-3))
        self.Ue = both[..., :2, :, :]
        self.Uo = both[..., 2:, :, :]
        self.off_e, self.off_o = _ext_offsets(geom, Nx, Nth, W)
        self.m = m0 + 2.0
        self.c = 1.0 / (4.0 * self.m)

    def normal(self, v: jax.Array) -> jax.Array:
        """(Dhat Dhat^+) v, 4 ppermutes total."""
        g = _LOCAL
        ve = extend(self.geom, v)
        # Dhat^+ : w = (H_eo)^+ v ; u = m v - c (H_oe)^+ w
        w1 = eo.hop_dag(g, self.Uo, self.Ue, ve, self.off_o)
        u = self.m * ve - self.c * eo.hop_dag(g, self.Ue, self.Uo, w1,
                                              self.off_e)
        # Dhat : w = H_oe u ; out = m u - c H_eo w
        w2 = eo.hop(g, self.Uo, self.Ue, u, self.off_o)
        out = self.m * u - self.c * eo.hop(g, self.Ue, self.Uo, w2,
                                           self.off_e)
        return out[..., W:-W, W:-W]
