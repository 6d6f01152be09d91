"""Device-mesh parallelism for the BLS/SNARK pipelines.

The reference's only parallelism is rayon data-parallelism inside arkworks
MSM/FFT (SURVEY.md section 2.5). The TPU-native equivalent implemented here:
  - a 1-D "data" mesh axis sharding the batch dimension of signature
    verification (Miller loops lane- and chip-parallel, GT product combined
    with a cross-chip all-gather + local product),
  - sharded MSM/aggregation: per-chip partial sums combined over ICI,
replacing NCCL-style allreduce with XLA collectives under shard_map.

All functions accept an explicit jax.sharding.Mesh so tests can run on the
8-device virtual CPU mesh (tests/conftest.py) and production on a real pod
slice.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

from ..ops import curve as dc
from ..ops import pairing as dp
from ..ops import tower as tw

try:
    shard_map = jax.shard_map
except AttributeError:  # older jax
    from jax.experimental.shard_map import shard_map


def make_mesh(devices=None, axis="data"):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices).reshape(-1), (axis,))


def shard_batch(mesh, tree, axis="data"):
    """Place a pytree of [n, B] arrays with B sharded over the mesh axis."""
    sharding = NamedSharding(mesh, P(None, axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def sharded_miller_product(mesh, p_aff, q_aff, axis="data"):
    """Batch-sharded Miller loops + cross-chip GT product.

    Per shard: local Miller loops + local tree product; then an all-gather
    of the per-chip partial GT elements and a final local product — the ICI
    collective replacing the reference's rayon join.
    """

    def local(p, q):
        f = dp.miller_loop_batch(p, q)
        f = dp.f12_product(f)  # [.., 1] per shard
        f = jax.tree.map(lambda x: jax.lax.all_gather(x[..., 0], axis, axis=-1), f)
        return dp.f12_product(f)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis)),
        out_specs=P(None, None),
        check_vma=False,
    )
    return fn(p_aff, q_aff)


def sharded_pairing_check(mesh, p_aff, q_aff, axis="data"):
    """Full sharded product-of-pairings check: sharded Miller + product,
    then the (replicated, single-element) final exponentiation."""
    f = sharded_miller_product(mesh, p_aff, q_aff, axis)
    e = dp.final_exponentiation(f)
    return tw.f12_is_one(e)


def sharded_msum_g1(mesh, pts_jac, axis="data"):
    """Sharded G1 sum: local tree-sum per chip, then all-gather + final sum."""

    def local(p):
        s = dc.g1.msum(p)
        g = jax.tree.map(lambda x: jax.lax.all_gather(x[..., 0], axis, axis=-1), s)
        return dc.g1.msum(g)

    fn = shard_map(
        local, mesh=mesh, in_specs=P(None, axis), out_specs=P(None, None), check_vma=False
    )
    return fn(pts_jac)


def sharded_msum_g2(mesh, pts_jac, axis="data"):
    def local(p):
        s = dc.g2.msum(p)
        g = jax.tree.map(lambda x: jax.lax.all_gather(x[..., 0], axis, axis=-1), s)
        return dc.g2.msum(g)

    fn = shard_map(
        local, mesh=mesh, in_specs=P(None, axis), out_specs=P(None, None), check_vma=False
    )
    return fn(pts_jac)


def sharded_msm_pippenger(mesh, points, scalars, axis="data", c=None, L=None,
                          curve=None, spec=None, nbits=None):
    """Mesh-sharded Pippenger MSM (host points/scalars -> host point).

    The MSM is additive, so the points are partitioned across chips, each
    chip runs the full scatter-free Pippenger pipeline (ops/msm.py: window
    plan gathers + suffix-scan bucket combine) on its shard, and the
    per-chip partial sums combine with one all-gather + local fold over
    ICI — the reference's \"buckets partitioned across devices\" shape
    (SURVEY.md section 2.5) with XLA collectives instead of NCCL.
    """
    from ..ops import msm as dmsm
    from ..ops.field import FQ

    curve = curve or dc.g1
    spec = spec or FQ
    nbits = nbits or 253
    D = mesh.devices.size
    B0 = len(points)
    Bc0 = -(-B0 // D)  # points per chip before padding
    c = c or dmsm._auto_c(Bc0, nbits)
    if L is None:
        L = 1 << max(2, min(12, (Bc0.bit_length() - 1) // 2 + 3))

    perms, lins, lanes, valids = [], [], [], []
    pts_chunks = []
    Bc = None
    for d in range(D):
        sc = list(scalars[d * Bc0 : (d + 1) * Bc0])
        pc = list(points[d * Bc0 : (d + 1) * Bc0])
        sc += [0] * (Bc0 - len(sc))
        pc += [None] * (Bc0 - len(pc))
        perm, lin, lane, valid, Bc = dmsm.plan_msm(sc, nbits, c, L)
        pc += [None] * (Bc - Bc0)
        perms.append(perm)
        lins.append(lin)
        lanes.append(lane)
        valids.append(valid)
        pts_chunks.append(pc)

    pts_aff = dc.pack_affine(spec, sum(pts_chunks, []))  # [n, D*Bc]
    plan = (
        np.stack(perms),  # [D, W, Bc]
        np.stack(lins),
        np.stack(lanes),
        np.stack(valids),
    )

    def local(pts, perm, lin, lane, valid):
        out = dmsm._pippenger_device(
            curve, pts, perm[0], lin[0], lane[0], valid[0], c, L
        )  # [.., 1]
        g = jax.tree.map(
            lambda x: jax.lax.all_gather(x[..., 0], axis, axis=-1), out
        )
        return curve.msum(g)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(None, None),
        check_vma=False,
    )
    out = fn(pts_aff, *[jnp.asarray(x) for x in plan])
    return dc.unpack_jac(curve, spec, out)[0]


def sharded_msm_g1(mesh, bits, pts_jac, axis="data"):
    """Sharded dense MSM: batch-sharded scalar-muls, per-chip partial sums,
    ICI-combined total (the mesh replacement for arkworks' rayon MSM)."""

    def local(b, p):
        prods = dc.g1.scalar_mul_bits(b, p)
        s = dc.g1.msum(prods)
        g = jax.tree.map(lambda x: jax.lax.all_gather(x[..., 0], axis, axis=-1), s)
        return dc.g1.msum(g)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis)),
        out_specs=P(None, None),
        check_vma=False,
    )
    return fn(bits, pts_jac)
