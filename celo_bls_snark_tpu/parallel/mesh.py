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


_JIT_CACHE = {}


def _jit_shard(key, builder):
    """jit-compile (and memoize) a shard_map program.

    Eager shard_map dispatch is catastrophically slow on the CPU backend
    (minutes per call vs seconds compiled + ~ms to run, measured on the
    four-step NTT), so every public function here routes its shard_map
    through one cached jax.jit callable per (mesh, static-config) key —
    jit itself re-specializes per operand shape."""
    fn = _JIT_CACHE.get(key)
    if fn is None:
        fn = _JIT_CACHE[key] = jax.jit(builder())
    return fn


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

    def build():
        def local(p, q):
            f = dp.miller_loop_batch(p, q)
            f = dp.f12_product(f)  # [.., 1] per shard
            f = jax.tree.map(
                lambda x: jax.lax.all_gather(x[..., 0], axis, axis=-1), f
            )
            return dp.f12_product(f)

        return shard_map(
            local,
            mesh=mesh,
            in_specs=(P(None, axis), P(None, axis)),
            out_specs=P(None, None),
            check_vma=False,
        )

    return _jit_shard(("miller_product", mesh, axis), build)(p_aff, q_aff)


def sharded_pairing_check(mesh, p_aff, q_aff, axis="data"):
    """Full sharded product-of-pairings check: sharded Miller + product,
    then the (replicated, single-element) final exponentiation."""
    f = sharded_miller_product(mesh, p_aff, q_aff, axis)
    e = dp.final_exponentiation(f)
    return tw.f12_is_one(e)


def sharded_msum_g1(mesh, pts_jac, axis="data"):
    """Sharded G1 sum: local tree-sum per chip, then all-gather + final sum."""

    return _sharded_msum(mesh, pts_jac, dc.g1, "msum_g1", axis)


def sharded_msum_g2(mesh, pts_jac, axis="data"):
    return _sharded_msum(mesh, pts_jac, dc.g2, "msum_g2", axis)


def _sharded_msum(mesh, pts_jac, curve, tag, axis):
    def build():
        def local(p):
            s = curve.msum(p)
            g = jax.tree.map(
                lambda x: jax.lax.all_gather(x[..., 0], axis, axis=-1), s
            )
            return curve.msum(g)

        return shard_map(
            local, mesh=mesh, in_specs=P(None, axis), out_specs=P(None, None),
            check_vma=False,
        )

    return _jit_shard((tag, mesh, axis), build)(pts_jac)


def sharded_msm_pippenger(mesh, points, scalars, axis="data", c=None, L=None,
                          curve=None, spec=None, nbits=None,
                          pack_fn=None, unpack_fn=None, cache_key=None):
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
    from ..utils.config import get_config

    curve = curve or dc.g1
    spec = spec or FQ
    nbits = nbits or 253
    D = mesh.devices.size
    B0 = len(points)
    Bc0 = -(-B0 // D)  # points per chip before padding
    c = c or dmsm._auto_c(Bc0, nbits)
    if L is None:
        L = 1 << max(2, min(15, Bc0.bit_length() - 5))

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

    full_key = (
        (cache_key, mesh.devices.size, B0, Bc)
        if cache_key is not None
        else None
    )
    pts_aff = dmsm._BASE_PACK_CACHE.get(full_key) if full_key else None
    if pts_aff is None:
        allpts = sum(pts_chunks, [])
        pts_aff = (
            pack_fn(allpts) if pack_fn else dc.pack_affine(spec, allpts)
        )  # [n, D*Bc]
        if full_key is not None and get_config().msm_cache_bases:
            pts_aff = jax.tree.map(jnp.asarray, pts_aff)
            dmsm._BASE_PACK_CACHE[full_key] = pts_aff
    plan = (
        np.stack(perms),  # [D, W, Bc]
        np.stack(lins),
        np.stack(lanes),
        np.stack(valids),
    )

    def build():
        def local(pts, perm, lin, lane, valid):
            out = dmsm._pippenger_device(
                curve, pts, perm[0], lin[0], lane[0], valid[0], c, L
            )  # [.., 1]
            g = jax.tree.map(
                lambda x: jax.lax.all_gather(x[..., 0], axis, axis=-1), out
            )
            return curve.msum(g)

        return shard_map(
            local,
            mesh=mesh,
            in_specs=(P(None, axis), P(axis), P(axis), P(axis), P(axis)),
            out_specs=P(None, None),
            check_vma=False,
        )

    fn = _jit_shard(("msm_pippenger", mesh, axis, id(curve), c, L), build)
    out = fn(pts_aff, *[jnp.asarray(x) for x in plan])
    if unpack_fn is not None:
        return unpack_fn(out)[0]
    return dc.unpack_jac(curve, spec, out)[0]


_FOUR_STEP_TW = {}


def _four_step_twiddles(nttops, N, N1, inverse):
    """Montgomery-packed T[k1, i2] = w_N^{±k1*i2}, shape [n, N1, N2]."""
    key = (nttops.r, N, N1, inverse)
    if key not in _FOUR_STEP_TW:
        w = nttops.root_fn(N)
        if inverse:
            w = pow(w, -1, nttops.r)
        N2 = N // N1
        vals = []
        wk = 1  # w^{k1}
        for _ in range(N1):
            acc = 1
            for _ in range(N2):
                vals.append(acc)
                acc = acc * wk % nttops.r
            wk = wk * w % nttops.r
        packed = np.asarray(nttops.spec.pack(vals))
        _FOUR_STEP_TW[key] = packed.reshape(packed.shape[0], N1, N2)
    return _FOUR_STEP_TW[key]


def sharded_ntt(mesh, coeffs, nttops=None, inverse=False, N1=None, axis="data"):
    """Mesh-sharded radix-2 NTT: the four-step (Bailey) decomposition.

    N = N1*N2 viewed as a matrix A[i1, i2]: (1) length-N1 NTTs along
    columns — local, batched over each chip's i2 shard; (2) twiddle
    multiply by w_N^{k1*i2} — local; (3) ONE all_to_all redistributing from
    i2-sharded to k1-sharded — the only ICI traffic, N elements total;
    (4) length-N2 NTTs along rows — local. This is the TPU-mesh equivalent
    of arkworks' rayon-parallel domain FFT inside the Groth16 prover
    (SURVEY.md §2.5), with the transpose riding ICI instead of shared
    memory.

    coeffs: [n_limbs, N] natural order -> [n_limbs, N] natural order
    (inverse=True gives the 1/N-scaled inverse NTT). Requires N1 % D == 0
    and N2 % D == 0 (D = mesh size).
    """
    from ..ops import ntt as dntt

    nttops = nttops or dntt.ntt_fr
    n, N = coeffs.shape
    D = mesh.devices.size
    if N1 is None:
        N1 = 1 << ((N.bit_length() - 1) // 2)  # ~sqrt(N)
        while N1 % D:
            N1 <<= 1
    N2 = N // N1
    assert N1 % D == 0 and N2 % D == 0, (N1, N2, D)
    tw = jnp.asarray(_four_step_twiddles(nttops, N, N1, inverse))
    f = nttops.f

    def build():
        def local(x, t):
            # x, t: [n, N1, N2/D] (full i1/k1, this chip's i2 slice)
            xt = jnp.moveaxis(x, -1, 1)            # [n, N2loc, N1]
            b = nttops.ntt(xt, inverse=inverse)    # column NTTs over i1
            tt = jnp.moveaxis(t, -1, 1)
            c = f.mul(b.reshape(n, -1), tt.reshape(n, -1)).reshape(b.shape)
            # redistribute: split k1 into D chunks, gather all i2 (ICI)
            d = jax.lax.all_to_all(c, axis, split_axis=2, concat_axis=1,
                                   tiled=True)
            dt = jnp.moveaxis(d, 1, -1)            # [n, N1/D, N2]
            e = nttops.ntt(dt, inverse=inverse)    # row NTTs over i2
            return jnp.moveaxis(e, 1, -1)          # [n, N2, N1/D]

        return shard_map(
            local,
            mesh=mesh,
            in_specs=(P(None, None, axis), P(None, None, axis)),
            out_specs=P(None, None, axis),
            check_vma=False,
        )

    fn = _jit_shard(("ntt", mesh, axis, nttops.r, inverse), build)
    out = fn(coeffs.reshape(n, N1, N2), tw)
    # out[:, k2, k1] = X[k2*N1 + k1] — flattening (k2, k1) IS natural order
    return out.reshape(n, N)


_PW_JIT = {}


def _pointwise_jit(key, fn):
    if key not in _PW_JIT:
        _PW_JIT[key] = jax.jit(fn)
    return _PW_JIT[key]


def sharded_compute_h(mesh, nttops, a_raw, b_raw, c_raw, d: int, g: int,
                      axis="data"):
    """Mesh-sharded Groth16 h-polynomial pipeline: the coset-NTT stage of
    the prover (snark/accel.py compute_h_evals) with every length-d
    transform running as a four-step sharded NTT (one all_to_all each) and
    the pointwise combines as data-parallel kernels — the reference's
    rayon-parallel domain FFT (SURVEY.md §2.5 row 4) across the mesh.

    a_raw/b_raw/c_raw: RAW (non-Montgomery) [n, d] limb arrays of the
    domain evaluations. Returns the RAW h coefficient limbs [n, d]
    (truncate to d-1 on the host side)."""
    f = nttops.f
    r = nttops.r
    sharding = NamedSharding(mesh, P(None, axis))

    def put(x):
        return jax.device_put(jnp.asarray(x), sharding)

    conv_in = _pointwise_jit(("from_raw", r), lambda x: nttops.f.from_raw(x))
    a = conv_in(put(a_raw))
    b = conv_in(put(b_raw))
    c = conv_in(put(c_raw))

    sc_g = put(nttops.coset_scale(d, g))
    sc_ginv = put(nttops.coset_scale(d, pow(g, -1, r)))
    mulp = _pointwise_jit(("mul", r), lambda x, y: f.mul(x, y))
    t_c_inv = (pow(g, d, r) - 1) % r
    t_c_inv = pow(t_c_inv, -1, r)
    tinv = put(
        np.broadcast_to(
            np.asarray(nttops.spec.pack([t_c_inv])), (a_raw.shape[0], d)
        ).copy()
    )
    combine = _pointwise_jit(
        ("h_combine", r), lambda ae, be, ce, ti: f.mul(f.sub(f.mul(ae, be), ce), ti)
    )

    def coset_fwd(x):
        return sharded_ntt(mesh, mulp(x, sc_g), nttops, axis=axis)

    ae = coset_fwd(sharded_ntt(mesh, a, nttops, inverse=True, axis=axis))
    be = coset_fwd(sharded_ntt(mesh, b, nttops, inverse=True, axis=axis))
    ce = coset_fwd(sharded_ntt(mesh, c, nttops, inverse=True, axis=axis))
    hc = combine(ae, be, ce, tinv)
    h = mulp(sharded_ntt(mesh, hc, nttops, inverse=True, axis=axis), sc_ginv)
    conv_out = _pointwise_jit(("to_raw", r), lambda x: nttops.f.to_raw(x))
    out = conv_out(h)
    # replicate before the host fetch: under a multi-PROCESS mesh each
    # process only addresses its own shard, and np.asarray on a sharded
    # global array raises — a jitted identity with replicated
    # out_shardings inserts the all-gather (near-no-op single-process)
    rep_key = ("replicate", mesh)
    if rep_key not in _PW_JIT:
        _PW_JIT[rep_key] = jax.jit(
            lambda x: x, out_shardings=NamedSharding(mesh, P(None, None))
        )
    return np.asarray(_PW_JIT[rep_key](out))


def sharded_msm_g1(mesh, bits, pts_jac, axis="data"):
    """Sharded dense MSM: batch-sharded scalar-muls, per-chip partial sums,
    ICI-combined total (the mesh replacement for arkworks' rayon MSM)."""

    def build():
        def local(b, p):
            prods = dc.g1.scalar_mul_bits(b, p)
            s = dc.g1.msum(prods)
            g = jax.tree.map(
                lambda x: jax.lax.all_gather(x[..., 0], axis, axis=-1), s
            )
            return dc.g1.msum(g)

        return shard_map(
            local,
            mesh=mesh,
            in_specs=(P(None, axis), P(None, axis)),
            out_specs=P(None, None),
            check_vma=False,
        )

    return _jit_shard(("msm_g1_dense", mesh, axis), build)(bits, pts_jac)
