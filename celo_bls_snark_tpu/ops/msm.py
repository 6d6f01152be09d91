"""Multi-scalar multiplication on device.

The Groth16 prover's MSM workload and the PublicKey/Signature::batch path
(crates/bls-crypto/src/bls/public.rs:47-65, SURVEY.md section 2.5).

Two kernels:

1. PIPPENGER (`msm_pippenger`) — the throughput path. TPU-first,
   scatter-free formulation:
     - the HOST plans each c-bit window: sort permutation of the points by
       digit (numpy argsort) + the 2^c-1 bucket-boundary positions;
     - the DEVICE, per window, gathers points into sorted order, lays them
       out column-major [L lanes x K], computes per-lane suffix partial
       sums with one K-step scan of mixed adds (this is the bucket
       accumulation: B adds), completes suffix sums T_j with a log(L)
       recursive-doubling pass over lane totals, and applies the
       telescoping identity
         sum_i d_i P_i = sum_{b=1}^{2^c-1} T_{pos(b)},
       pos(b) = first sorted index with digit >= b — so the whole bucket
       combine is ONE gather + one msum, no scatter anywhere;
     - windows combine MSB->LSB by Horner doubling.
   Total work ~ ceil(nbits/c) * B mixed adds + O(2^c) per window — true
   Pippenger complexity, robust to arbitrarily skewed digit distributions
   (0/1-heavy witness vectors put thousands of points in one bucket; the
   suffix formulation does not care).

2. BIT-PLANE (`msm_g1`/`msm_g2`) — the small-batch / no-host-plan form
   (~nbits adds per point): sum_b 2^b * (masked lane sum).

Plus FIXED-BASE batch scalar multiplication (`fixed_base_batch_mul`) for
the Groth16 setup's millions of generator multiples: a host-precomputed
window table [W * 2^c] and one W-step gather+madd scan.
"""

import numpy as np
import jax
import jax.numpy as jnp

from . import curve as dc
from .field import FQ, FQ761


# ---------------------------------------------------------------------------
# Bit-plane MSM (small batches; no host planning)
# ---------------------------------------------------------------------------

def _bitplane_msm(curve, bits, pts_jac):
    """bits: [nbits, B] (MSB first); pts_jac: projective batch [B].
    Returns batch-1 projective point."""
    nbits = bits.shape[0]
    batch = bits.shape[1:]
    inf = curve.infinity(batch)

    def plane_sum(bitrow):
        masked = curve.tree_select(bitrow != 0, pts_jac, inf)
        return curve.msum(masked)

    # accumulate MSB -> LSB with Horner doubling:
    #   acc = 2*acc + plane_sum(bit b)
    def step(acc, bitrow):
        acc = curve.double(acc)
        acc = curve.add(acc, plane_sum(bitrow))
        return acc, None

    acc, _ = jax.lax.scan(step, curve.infinity((1,)), bits)
    return acc


def msm_g1(bits, pts_jac):
    return _bitplane_msm(dc.g1, bits, pts_jac)


def msm_g2(bits, pts_jac):
    return _bitplane_msm(dc.g2, bits, pts_jac)


# ---------------------------------------------------------------------------
# Straus grouped MSM (many small MSMs sharing the Horner doubling)
# ---------------------------------------------------------------------------

class RawScalarVec:
    """B scalars carried as a canonical RAW (non-Montgomery) limb matrix
    [n, B] of 16-bit limbs — the zero-marshaling scalar representation
    between a device NTT output (field.to_raw) and MSM planning. Values
    MUST be canonical (< modulus); digit extraction reads the limb bytes
    directly, so nothing is ever converted to a python int."""

    def __init__(self, limbs, spec):
        self.limbs = np.asarray(limbs)
        self.spec = spec

    def __len__(self):
        return int(self.limbs.shape[-1])

    def __iter__(self):
        return iter(self.to_ints())

    def __eq__(self, other):
        if isinstance(other, RawScalarVec):
            other = other.to_ints()
        return self.to_ints() == other

    def byte_matrix(self, nb: int) -> np.ndarray:
        """[B, nb] uint8 little-endian bytes (zero-padded columns)."""
        a8 = (
            self.limbs.astype(np.uint16)
            .astype("<u2")
            .T.copy()
            .view(np.uint8)
        )
        if a8.shape[1] < nb:
            a8 = np.pad(a8, ((0, 0), (0, nb - a8.shape[1])))
        return a8[:, :nb]

    def to_ints(self) -> list:
        return self.spec.unpack_raw(self.limbs)


def _scalar_byte_matrix(scalars, nbits: int, pad_to=None) -> np.ndarray:
    """Scalars (python ints or RawScalarVec) -> [B, nb] uint8 LE byte
    matrix with nb = ceil(nbits/8) + 4 trailing zero bytes, so any
    window of c <= 24 bits can be read as one unaligned uint32."""
    nb = (nbits + 7) // 8 + 4
    B0 = len(scalars)
    B = pad_to or B0
    if isinstance(scalars, RawScalarVec):
        a8 = scalars.byte_matrix(nb)
    else:
        buf = b"".join(int(s).to_bytes(nb, "little") for s in scalars)
        a8 = np.frombuffer(buf, dtype=np.uint8).reshape(B0, nb)
    if B > B0:
        a8 = np.pad(a8, ((0, B - B0), (0, 0)))
    return a8


def _window_matrix(a8: np.ndarray, nbits: int, c: int,
                   dtype=np.int64) -> np.ndarray:
    """[W, B] window digits from a byte matrix, LSB-first window order
    (row w = bits [c*w, c*w+c)), fully vectorized for any c <= 24.
    Transposes the byte matrix once so each window reads 4 CONTIGUOUS
    rows (column slices of the row-major [B, nb] matrix are strided —
    measured 10x slower at 2^19)."""
    B, nb = a8.shape
    W = -(-nbits // c)
    mask = np.uint32((1 << c) - 1)
    aT = np.ascontiguousarray(a8.T).astype(np.uint32)  # [nb, B]
    out = np.empty((W, B), dtype=dtype)
    for w in range(W):
        bit = c * w
        i0 = bit >> 3
        v = (
            aT[i0]
            | (aT[i0 + 1] << 8)
            | (aT[i0 + 2] << 16)
            | (aT[i0 + 3] << 24)
        )
        out[w] = (v >> np.uint32(bit & 7)) & mask
    return out


def window_digits(scalars, nbits: int, c: int):
    """[nw, B] int32 window digits, MSB-first (nw = ceil(nbits/c))."""
    a8 = _scalar_byte_matrix(scalars, nbits)
    return _window_matrix(a8, nbits, c)[::-1].astype(np.int32).copy()


def straus_msm_groups(curve, digits, pts_jac, groups: int, c: int):
    """Many small MSMs in one program: out[g] = sum_i k_i * P_i over the
    lanes of group g (G equal contiguous groups).

    The strict-batch verifier's shape (crates/bls-crypto/src/bls/
    batch.rs:44-84: per-epoch random-linear combinations of ~20 points
    with ~136-bit exponents, hundreds of epochs at once). Per-lane
    double-and-add costs nbits*(dbl+add) at FULL lane width; here the
    Horner doubling runs at GROUP width and each window costs one
    per-lane table gather + a grouped lane-sum:

      - per-lane multiples table T[m] = m*P, m < 2^c (2^c - 2 adds, once),
      - scan windows MSB-first: acc = 2^c*acc (G lanes); acc += group-sums
        of T[digit] (one gather + msum_groups).

    ~4x fewer field ops than scalar_mul_bits + msum_groups at the
    reference bench shape (c=4, 20-point groups, 136-bit exponents).

    digits: [nw, B] int32 in [0, 2^c) (window_digits). pts_jac:
    projective batch [B], B % groups == 0. Returns projective [groups].
    """
    nw, B = digits.shape
    assert B % groups == 0
    table = [curve.infinity((B,)), pts_jac]
    for _ in range(2, 1 << c):
        table.append(curve.add(table[-1], pts_jac))
    T = jax.tree.map(lambda *xs: jnp.stack(xs), *table)  # leaves [2^c, n, B]

    def gather(d):
        # one-hot masked accumulation instead of a gather: TPU gathers
        # with per-lane indices serialize on the scalar core (measured
        # 2x SLOWER end-to-end than per-lane double-and-add); 2^c static
        # masked adds stay on the VPU. Exactly one mask fires per lane.
        def sel(t):
            out = jnp.zeros_like(t[0])
            for m in range(1 << c):
                out = out + jnp.where(d[None] == m, t[m], 0).astype(t.dtype)
            return out

        return jax.tree.map(sel, T)

    # small groups want a narrow fold: with V = B/groups ~ 20 lanes the
    # default fold_lanes=128 pads each group to 32 and runs 4 recursive-
    # doubling rounds (~96 add-lanes/group); folding at 4 lanes costs ~28
    fold = max(2, min(8, 1 << ((B // groups).bit_length() // 2)))

    def step(acc, d):
        for _ in range(c):
            acc = curve.double(acc)
        s = curve.msum_groups(gather(d), groups, fold_lanes=fold)
        return curve.add(acc, s), None

    acc, _ = jax.lax.scan(step, curve.infinity((groups,)), digits)
    return acc


# ---------------------------------------------------------------------------
# Pippenger
# ---------------------------------------------------------------------------

def _auto_c(B: int, nbits: int = 253) -> int:
    """Window size minimizing W*(B + 2*2^c)."""
    best, best_cost = 4, None
    for c in range(4, 17):
        W = -(-nbits // c)
        cost = W * (B + 2 * (1 << c))
        if best_cost is None or cost < best_cost:
            best, best_cost = c, cost
    return best


def plan_msm(scalars, nbits: int, c: int, L: int, fast_digits: bool = True):
    """Host-side window planning. Returns numpy arrays:
    perm [W, B], lin [W, 2^c-1], lane [W, 2^c-1], valid [W, 2^c-1]
    (B = len(scalars) padded to a multiple of L; pad scalars are 0).
    `scalars` is a list of python ints or a RawScalarVec (device NTT
    output — digits come straight off the limb bytes)."""
    B0 = len(scalars)
    B = B0 + ((-B0) % L)
    K = B // L
    W = -(-nbits // c)
    mask = (1 << c) - 1
    if fast_digits:
        # vectorized for every c: one byte matrix + W unaligned u32 reads;
        # uint16 digits make numpy's stable argsort a RADIX sort (~7x
        # faster than int64 mergesort at 2^19)
        a8 = _scalar_byte_matrix(scalars, nbits, pad_to=B)
        dt = np.uint16 if c <= 16 else np.int64
        digits = _window_matrix(a8, nbits, c, dtype=dt)[::-1]
    else:
        sc = list(scalars) + [0] * (B - B0)
        digits = np.zeros((W, B), dtype=np.int64)
        for i, s in enumerate(sc):
            s = int(s)
            for w in range(W):
                digits[W - 1 - w, i] = (s >> (c * w)) & mask
        if c <= 16:
            digits = digits.astype(np.uint16)
    perm = np.zeros((W, B), dtype=np.int32)
    lin = np.zeros((W, (1 << c) - 1), dtype=np.int32)
    lane = np.zeros((W, (1 << c) - 1), dtype=np.int32)
    valid = np.zeros((W, (1 << c) - 1), dtype=bool)
    bvals = np.arange(1, 1 << c)

    def plan_window(w):
        order = np.argsort(digits[w], kind="stable").astype(np.int32)
        ds = digits[w][order]
        pos = np.searchsorted(ds, bvals, side="left")
        ok = pos < B
        posc = np.minimum(pos, B - 1)
        l = posc // K
        off = posc % K
        perm[w] = order
        lin[w] = (K - 1 - off) * L + l
        lane[w] = l
        valid[w] = ok

    if W >= 4 and B >= 1 << 16:
        # argsort releases the GIL; 4 host cores
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(4) as ex:
            list(ex.map(plan_window, range(W)))
    else:
        for w in range(W):
            plan_window(w)
    return perm, lin, lane, valid, B


def plan_msm_generic(scalars, nbits: int, c: int, L: int):
    """plan_msm with the per-scalar digit loop (oracle for the c=16
    byte-slicing fast path)."""
    return plan_msm(scalars, nbits, c, L, fast_digits=False)


def _pippenger_device(curve, points_aff, perm, lin, lane, valid, c: int, L: int):
    """One projective batch-1 point = sum_i scalar_i * P_i (see module doc).
    points_aff: (x, y) affine leaves [n, B]; plan arrays from plan_msm."""
    W, B = perm.shape
    K = B // L
    nb = lin.shape[1]  # 2^c - 1
    lanes_iota = jnp.arange(L)
    inf_L = curve.infinity((L,))
    inf_nb = curve.infinity((nb,))

    def window(acc, inputs):
        pw, linw, lanew, validw = inputs
        # Horner shift of the running accumulator
        acc = jax.lax.fori_loop(0, c, lambda i, a: curve.double(a), acc)
        srt = jax.tree.map(lambda t: jnp.take(t, pw, axis=-1), points_aff)
        # column-major: lane l owns sorted range [l*K, (l+1)*K)
        steps = jax.tree.map(
            lambda t: jnp.moveaxis(t.reshape(t.shape[0], L, K), -1, 0)[::-1],
            srt,
        )  # leaves [K, n, L], step t = original local offset K-1-t

        def body(a, pt):
            # bases are host-packed canonical limbs: cheap infinity test
            a2 = curve.madd(a, pt, canonical_bases=True)
            return a2, a2

        totals, partials = jax.lax.scan(body, inf_L, steps)
        # inclusive suffix sums of lane totals via recursive doubling
        def sround(r, x):
            shift = jnp.left_shift(jnp.int32(1), r)
            rolled = jax.tree.map(lambda a: jnp.roll(a, -shift, axis=-1), x)
            wrapped = lanes_iota >= (L - shift)
            rolled = curve.tree_select(wrapped, inf_L, rolled)
            return curve.add(x, rolled)

        csuf = jax.lax.fori_loop(0, L.bit_length() - 1, sround, totals)
        # csuf_next[l] = csuf[l+1], last lane -> infinity
        csuf_next = curve.tree_select(
            lanes_iota == L - 1,
            inf_L,
            jax.tree.map(lambda a: jnp.roll(a, -1, axis=-1), csuf),
        )
        # T at the 2^c-1 bucket boundaries: within-chunk partial + tail
        Wg = jax.tree.map(
            lambda t: jnp.take(
                jnp.moveaxis(t, 0, 1).reshape(t.shape[1], K * L), linw, axis=-1
            ),
            partials,
        )
        Cg = jax.tree.map(lambda t: jnp.take(t, lanew, axis=-1), csuf_next)
        T = curve.add(Wg, Cg)
        T = curve.tree_select(validw, T, inf_nb)
        wsum = curve.msum(T, fold_lanes=1024)
        return curve.add(acc, wsum), None

    acc, _ = jax.lax.scan(
        window,
        curve.infinity((1,)),
        (jnp.asarray(perm), jnp.asarray(lin), jnp.asarray(lane), jnp.asarray(valid)),
    )
    return acc


_PIPPENGER_JIT_CACHE = {}


def _stable_curve_name(curve) -> str:
    """Process-independent curve tag for the AOT executable cache (an
    id()-based tag would never hit across processes)."""
    for name in ("g1", "g2", "bw6_g1", "bw6_g2"):
        if getattr(dc, name, None) is curve:
            return name
    # unknown curve: fall back to the id-based key — never hits across
    # processes but never loads another curve's executable either
    return f"curve{id(curve)}"


def _pippenger_jit(curve_key, curve, c, L):
    key = (curve_key, c, L)
    if key not in _PIPPENGER_JIT_CACHE:
        from ..utils.aotcache import AotJit

        _PIPPENGER_JIT_CACHE[key] = AotJit(
            f"pip_{_stable_curve_name(curve)}_c{c}_L{L}",
            lambda pts, perm, lin, lane, valid: _pippenger_device(
                curve, pts, perm, lin, lane, valid, c, L
            ),
        )
    return _PIPPENGER_JIT_CACHE[key]


_BASE_PACK_CACHE = {}


def msm_pippenger(points, scalars, curve=None, spec=None, nbits=None,
                  c=None, L=None, pack_fn=None, unpack_fn=None,
                  cache_key=None):
    """Host entry: affine host points (None = infinity) x python-int
    scalars -> affine host point. Defaults to BLS12-377 G1; pass
    (curve=dc.bw6_g1, spec=FQ761, nbits=377) for BW6-761 G1/G2, or custom
    pack_fn/unpack_fn for tower-coordinate groups (BLS12-377 G2).

    cache_key: opaque hashable identifying a FIXED base-point set (e.g. a
    proving-key query array). When set, the packed device-resident bases
    are memoized so repeated proofs skip the host marshaling — the caller
    guarantees the same key is never reused with different points."""
    from ..utils.config import get_config

    cfg = get_config()
    curve = curve or dc.g1
    spec = spec or FQ
    nbits = nbits or 253
    B0 = len(points)
    c = c or cfg.msm_window or _auto_c(B0, nbits)
    if L is None:
        # target ~16-32 scan steps (K = B/L): wide lanes keep the bucket
        # accumulation VPU-bound instead of loop-overhead-bound
        L = cfg.msm_lanes or (1 << max(3, min(15, B0.bit_length() - 5)))
    from ..utils.profiling import stage, device_sync

    with stage("msm.plan"):
        sc = scalars if isinstance(scalars, RawScalarVec) else list(scalars)
        perm, lin, lane, valid, B = plan_msm(sc, nbits, c, L)
    full_key = (cache_key, B0, B) if cache_key is not None else None
    pts_aff = _BASE_PACK_CACHE.get(full_key) if full_key else None
    if pts_aff is None:
        with stage("msm.pack_bases"):
            if isinstance(points, dc.PointVec):
                # raw uint16 straight to device + one from_raw multiply —
                # no host Montgomery mulmods, half the H2D bytes
                pts_aff = points.device_montgomery(B)
            else:
                pts = list(points) + [None] * (B - B0)
                pts_aff = pack_fn(pts) if pack_fn else dc.pack_affine(spec, pts)
        if full_key is not None and cfg.msm_cache_bases:
            pts_aff = jax.tree.map(jnp.asarray, pts_aff)
            _BASE_PACK_CACHE[full_key] = pts_aff
    fn = _pippenger_jit(id(curve), curve, c, L)
    with stage("msm.device"):
        out = fn(pts_aff, perm, lin, lane, valid)
        device_sync(out)  # axon block_until_ready returns early
    if unpack_fn is not None:
        return unpack_fn(out)[0]
    return dc.unpack_jac(curve, spec, out)[0]


# ---------------------------------------------------------------------------
# Fixed-base batch scalar multiplication (Groth16 setup workload)
# ---------------------------------------------------------------------------

def fixed_base_plan(scalars, nbits: int, c: int):
    """digits [W, B] int32: digits[w, i] = window w (LSB-first) of scalar i,
    offset into the window table (idx = w*2^c + digit)."""
    W = -(-nbits // c)
    a8 = _scalar_byte_matrix(scalars, nbits)
    digits = _window_matrix(a8, nbits, c).astype(np.int32)
    return digits + (np.arange(W, dtype=np.int32) << c)[:, None]


def fixed_base_table(curve_host, base, nbits: int, c: int):
    """Host table: T[w*2^c + m] = m * 2^(c*w) * base (affine, None=inf)."""
    W = -(-nbits // c)
    table = []
    g = base
    for w in range(W):
        acc = None
        for m in range(1 << c):
            table.append(acc)
            acc = curve_host.add(acc, g) if acc is not None else g
        # g <- 2^c * g
        for _ in range(c):
            g = curve_host.double(g)
    return table


def _fixed_base_device(curve, table_aff, digits):
    """digits [W, B] (table-offset encoded); returns projective batch [B]."""
    def step(acc, dg):
        pt = jax.tree.map(lambda t: jnp.take(t, dg, axis=-1), table_aff)
        return curve.madd(acc, pt, canonical_bases=True), None

    B = digits.shape[1]
    acc, _ = jax.lax.scan(step, curve.infinity((B,)), digits)
    return acc


_FIXED_BASE_JIT_CACHE = {}


def fixed_base_batch_mul(curve, curve_key, table_aff, digits):
    if curve_key not in _FIXED_BASE_JIT_CACHE:
        from ..utils.aotcache import AotJit

        _FIXED_BASE_JIT_CACHE[curve_key] = AotJit(
            f"fb_{curve_key}",
            lambda t, d: _fixed_base_device(curve, t, d)
        )
    fn = _FIXED_BASE_JIT_CACHE[curve_key]
    if jax.default_backend() == "cpu":
        # XLA's CPU executable (de)serializer segfaults on exactly this
        # scan+gather program (observed on both the cache-write and
        # cache-read paths under pytest); skip the persistent cache here.
        prev = jax.config.jax_enable_compilation_cache
        try:
            jax.config.update("jax_enable_compilation_cache", False)
            return fn(table_aff, jnp.asarray(digits))
        finally:
            jax.config.update("jax_enable_compilation_cache", prev)
    return fn(table_aff, jnp.asarray(digits))
