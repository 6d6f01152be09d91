"""Batched short-Weierstrass group law on device (G1 over Fq, G2 over Fq2).

Points are homogeneous projective (X, Y, Z) pytrees of limb arrays;
infinity is (0, 1, 0) (Z == 0). The group law is the COMPLETE a=0
addition of Renes-Costello-Batina (EUROCRYPT 2016, Algorithms 7-9): one
formula covers add/double/infinity with NO case selects and NO zero
tests — the XLA-friendly reformulation of arkworks' branchy Jacobian add
(SURVEY.md section 7 hard part (b)), and less than half its multiply
count (12M per add vs ~16M + 7M doubling path + 4 zero tests).

Completeness precondition: inputs lie in the odd-order r-subgroup (the
formulas admit exceptions only at even-torsion points). Every caller
satisfies it: signatures/pubkeys are subgroup-checked at deserialization,
hash-to-curve output is cofactor-cleared, proving/verifying-key elements
are subgroup points, and sums/multiples stay in the subgroup.

Independent field multiplies inside each formula are stacked into single
wide kernel calls (F.mul_many layers): a full complete add is 2 kernel
dispatches of 6 multiplies each.

Host oracle: hostmath/curves.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..hostmath.params import P
from .field import FQ, fq
from . import tower as tw


class _F2Wrap:
    """Adapter giving Fq2 the same callable surface as fq for generic code."""

    add = staticmethod(tw.f2_add)
    sub = staticmethod(tw.f2_sub)
    mul = staticmethod(tw.f2_mul)
    mul_many = staticmethod(tw.f2_mul_batch)
    sq = staticmethod(tw.f2_sq)
    neg = staticmethod(tw.f2_neg)
    inv = staticmethod(tw.f2_inv)
    is_zero = staticmethod(tw.f2_is_zero)
    is_zero_many = staticmethod(tw.f2_is_zero_many)
    eq = staticmethod(tw.f2_eq)
    select = staticmethod(tw.f2_select)
    zeros = staticmethod(tw.f2_zeros)
    ones = staticmethod(tw.f2_ones)

    @staticmethod
    def smul(k, a):
        return tw.f2_smul(k, a)


class _FqWrap:
    add = staticmethod(fq.add)
    sub = staticmethod(fq.sub)
    mul = staticmethod(fq.mul)

    @staticmethod
    def mul_many(pairs):
        return fq.mul_many(pairs)

    sq = staticmethod(fq.sq)
    neg = staticmethod(fq.neg)
    inv = staticmethod(fq.inv)
    is_zero = staticmethod(fq.is_zero)
    is_zero_many = staticmethod(fq.is_zero_many)
    eq = staticmethod(fq.eq)
    select = staticmethod(fq.select)
    zeros = staticmethod(fq.zeros)
    ones = staticmethod(fq.ones)

    @staticmethod
    def smul(k, a):
        return fq.mul_small(a, k)


def make_curve_ops(F, b3_mul):
    """Complete a=0 projective group law over field adapter F.

    b3_mul(t) must return 3*b*t (lazy ok) for the curve constant b:
    a scalar smul for small/rational-looking 3b, one constant multiply
    per component otherwise.
    """

    def infinity(batch):
        return (F.zeros(batch), F.ones(batch), F.zeros(batch))

    def is_infinity(pt):
        return F.is_zero(pt[2])

    def from_affine(xy):
        x, y = xy
        batch = jax.tree.leaves(x)[0].shape[1:]
        return (x, y, F.ones(batch))

    def to_affine(pt):
        """Batched; infinity lanes return (0, 0)."""
        X, Y, Z = pt
        zi = F.inv(Z)  # inv(0) = 0, so infinity lanes collapse to (0, 0)
        xa, ya = F.mul_many([(X, zi), (Y, zi)])
        return (xa, ya)

    def neg(pt):
        return (pt[0], F.neg(pt[1]), pt[2])

    def double(pt):
        # RCB Algorithm 9 (a=0): 6M+2S, two stacked-mul layers, complete.
        X, Y, Z = pt
        t0, t1, t2, xy = F.mul_many([(Y, Y), (Y, Z), (Z, Z), (X, Y)])
        z3 = F.smul(8, t0)
        t2 = b3_mul(t2)
        y3 = F.add(t0, t2)
        t0 = F.sub(t0, F.smul(3, t2))
        X3a, Z3, Y3a, X3b = F.mul_many(
            [(t2, z3), (t1, z3), (t0, y3), (t0, xy)]
        )
        Y3 = F.add(X3a, Y3a)
        X3 = F.smul(2, X3b)
        return (X3, Y3, Z3)

    def add(p1, p2):
        """COMPLETE addition (RCB Algorithm 7, a=0): 12M, two stacked-mul
        layers, no selects, no zero tests. Valid for any pair of
        r-subgroup points including infinity and P == Q."""
        X1, Y1, Z1 = p1
        X2, Y2, Z2 = p2
        m0, m1, m2, m3, m4, m5 = F.mul_many([
            (X1, X2),
            (Y1, Y2),
            (Z1, Z2),
            (F.add(X1, Y1), F.add(X2, Y2)),
            (F.add(Y1, Z1), F.add(Y2, Z2)),
            (F.add(X1, Z1), F.add(X2, Z2)),
        ])
        t3 = F.sub(F.sub(m3, m0), m1)          # (X1+Y1)(X2+Y2)-X1X2-Y1Y2
        t4 = F.sub(F.sub(m4, m1), m2)          # (Y1+Z1)(Y2+Z2)-Y1Y2-Z1Z2
        y3p = F.sub(F.sub(m5, m0), m2)         # (X1+Z1)(X2+Z2)-X1X2-Z1Z2
        x3a = F.smul(3, m0)
        t2b = b3_mul(m2)
        z3a = F.add(m1, t2b)
        t1b = F.sub(m1, t2b)
        y3b = b3_mul(y3p)
        q0, q1, q2, q3, q4, q5 = F.mul_many([
            (t4, y3b), (t3, t1b), (y3b, x3a),
            (t1b, z3a), (x3a, t3), (z3a, t4),
        ])
        return (F.sub(q1, q0), F.add(q3, q2), F.add(q5, q4))

    def tree_select(c, a, b):
        return jax.tree.map(lambda x, y: jnp.where(c[None], x, y), a, b)

    def select(c, a, b):
        return tree_select(c, a, b)

    def madd(p1, a2, canonical_bases=False):
        """COMPLETE MIXED addition (RCB Algorithm 8, a=0): p1 (projective)
        += a2 (affine; (0, 0) encodes infinity). 11M + one select pair for
        the affine-infinity encoding — the Pippenger / fixed-base
        accumulator step.

        canonical_bases=True asserts a2's limbs are CANONICAL (host-packed
        bases are): the infinity test is then a plain all-limbs-zero
        integer compare instead of a REDC half-mul (~8% of the madd)."""
        X1, Y1, Z1 = p1
        x2, y2 = a2
        m0, m1, m2, m3, m4 = F.mul_many([
            (X1, x2),
            (Y1, y2),
            (F.add(X1, Y1), F.add(x2, y2)),
            (y2, Z1),
            (x2, Z1),
        ])
        t3 = F.sub(F.sub(m2, m0), m1)
        t4 = F.add(m3, Y1)
        y3p = F.add(m4, X1)
        x3a = F.smul(3, m0)
        t2b = b3_mul(Z1)
        z3a = F.add(m1, t2b)
        t1b = F.sub(m1, t2b)
        y3b = b3_mul(y3p)
        q0, q1, q2, q3, q4, q5 = F.mul_many([
            (t4, y3b), (t3, t1b), (y3b, x3a),
            (t1b, z3a), (x3a, t3), (z3a, t4),
        ])
        out = (F.sub(q1, q0), F.add(q3, q2), F.add(q5, q4))
        # (0, 0) encodes affine infinity: identity on that lane
        if canonical_bases:
            import functools
            import operator

            inf2 = functools.reduce(
                operator.and_,
                [jnp.all(l == 0, axis=0) for l in jax.tree.leaves((x2, y2))],
            )
            return tree_select(inf2, p1, out)
        inf2x, inf2y = F.is_zero_many([x2, y2])
        return tree_select(inf2x & inf2y, p1, out)

    def scalar_mul_bits(bits, pt):
        """Per-lane scalar mul. bits: [nbits, B] uint32 (MSB first)."""
        batch = jax.tree.leaves(pt[0])[0].shape[1:]
        acc0 = infinity(batch)

        def step(acc, bit):
            acc = double(acc)
            acc_plus = add(acc, pt)
            acc = tree_select(bit != 0, acc_plus, acc)
            return acc, None

        acc, _ = jax.lax.scan(step, acc0, bits)
        return acc

    def scalar_mul_const(k: int, pt):
        """Multiply every lane by the same compile-time scalar."""
        nb = max(1, k.bit_length())
        bits = jnp.asarray(
            [(k >> (nb - 1 - i)) & 1 for i in range(nb)], dtype=jnp.uint32
        )
        batch = jax.tree.leaves(pt[0])[0].shape[1:]
        bits = jnp.broadcast_to(bits[:, None], (nb, *batch))
        return scalar_mul_bits(bits, pt)

    def msum_groups(p, groups: int = 1, fold_lanes: int = 128):
        """Per-group lane sums: [G*B] (G equal contiguous groups) -> [G].

        Two phases, both with compile cost INDEPENDENT of B (a handful of
        kernel call sites instead of log2(B) distinct tree levels):
          1. work-efficient scan-fold: each group [B] -> [fold_lanes],
             accumulating chunks of fold_lanes lanes per scan step (all
             groups ride the same scan, lanes side by side);
          2. recursive-doubling all-reduce on the remaining lanes
             (x += roll-within-group(x, 2^l), log2 rounds).
        """
        G = groups
        total = jax.tree.leaves(p)[0].shape[-1]
        assert total % G == 0, (total, G)
        B = total // G
        L = min(fold_lanes, B)
        # round L down to a power of two
        while L & (L - 1):
            L &= L - 1
        pad = (-B) % L
        if pad:
            infp = infinity((pad,))
            p = jax.tree.map(
                lambda x, i: jnp.concatenate(
                    [
                        x.reshape(*x.shape[:-1], G, B),
                        jnp.broadcast_to(
                            i[..., None, :], (*x.shape[:-1], G, pad)
                        ),
                    ],
                    axis=-1,
                ).reshape(*x.shape[:-1], G * (B + pad)),
                p,
                infp,
            )
            B += pad
        if B > L:
            k = B // L
            chunks = jax.tree.map(
                lambda x: jnp.moveaxis(
                    x.reshape(*x.shape[:-1], G, k, L), -2, 0
                ).reshape(k, *x.shape[:-1], G * L),
                p,
            )
            # chunks leaves: [k, n, G*L]; scan-fold over k
            def step(acc, chunk):
                return add(acc, chunk), None

            first = jax.tree.map(lambda x: x[0], chunks)
            rest = jax.tree.map(lambda x: x[1:], chunks)
            p, _ = jax.lax.scan(step, first, rest)
        # recursive-doubling all-reduce over the last L lanes of each group
        rounds = L.bit_length() - 1

        def body(l, x):
            shift = jnp.left_shift(jnp.int32(1), l)
            rolled = jax.tree.map(
                lambda a: jnp.roll(
                    a.reshape(*a.shape[:-1], G, L), -shift, axis=-1
                ).reshape(a.shape),
                x,
            )
            return add(x, rolled)

        p = jax.lax.fori_loop(0, rounds, body, p)
        return jax.tree.map(
            lambda x: x.reshape(*x.shape[:-1], G, L)[..., 0], p
        )

    def msum(p, fold_lanes: int = 128):
        """Sum over the last batch axis -> batch of size 1."""
        return msum_groups(p, 1, fold_lanes)

    class Ops:
        pass

    ops = Ops()
    ops.F = F
    ops.infinity = infinity
    ops.is_infinity = is_infinity
    ops.from_affine = from_affine
    ops.to_affine = to_affine
    ops.neg = neg
    ops.double = double
    ops.add = add
    ops.select = select
    ops.tree_select = tree_select
    ops.scalar_mul_bits = scalar_mul_bits
    ops.scalar_mul_const = scalar_mul_const
    ops.msum = msum
    ops.msum_groups = msum_groups
    ops.madd = madd
    return ops


class _Fq761Wrap(_FqWrap):
    """BW6-761 base-field adapter (both BW6 G1 and G2 live over Fq761;
    the groups differ only in the curve constant b, i.e. in b3_mul)."""

    from .field import fq761 as _f

    add = staticmethod(_f.add)
    sub = staticmethod(_f.sub)
    mul = staticmethod(_f.mul)
    mul_many = staticmethod(_f.mul_many)
    sq = staticmethod(_f.sq)
    neg = staticmethod(_f.neg)
    inv = staticmethod(_f.inv)
    is_zero = staticmethod(_f.is_zero)
    is_zero_many = staticmethod(_f.is_zero_many)
    eq = staticmethod(_f.eq)
    select = staticmethod(_f.select)
    zeros = staticmethod(_f.zeros)
    ones = staticmethod(_f.ones)

    @staticmethod
    def smul(k, a):
        from .field import fq761 as _f

        return _f.mul_small(a, k)


# --- curve constants: b3_mul(t) = 3*b*t per group --------------------------
#
# BLS12-377 G1: y^2 = x^3 + 1        -> 3b = 3 (scalar)
# BLS12-377 G2: y^2 = x^3 + (0, c1)u-part with c1 = -1/5 (D-type twist):
#   3b = (0, 3c1); (a0 + a1 u)(0 + 3c1 u) = (-5*3c1*a1, 3c1*a0)
#   and -15c1 = 3 mod p, so component 0 is a free smul and component 1 one
#   constant multiply.
# BW6-761 G1:  y^2 = x^3 - 1         -> 3b = -3 (scalar)
# BW6-761 G2:  y^2 = x^3 + 4         -> 3b = 12 (scalar)

from ..hostmath.params import G2_B_C1 as _G2_B_C1


def _b3_mul_g2(t):
    a0, a1 = t
    d = fq.spec.const(3 * _G2_B_C1 % P, a0.shape[1:])
    return (fq.mul_small(a1, 3), fq.mul(a0, d))


g1 = make_curve_ops(_FqWrap, lambda t: _FqWrap.smul(3, t))
g2 = make_curve_ops(_F2Wrap, _b3_mul_g2)
bw6_g1 = make_curve_ops(
    _Fq761Wrap, lambda t: _Fq761Wrap.neg(_Fq761Wrap.smul(3, t))
)
bw6_g2 = make_curve_ops(_Fq761Wrap, lambda t: _Fq761Wrap.smul(12, t))


# --- host <-> device point packing ----------------------------------------

def pack_jac(spec, points):
    """List of affine host points (or None) -> device projective batch,
    for any prime-field spec (FQ for BLS12-377 G1, FQ761 for BW6 G1/G2).
    Infinity packs as (0, 1, 0)."""
    xs, ys, zs = [], [], []
    for pt in points:
        if pt is None:
            xs.append(0)
            ys.append(1)
            zs.append(0)
        else:
            xs.append(pt[0])
            ys.append(pt[1])
            zs.append(1)
    return (spec.pack(xs), spec.pack(ys), spec.pack(zs))


def pack_affine(spec, points):
    """List of affine host points (None = infinity -> (0, 0)) -> (x, y)."""
    xs = [0 if p is None else p[0] for p in points]
    ys = [0 if p is None else p[1] for p in points]
    return (spec.pack(xs), spec.pack(ys))


def unpack_jac(curve, spec, dev_pt):
    """Device projective batch -> list of affine host points (None=infinity).

    Fetches the raw projective coordinates and batch-inverts Z on the HOST
    (Montgomery trick: ONE modular inverse + 3 mulmods per point). A device
    to_affine path existed for small batches but its jit COMPILES a
    761-step pow-inversion chain per curve per process — measured ~100s of
    XLA compile each on the axon service, the round-4 prover's largest
    unaccounted cost (VERDICT r4 Weak #1-3) — while the host path at any
    batch size is pure numpy + bigint with nothing to compile."""
    import numpy as np

    X, Y, Z = dev_pt
    xs = spec.unpack(np.asarray(X))
    ys = spec.unpack(np.asarray(Y))
    zs = spec.unpack(np.asarray(Z))
    p = spec.modulus
    # host Montgomery batch inversion over the non-zero Z lanes
    prefix = [0] * len(zs)
    acc = 1
    for i, z in enumerate(zs):
        prefix[i] = acc
        if z:
            acc = acc * z % p
    inv = pow(acc, -1, p)
    out = [None] * len(zs)
    for i in range(len(zs) - 1, -1, -1):
        z = zs[i]
        if z:
            zi = inv * prefix[i] % p
            inv = inv * z % p
            out[i] = (xs[i] * zi % p, ys[i] * zi % p)
    return out


# --- device batch projective->affine + packed point carrier ----------------

class PointVec:
    """A batch of affine points held as RAW canonical uint16 limb matrices
    (numpy [n_limbs, B] per affine field component; infinity = all-zero
    coordinates). The zero-marshaling point representation between the
    setup's device fixed-base kernels, ProvingKey storage, and the
    prover's MSM base packing — round 4 round-tripped every proving-key
    query through host python ints (fixed_base.unpack = 484 s/setup,
    msm.pack_bases = 22.6 s/prove; VERDICT r4 Next #1/#7).

    Acts as a sequence of host affine points (tuples of python ints,
    None = infinity) for serialization/tests; the bulk conversion is lazy
    and cached."""

    def __init__(self, leaves, spec, template):
        self.leaves = [np.asarray(l) for l in leaves]
        self.spec = spec
        self.template = template  # host affine structure, e.g. (0, 0)
        self._host = None
        self._treedef = jax.tree.structure(template)

    def __len__(self):
        return int(self.leaves[0].shape[-1])

    def to_host_list(self):
        if self._host is None:
            cols = [self.spec.unpack_raw(l) for l in self.leaves]
            pts = []
            for vals in zip(*cols):
                if all(v == 0 for v in vals):
                    pts.append(None)
                else:
                    pts.append(jax.tree.unflatten(self._treedef, list(vals)))
            self._host = pts
        return self._host

    def __iter__(self):
        return iter(self.to_host_list())

    def __getitem__(self, i):
        return self.to_host_list()[i]

    def __eq__(self, other):
        """Sequence equality against any iterable of host affine points
        (ProvingKey dataclass equality compares query vectors)."""
        if isinstance(other, PointVec):
            other = other.to_host_list()
        if isinstance(other, (list, tuple)):
            return self.to_host_list() == list(other)
        return NotImplemented

    def device_montgomery(self, pad_to=None):
        """Device affine tree (Montgomery int32 limbs) shaped like the
        group's pack_fn output: one H2D of uint16 (half the tunnel bytes
        of int32) + one from_raw multiply on device."""
        from .field import ops_for

        fops = ops_for(self.spec)
        B0 = self.leaves[0].shape[-1]
        B = pad_to or B0
        arrs = [
            np.pad(l, ((0, 0), (0, B - B0))) if B > B0 else l
            for l in self.leaves
        ]
        cat = jnp.asarray(np.concatenate(arrs, axis=-1))
        key = ("pv_fromraw", self.spec.name)
        fn = _PV_JIT.get(key)
        if fn is None:
            from ..utils.aotcache import AotJit

            # reduce_2p: from_raw output is < 2p — a zero (infinity)
            # coordinate can come back as exactly p, whose nonzero limbs
            # would defeat madd's all-zero-limb infinity test
            fn = _PV_JIT[key] = AotJit(
                f"pv_fromraw_{self.spec.name}",
                lambda x: fops.reduce_2p(fops.from_raw(x.astype(jnp.int32))),
            )
        dev = fn(cat)
        parts = [
            dev[..., i * B : (i + 1) * B] for i in range(len(self.leaves))
        ]
        return jax.tree.unflatten(self._treedef, parts)


_PV_JIT = {}
_AFFINE_RAW = {}


def make_affine_raw(curve, fops, host_inv, template, tag):
    """Device projective batch -> PointVec, with ONE host modular inverse.

    Montgomery batch inversion fully on device: Hillis-Steele inclusive
    prefix/suffix products of the (infinity-masked) Z column — every
    round is one full-width field multiply, so the program is log2(B)
    kernel dispatches of a single shape (compiles fast, AOT-cacheable) —
    then inv(z_i) = P_{i-1} * S_{i+1} * T^-1 where only T^-1 crosses to
    the host (a handful of bytes). Replaces both the 761-step device
    pow-inversion (~100 s XLA compile per curve) and the host bigint
    unpack path for large batches.

    host_inv: tuple of leaf ints -> tuple of leaf ints (field inverse of
    the total product T, computed on host)."""
    F = curve.F
    from ..utils.aotcache import AotJit

    def _scan_products(zden, B, reverse):
        idx = jnp.arange(B)
        P = zden
        s = 1
        while s < B:
            if reverse:
                rolled = jax.tree.map(lambda a: jnp.roll(a, -s, axis=-1), P)
                edge = idx >= B - s
            else:
                rolled = jax.tree.map(lambda a: jnp.roll(a, s, axis=-1), P)
                edge = idx < s
            rolled = F.select(edge, F.ones((B,)), rolled)
            P = F.mul(P, rolled)
            s <<= 1
        return P

    def _part1(pt):
        X, Y, Z = pt
        B = jax.tree.leaves(Z)[0].shape[-1]
        m = F.is_zero(Z)
        zden = F.select(m, F.ones((B,)), Z)
        Pf = _scan_products(zden, B, reverse=False)
        Sf = _scan_products(zden, B, reverse=True)
        total = jax.tree.map(lambda a: a[..., B - 1 : B], Pf)
        t_raw = [fops.to_raw(l) for l in jax.tree.leaves(total)]
        return Pf, Sf, m, t_raw

    def _part2(pt, Pf, Sf, m, invT):
        X, Y, Z = pt
        B = jax.tree.leaves(Z)[0].shape[-1]
        idx = jnp.arange(B)
        left = jax.tree.map(lambda a: jnp.roll(a, 1, axis=-1), Pf)
        left = F.select(idx < 1, F.ones((B,)), left)      # P_{i-1}
        right = jax.tree.map(lambda a: jnp.roll(a, -1, axis=-1), Sf)
        right = F.select(idx >= B - 1, F.ones((B,)), right)  # S_{i+1}
        invT_b = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (a.shape[0], B)), invT
        )
        zi = F.mul(F.mul(left, right), invT_b)
        xa = F.mul(X, zi)
        ya = F.mul(Y, zi)
        out = []
        for l in jax.tree.leaves((xa, ya)):
            r = fops.to_raw(l)
            out.append(jnp.where(m[None], 0, r).astype(jnp.uint16))
        return out

    aff1 = AotJit(f"aff1_{tag}", _part1)
    aff2 = AotJit(f"aff2_{tag}", _part2)
    spec = fops.spec

    def run(dev_pt):
        Pf, Sf, m, t_raw = aff1(dev_pt)
        t_ints = tuple(spec.unpack_raw(np.asarray(l))[0] for l in t_raw)
        inv_ints = host_inv(t_ints)
        packed = [jnp.asarray(spec.pack([v])) for v in inv_ints]
        # match the field-element structure of Z: bare array for Fp,
        # component tuple for extension fields
        invT = packed[0] if len(packed) == 1 else tuple(packed)
        leaves = aff2(dev_pt, Pf, Sf, m, invT)
        return PointVec([np.asarray(l) for l in leaves], spec, template)

    return run


def affine_raw_fn(curve, fops, host_inv, template, tag):
    key = tag
    if key not in _AFFINE_RAW:
        _AFFINE_RAW[key] = make_affine_raw(curve, fops, host_inv, template, tag)
    return _AFFINE_RAW[key]


def g1_pack(points):
    """List of affine host points (or None) -> device projective batch."""
    return pack_jac(FQ, points)


def g1_unpack(dev_pt):
    """Device projective batch -> list of affine host points (None=infinity)."""
    return unpack_jac(g1, FQ, dev_pt)


def g2_pack(points):
    xs0, xs1, ys0, ys1, zs = [], [], [], [], []
    for pt in points:
        if pt is None:
            xs0.append(0)
            xs1.append(0)
            ys0.append(1)
            ys1.append(0)
            zs.append(0)
        else:
            (x0, x1), (y0, y1) = pt
            xs0.append(x0)
            xs1.append(x1)
            ys0.append(y0)
            ys1.append(y1)
            zs.append(1)
    return (
        (FQ.pack(xs0), FQ.pack(xs1)),
        (FQ.pack(ys0), FQ.pack(ys1)),
        (FQ.pack(zs), FQ.pack([0] * len(zs))),
    )


def g2_unpack(dev_pt):
    """Fetch raw projective coords, HOST Fq2 batch inversion (one modular
    inverse total) — see unpack_jac for why there is no device path."""
    import numpy as np

    from ..hostmath import fp2

    X, Y, Z = dev_pt
    x0 = FQ.unpack(np.asarray(X[0]))
    x1 = FQ.unpack(np.asarray(X[1]))
    y0 = FQ.unpack(np.asarray(Y[0]))
    y1 = FQ.unpack(np.asarray(Y[1]))
    z0 = FQ.unpack(np.asarray(Z[0]))
    z1 = FQ.unpack(np.asarray(Z[1]))
    n = len(z0)
    prefix = [fp2.ONE] * n
    acc = fp2.ONE
    zs = list(zip(z0, z1))
    for i, z in enumerate(zs):
        prefix[i] = acc
        if z != (0, 0):
            acc = fp2.mul(acc, z)
    inv = fp2.inv(acc)
    out = [None] * n
    for i in range(n - 1, -1, -1):
        z = zs[i]
        if z != (0, 0):
            zi = fp2.mul(inv, prefix[i])
            inv = fp2.mul(inv, z)
            out[i] = (
                fp2.mul((x0[i], x1[i]), zi),
                fp2.mul((y0[i], y1[i]), zi),
            )
    return out
