"""Batched short-Weierstrass group law on device (G1 over Fq, G2 over Fq2).

Points are Jacobian (X, Y, Z) pytrees of limb arrays; infinity is Z == 0.
All ops are branch-free: doubling/addition edge cases resolve via selects so
one traced graph serves every lane (the XLA-friendly reformulation of
arkworks' branchy Jacobian add — SURVEY.md section 7 hard part (b)).

Independent field multiplies inside each formula are stacked into single
wide kernel calls (F.mul_many layers): a full Jacobian add is ~5 kernel
dispatches instead of ~16.

Host oracle: hostmath/curves.py.
"""

import jax
import jax.numpy as jnp

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


def make_curve_ops(F):
    """Jacobian group law over field adapter F."""

    def infinity(batch):
        return (F.ones(batch), F.ones(batch), F.zeros(batch))

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
        zi2 = F.sq(zi)
        zi3 = F.mul(zi, zi2)
        xa, ya = F.mul_many([(X, zi2), (Y, zi3)])
        return (xa, ya)

    def neg(pt):
        return (pt[0], F.neg(pt[1]), pt[2])

    def double(pt):
        # dbl-2007-bl, 3 stacked-mul layers
        X1, Y1, Z1 = pt
        A, B, YZ = F.mul_many([(X1, X1), (Y1, Y1), (Y1, Z1)])
        E = F.smul(3, A)
        xb = F.add(X1, B)
        C, T, FF = F.mul_many([(B, B), (xb, xb), (E, E)])
        D = F.smul(2, F.sub(T, F.add(A, C)))
        X3 = F.sub(FF, F.smul(2, D))
        (Y3a,) = F.mul_many([(E, F.sub(D, X3))])
        Y3 = F.sub(Y3a, F.smul(8, C))
        Z3 = F.smul(2, YZ)
        return (X3, Y3, Z3)

    def add(p1, p2):
        """Branch-free complete addition (add-2007-bl + selects),
        5 stacked-mul layers plus the doubling path."""
        X1, Y1, Z1 = p1
        X2, Y2, Z2 = p2
        Z1Z1, Z2Z2, Z1Z2, S1a, S2a = F.mul_many(
            [(Z1, Z1), (Z2, Z2), (Z1, Z2), (Y1, Z2), (Y2, Z1)]
        )
        U1, U2, S1, S2 = F.mul_many(
            [(X1, Z2Z2), (X2, Z1Z1), (S1a, Z2Z2), (S2a, Z1Z1)]
        )
        H = F.sub(U2, U1)
        r = F.smul(2, F.sub(S2, S1))
        inf1, inf2, samex, sames = F.is_zero_many([Z1, Z2, H, F.sub(S2, S1)])
        H2 = F.smul(2, H)
        I, r2 = F.mul_many([(H2, H2), (r, r)])
        J, V, ZH = F.mul_many([(H, I), (U1, I), (Z1Z2, H)])
        X3 = F.sub(F.sub(r2, J), F.smul(2, V))
        rV, S1J = F.mul_many([(r, F.sub(V, X3)), (S1, J)])
        Y3 = F.sub(rV, F.smul(2, S1J))
        Z3 = F.smul(2, ZH)
        out = (X3, Y3, Z3)
        # x equal, y equal -> doubling
        dbl = double(p1)
        out = tree_select(samex & sames, dbl, out)
        # x equal, y differ -> infinity
        batch = jax.tree.leaves(Z1)[0].shape[1:]
        out = tree_select(samex & ~sames & ~inf1 & ~inf2, infinity(batch), out)
        # infinity inputs
        out = tree_select(inf1, p2, out)
        out = tree_select(inf2 & ~inf1, p1, out)
        return out

    def tree_select(c, a, b):
        return jax.tree.map(lambda x, y: jnp.where(c[None], x, y), a, b)

    def select(c, a, b):
        return tree_select(c, a, b)

    def madd(p1, a2):
        """Branch-free complete MIXED addition: p1 (Jacobian) += a2
        (affine; (0, 0) encodes infinity). madd-2007-bl + selects — the
        Pippenger / fixed-base accumulator step (11 core muls vs 20 for
        the full Jacobian add)."""
        X1, Y1, Z1 = p1
        x2, y2 = a2
        (Z1Z1,) = F.mul_many([(Z1, Z1)])
        U2, A = F.mul_many([(x2, Z1Z1), (Z1, Z1Z1)])
        H = F.sub(U2, X1)
        S2, HH = F.mul_many([(y2, A), (H, H)])
        rr = F.sub(S2, Y1)
        inf2x, inf2y, inf1, samex, sames = F.is_zero_many(
            [x2, y2, Z1, H, rr]
        )
        r = F.smul(2, rr)
        I = F.smul(4, HH)
        t = F.add(Z1, H)
        J, V, r2, T2 = F.mul_many([(H, I), (X1, I), (r, r), (t, t)])
        X3 = F.sub(F.sub(r2, J), F.smul(2, V))
        Y3a, Y1J = F.mul_many([(r, F.sub(V, X3)), (Y1, J)])
        Y3 = F.sub(Y3a, F.smul(2, Y1J))
        Z3 = F.sub(F.sub(T2, Z1Z1), HH)
        out = (X3, Y3, Z3)
        inf2 = inf2x & inf2y
        dbl = double(p1)
        out = tree_select(samex & sames, dbl, out)
        batch = jax.tree.leaves(Z1)[0].shape[1:]
        out = tree_select(samex & ~sames & ~inf1 & ~inf2, infinity(batch), out)
        out = tree_select(inf1, from_affine(a2), out)
        out = tree_select(inf2, p1, out)
        return out

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
    the a=0 Jacobian formulas are curve-constant-free, so one ops instance
    serves both groups)."""

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


g1 = make_curve_ops(_FqWrap)
g2 = make_curve_ops(_F2Wrap)
bw6_g1 = make_curve_ops(_Fq761Wrap)  # serves BW6 G2 as well


# --- host <-> device point packing ----------------------------------------

def pack_jac(spec, points):
    """List of affine host points (or None) -> device Jacobian batch, for
    any prime-field spec (FQ for BLS12-377 G1, FQ761 for BW6 G1/G2)."""
    xs, ys, zs = [], [], []
    for pt in points:
        if pt is None:
            xs.append(1)
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
    """Device Jacobian batch -> list of affine host points (None=infinity)."""
    import numpy as np

    x, y = curve.to_affine(dev_pt)
    zs = curve.F.is_zero(dev_pt[2])
    xs = spec.unpack(x)
    ys = spec.unpack(y)
    infs = np.asarray(zs).reshape(-1)
    return [None if i else (a, b) for a, b, i in zip(xs, ys, infs)]


def g1_pack(points):
    """List of affine host points (or None) -> device Jacobian batch."""
    return pack_jac(FQ, points)


def g1_unpack(dev_pt):
    """Device Jacobian batch -> list of affine host points (None=infinity)."""
    import numpy as np

    x, y = g1.to_affine(dev_pt)
    zs = fq.is_zero(dev_pt[2])
    xs = FQ.unpack(x)
    ys = FQ.unpack(y)
    infs = np.asarray(zs).reshape(-1)
    return [None if i else (a, b) for a, b, i in zip(xs, ys, infs)]


def g2_pack(points):
    xs0, xs1, ys0, ys1, zs = [], [], [], [], []
    for pt in points:
        if pt is None:
            xs0.append(1)
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
    import numpy as np

    x, y = g2.to_affine(dev_pt)
    zs = tw.f2_is_zero(dev_pt[2])
    x0 = FQ.unpack(x[0])
    x1 = FQ.unpack(x[1])
    y0 = FQ.unpack(y[0])
    y1 = FQ.unpack(y[1])
    infs = np.asarray(zs).reshape(-1)
    return [
        None if i else ((a0, a1), (b0, b1))
        for a0, a1, b0, b1, i in zip(x0, x1, y0, y1, infs)
    ]
