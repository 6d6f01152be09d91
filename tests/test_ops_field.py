"""Device field kernels vs the hostmath oracle (CPU backend, conv-mul path).

Mirrors the reference's native-vs-kernel cross-validation strategy
(SURVEY.md section 4)."""

import random

import jax
import numpy as np
import pytest

from celo_bls_snark_tpu.ops.field import FQ, FR, FQ761, fq, fr, fq761


random.seed(20240816)
P = FQ.modulus


def rvals(spec, k=8):
    return [random.randrange(spec.modulus) for _ in range(k)]


class TestFq:
    def test_mul(self):
        av, bv = rvals(FQ), rvals(FQ)
        out = FQ.unpack(jax.jit(fq.mul)(FQ.pack(av), FQ.pack(bv)))
        assert out == [x * y % P for x, y in zip(av, bv)]

    def test_mul_edge_cases(self):
        av = [0, 1, P - 1, P - 1, 0, 1]
        bv = [0, P - 1, P - 1, 1, 12345, 1]
        out = FQ.unpack(fq.mul(FQ.pack(av), FQ.pack(bv)))
        assert out == [x * y % P for x, y in zip(av, bv)]

    def test_add_sub_neg(self):
        av, bv = rvals(FQ), rvals(FQ)
        a, b = FQ.pack(av), FQ.pack(bv)
        assert FQ.unpack(jax.jit(fq.add)(a, b)) == [(x + y) % P for x, y in zip(av, bv)]
        assert FQ.unpack(jax.jit(fq.sub)(a, b)) == [(x - y) % P for x, y in zip(av, bv)]
        assert FQ.unpack(jax.jit(fq.neg)(a)) == [(-x) % P for x in av]

    def test_add_edge(self):
        av = [0, P - 1, P - 1, 1]
        bv = [0, 1, P - 1, 0]
        out = FQ.unpack(fq.add(FQ.pack(av), FQ.pack(bv)))
        assert out == [(x + y) % P for x, y in zip(av, bv)]
        assert FQ.unpack(fq.neg(FQ.pack([0, 5]))) == [0, P - 5]

    def test_inv(self):
        av = rvals(FQ, 4)
        out = FQ.unpack(jax.jit(fq.inv)(FQ.pack(av)))
        assert out == [pow(x, -1, P) for x in av]

    def test_mul_small(self):
        av = [0, 1, P - 1, 123]
        out = FQ.unpack(fq.mul_small(FQ.pack(av), 8))
        assert out == [8 * x % P for x in av]

    def test_is_zero_eq_select(self):
        a = FQ.pack([0, 1, 0, 5])
        b = FQ.pack([0, 1, 2, 7])
        assert list(np.asarray(fq.is_zero(a))) == [True, False, True, False]
        assert list(np.asarray(fq.eq(a, b))) == [True, True, False, False]
        c = fq.is_zero(a)
        out = FQ.unpack(fq.select(c, a, b))
        assert out == [0, 1, 0, 7]

    def test_legendre(self):
        av = [4, 9, 2, 0]
        out = list(np.asarray(fq.legendre_is_qr(FQ.pack(av))))
        assert out == [pow(x, (P - 1) // 2, P) == 1 for x in av]

    def test_lazy_representation(self):
        """adds/subs defer carries; a multiply erases the drift."""
        av, bv = rvals(FQ, 4), rvals(FQ, 4)
        a, b = FQ.pack(av), FQ.pack(bv)
        # chain of lazy ops: 8*(a+b) - 3*a - b
        lazy = fq.sub(fq.sub(fq.mul_small(fq.add(a, b), 8), fq.mul_small(a, 3)), b)
        out = FQ.unpack(jax.jit(fq.mul)(lazy, b))
        exp = [((8 * (x + y) - 3 * x - y) % P) * y % P for x, y in zip(av, bv)]
        assert out == exp
        # to_canonical reduces a lazy value to [0, p)
        assert FQ.unpack(fq.to_canonical(lazy)) == [
            (8 * (x + y) - 3 * x - y) % P for x, y in zip(av, bv)
        ]

    def test_mul_many(self):
        av, bv = rvals(FQ, 4), rvals(FQ, 4)
        a, b = FQ.pack(av), FQ.pack(bv)
        outs = fq.mul_many([(a, b), (b, b), (a, a)])
        assert FQ.unpack(outs[0]) == [x * y % P for x, y in zip(av, bv)]
        assert FQ.unpack(outs[1]) == [y * y % P for y in bv]
        assert FQ.unpack(outs[2]) == [x * x % P for x in av]


class TestOtherFields:
    def test_fr_mul(self):
        r = FR.modulus
        av, bv = rvals(FR, 4), rvals(FR, 4)
        out = FR.unpack(fr.mul(FR.pack(av), FR.pack(bv)))
        assert out == [x * y % r for x, y in zip(av, bv)]

    def test_fq761_mul(self):
        q = FQ761.modulus
        av, bv = rvals(FQ761, 2), rvals(FQ761, 2)
        out = FQ761.unpack(fq761.mul(FQ761.pack(av), FQ761.pack(bv)))
        assert out == [x * y % q for x, y in zip(av, bv)]
