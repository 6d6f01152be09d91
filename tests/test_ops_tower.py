"""Device tower arithmetic vs hostmath oracle (CPU backend)."""

import random

import jax
import pytest

from celo_bls_snark_tpu.ops.field import FQ
from celo_bls_snark_tpu.ops import tower as tw
from celo_bls_snark_tpu.hostmath import fp2 as hf2, fq12 as hf12
from celo_bls_snark_tpu.hostmath.params import P

random.seed(20240817)


def rf():
    return random.randrange(P)


def pack2(vals):
    return (FQ.pack([v[0] for v in vals]), FQ.pack([v[1] for v in vals]))


def un2(dev):
    return list(zip(FQ.unpack(dev[0]), FQ.unpack(dev[1])))


def rnd6():
    return tuple((rf(), rf()) for _ in range(3))


def rnd12():
    return (rnd6(), rnd6())


def pack6(vals):
    return tuple(pack2([v[i] for v in vals]) for i in range(3))


def un6(dev):
    cs = [un2(dev[i]) for i in range(3)]
    return [tuple(cs[i][j] for i in range(3)) for j in range(len(cs[0]))]


def pack12(vals):
    return tuple(pack6([v[i] for v in vals]) for i in range(2))


def un12(dev):
    cs = [un6(dev[i]) for i in range(2)]
    return [tuple(cs[i][j] for i in range(2)) for j in range(len(cs[0]))]


B = 4


class TestFq2:
    def test_mul_sq(self):
        a = [(rf(), rf()) for _ in range(B)]
        b = [(rf(), rf()) for _ in range(B)]
        assert un2(jax.jit(tw.f2_mul)(pack2(a), pack2(b))) == [
            hf2.mul(x, y) for x, y in zip(a, b)
        ]
        assert un2(jax.jit(tw.f2_sq)(pack2(a))) == [hf2.sq(x) for x in a]

    def test_add_sub_neg_conj(self):
        a = [(rf(), rf()) for _ in range(B)]
        b = [(rf(), rf()) for _ in range(B)]
        assert un2(tw.f2_add(pack2(a), pack2(b))) == [hf2.add(x, y) for x, y in zip(a, b)]
        assert un2(tw.f2_sub(pack2(a), pack2(b))) == [hf2.sub(x, y) for x, y in zip(a, b)]
        assert un2(tw.f2_neg(pack2(a))) == [hf2.neg(x) for x in a]
        assert un2(tw.f2_conj(pack2(a))) == [hf2.conj(x) for x in a]

    def test_inv(self):
        a = [(rf(), rf()) for _ in range(B)]
        assert un2(jax.jit(tw.f2_inv)(pack2(a))) == [hf2.inv(x) for x in a]

    def test_mul_by_nonresidue(self):
        a = [(rf(), rf()) for _ in range(B)]
        exp = [hf2.mul(x, (0, 1)) for x in a]
        assert un2(tw.f2_mul_by_nonresidue(pack2(a))) == exp


@pytest.mark.slow
class TestFq6Fq12:
    """Bigger graphs — first compile on CPU is slow; run with -m slow
    (exercised on TPU by bench.py every round regardless)."""

    def test_f6_mul(self):
        a = [rnd6() for _ in range(B)]
        b = [rnd6() for _ in range(B)]
        assert un6(jax.jit(tw.f6_mul)(pack6(a), pack6(b))) == [
            hf12.f6_mul(x, y) for x, y in zip(a, b)
        ]

    def test_f12_mul(self):
        a = [rnd12() for _ in range(B)]
        b = [rnd12() for _ in range(B)]
        assert un12(jax.jit(tw.f12_mul)(pack12(a), pack12(b))) == [
            hf12.mul(x, y) for x, y in zip(a, b)
        ]

    def test_f12_inv(self):
        a = [rnd12() for _ in range(B)]
        assert un12(jax.jit(tw.f12_inv)(pack12(a))) == [hf12.inv(x) for x in a]

    def test_f12_frob(self):
        a = [rnd12() for _ in range(B)]
        assert un12(jax.jit(tw.f12_frob)(pack12(a))) == [hf12.frob(x) for x in a]

    def _unitary(self):
        f = rnd12()
        m = hf12.mul(hf12.conj(f), hf12.inv(f))
        return hf12.mul(hf12.frob_n(m, 2), m)

    def test_f12_cyclo_sq(self):
        ms = [self._unitary() for _ in range(B)]
        assert un12(jax.jit(tw.f12_cyclo_sq)(pack12(ms))) == [
            hf12.cyclotomic_sq(m) for m in ms
        ]

    def test_f12_cyclo_sq_long_chain(self):
        """Regression: the +-2z terms bypass the Montgomery multiply, so
        without the in-kernel canonicalization the lazy drift doubles per
        squaring and a chain > ~5 deep silently overflows the 512p budget.
        70 chained squarings must stay bit-exact vs the host oracle."""
        m = self._unitary()

        def chain(a):
            for _ in range(70):
                a = tw.f12_cyclo_sq(a)
            return a

        w = m
        for _ in range(70):
            w = hf12.cyclotomic_sq(w)
        assert un12(jax.jit(chain)(pack12([m])))[0] == w
