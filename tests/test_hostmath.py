"""Host-math invariants: fields, curves, pairing, serialization.

These validate the pure-Python oracle that the TPU kernels are
cross-checked against (mirrors the role of arkworks for the reference).
"""

import pytest

from celo_bls_snark_tpu.hostmath.params import (
    P,
    R,
    X,
    G1_COFACTOR,
    G2_COFACTOR,
    G1_GENERATOR,
    G2_GENERATOR,
)
from celo_bls_snark_tpu.hostmath import fp, fp2, fq12, curves, pairing
from celo_bls_snark_tpu.utils import serialization as ser


class TestFields:
    def test_sqrt_roundtrip(self):
        for v in [2, 5, 1234567, P - 3]:
            s = fp.sqrt(v * v % P, P)
            assert s is not None and s * s % P == v * v % P

    def test_fp2_inv_mul(self):
        a = (123456789, 987654321)
        assert fp2.mul(a, fp2.inv(a)) == fp2.ONE

    def test_fp2_sqrt(self):
        a = (1234567, 7654321)
        a2 = fp2.sq(a)
        s = fp2.sqrt(a2)
        assert s is not None and fp2.sq(s) == a2

    def test_fq12_inv_mul(self):
        a = (((1, 2), (3, 4), (5, 6)), ((7, 8), (9, 10), (11, 12)))
        assert fq12.mul(a, fq12.inv(a)) == fq12.F12_ONE

    def test_frobenius_is_pth_power(self):
        a = (((1, 2), (3, 4), (5, 6)), ((7, 8), (9, 10), (11, 12)))
        assert fq12.frob(a) == fq12.pow_(a, P)


class TestCurves:
    def test_g1_generator(self):
        assert curves.G1.is_on_curve(G1_GENERATOR)
        assert curves.G1.mul(R, G1_GENERATOR) is None

    def test_g2_generator(self):
        assert curves.G2.is_on_curve(G2_GENERATOR)
        assert curves.G2.mul(R, G2_GENERATOR) is None

    def test_curve_counts(self):
        # #E(Fq) = h1 * r = p + 1 - (X+1)
        assert G1_COFACTOR * R == P + 1 - (X + 1)

    def test_add_double_consistency(self):
        g = G1_GENERATOR
        assert curves.G1.add(g, g) == curves.G1.double(g)
        assert curves.G1.mul(5, g) == curves.G1.add(
            curves.G1.mul(2, g), curves.G1.mul(3, g)
        )

    def test_g2_cofactor_clears(self):
        # any decompressed x should land in the subgroup after cofactor mul
        pt = curves.G2.get_point_from_x((7, 11), True)
        i = 7
        while pt is None:
            i += 1
            pt = curves.G2.get_point_from_x((i, 11), True)
        sub = curves.G2.scale_by_cofactor(pt)
        assert curves.G2.mul(R, sub) is None


class TestSerialization:
    def test_g1_roundtrip(self):
        for k in [1, 2, 12345]:
            pt = curves.G1.mul(k, G1_GENERATOR)
            b = ser.g1_to_bytes(pt)
            assert len(b) == 48
            assert ser.g1_from_bytes(b) == pt

    def test_g2_roundtrip(self):
        for k in [1, 2, 12345]:
            pt = curves.G2.mul(k, G2_GENERATOR)
            b = ser.g2_to_bytes(pt)
            assert len(b) == 96
            assert ser.g2_from_bytes(b) == pt

    def test_infinity(self):
        b = ser.g1_to_bytes(None)
        assert b[-1] & 0x40
        assert ser.g1_from_bytes(b) is None

    def test_uncompressed_roundtrip(self):
        pt = curves.G1.mul(77, G1_GENERATOR)
        b = ser.g1_to_bytes(pt, compressed=False)
        assert len(b) == 96
        assert ser.g1_from_bytes(b, compressed=False) == pt

    def test_subgroup_check_rejects(self):
        # a point on the curve but not in the subgroup must fail deserialize
        pt = curves.G1.get_point_from_x(3, True)
        i = 3
        while pt is None or curves.G1.mul(R, pt) is None:
            i += 1
            pt = curves.G1.get_point_from_x(i, True)
        b = ser.g1_to_bytes(pt)
        with pytest.raises(ser.SerializationError):
            ser.g1_from_bytes(b)


class TestPairing:
    def test_bilinearity(self):
        e = pairing.pairing(G1_GENERATOR, G2_GENERATOR)
        assert fq12.is_one(fq12.pow_(e, R))
        a, b = 1234, 56789
        eab = pairing.pairing(
            curves.G1.mul(a, G1_GENERATOR), curves.G2.mul(b, G2_GENERATOR)
        )
        assert eab == fq12.pow_(e, a * b % R)

    def test_product_check(self):
        aP = curves.G1.mul(42, G1_GENERATOR)
        assert pairing.pairing_check(
            [(aP, G2_GENERATOR), (curves.G1.neg(aP), G2_GENERATOR)]
        )
        assert not pairing.pairing_check([(aP, G2_GENERATOR)])
