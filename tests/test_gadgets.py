"""R1CS core + gadget layer tests (bitmap, y-to-bit, FpUtils) and Groth16.

Mirrors the reference's gadget test strategy: compute natively, constrain,
assert satisfaction; flip a value, assert violation (SURVEY.md section 4.3).
"""

import random

import pytest

from celo_bls_snark_tpu.relations.r1cs import ConstraintSystem, LinearCombination
from celo_bls_snark_tpu.gadgets.vars import Boolean, FpVar
from celo_bls_snark_tpu.gadgets import bitmap as gbitmap
from celo_bls_snark_tpu.gadgets import y_to_bit as gy2b
from celo_bls_snark_tpu.hostmath.params import P, R, G1_GENERATOR, G2_GENERATOR
from celo_bls_snark_tpu.hostmath import curves as hc, fp, fp2
from celo_bls_snark_tpu.snark import groth16 as g16
from celo_bls_snark_tpu.utils.rngs import XorShiftRng

random.seed(20240821)


class TestR1CSCore:
    def test_mul_constraint(self):
        cs = ConstraintSystem(P, "prove")
        a = FpVar.new_witness(cs, 3)
        b = FpVar.new_witness(cs, 5)
        c = a.mul(b)
        assert c.value == 15
        assert cs.num_constraints == 1
        assert cs.is_satisfied()

    def test_linear_ops_free(self):
        cs = ConstraintSystem(P, "prove")
        a = FpVar.new_witness(cs, 3)
        b = FpVar.new_witness(cs, 5)
        _ = a.add(b).sub(a).neg().mul_const(7)
        assert cs.num_constraints == 0

    def test_setup_mode_counts_match_prove_mode(self):
        def synth(cs):
            a = FpVar.new_witness(cs, 3 if not cs.is_in_setup_mode() else 0)
            b = FpVar.new_witness(cs, 5 if not cs.is_in_setup_mode() else 0)
            a.mul(b).is_eq_zero()
            a.normalize()

        cs1 = ConstraintSystem(P, "setup")
        synth(cs1)
        cs2 = ConstraintSystem(P, "prove")
        synth(cs2)
        assert cs1.num_constraints == cs2.num_constraints
        assert cs1.num_witness == cs2.num_witness

    def test_namespace_attribution(self):
        cs = ConstraintSystem(P, "prove")
        with cs.ns("outer"):
            with cs.ns("inner"):
                FpVar.new_witness(cs, 2).mul(FpVar.new_witness(cs, 3))
        counts = cs.constraint_counts_by_namespace()
        assert counts == {"outer/inner": 1}

    def test_unsatisfied_reporting(self):
        cs = ConstraintSystem(P, "prove")
        with cs.ns("badns"):
            FpVar.new_witness(cs, 5).enforce_equal(FpVar.const(cs, 6))
        idx, trace = cs.which_is_unsatisfied()
        assert idx == 0 and trace == "badns"


class TestBooleans:
    def test_logic_table(self):
        for x in (False, True):
            for y in (False, True):
                cs = ConstraintSystem(P, "prove")
                a = Boolean.new_witness(cs, x)
                b = Boolean.new_witness(cs, y)
                assert a.and_(b).value == (x and y)
                assert a.or_(b).value == (x or y)
                assert a.xor(b).value == (x ^ y)
                assert a.not_().value == (not x)
                assert cs.is_satisfied()

    def test_select(self):
        cs = ConstraintSystem(P, "prove")
        c = Boolean.new_witness(cs, True)
        t = FpVar.new_witness(cs, 11)
        f = FpVar.new_witness(cs, 22)
        assert FpVar.conditionally_select(c, t, f).value == 11
        assert FpVar.conditionally_select(c.not_(), t, f).value == 22
        assert cs.is_satisfied()


class TestBitmap:
    def _run(self, bits, max_occ, value):
        cs = ConstraintSystem(P, "prove")
        bitmap = [Boolean.new_witness(cs, b) for b in bits]
        gbitmap.enforce_maximum_occurrences_in_bitmap(
            cs, bitmap, FpVar.const(cs, max_occ), value
        )
        return cs

    def test_count_zeros_ok(self):
        # bitmap.rs semantics: at most `max` zeros
        assert self._run([1, 0, 1, 0, 1], 2, False).is_satisfied()
        assert self._run([1, 0, 1, 0, 1], 3, False).is_satisfied()

    def test_count_zeros_exceeded(self):
        assert not self._run([1, 0, 0, 0, 1], 2, False).is_satisfied()

    def test_count_ones(self):
        assert self._run([1, 1, 0, 0], 2, True).is_satisfied()
        assert not self._run([1, 1, 1, 0], 2, True).is_satisfied()


class TestYToBit:
    def test_g1_y_to_bit(self):
        for k in [1, 2, 7, 123]:
            pt = hc.G1.mul(k, G1_GENERATOR)
            cs = ConstraintSystem(P, "prove")
            y = FpVar.new_witness(cs, pt[1])
            bit = gy2b.g1_y_to_bit(cs, y)
            assert bit.value == fp.is_greatest(pt[1], P)
            assert cs.is_satisfied()

    def test_g2_y_to_bit(self):
        for k in [1, 2, 7, 123]:
            pt = hc.G2.mul(k, G2_GENERATOR)
            cs = ConstraintSystem(P, "prove")
            y0 = FpVar.new_witness(cs, pt[1][0])
            y1 = FpVar.new_witness(cs, pt[1][1])
            bit = gy2b.g2_y_to_bit(cs, y0, y1)
            assert bit.value == fp2.is_greatest(pt[1])
            assert cs.is_satisfied()

    def test_constraint_count_parity(self):
        """Exact parity with the reference's pinned figures: a checked
        point allocation + y_to_bit costs 1,003 constraints for G1 and
        2,014 for G2 (y_to_bit.rs:211,251)."""
        from celo_bls_snark_tpu.gadgets.curve_vars import G1Var, G2Var

        cs = ConstraintSystem(P, "setup")
        g = G1Var.new_witness_checked(cs, None)
        gy2b.g1_y_to_bit(cs, g.y)
        assert cs.num_constraints == 1003

        cs = ConstraintSystem(P, "setup")
        g = G2Var.new_witness_checked(cs, None)
        gy2b.g2_y_to_bit(cs, g.y.c0, g.y.c1)
        assert cs.num_constraints == 2014

    def test_checked_allocation(self):
        """On-curve witness allocation: valid points and infinity satisfy;
        an off-curve point must not."""
        from celo_bls_snark_tpu.gadgets.curve_vars import G1Var, G2Var

        for pt in [G1_GENERATOR, None]:
            cs = ConstraintSystem(P, "prove")
            G1Var.new_witness_checked(cs, pt)
            assert cs.is_satisfied()
        cs = ConstraintSystem(P, "prove")
        G1Var.new_witness_checked(cs, (G1_GENERATOR[0], G1_GENERATOR[1] + 1))
        assert not cs.is_satisfied()
        for pt in [G2_GENERATOR, None]:
            cs = ConstraintSystem(P, "prove")
            G2Var.new_witness_checked(cs, pt)
            assert cs.is_satisfied()

    def test_g2_y_to_bit_c1_zero_branch(self):
        # c1 == 0: lexicographic falls through to c0
        for c0 in [5, P - 5]:
            cs = ConstraintSystem(P, "prove")
            y0 = FpVar.new_witness(cs, c0)
            y1 = FpVar.new_witness(cs, 0)
            bit = gy2b.g2_y_to_bit(cs, y0, y1)
            assert bit.value == fp2.is_greatest((c0, 0))
            assert cs.is_satisfied()


class TestGroth16:
    def _square_circuit(self, cs, x_pub=None, w=None):
        """TestCircuit parity: knowledge of a square root + padding
        (crates/bls-snark-sys/src/snark/test_helpers.rs:12-59)."""
        x = FpVar.new_input(cs, x_pub)
        wv = FpVar.new_witness(cs, w)
        wv.mul(wv).enforce_equal(x)
        for _ in range(4):
            wv.mul(wv)

    def test_setup_prove_verify(self):
        E = g16.BLS12_377_ENGINE
        cs_setup = ConstraintSystem(E.fr, "setup")
        self._square_circuit(cs_setup)
        rng = XorShiftRng(b"groth16-test-see")
        pk = g16.generate_parameters(cs_setup, E, rng)

        w = 1234567
        x_pub = w * w % E.fr
        cs = ConstraintSystem(E.fr, "prove")
        self._square_circuit(cs, x_pub, w)
        assert cs.is_satisfied()
        proof = g16.create_proof_no_zk(pk, cs, E)
        assert g16.verify_proof(pk.vk, proof, [x_pub], E)
        assert not g16.verify_proof(pk.vk, proof, [x_pub + 1], E)

    def test_groth16_bitmap_circuit(self):
        """Real proof over the bitmap subcircuit (bitmap.rs:89-144)."""
        E = g16.BLS12_377_ENGINE

        def synth(cs, bits):
            bitmap = [Boolean.new_witness(cs, b) for b in bits]
            gbitmap.enforce_maximum_occurrences_in_bitmap(
                cs, bitmap, FpVar.const(cs, 2), False
            )

        cs_setup = ConstraintSystem(E.fr, "setup")
        synth(cs_setup, [False] * 4)
        rng = XorShiftRng(b"groth16-bitmap-s")
        pk = g16.generate_parameters(cs_setup, E, rng)
        cs = ConstraintSystem(E.fr, "prove")
        synth(cs, [True, False, True, False])
        assert cs.is_satisfied()
        proof = g16.create_proof_no_zk(pk, cs, E)
        assert g16.verify_proof(pk.vk, proof, [], E)

    def test_fft_roundtrip(self):
        E = g16.BLS12_377_ENGINE
        n = 8
        omega = g16._root_of_unity(E, n)
        assert pow(omega, n, E.fr) == 1 and pow(omega, n // 2, E.fr) != 1
        vals = [random.randrange(E.fr) for _ in range(n)]
        assert g16.ifft(g16.fft(vals, omega, E.fr), omega, E.fr) == vals
