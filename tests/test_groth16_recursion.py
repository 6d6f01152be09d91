"""In-circuit Groth16 verification (the 2-SNARK recursion gadget,
epoch_bits.rs:104-132 parity): a real BLS12-377 proof over bit-packed
public inputs is verified inside a BW6-761 constraint system; tampering
with the proof or the bits must make the system unsatisfiable."""

import random

import pytest

from celo_bls_snark_tpu.hostmath.params import R as BLS_R, P as BW_FR
from celo_bls_snark_tpu.relations.r1cs import ConstraintSystem
from celo_bls_snark_tpu.gadgets.vars import Boolean
from celo_bls_snark_tpu.gadgets.pack import multipack, pack_native
from celo_bls_snark_tpu.gadgets.groth16_verify import (
    ProofVar, enforce_groth16_verify,
)
from celo_bls_snark_tpu.snark import groth16 as g16
from celo_bls_snark_tpu.snark.groth16 import BLS12_377_ENGINE
from celo_bls_snark_tpu.utils.rngs import XorShiftRng

pytestmark = pytest.mark.slow

random.seed(20260817)
NBITS = 20


class _InnerCircuit:
    """Tiny BLS12-377 circuit: witness bits exposed as one multipacked
    public input (the HashToBits input-exposure shape)."""

    def __init__(self, bits=None):
        self.bits = bits

    def generate_constraints(self, cs):
        vals = self.bits if self.bits is not None else [False] * NBITS
        bvars = [Boolean.new_witness(cs, b) for b in vals]
        multipack(cs, bvars, NBITS, as_input=True)


@pytest.fixture(scope="module")
def inner():
    cs = ConstraintSystem(BLS_R, "setup")
    _InnerCircuit().generate_constraints(cs)
    pk = g16.generate_parameters(cs, BLS12_377_ENGINE, XorShiftRng(b"recursion-seed00"))
    bits = [random.random() < 0.5 for _ in range(NBITS)]
    cs = ConstraintSystem(BLS_R, "prove")
    _InnerCircuit(bits).generate_constraints(cs)
    proof = g16.create_proof_no_zk(pk, cs, BLS12_377_ENGINE)
    # sanity: native verification with the packed input
    x = pack_native(bits, BLS_R, NBITS)
    assert g16.verify_proof(pk.vk, proof, x, BLS12_377_ENGINE)
    return pk.vk, proof, bits


def _outer_cs(vk, proof, bits):
    cs = ConstraintSystem(BW_FR, "prove")
    bvars = [Boolean.new_witness(cs, b) for b in bits]
    pvar = ProofVar.new_witness(cs, proof)
    enforce_groth16_verify(cs, vk, [bvars], pvar)
    return cs


class TestGroth16Recursion:
    def test_valid_proof_satisfies(self, inner):
        vk, proof, bits = inner
        cs = _outer_cs(vk, proof, bits)
        bad = cs.which_is_unsatisfied()
        assert bad is None, bad

    def test_tampered_proof_unsatisfiable(self, inner):
        from celo_bls_snark_tpu.hostmath import curves as hc

        vk, proof, bits = inner
        bad_proof = g16.Proof(a=hc.G1.double(proof.a), b=proof.b, c=proof.c)
        cs = _outer_cs(vk, bad_proof, bits)
        assert cs.which_is_unsatisfied() is not None

    def test_off_curve_proof_element_unsatisfiable(self, inner):
        """ProofVar allocation is checked (epoch_bits.rs:110 / ark
        ProofVar::new_witness parity): a proof element off the curve —
        which would otherwise turn the Miller loop into a non-pairing —
        must make the outer system unsatisfiable."""
        vk, proof, bits = inner
        ax, ay = proof.a
        bad_proof = g16.Proof(a=(ax, (ay + 1) % BW_FR), b=proof.b, c=proof.c)
        cs = _outer_cs(vk, bad_proof, bits)
        assert cs.which_is_unsatisfied() is not None

    def test_flipped_input_bit_unsatisfiable(self, inner):
        vk, proof, bits = inner
        flipped = [not bits[0]] + bits[1:]
        cs = _outer_cs(vk, proof, flipped)
        assert cs.which_is_unsatisfied() is not None

    def test_setup_mode_synthesizes(self, inner):
        """The outer circuit must synthesize with an absent proof (trusted
        setup path)."""
        vk, _proof, _bits = inner
        cs = ConstraintSystem(BW_FR, "setup")
        bvars = [Boolean.new_witness(cs, False) for _ in range(NBITS)]
        pvar = ProofVar.new_witness(cs, None)
        enforce_groth16_verify(cs, vk, [bvars], pvar)
        assert cs.num_constraints > 0
