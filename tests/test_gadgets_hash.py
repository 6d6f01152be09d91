"""Blake2s / hash_to_bits gadget tests + the HashToBits helper circuit."""

import pytest

from celo_bls_snark_tpu.hostmath.params import P, R
from celo_bls_snark_tpu.relations.r1cs import ConstraintSystem
from celo_bls_snark_tpu.gadgets.vars import Boolean
from celo_bls_snark_tpu.gadgets.uint32 import UInt32
from celo_bls_snark_tpu.gadgets.blake2s_gadget import blake2s_gadget, blake2s_param_words
from celo_bls_snark_tpu.gadgets.hash_to_bits import hash_to_bits
from celo_bls_snark_tpu.gadgets.pack import multipack, pack_native
from celo_bls_snark_tpu.utils.blake2s import blake2s
from celo_bls_snark_tpu.utils.bits import bits_le_to_bytes_le, bytes_le_to_bits_le
from celo_bls_snark_tpu.hashers import DirectHasher
from celo_bls_snark_tpu.bls import SIG_DOMAIN


def b2bits(data):
    return [(b >> i) & 1 == 1 for b in data for i in range(8)]


def bits2b(bits):
    return bits_le_to_bytes_le(bits)


class TestUInt32:
    def test_ops(self):
        cs = ConstraintSystem(P, "prove")
        a = UInt32.constant(cs, 0xDEADBEEF)
        b = UInt32.new_witness(cs, 0x12345678)
        assert a.xor(b).value() == 0xDEADBEEF ^ 0x12345678
        assert b.rotr(7).value() == ((0x12345678 >> 7) | (0x12345678 << 25)) & 0xFFFFFFFF
        s = UInt32.addmany(cs, [a, b, UInt32.constant(cs, 99)])
        assert s.value() == (0xDEADBEEF + 0x12345678 + 99) & 0xFFFFFFFF
        assert cs.is_satisfied()


class TestBlake2sGadget:
    @pytest.mark.parametrize("msg", [b"", b"hello gadget", b"y" * 71])
    def test_matches_host(self, msg):
        host = blake2s(msg, digest_size=32, person=b"ULforout")
        cs = ConstraintSystem(P, "prove")
        bits = [Boolean.new_witness(cs, b) for b in b2bits(msg)]
        out = blake2s_gadget(cs, bits, blake2s_param_words(person=b"ULforout"))
        assert bits2b([bool(b.value) for b in out]) == host
        assert cs.is_satisfied()

    def test_wrong_witness_unsatisfiable(self):
        cs = ConstraintSystem(P, "prove")
        bits = [Boolean.new_witness(cs, b) for b in b2bits(b"msg")]
        out = blake2s_gadget(cs, bits, blake2s_param_words())
        # tamper an internal witness: flip the final output bit's assignment
        idx = list(out[0].lc().terms.keys())[0]
        kind, widx = idx
        assert kind == "w"
        cs.witness_assignment[widx] ^= 1
        assert not cs.is_satisfied()


class TestHashToBits:
    def test_matches_native_xof(self):
        msg = b"crh-output-bytes-here-48b-worth-of-data-12345678"
        cs = ConstraintSystem(R, "prove")
        bits = [Boolean.new_witness(cs, b) for b in b2bits(msg)]
        out = hash_to_bits(cs, bits, 512, SIG_DOMAIN, True)
        native = DirectHasher().xof(SIG_DOMAIN, msg, 64)
        assert bits2b([bool(b.value) for b in out]) == native
        assert cs.is_satisfied()

    def test_constraints_off_witnesses_native(self):
        msg = b"another message"
        cs = ConstraintSystem(R, "prove")
        bits = [Boolean.new_witness(cs, b) for b in b2bits(msg)]
        n_before = cs.num_constraints
        out = hash_to_bits(cs, bits, 512, SIG_DOMAIN, False)
        native = DirectHasher().xof(SIG_DOMAIN, msg, 64)
        assert bits2b([bool(b.value) for b in out]) == native
        # only booleanity constraints for the witnessed bits
        assert cs.num_constraints - n_before == 512


class TestMultipack:
    def test_matches_native(self):
        cs = ConstraintSystem(R, "prove")
        vals = [True, False, True] * 100
        bits = [Boolean.new_witness(cs, b) for b in vals]
        fps = multipack(cs, bits, 252, as_input=True)
        assert [f.value for f in fps] == pack_native(vals, R, 252)
        assert cs.is_satisfied()


class TestHashToBitsCircuit:
    def test_helper_circuit(self):
        from celo_bls_snark_tpu.snark.hash_to_bits_circuit import (
            HashToBits,
            XOF_INPUT_BITS,
        )
        from celo_bls_snark_tpu.utils.rngs import XorShiftRng

        rng = XorShiftRng(b"hash-to-bits-tst")
        msg_bits = [[bool(rng.gen_u8() & 1) for _ in range(XOF_INPUT_BITS)]]
        msg_bytes = bits_le_to_bytes_le(msg_bits[0])
        xof_bits = bytes_le_to_bits_le(DirectHasher().xof(SIG_DOMAIN, msg_bytes, 64), 512)

        cs = ConstraintSystem(R, "prove")
        HashToBits(msg_bits).generate_constraints(cs)
        assert cs.is_satisfied()
        assert cs.instance_assignment[1:] == HashToBits.public_inputs(msg_bits, xof_bits)
        # setup-mode shape parity
        cs2 = ConstraintSystem(R, "setup")
        HashToBits.empty(1).generate_constraints(cs2)
        assert (cs2.num_constraints, cs2.num_instance) == (
            cs.num_constraints,
            cs.num_instance,
        )
