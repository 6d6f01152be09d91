"""Epoch-SNARK verification against the reference's pinned proof.

The vk/proof/pubkey hex below are the production test vectors from
crates/bls-snark-sys/src/snark/mod.rs:52-119 ("a proof which we have
verified on our own") — passing this means BW6-761 deserialization,
the epoch commitment hashing, BW6-Fr packing, and Groth16-over-BW6
verification are all bit-compatible with the deployed system.
"""

import pytest

import vectors_snark

from celo_bls_snark_tpu.bls import PublicKey
from celo_bls_snark_tpu.hostmath import bw6
from celo_bls_snark_tpu.hostmath.params import P as R_BW6
from celo_bls_snark_tpu.snark.api import BW6_761_ENGINE, pack, verify, verify_parsed
from celo_bls_snark_tpu.snark.epoch_block import EpochBlock
from celo_bls_snark_tpu.snark import groth16 as g16
from celo_bls_snark_tpu.snark.serialize_bw6 import (
    proof_from_bytes,
    proof_to_bytes,
    vk_from_bytes,
    vk_to_bytes,
)

def _grab(name):
    return bytes.fromhex(getattr(vectors_snark, name))


def _pks(data):
    return [PublicKey.from_bytes(data[i * 96 : (i + 1) * 96]) for i in range(len(data) // 96)]


@pytest.fixture(scope="module")
def pinned():
    return {
        "proof": _grab("ENTROPY_PROOF"),
        "vk": _grab("ENTROPY_VK"),
        "first": EpochBlock(
            0, 0, bytes.fromhex("01" * 16), bytes.fromhex("02" * 16), 1, 4,
            _pks(_grab("ENTROPY_FIRST_PUBKEYS")),
        ),
        "last": EpochBlock(
            2, 0, bytes.fromhex("03" * 16), bytes.fromhex("02" * 16), 1, 4,
            _pks(_grab("ENTROPY_LAST_PUBKEYS")),
        ),
    }


class TestPinnedProof:
    def test_pinned_proof_verifies(self, pinned):
        assert verify(pinned["vk"], pinned["proof"], pinned["first"], pinned["last"])

    def test_swapped_epochs_rejected(self, pinned):
        assert not verify(pinned["vk"], pinned["proof"], pinned["last"], pinned["first"])

    def test_tampered_entropy_rejected(self, pinned):
        # the first-epoch commitment covers the PARENT entropy
        # (epoch_block.rs:122-124); tamper it
        first = pinned["first"]
        tampered = EpochBlock(
            first.index, first.round, first.epoch_entropy, bytes(16),
            first.maximum_non_signers, first.maximum_validators, first.new_public_keys,
        )
        assert not verify(pinned["vk"], pinned["proof"], tampered, pinned["last"])

    def test_serialization_roundtrip(self, pinned):
        vk = vk_from_bytes(pinned["vk"])
        assert vk_to_bytes(vk) == pinned["vk"]
        proof = proof_from_bytes(pinned["proof"])
        assert proof_to_bytes(proof) == pinned["proof"]


class TestBW6:
    def test_bilinearity(self):
        g1, g2 = bw6.G1_GENERATOR, bw6.G2_GENERATOR
        e = bw6.pairing(g1, g2)
        assert bw6.f6_is_one(bw6.f6_pow(e, R_BW6))
        a, b = 1234, 777
        eab = bw6.pairing(bw6.G1.mul(a, g1), bw6.G2.mul(b, g2))
        assert eab == bw6.f6_pow(e, a * b % R_BW6)

    def test_groth16_over_bw6(self):
        """Full setup/prove/verify over the outer curve."""
        from celo_bls_snark_tpu.relations.r1cs import ConstraintSystem
        from celo_bls_snark_tpu.gadgets.vars import FpVar
        from celo_bls_snark_tpu.utils.rngs import XorShiftRng

        E = BW6_761_ENGINE

        def synth(cs, x=None, w=None):
            xv = FpVar.new_input(cs, x)
            wv = FpVar.new_witness(cs, w)
            wv.mul(wv).enforce_equal(xv)

        cs_setup = ConstraintSystem(E.fr, "setup")
        synth(cs_setup)
        pk = g16.generate_parameters(cs_setup, E, XorShiftRng(b"bw6-groth16-test"))
        w = 987654321
        x = w * w % E.fr
        cs = ConstraintSystem(E.fr, "prove")
        synth(cs, x, w)
        proof = g16.create_proof_no_zk(pk, cs, E)
        assert g16.verify_proof(pk.vk, proof, [x], E)
        assert not g16.verify_proof(pk.vk, proof, [x + 1], E)

    def test_pack(self):
        bits = [True] + [False] * 511
        out = pack(bits)
        assert len(out) == 2
        assert out[0] == 1 << 375  # first chunk is 376 bits, BE


class TestGroth16DeviceAccel:
    """Device-backed setup/prover (snark/accel.py) vs the host path: with
    the same rng and r = s = 0 the proving key and proof are DETERMINISTIC,
    so the two paths must agree bit-for-bit."""

    def _synth(self, E):
        from celo_bls_snark_tpu.relations.r1cs import ConstraintSystem
        from celo_bls_snark_tpu.gadgets.vars import FpVar

        def synth(cs, x=None, w=None):
            xv = FpVar.new_input(cs, x)
            wv = FpVar.new_witness(cs, w)
            wv.mul(wv).enforce_equal(xv)
            # a few more rows so the domain/h-query are non-trivial
            a = wv.mul(wv)
            b = a.mul(wv)
            b.mul(wv).enforce_equal(xv.mul(xv))

        return synth

    def _roundtrip(self, E, accel_name):
        from celo_bls_snark_tpu.relations.r1cs import ConstraintSystem
        from celo_bls_snark_tpu.snark.accel import get_accel
        from celo_bls_snark_tpu.utils.rngs import XorShiftRng

        synth = self._synth(E)
        accel = get_accel(accel_name)
        cs_setup = ConstraintSystem(E.fr, "setup")
        synth(cs_setup)
        pk_dev = g16.generate_parameters(
            cs_setup, E, XorShiftRng(b"accel-g16-test00"), accel=accel
        )
        pk_host = g16.generate_parameters(
            cs_setup, E, XorShiftRng(b"accel-g16-test00")
        )
        assert pk_dev == pk_host
        w = 987654321
        x = w * w % E.fr
        cs = ConstraintSystem(E.fr, "prove")
        synth(cs, x, w)
        proof_dev = g16.create_proof_no_zk(pk_dev, cs, E, accel=accel)
        proof_host = g16.create_proof_no_zk(pk_host, cs, E)
        assert proof_dev == proof_host
        assert g16.verify_proof(pk_dev.vk, proof_dev, [x], E)

    def test_bw6_accel_matches_host(self):
        self._roundtrip(BW6_761_ENGINE, "bw6_761")

    def test_bls_accel_matches_host(self):
        from celo_bls_snark_tpu.snark.groth16 import BLS12_377_ENGINE

        self._roundtrip(BLS12_377_ENGINE, "bls12_377")


class TestProvingKeySerialization:
    """setup -> save -> load -> prove round trip (the reference's durable-
    artifact pattern, crates/epoch-snark/tests/e2e.rs:46-52)."""

    def _pk(self, E):
        from celo_bls_snark_tpu.relations.r1cs import ConstraintSystem
        from celo_bls_snark_tpu.gadgets.vars import FpVar
        from celo_bls_snark_tpu.utils.rngs import XorShiftRng

        def synth(cs, x=None, w=None):
            xv = FpVar.new_input(cs, x)
            wv = FpVar.new_witness(cs, w)
            wv.mul(wv).enforce_equal(xv)

        cs = ConstraintSystem(E.fr, "setup")
        synth(cs)
        return g16.generate_parameters(cs, E, XorShiftRng(b"pk-serde-test-00")), synth

    @pytest.mark.parametrize("engine_name,compressed", [
        ("bw6_761", False), ("bw6_761", True),
        ("bls12_377", False), ("bls12_377", True),
    ])
    def test_pk_roundtrip(self, engine_name, compressed):
        from celo_bls_snark_tpu.snark.serialize_pk import pk_to_bytes, pk_from_bytes
        from celo_bls_snark_tpu.snark.groth16 import BLS12_377_ENGINE
        from celo_bls_snark_tpu.relations.r1cs import ConstraintSystem

        E = BW6_761_ENGINE if engine_name == "bw6_761" else BLS12_377_ENGINE
        pk, synth = self._pk(E)
        blob = pk_to_bytes(pk, engine_name, compressed=compressed)
        pk2 = pk_from_bytes(blob, engine_name, compressed=compressed, validate=True)
        assert pk2 == pk
        # prove with the reloaded key, verify under the original vk
        w = 31337
        x = w * w % E.fr
        cs = ConstraintSystem(E.fr, "prove")
        synth(cs, x, w)
        proof = g16.create_proof_no_zk(pk2, cs, E)
        assert g16.verify_proof(pk.vk, proof, [x], E)

    def test_pk_truncation_rejected(self):
        from celo_bls_snark_tpu.snark.serialize_pk import pk_to_bytes, pk_from_bytes

        pk, _ = self._pk(BW6_761_ENGINE)
        blob = pk_to_bytes(pk, "bw6_761")
        with pytest.raises(ValueError):
            pk_from_bytes(blob[:-1], "bw6_761")
        with pytest.raises(ValueError):
            pk_from_bytes(blob + b"\x00", "bw6_761")
