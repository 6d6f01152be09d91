"""Epoch-SNARK public API (crates/epoch-snark/src/api/).

verify() is fully functional: constant-size light-client check of an epoch
transition proof (verifier.rs:23-40) — recompute the two Blake2s commitment
hashes, pack to BW6-Fr public inputs, Groth16-verify over BW6-761.

trusted_setup()/prove() for the full ValidatorSetUpdate circuit are the
layer-3 continuation (gadget curve/pairing vars); see snark/epochs.py for
the circuit scaffolding and ROADMAP.md.
"""

from dataclasses import dataclass
from typing import Optional

from ..hostmath.params import P as BW_FR
from ..hostmath import bw6
from .epoch_block import EpochBlock, hash_first_last_epoch_block
from . import groth16 as g16
from .groth16 import Engine, Proof, VerifyingKey
from .serialize_bw6 import proof_from_bytes, vk_from_bytes


BW6_761_ENGINE = Engine(
    "bw6_761",
    BW_FR,
    bw6.G1,
    bw6.G2,
    bw6.G1_GENERATOR,
    bw6.G2_GENERATOR,
    bw6.pairing_check,
    46,
    g16._find_fr_generator(BW_FR, 46),
)

# BW6-Fr (== BLS12-377 Fq) capacity: MODULUS_BITS - 1
FR_CAPACITY = BW_FR.bit_length() - 1


def pack(bits):
    """BE bit-chunks -> field elements (gadgets/mod.rs:75-83)."""
    out = []
    for i in range(0, len(bits), FR_CAPACITY):
        chunk = bits[i : i + FR_CAPACITY]
        v = 0
        for b in chunk:
            v = (v << 1) | int(bool(b))
        out.append(v % BW_FR)
    return out


def verify_parsed(vk: VerifyingKey, first_epoch: EpochBlock, last_epoch: EpochBlock, proof: Proof) -> bool:
    """epoch_snark::verify with already-deserialized objects."""
    bits = hash_first_last_epoch_block(first_epoch, last_epoch)
    public_inputs = pack(bits)
    return g16.verify_proof(vk, proof, public_inputs, BW6_761_ENGINE)


def verify(vk_bytes: bytes, proof_bytes: bytes, first_epoch: EpochBlock, last_epoch: EpochBlock) -> bool:
    """The C-FFI `verify` (crates/bls-snark-sys/src/snark/mod.rs:23-45):
    byte inputs, boolean output."""
    try:
        vk = vk_from_bytes(vk_bytes)
        proof = proof_from_bytes(proof_bytes)
        return verify_parsed(vk, first_epoch, last_epoch, proof)
    except Exception:
        return False
