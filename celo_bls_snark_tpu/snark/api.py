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


class SynthesisError(Exception):
    """Prover-side failure (ark SynthesisError analogue): unsatisfied
    witness, bad transition count, or an unsupported mode."""


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


@dataclass
class Parameters:
    """Groth16 keys for the epoch circuit (+ optional 2-SNARK helper keys)
    — setup.rs:17-22."""

    epochs: object                  # groth16.ProvingKey over BW6-761
    hash_to_bits: Optional[object]  # groth16.ProvingKey over BLS12-377


def _to_epoch_data(block: EpochBlock):
    from .gadgets_epoch import EpochDataGadget

    return EpochDataGadget(
        block.index,
        block.round,
        block.epoch_entropy,
        block.parent_entropy,
        block.maximum_non_signers,
        [pk.pt for pk in block.new_public_keys],
    )


def _to_update(transition):
    from .single_update import SingleUpdateGadget

    return SingleUpdateGadget(
        _to_epoch_data(transition.block), list(transition.bitmap)
    )


def _to_dummy_update(num_validators: int):
    """prover.rs:146-160: index 0, zero entropy, generator pubkeys,
    all-ones bitmap."""
    from ..hostmath.params import G2_GENERATOR
    from .gadgets_epoch import EpochDataGadget
    from .single_update import SingleUpdateGadget

    return SingleUpdateGadget(
        EpochDataGadget(
            0, 0, bytes(16), bytes(16), 0, [G2_GENERATOR] * num_validators
        ),
        [True] * num_validators,
    )


def trusted_setup(num_validators: int, num_epochs: int, maximum_non_signers: int,
                  rng, hashes_in_bls12_377: bool = False) -> Parameters:
    """setup.rs:30-46. hashes_in_bls12_377=True selects the 2-SNARK split:
    XOF constraints move to a BLS12-377 helper circuit whose Groth16 proof
    the outer circuit must verify in-circuit (epoch_bits.rs:104-132).
    Until that recursion gadget lands, requesting the mode raises — the
    alternative (witnessing XOF bits unchecked) would be unsound."""
    from ..relations.r1cs import ConstraintSystem
    from .epochs import ValidatorSetUpdate

    helper_pk = None
    if hashes_in_bls12_377:
        raise SynthesisError(
            "2-SNARK mode (hashes_in_bls12_377) requires in-circuit Groth16 "
            "verification of the helper proof, which is not implemented yet; "
            "proving with unconstrained XOF witnesses would be unsound"
        )

    cs = ConstraintSystem(BW_FR, "setup")
    circuit = ValidatorSetUpdate.empty(
        num_validators, num_epochs, hash_helper=helper_pk
    )
    circuit.generate_constraints(cs)
    epochs_pk = g16.generate_parameters(cs, BW6_761_ENGINE, rng)
    return Parameters(epochs=epochs_pk, hash_to_bits=helper_pk)


def prove(parameters: Parameters, num_validators: int, initial_epoch: EpochBlock,
          transitions, max_transitions: int = 0):
    """prover.rs:22-82: pad real transitions with dummy updates inserted
    before the final epoch; aggregate all signatures plus one generator per
    dummy; prove the ValidatorSetUpdate circuit (no zk randomization)."""
    from ..hostmath.params import G1_GENERATOR
    from ..hostmath import curves as hcurves
    from ..relations.r1cs import ConstraintSystem
    from .epochs import ValidatorSetUpdate

    if not transitions:
        raise SynthesisError("prove() needs at least one epoch transition")
    num_dummy = 0
    if max_transitions > 0:
        if max_transitions < len(transitions):
            raise SynthesisError(
                f"more transitions ({len(transitions)}) than the circuit "
                f"supports ({max_transitions})"
            )
        num_dummy = max_transitions - len(transitions)
    updates = [_to_update(t) for t in transitions[:-1]]
    updates += [_to_dummy_update(num_validators) for _ in range(num_dummy)]
    updates.append(_to_update(transitions[-1]))

    asig_pt = hcurves.G1.msum(
        [t.aggregate_signature.pt for t in transitions]
        + [G1_GENERATOR] * num_dummy
    )
    circuit = ValidatorSetUpdate(
        _to_epoch_data(initial_epoch),
        updates,
        num_validators,
        asig_pt,
        hash_helper=parameters.hash_to_bits,
    )
    cs = ConstraintSystem(BW_FR, "prove")
    circuit.generate_constraints(cs)
    bad = cs.which_is_unsatisfied()
    if bad is not None:
        raise SynthesisError(
            f"witness generation produced unsatisfied constraint: {bad}"
        )
    return g16.create_proof_no_zk(parameters.epochs, cs, BW6_761_ENGINE)


def verify(vk_bytes: bytes, proof_bytes: bytes, first_epoch: EpochBlock, last_epoch: EpochBlock) -> bool:
    """The C-FFI `verify` (crates/bls-snark-sys/src/snark/mod.rs:23-45):
    byte inputs, boolean output."""
    try:
        vk = vk_from_bytes(vk_bytes)
        proof = proof_from_bytes(proof_bytes)
        return verify_parsed(vk, first_epoch, last_epoch, proof)
    except Exception:
        return False
