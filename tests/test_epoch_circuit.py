"""The full ValidatorSetUpdate circuit: satisfiability, soundness, and
consistency with the native verifier's public-input packing.

Mirrors the reference's circuit-level integration tests
(crates/epoch-snark/src/gadgets/epochs.rs:356-759): a synthetic chain with
per-epoch bitmaps, a dummy-epoch insertion, entropy chaining, and the
packed-public-inputs == instance-assignment assertion.
"""

import pytest

from celo_bls_snark_tpu.hostmath.params import P, G1_GENERATOR
from celo_bls_snark_tpu.hostmath import curves as hc
from celo_bls_snark_tpu.relations.r1cs import ConstraintSystem
from celo_bls_snark_tpu.snark.api import _to_dummy_update, _to_epoch_data, _to_update, pack
from celo_bls_snark_tpu.snark.epoch_block import hash_first_last_epoch_block
from celo_bls_snark_tpu.snark.epochs import ValidatorSetUpdate
from celo_bls_snark_tpu.snark.fixtures import generate_test_data

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def chain():
    initial, transitions, last = generate_test_data(3, 1, 2)
    updates = [
        _to_update(transitions[0]),
        _to_dummy_update(3),
        _to_update(transitions[1]),
    ]
    asig = hc.G1.msum(
        [t.aggregate_signature.pt for t in transitions] + [G1_GENERATOR]
    )
    return initial, transitions, last, updates, asig


def _build(initial, updates, asig):
    cs = ConstraintSystem(P, "prove")
    ValidatorSetUpdate(_to_epoch_data(initial), updates, 3, asig).generate_constraints(cs)
    return cs


class TestValidatorSetUpdate:
    def test_satisfiable_and_inputs_match_verifier(self, chain):
        initial, transitions, last, updates, asig = chain
        cs = _build(initial, updates, asig)
        assert cs.which_is_unsatisfied() is None
        # the circuit's packed public inputs ARE the light-client verifier's
        assert cs.instance_assignment[1:] == pack(
            hash_first_last_epoch_block(initial, last)
        )

    def test_forged_signature_unsatisfiable(self, chain):
        initial, _t, _l, updates, _asig = chain
        cs = _build(initial, updates, hc.G1.mul(7, G1_GENERATOR))
        assert not cs.is_satisfied()

    def test_wrong_entropy_unsatisfiable(self, chain):
        from celo_bls_snark_tpu.snark.epoch_block import EpochBlock
        from celo_bls_snark_tpu.snark.epoch_block import EpochTransition

        initial, transitions, _l, _u, asig = chain
        # break the entropy chain of the second real transition
        t1 = transitions[1]
        bad_block = EpochBlock(
            t1.block.index, t1.block.round, t1.block.epoch_entropy,
            bytes(16), t1.block.maximum_non_signers,
            t1.block.maximum_validators, t1.block.new_public_keys,
        )
        updates = [
            _to_update(transitions[0]),
            _to_dummy_update(3),
            _to_update(EpochTransition(bad_block, t1.aggregate_signature, t1.bitmap)),
        ]
        cs = _build(initial, updates, asig)
        assert not cs.is_satisfied()

    def test_off_curve_pubkey_unsatisfiable(self, chain):
        """A witnessed epoch pubkey OFF the curve must be unsatisfiable:
        the epoch encoding binds only x and the y-sign bit, so without the
        checked allocation (ark epoch_data.rs:194 parity) a malicious
        prover could witness an arbitrary y and feed the pairing gadget a
        non-point."""
        initial, transitions, _l, _u, asig = chain
        updates = [
            _to_update(transitions[0]),
            _to_dummy_update(3),
            _to_update(transitions[1]),
        ]
        ed = updates[0].epoch_data
        x, y = ed.public_keys[0]
        ed.public_keys[0] = (x, ((y[0] + 1) % P, y[1]))
        cs = _build(initial, updates, asig)
        assert not cs.is_satisfied()

    def test_off_curve_signature_unsatisfiable(self, chain):
        """An off-curve aggregated-signature witness must be unsatisfiable
        (ark epochs.rs:304 allocation parity)."""
        initial, _t, _l, updates, asig = chain
        bad_sig = (asig[0], (asig[1] + 1) % P)
        cs = _build(initial, updates, bad_sig)
        assert not cs.is_satisfied()

    def test_xof_streams_match_native_helper_statement(self, chain):
        """The circuit's collected XOF input/output bits must equal the
        native hash-helper statement (api.xof_input_message_bits) — the
        consistency the 2-SNARK recursion relies on."""
        from celo_bls_snark_tpu.bls import SIG_DOMAIN
        from celo_bls_snark_tpu.hashers import DirectHasher
        from celo_bls_snark_tpu.snark.api import _dummy_block, xof_input_message_bits
        from celo_bls_snark_tpu.snark.epochs import ValidatorSetUpdate
        from celo_bls_snark_tpu.utils.bits import bits_le_to_bytes_le, bytes_le_to_bits_le

        initial, transitions, _l, updates, asig = chain
        cs = ConstraintSystem(P, "prove")
        xof_input_bits, xof_bits = ValidatorSetUpdate(
            _to_epoch_data(initial), updates, 3, asig
        ).generate_constraints(cs)
        blocks = [transitions[0].block, _dummy_block(3), transitions[1].block]
        native_inputs = xof_input_message_bits(blocks)
        assert [bool(b.value) for b in xof_input_bits] == [
            b for epoch in native_inputs for b in epoch
        ]
        native_xof = []
        for epoch in native_inputs:
            msg = bits_le_to_bytes_le(epoch)
            native_xof += bytes_le_to_bits_le(
                DirectHasher().xof(SIG_DOMAIN, msg, 64), 512
            )
        assert [bool(b.value) for b in xof_bits] == native_xof

    def test_setup_shape_parity(self, chain):
        initial, _t, _l, updates, asig = chain
        cs = _build(initial, updates, asig)
        cs2 = ConstraintSystem(P, "setup")
        ValidatorSetUpdate.empty(3, 3).generate_constraints(cs2)
        assert (cs2.num_constraints, cs2.num_instance) == (
            cs.num_constraints,
            cs.num_instance,
        )

    def test_matrix_hashes_pinned(self, chain):
        """The epochs.rs:592-597 regression guard: blake2s fingerprints of
        the circuit's A/B/C matrices, pinned in tests/golden_matrices.json.
        Any change to these digests means the deployed circuit changed —
        existing proving/verifying keys stop matching — and must be
        deliberate (regenerate via scripts/regen_golden.py)."""
        import json
        import os

        from celo_bls_snark_tpu.snark.matrix_hash import matrices_hashes

        initial, _t, _l, updates, asig = chain
        cs = _build(initial, updates, asig)
        got = matrices_hashes(cs)
        path = os.path.join(os.path.dirname(__file__), "golden_matrices.json")
        with open(path) as f:
            want = json.load(f)["validator_set_update_3v_3e"]
        assert got == want
