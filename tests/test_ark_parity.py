"""The ark-parity mode boundary (VERDICT r4 Next #8).

This build's circuit is deliberately leaner than the deployed Celo
constraint system; prove-side byte-parity with arkworks is a documented
non-goal while verify-side interop is exact (the deployed pinned proof
verifies in tests/test_snark_verify.py). These tests turn that prose into
an enforced boundary:

  - the divergence NUMBERS are pinned: our 18,439-constraint BLS verify
    vs the reference's 18,702 (crates/bls-gadgets/src/bls.rs:401 —
    exact pin lives in tests/test_gadgets_pairing.py::
    test_verify_constraint_count; the strictly-cheaper relation is
    asserted here); exact 1,003 / 2,014 y-to-bit parity is pinned in
    tests/test_gadgets.py (y_to_bit.rs:211,251);
  - the circuit matrices are pinned in BOTH sign-bit configs (compat 377
    = deployed Celo, 383 = the reference's non-compat feature), the
    tests/golden_matrices.json analogue of epochs.rs:592-597;
  - requesting Config.ark_parity=True fails fast at setup instead of
    silently producing keys that are not ceremony-compatible.
"""

import json
import os
from dataclasses import replace

import pytest

from celo_bls_snark_tpu.hostmath.params import P
from celo_bls_snark_tpu.relations.r1cs import ConstraintSystem
from celo_bls_snark_tpu.snark.epochs import ValidatorSetUpdate
from celo_bls_snark_tpu.snark.matrix_hash import matrices_hashes
from celo_bls_snark_tpu.utils.config import get_config, set_config

# the reference's pinned count for ONE in-circuit BLS verify; this
# build's checked-allocation circuit is strictly cheaper
REFERENCE_BLS_VERIFY_CONSTRAINTS = 18_702
OUR_BLS_VERIFY_CONSTRAINTS = 18_439


@pytest.fixture
def restore_config():
    base = get_config()
    yield base
    set_config(base)


class TestArkParityBoundary:
    def test_setup_fails_fast_in_ark_parity_mode(self, restore_config):
        from celo_bls_snark_tpu.snark.api import trusted_setup
        from celo_bls_snark_tpu.utils.rngs import XorShiftRng

        set_config(replace(restore_config, ark_parity=True))
        with pytest.raises(NotImplementedError, match="byte-parity"):
            trusted_setup(3, 2, 0, XorShiftRng(b"ark-parity-test0"))

    def test_bls_verify_constraint_divergence(self):
        """The documented divergence: strictly cheaper than the
        reference, at exactly the count pinned in
        test_gadgets_pairing.py::test_verify_constraint_count."""
        assert OUR_BLS_VERIFY_CONSTRAINTS < REFERENCE_BLS_VERIFY_CONSTRAINTS

    def test_matrix_hashes_pinned_both_modes(self, restore_config):
        """epochs.rs:592-597 analogue for BOTH sign-bit configs."""
        path = os.path.join(os.path.dirname(__file__), "golden_matrices.json")
        with open(path) as f:
            want = json.load(f)
        for name, bit in (
            ("validator_set_update_3v_3e", 377),
            ("validator_set_update_3v_3e_bit383", 383),
        ):
            set_config(replace(restore_config, compat_sign_bit=bit))
            cs = ConstraintSystem(P, "setup")
            ValidatorSetUpdate.empty(3, 3).generate_constraints(cs)
            assert matrices_hashes(cs) == want[name], name
        # the two configs must actually differ (the sign-bit read is wired
        # into A) — otherwise the pin would not distinguish the modes
        assert (
            want["validator_set_update_3v_3e"]
            != want["validator_set_update_3v_3e_bit383"]
        )
