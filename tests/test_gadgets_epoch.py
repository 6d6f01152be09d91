"""EpochData gadget vs the native EpochBlock encodings — the reference's
own cross-validation strategy (epoch_data.rs:412-455)."""

import pytest

from celo_bls_snark_tpu.bls import PublicKey
from celo_bls_snark_tpu.hostmath.params import P, R, G2_GENERATOR
from celo_bls_snark_tpu.hostmath import curves as hc
from celo_bls_snark_tpu.relations.r1cs import ConstraintSystem
from celo_bls_snark_tpu.gadgets.vars import FpVar
from celo_bls_snark_tpu.snark.epoch_block import EpochBlock
from celo_bls_snark_tpu.snark.gadgets_epoch import EpochDataGadget


def _bitvals(bits):
    return [bool(b.value) for b in bits]


@pytest.fixture(scope="module")
def epoch():
    pks = [hc.G2.mul(k, G2_GENERATOR) for k in (3, 5, 7)]
    return EpochBlock(
        index=7,
        round=2,
        epoch_entropy=bytes(range(16)),
        parent_entropy=bytes(range(16, 32)),
        maximum_non_signers=1,
        maximum_validators=3,
        new_public_keys=[PublicKey(p) for p in pks],
    )


class TestEpochDataToBits:
    def test_matches_native_encodings(self, epoch):
        cs = ConstraintSystem(P, "prove")
        g = EpochDataGadget(
            epoch.index,
            epoch.round,
            epoch.epoch_entropy,
            epoch.parent_entropy,
            epoch.maximum_non_signers,
            [pk.pt for pk in epoch.new_public_keys],
        )
        (bits, extra, first, last, *_rest) = g.to_bits(cs)
        inner_native, extra_native = epoch.encode_inner_to_bits_cip22()
        assert _bitvals(bits) == [bool(b) for b in inner_native]
        assert _bitvals(extra) == [bool(b) for b in extra_native]
        assert _bitvals(first) == [bool(b) for b in epoch.encode_to_bits_cip22("first")]
        assert _bitvals(last) == [bool(b) for b in epoch.encode_to_bits_cip22("last")]
        assert cs.is_satisfied()

    def test_setup_mode_shape(self, epoch):
        cs1 = ConstraintSystem(P, "setup")
        EpochDataGadget.empty(3).to_bits(cs1)
        cs2 = ConstraintSystem(P, "prove")
        g = EpochDataGadget(
            epoch.index, epoch.round, epoch.epoch_entropy, epoch.parent_entropy,
            epoch.maximum_non_signers, [pk.pt for pk in epoch.new_public_keys],
        )
        g.to_bits(cs2)
        assert cs1.num_constraints == cs2.num_constraints
        assert cs1.num_witness == cs2.num_witness


class TestEnforceNextEpoch:
    def _run(self, prev, idx):
        cs = ConstraintSystem(P, "prove")
        EpochDataGadget.enforce_next_epoch(
            cs, FpVar.new_witness(cs, prev), FpVar.new_witness(cs, idx)
        )
        return cs.is_satisfied()

    def test_sequential_ok(self):
        assert self._run(6, 7)

    def test_gap_fails(self):
        assert not self._run(6, 9)

    def test_dummy_epoch_allowed(self):
        # index 0 marks a dummy epoch: no sequencing constraint
        assert self._run(6, 0)
