"""Pedersen CRH + HashToGroup gadgets vs the native (golden-vector-pinned)
implementations — the in-circuit half of the CIP22 try-and-increment."""

import pytest

from celo_bls_snark_tpu.relations.r1cs import ConstraintSystem
from celo_bls_snark_tpu.gadgets.vars import Boolean
from celo_bls_snark_tpu.gadgets.pedersen import pedersen_crh_gadget
from celo_bls_snark_tpu.gadgets.hash_to_group import enforce_hash_to_group
from celo_bls_snark_tpu.hashers.composite import composite_hasher, bh_pedersen_crh
from celo_bls_snark_tpu.hash_to_curve import composite_hash_to_g1_cip22
from celo_bls_snark_tpu.bls import SIG_DOMAIN
from celo_bls_snark_tpu.hostmath import curves as hc
from celo_bls_snark_tpu.hostmath.params import P
from celo_bls_snark_tpu.utils.bits import bits_le_to_bytes_le


def b2bits(data):
    return [(b >> i) & 1 == 1 for b in data for i in range(8)]


class TestPedersenGadget:
    @pytest.mark.parametrize("msg", [b"", b"hello pedersen", bytes(range(48))])
    def test_matches_native(self, msg):
        native_pt = hc.ed_to_affine(bh_pedersen_crh(msg))
        native_bytes = composite_hasher().crh(b"", msg, 96)
        cs = ConstraintSystem(P, "prove")
        bits = [Boolean.new_witness(cs, b) for b in b2bits(msg)]
        pt, crh_bits = pedersen_crh_gadget(cs, bits)
        assert pt.value() == native_pt
        assert bits_le_to_bytes_le([bool(b.value) for b in crh_bits]) == native_bytes
        assert cs.is_satisfied()


@pytest.mark.slow
class TestHashToGroupGadget:
    def _build(self, msg, extra, counter, constraints_for_hash):
        cs = ConstraintSystem(P, "prove")
        cb = [Boolean.new_witness(cs, b) for b in b2bits(bytes([counter]))]
        mb = [Boolean.new_witness(cs, b) for b in b2bits(msg)]
        eb = [Boolean.new_witness(cs, b) for b in b2bits(extra)]
        g1, crh_bits, xof_bits = enforce_hash_to_group(
            cs, cb, mb, eb, constraints_for_hash
        )
        return cs, g1

    def test_matches_native_with_hash_constraints(self):
        h2c = composite_hash_to_g1_cip22()
        msg, extra = b"epoch message for h2g", b"xx"
        native_pt, counter = h2c.hash_with_attempt_cip22(SIG_DOMAIN, msg, extra)
        cs, g1 = self._build(msg, extra, counter, True)
        assert g1.value() == native_pt
        assert cs.is_satisfied()

    def test_matches_native_two_snark_mode(self):
        h2c = composite_hash_to_g1_cip22()
        msg, extra = b"another epoch", b""
        native_pt, counter = h2c.hash_with_attempt_cip22(SIG_DOMAIN, msg, extra)
        cs, g1 = self._build(msg, extra, counter, False)
        assert g1.value() == native_pt
        assert cs.is_satisfied()

    def test_matches_native_non_compat_mode(self):
        """Non-compat (upstream zexe) sign-bit position 383, the
        reference's `--no-default-features` CI leg (hash_to_group.rs:39-44):
        the gadget must track Config.compat_sign_bit and agree with the
        native compat=False hasher."""
        from celo_bls_snark_tpu.utils.config import (
            Config, get_config, set_config,
        )
        from dataclasses import replace

        prev = get_config()
        set_config(replace(prev, compat_sign_bit=383))
        try:
            h2c = composite_hash_to_g1_cip22(compat=False)
            msg, extra = b"epoch message for h2g", b"xx"
            native_pt, counter = h2c.hash_with_attempt_cip22(
                SIG_DOMAIN, msg, extra
            )
            cs, g1 = self._build(msg, extra, counter, True)
            assert g1.value() == native_pt
            assert cs.is_satisfied()
        finally:
            set_config(prev)

    def test_wrong_counter_breaks(self):
        h2c = composite_hash_to_g1_cip22()
        msg, extra = b"epoch message for h2g", b"xx"
        native_pt, counter = h2c.hash_with_attempt_cip22(SIG_DOMAIN, msg, extra)
        # a counter whose candidate x does not decompress raises during
        # witness generation (the native path would have skipped it)
        bad = None
        for c in range(256):
            if c == counter:
                continue
            try:
                cs, g1 = self._build(msg, extra, c, False)
            except AssertionError:
                bad = c
                break
            # if it decompresses, it yields a DIFFERENT point than native
            if g1.value() != native_pt:
                bad = c
                break
        assert bad is not None
