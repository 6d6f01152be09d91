"""Golden-vector tests for the hasher layer (direct + composite).

Mirrors crates/bls-crypto/src/hashers/{direct,composite}.rs test modules.
"""

import pytest

from celo_bls_snark_tpu.hashers import DirectHasher
from celo_bls_snark_tpu.hashers.composite import composite_hasher
from celo_bls_snark_tpu.utils.rngs import XorShiftRng

import vectors as V


class TestDirectHasher:
    def test_crh_empty(self):
        assert DirectHasher().crh(b"", b"", 96).hex() == V.DIRECT_CRH_EMPTY

    def test_crh_random(self):
        msg = V.xorshift_bytes(V.XORSHIFT_SEED_5D, 32)
        assert DirectHasher().crh(b"", msg, 96).hex() == V.DIRECT_CRH_RANDOM

    def test_xof_random_96(self):
        h = DirectHasher()
        msg = V.xorshift_bytes(V.XORSHIFT_SEED_2D, 32)
        res = h.crh(b"", msg, 96)
        assert h.xof(b"ULforxof", res, 96).hex() == V.DIRECT_XOF_RANDOM_96

    def test_hash_random(self):
        msg = V.xorshift_bytes(V.XORSHIFT_SEED_2D, 9820 * 4 // 8)
        assert DirectHasher().hash(b"ULforxof", msg, 96).hex() == V.DIRECT_HASH_RANDOM

    def test_blake2xs_vectors(self):
        h = DirectHasher()
        for inp_hex, out_hex in V.BLAKE2XS_VECTORS:
            got = h.hash(b"", bytes.fromhex(inp_hex), len(out_hex) // 2)
            assert got.hex() == out_hex


class TestCompositeHasher:
    def test_crh_empty(self):
        h = composite_hasher()
        assert h.crh(b"", b"", 96).hex() == V.COMPOSITE_CRH_EMPTY

    def test_crh_random(self):
        h = composite_hasher()
        msg = V.xorshift_bytes(V.XORSHIFT_SEED_5D, 32)
        assert h.crh(b"", msg, 96).hex() == V.COMPOSITE_CRH_RANDOM

    def test_xof_random_96(self):
        h = composite_hasher()
        msg = V.xorshift_bytes(V.XORSHIFT_SEED_2D, 32)
        res = h.crh(b"", msg, 96)
        assert h.xof(b"ULforxof", res, 96).hex() == V.COMPOSITE_XOF_RANDOM_96

    def test_xof_random_768(self):
        h = composite_hasher()
        msg = V.xorshift_bytes(V.XORSHIFT_SEED_2D, 32)
        res = h.crh(b"", msg, 768)
        out = h.xof(b"ULforxof", res, 768)
        assert len(out) == 768
        assert out.hex().startswith(V.COMPOSITE_XOF_RANDOM_768_PREFIX)

    def test_xof_random_769(self):
        h = composite_hasher()
        msg = V.xorshift_bytes(V.XORSHIFT_SEED_0D, 32)
        res = h.crh(b"", msg, 769)
        out = h.xof(b"ULforxof", res, 769)
        assert len(out) == 769
        assert out.hex().startswith(V.COMPOSITE_XOF_RANDOM_769_PREFIX)

    def test_hash_random(self):
        h = composite_hasher()
        msg = V.xorshift_bytes(V.XORSHIFT_SEED_2D, 9820 * 4 // 8)
        assert h.hash(b"ULforxof", msg, 96).hex() == V.COMPOSITE_HASH_RANDOM

    def test_invalid_message(self):
        h = composite_hasher()
        with pytest.raises(ValueError):
            h.hash(b"ULforxof", bytes(1_000_000), 96)
