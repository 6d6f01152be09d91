"""BLS layer-1 tests: sign/verify, aggregate, batch, strict batch, cache.

Mirrors the test strategy of crates/bls-crypto/src/bls/*.rs test modules.
"""

import pytest

from celo_bls_snark_tpu.bls import (
    Batch,
    PrivateKey,
    PublicKey,
    PublicKeyCache,
    Signature,
    VerificationFailed,
    UnevenNumKeysMessages,
    byte_count_from_target_batch_size,
)
from celo_bls_snark_tpu.hash_to_curve import (
    composite_hash_to_g1,
    composite_hash_to_g1_cip22,
    direct_hash_to_g1,
)
from celo_bls_snark_tpu.utils.rngs import XorShiftRng


@pytest.fixture(scope="module")
def h2c():
    return composite_hash_to_g1()


def rng():
    return XorShiftRng(b"0123456789abcdef")


class TestSimpleSig:
    def test_simple_sig(self, h2c):
        r = rng()
        for hasher in [h2c, direct_hash_to_g1(), composite_hash_to_g1_cip22()]:
            sk = PrivateKey.generate(r)
            sig = sk.sign(b"hello world", b"", hasher)
            pk = sk.to_public()
            pk.verify(b"hello world", b"", sig, hasher)
            with pytest.raises(VerificationFailed):
                pk.verify(b"goodbye", b"", sig, hasher)

    def test_pop(self, h2c):
        r = rng()
        sk = PrivateKey.generate(r)
        sk2 = PrivateKey.generate(r)
        pk = sk.to_public()
        pk_bytes = pk.to_bytes()
        sig = sk.sign_pop(pk_bytes, h2c)
        pk.verify_pop(pk_bytes, sig, h2c)
        with pytest.raises(VerificationFailed):
            sk2.to_public().verify_pop(pk_bytes, sig, h2c)

    def test_sk_serialization_roundtrip(self):
        sk = PrivateKey.generate(rng())
        assert PrivateKey.from_bytes(sk.to_bytes()).sk == sk.sk


class TestAggregates:
    def test_aggregated_sig(self, h2c):
        r = rng()
        message = b"hello"
        sks = [PrivateKey.generate(r) for _ in range(4)]
        sigs = [sk.sign(message, b"", h2c) for sk in sks]
        apk = PublicKey.aggregate([sk.to_public() for sk in sks])
        asig = Signature.aggregate(sigs)
        apk.verify(message, b"", asig, h2c)
        # a subset pk-aggregate must not verify the full sig-aggregate
        apk_sub = PublicKey.aggregate([sks[0].to_public(), sks[1].to_public()])
        with pytest.raises(VerificationFailed):
            apk_sub.verify(message, b"", asig, h2c)

    def test_batch_verify_distinct_messages(self, h2c):
        r = rng()
        msgs = [(b"m1", b""), (b"m2", b"x"), (b"m3", b"yy")]
        sks = [PrivateKey.generate(r) for _ in msgs]
        sigs = [sk.sign(m, e, h2c) for sk, (m, e) in zip(sks, msgs)]
        agg = Signature.aggregate(sigs)
        agg.batch_verify([sk.to_public() for sk in sks], b"ULforxof", msgs, h2c)
        with pytest.raises(UnevenNumKeysMessages):
            agg.batch_verify([sks[0].to_public()], b"ULforxof", msgs, h2c)

    def test_batch_length_mismatch_returns_none(self):
        r = rng()
        pks = [PrivateKey.generate(r).to_public() for _ in range(2)]
        assert PublicKey.batch([1], pks) is None


class TestStrictBatch:
    def test_exponent_sizing(self):
        # batch.rs:20-28: min(ceil((128+log2 n)/8), 31)
        assert byte_count_from_target_batch_size(1, 128) == 16
        assert byte_count_from_target_batch_size(2, 128) == 17  # ceil(129/8)
        assert byte_count_from_target_batch_size(1 << 20, 128) == 19
        assert byte_count_from_target_batch_size(1 << 126, 128) == 31

    def test_batch_verify(self, h2c):
        r = rng()
        msg, extra = b"block", b"extra"
        batch = Batch(msg, extra)
        for _ in range(4):
            sk = PrivateKey.generate(r)
            batch.add(sk.to_public(), sk.sign(msg, extra, h2c))
        batch.verify(h2c, rng=r)
        batch.verify_each(h2c)

    def test_batch_verify_rejects_planted_bad_sig(self, h2c):
        r = rng()
        msg, extra = b"block", b"extra"
        batch = Batch(msg, extra)
        for _ in range(3):
            sk = PrivateKey.generate(r)
            batch.add(sk.to_public(), sk.sign(msg, extra, h2c))
        bad_sk = PrivateKey.generate(r)
        batch.add(bad_sk.to_public(), bad_sk.sign(b"other message", extra, h2c))
        with pytest.raises(VerificationFailed):
            batch.verify(h2c, rng=r)
        with pytest.raises(VerificationFailed):
            batch.verify_each(h2c)


class TestCache:
    def test_lru_deserialize(self):
        r = rng()
        cache = PublicKeyCache()
        pk = PrivateKey.generate(r).to_public()
        data = pk.to_bytes()
        a = cache.deserialize(data)
        b = cache.deserialize(data)
        assert a is b  # cached instance

    def test_incremental_aggregation(self, h2c):
        r = rng()
        cache = PublicKeyCache()
        pks = [PrivateKey.generate(r).to_public() for _ in range(5)]
        agg1 = cache.aggregate(pks[:3])
        assert agg1 == PublicKey.aggregate(pks[:3])
        # change the set: drop one, add two
        agg2 = cache.aggregate(pks[1:5])
        assert agg2 == PublicKey.aggregate(pks[1:5])
        # unchanged set hits the running sum
        agg3 = cache.aggregate(pks[1:5])
        assert agg3 == agg2


class TestStrictBatchDevice:
    def test_matches_host_batch_verify(self):
        """ops/bls.py strict_batch_verify_device vs the host Batch.verify
        semantics (batch.rs:44-84): same random exponents -> per-epoch
        booleans; a planted bad signature flips exactly its epoch."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from celo_bls_snark_tpu.hostmath.params import R
        from celo_bls_snark_tpu.hostmath import curves as hcurves
        from celo_bls_snark_tpu.bls import PrivateKey, SIG_DOMAIN
        from celo_bls_snark_tpu.bls.batch import (
            byte_count_from_target_batch_size, SECURITY_BOUND,
        )
        from celo_bls_snark_tpu.hash_to_curve import composite_hash_to_g1_cip22
        from celo_bls_snark_tpu.utils.rngs import XorShiftRng
        from celo_bls_snark_tpu.ops import bls as dbls
        from celo_bls_snark_tpu.ops import curve as dc
        from celo_bls_snark_tpu.ops import msm as dmsm

        G, V = 3, 4
        rng = XorShiftRng(b"strictbatchdev01")
        h2c = composite_hash_to_g1_cip22()
        hashes = [h2c.hash(SIG_DOMAIN, b"epoch %d" % g, b"") for g in range(G)]
        sks = [PrivateKey.generate(rng) for _ in range(G * V)]
        pks = [sk.to_public().pt for sk in sks]
        sigs = [
            hcurves.G1.mul(sks[g * V + i].sk, hashes[g])
            for g in range(G) for i in range(V)
        ]
        # plant a bad signature in epoch 1
        bad = list(sigs)
        bad[1 * V + 2] = hcurves.G1.mul(12345, hashes[1])

        exp_size = byte_count_from_target_batch_size(V, SECURITY_BOUND)
        exps = [rng.gen_u64() | (rng.gen_u64() << 64) for _ in range(G * V)]
        exps = [e % (1 << (8 * exp_size)) for e in exps]
        digits = jnp.asarray(dmsm.window_digits(exps, 8 * exp_size, 4))
        h_aff = dc.g1.to_affine(dc.g1_pack(hashes))
        pks_jac = dc.g2_pack(pks)

        fn = jax.jit(lambda d, s, p, h: dbls.strict_batch_verify_device(
            d, s, p, h, G, c=4))
        ok = np.asarray(fn(digits, dc.g1_pack(sigs), pks_jac, h_aff))
        assert ok.tolist() == [True] * G
        ok_bad = np.asarray(fn(digits, dc.g1_pack(bad), pks_jac, h_aff))
        assert ok_bad.tolist() == [True, False, True]
