"""Device pairing vs hostmath oracle + end-to-end batch verification.

Marked slow: the Miller-loop/final-exp graphs take ~1 min to compile on
CPU the first time (cached afterwards in .jax_cache). The same kernels are
exercised on real TPU hardware by bench.py every round.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from celo_bls_snark_tpu.hostmath.params import R, G1_GENERATOR, G2_GENERATOR
from celo_bls_snark_tpu.hostmath import curves as hc, pairing as hp
from celo_bls_snark_tpu.ops.field import FQ
from celo_bls_snark_tpu.ops import pairing as dp
from celo_bls_snark_tpu.ops import bls as dbls
from celo_bls_snark_tpu.ops import curve as dc

random.seed(20240819)

pytestmark = pytest.mark.slow


def pack_pairs(ps, qs):
    p_dev = dbls.pack_g1_affine(ps)
    q_dev = dbls.pack_g2_affine(qs)
    return p_dev, q_dev


def un12(dev):
    def un2(d):
        return list(zip(FQ.unpack(d[0]), FQ.unpack(d[1])))

    cs0 = [un2(dev[0][i]) for i in range(3)]
    cs1 = [un2(dev[1][i]) for i in range(3)]
    return [
        (tuple(cs0[i][j] for i in range(3)), tuple(cs1[i][j] for i in range(3)))
        for j in range(len(cs0[0]))
    ]


class TestPairing:
    def test_pairing_matches_host(self):
        ps = [hc.G1.mul(random.randrange(1, R), G1_GENERATOR) for _ in range(2)]
        qs = [hc.G2.mul(random.randrange(1, R), G2_GENERATOR) for _ in range(2)]
        p_dev, q_dev = pack_pairs(ps, qs)

        def full(p, q):
            return dp.final_exponentiation(dp.miller_loop_batch(p, q))

        got = un12(jax.jit(full)(p_dev, q_dev))
        exp = [
            hp.final_exponentiation_3d(hp.miller_loop([(p, q)]))
            for p, q in zip(ps, qs)
        ]
        assert got == exp

    def test_product_check(self):
        a = 424242
        aP = hc.G1.mul(a, G1_GENERATOR)
        # e(aP, Q) * e(-aP, Q) == 1
        ps = [aP, hc.G1.neg(aP)]
        qs = [G2_GENERATOR, G2_GENERATOR]
        p_dev, q_dev = pack_pairs(ps, qs)
        ok = jax.jit(dp.pairing_check_product)(p_dev, q_dev)
        assert bool(np.asarray(ok)[0])
        # and a single pairing is != 1
        bad = jax.jit(dp.pairing_check_product)(
            *pack_pairs([aP], [G2_GENERATOR])
        )
        assert not bool(np.asarray(bad)[0])

    def test_infinity_lanes_skip(self):
        # infinity in either slot contributes f = 1
        aP = hc.G1.mul(7, G1_GENERATOR)
        ps = [aP, None, hc.G1.neg(aP)]
        qs = [G2_GENERATOR, G2_GENERATOR, G2_GENERATOR]
        p_dev, q_dev = pack_pairs(ps, qs)
        ok = jax.jit(dp.pairing_check_product)(p_dev, q_dev)
        assert bool(np.asarray(ok)[0])


class TestDeviceBatchVerify:
    def test_batch_verify_hashes_device(self):
        """Full BDN18 device pipeline vs a synthetic committee."""
        from celo_bls_snark_tpu.bls import PrivateKey, PublicKey, SIG_DOMAIN
        from celo_bls_snark_tpu.hash_to_curve import composite_hash_to_g1_cip22
        from celo_bls_snark_tpu.utils.rngs import XorShiftRng

        rng = XorShiftRng(b"device-batch-ver")
        h2c = composite_hash_to_g1_cip22()
        sks = [PrivateKey.generate(rng) for _ in range(3)]
        apk = PublicKey.aggregate([sk.to_public() for sk in sks])
        sk_sum = sum(sk.sk for sk in sks) % R
        msgs = [b"m1", b"m2"]
        hashes = [h2c.hash(SIG_DOMAIN, m, b"") for m in msgs]
        sigs = [hc.G1.mul(sk_sum, h) for h in hashes]
        asig = hc.G1.msum(sigs)

        sig_aff = dbls.pack_g1_affine([asig])
        hashes_aff = dbls.pack_g1_affine(hashes)
        apk_aff = dbls.pack_g2_affine([apk.pt] * len(msgs))
        ok = jax.jit(dbls.batch_verify_hashes_device)(sig_aff, apk_aff, hashes_aff)
        assert bool(np.asarray(ok)[0])
        # flip: wrong aggregate signature must fail
        bad_sig = dbls.pack_g1_affine([hc.G1.mul(12345, G1_GENERATOR)])
        bad = jax.jit(dbls.batch_verify_hashes_device)(bad_sig, apk_aff, hashes_aff)
        assert not bool(np.asarray(bad)[0])
