"""Device curve kernels vs hostmath oracle (CPU backend)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from celo_bls_snark_tpu.hostmath.params import R, G1_GENERATOR, G2_GENERATOR
from celo_bls_snark_tpu.hostmath import curves as hc
from celo_bls_snark_tpu.ops import curve as dc
from celo_bls_snark_tpu.ops import bls as dbls

random.seed(20240818)


@pytest.fixture(scope="module")
def g1pts():
    ks = [random.randrange(1, R) for _ in range(8)]
    return ks, [hc.G1.mul(k, G1_GENERATOR) for k in ks]


class TestG1:
    def test_double(self, g1pts):
        _, pts = g1pts
        out = dc.g1_unpack(jax.jit(dc.g1.double)(dc.g1_pack(pts)))
        assert out == [hc.G1.double(p) for p in pts]

    def test_add(self, g1pts):
        _, pts = g1pts
        out = dc.g1_unpack(
            jax.jit(dc.g1.add)(dc.g1_pack(pts), dc.g1_pack(pts[1:] + pts[:1]))
        )
        assert out == [hc.G1.add(a, b) for a, b in zip(pts, pts[1:] + pts[:1])]

    def test_add_special_cases(self, g1pts):
        _, pts = g1pts
        s1 = [pts[0], pts[0], None, pts[1], None]
        s2 = [pts[0], hc.G1.neg(pts[0]), pts[2], None, None]
        out = dc.g1_unpack(jax.jit(dc.g1.add)(dc.g1_pack(s1), dc.g1_pack(s2)))
        assert out == [hc.G1.add(a, b) for a, b in zip(s1, s2)]

    def test_scalar_mul(self, g1pts):
        ks, pts = g1pts
        bits = jnp.asarray(dbls.scalars_to_bits(ks))
        out = dc.g1_unpack(
            jax.jit(dc.g1.scalar_mul_bits)(bits, dc.g1_pack([G1_GENERATOR] * 8))
        )
        assert out == pts

    def test_msum(self, g1pts):
        _, pts = g1pts
        assert dc.g1_unpack(jax.jit(dc.g1.msum)(dc.g1_pack(pts))) == [hc.G1.msum(pts)]
        assert dc.g1_unpack(dc.g1.msum(dc.g1_pack(pts[:7]))) == [hc.G1.msum(pts[:7])]

    def test_msm(self, g1pts):
        ks, pts = g1pts
        scalars = [random.randrange(R) for _ in pts]
        bits = jnp.asarray(dbls.scalars_to_bits(scalars))
        out = dc.g1_unpack(jax.jit(dbls.msm_g1_device)(bits, dc.g1_pack(pts)))
        exp = hc.G1.msum([hc.G1.mul(s, p) for s, p in zip(scalars, pts)])
        assert out == [exp]


@pytest.mark.slow
class TestG2:
    """Fq2-level curve graphs: slower CPU compiles, run with -m slow."""

    def test_add_msum(self):
        qs = [hc.G2.mul(random.randrange(1, R), G2_GENERATOR) for _ in range(4)]
        out = dc.g2_unpack(
            jax.jit(dc.g2.add)(dc.g2_pack(qs), dc.g2_pack(qs[1:] + qs[:1]))
        )
        assert out == [hc.G2.add(a, b) for a, b in zip(qs, qs[1:] + qs[:1])]
        assert dc.g2_unpack(jax.jit(dc.g2.msum)(dc.g2_pack(qs))) == [hc.G2.msum(qs)]


class TestMsumGroupsAndGroupedVerify:
    def test_msum_groups(self, g1pts):
        _, pts = g1pts
        # 2 groups of 4 lanes, fold_lanes smaller than group
        out = dc.g1_unpack(
            jax.jit(lambda p: dc.g1.msum_groups(p, 2, fold_lanes=2))(
                dc.g1_pack(pts)
            )
        )
        assert out == [hc.G1.msum(pts[:4]), hc.G1.msum(pts[4:])]
        # 4 groups of 2
        out = dc.g1_unpack(dc.g1.msum_groups(dc.g1_pack(pts), 4))
        assert out == [hc.G1.msum(pts[i : i + 2]) for i in range(0, 8, 2)]
        # group size not a multiple of fold_lanes (padding path)
        out = dc.g1_unpack(
            dc.g1.msum_groups(dc.g1_pack(pts[:6]), 2, fold_lanes=4)
        )
        assert out == [hc.G1.msum(pts[:3]), hc.G1.msum(pts[3:6])]

    def test_batch_verify_grouped(self):
        """Grouped pairing check == reference semantics; tamper detected."""
        from celo_bls_snark_tpu.hostmath.params import G2_GENERATOR

        sk1, sk2 = 1234567, 7654321
        pk1 = hc.G2.mul(sk1, G2_GENERATOR)
        pk2 = hc.G2.mul(sk2, G2_GENERATOR)
        hs = [hc.G1.mul(3 + i, G1_GENERATOR) for i in range(8)]
        sigs = [hc.G1.mul(sk1, h) for h in hs[:4]] + [
            hc.G1.mul(sk2, h) for h in hs[4:]
        ]
        fn = jax.jit(
            lambda s, h, pk: dbls.batch_verify_grouped_device(s, h, pk, 2)
        )
        ok = fn(dc.g1_pack(sigs), dc.g1_pack(hs), dbls.pack_g2_affine([pk1, pk2]))
        assert bool(np.asarray(ok)[0])
        bad = sigs[:3] + [hc.G1.mul(999, hs[3])] + sigs[4:]
        ok = fn(dc.g1_pack(bad), dc.g1_pack(hs), dbls.pack_g2_affine([pk1, pk2]))
        assert not bool(np.asarray(ok)[0])
        # single group (the bench shape)
        fn1 = jax.jit(
            lambda s, h, pk: dbls.batch_verify_grouped_device(s, h, pk, 1)
        )
        ok = fn1(
            dc.g1_pack(sigs[:4]), dc.g1_pack(hs[:4]), dbls.pack_g2_affine([pk1])
        )
        assert bool(np.asarray(ok)[0])
