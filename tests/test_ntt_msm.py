"""Device NTT and MSM kernels vs host oracles."""

import random

import jax
import jax.numpy as jnp
import pytest

from celo_bls_snark_tpu.hostmath.params import R, G1_GENERATOR
from celo_bls_snark_tpu.hostmath import curves as hc
from celo_bls_snark_tpu.ops.field import FR
from celo_bls_snark_tpu.ops import ntt as dntt, msm as dmsm, curve as dc, bls as dbls
from celo_bls_snark_tpu.snark.groth16 import fft, _root_of_unity, BLS12_377_ENGINE

random.seed(20240822)


class TestNTT:
    def test_ntt_matches_host_fft(self):
        N = 64
        vals = [random.randrange(R) for _ in range(N)]
        omega = _root_of_unity(BLS12_377_ENGINE, N)
        out = FR.unpack(jax.jit(dntt.ntt)(jnp.asarray(FR.pack(vals))))
        assert out == fft(vals, omega, R)

    def test_intt_roundtrip(self):
        N = 32
        vals = [random.randrange(R) for _ in range(N)]
        fwd = dntt.ntt(jnp.asarray(FR.pack(vals)))
        back = FR.unpack(dntt.ntt(fwd, inverse=True))
        assert back == vals

    def test_coset_roundtrip(self):
        N = 16
        g = BLS12_377_ENGINE.fr_generator
        vals = [random.randrange(R) for _ in range(N)]
        ev = dntt.coset_ntt(jnp.asarray(FR.pack(vals)), g)
        back = FR.unpack(dntt.coset_intt(ev, g))
        assert back == vals


class TestMSM:
    def test_bitplane_msm_g1(self):
        pts = [hc.G1.mul(random.randrange(1, R), G1_GENERATOR) for _ in range(10)]
        scalars = [random.randrange(R) for _ in range(10)]
        bits = jnp.asarray(dbls.scalars_to_bits(scalars))
        out = dc.g1_unpack(jax.jit(dmsm.msm_g1)(bits, dc.g1_pack(pts)))
        exp = hc.G1.msum([hc.G1.mul(s, p) for s, p in zip(scalars, pts)])
        assert out == [exp]

    def test_msm_with_zero_scalars_and_infinity(self):
        pts = [hc.G1.mul(5, G1_GENERATOR), None, G1_GENERATOR]
        scalars = [3, 7, 0]
        bits = jnp.asarray(dbls.scalars_to_bits(scalars, nbits=8))
        out = dc.g1_unpack(dmsm.msm_g1(bits, dc.g1_pack(pts)))
        assert out == [hc.G1.mul(15, G1_GENERATOR)]


class TestNTTBW6:
    def test_ntt_bw6_fr_matches_host_fft(self):
        from celo_bls_snark_tpu.hostmath.params import P
        from celo_bls_snark_tpu.ops.field import FQ
        from celo_bls_snark_tpu.snark.api import BW6_761_ENGINE

        N = 32
        vals = [random.randrange(P) for _ in range(N)]
        omega = _root_of_unity(BW6_761_ENGINE, N)
        out = FQ.unpack(jax.jit(dntt.ntt_bw6.ntt)(jnp.asarray(FQ.pack(vals))))
        assert out == fft(vals, omega, P)

    def test_coset_roundtrip_bw6(self):
        from celo_bls_snark_tpu.hostmath.params import P
        from celo_bls_snark_tpu.ops.field import FQ
        from celo_bls_snark_tpu.snark.api import BW6_761_ENGINE

        N = 16
        g = BW6_761_ENGINE.fr_generator
        vals = [random.randrange(P) for _ in range(N)]
        ev = dntt.ntt_bw6.coset_ntt(jnp.asarray(FQ.pack(vals)), g)
        back = FQ.unpack(dntt.ntt_bw6.coset_intt(ev, g))
        assert back == vals


class TestMadd:
    def test_madd_g1(self):
        pts = [hc.G1.mul(k, G1_GENERATOR) for k in range(2, 8)]
        jac = dc.g1_pack(pts)
        # generic adds, doubling (same point), affine infinity, jac infinity
        aff_pts = [pts[3], pts[4], pts[1], None, pts[0], hc.G1.neg(pts[5])]
        jacs = [pts[0], pts[1], pts[1], pts[2], None, pts[5]]
        out = dc.g1_unpack(
            jax.jit(dc.g1.madd)(
                dc.g1_pack(jacs), dbls.pack_g1_affine(aff_pts)
            )
        )
        exp = [hc.G1.add(a, b) for a, b in zip(jacs, aff_pts)]
        assert out == exp

    def test_madd_bw6(self):
        from celo_bls_snark_tpu.hostmath import bw6
        from celo_bls_snark_tpu.ops.field import FQ761

        pts = [bw6.G1.mul(k, bw6.G1_GENERATOR) for k in range(2, 6)]
        jacs = [pts[0], pts[1], None, pts[2]]
        affs = [pts[2], pts[1], pts[3], None]
        out = dc.unpack_jac(
            dc.bw6_g1,
            FQ761,
            jax.jit(dc.bw6_g1.madd)(
                dc.pack_jac(FQ761, jacs), dc.pack_affine(FQ761, affs)
            ),
        )
        assert out == [bw6.G1.add(a, b) for a, b in zip(jacs, affs)]


class TestPippenger:
    def test_pippenger_g1_small(self):
        B = 37
        pts = [hc.G1.mul(random.randrange(1, R), G1_GENERATOR) for _ in range(B)]
        scalars = [random.randrange(R) for _ in range(B)]
        out = dmsm.msm_pippenger(pts, scalars, c=4, L=8)
        assert out == hc.G1.msum([hc.G1.mul(s, p) for s, p in zip(scalars, pts)])

    def test_pippenger_skewed_digits(self):
        """0/1-heavy scalars (the witness-vector shape): many points share
        one bucket — the suffix formulation must not care."""
        B = 24
        pts = [hc.G1.mul(3 + i, G1_GENERATOR) for i in range(B)]
        scalars = [1] * 10 + [0] * 8 + [2] * 4 + [random.randrange(R), 1]
        out = dmsm.msm_pippenger(pts, scalars, c=4, L=4)
        assert out == hc.G1.msum(
            [hc.G1.mul(s, p) if s else None for s, p in zip(scalars, pts)]
        )

    def test_c16_fast_plan_matches_generic(self):
        """The c=16 byte-sliced digit plan must equal the generic loop's.
        (Host-only: a 2^16-bucket DEVICE window is TPU-scale — CPU XLA
        cannot compile it in reasonable time, and the real prover exercises
        it on the TPU via scripts/run_e2e.py.)"""
        import numpy as np

        scalars = [random.randrange(R) for _ in range(9)] + [0, 1, R - 1]
        fast = dmsm.plan_msm(scalars, 253, 16, 4)
        slow = dmsm.plan_msm_generic(scalars, 253, 16, 4)
        for a, b in zip(fast, slow):
            assert np.array_equal(a, b)

    def test_pippenger_bw6(self):
        from celo_bls_snark_tpu.hostmath import bw6
        from celo_bls_snark_tpu.hostmath.params import BW6_P, P as BW_FR
        from celo_bls_snark_tpu.ops.field import FQ761

        B = 11
        pts = [bw6.G1.mul(5 + i, bw6.G1_GENERATOR) for i in range(B)]
        scalars = [random.randrange(BW_FR) for _ in range(B)]
        out = dmsm.msm_pippenger(
            pts, scalars, curve=dc.bw6_g1, spec=FQ761, nbits=377, c=4, L=4
        )
        assert out == bw6.G1.msum([bw6.G1.mul(s, p) for s, p in zip(scalars, pts)])


class TestFixedBase:
    def test_fixed_base_batch_mul(self):
        B = 13
        scalars = [random.randrange(R) for _ in range(B)] + [0, 1]
        table = dmsm.fixed_base_table(hc.G1, G1_GENERATOR, nbits=253, c=5)
        from celo_bls_snark_tpu.ops.field import FQ

        table_aff = dc.pack_affine(FQ, table)
        digits = dmsm.fixed_base_plan(scalars, nbits=253, c=5)
        out = dc.g1_unpack(
            dmsm.fixed_base_batch_mul(dc.g1, "g1-test", table_aff, digits)
        )
        assert out == [
            (hc.G1.mul(s, G1_GENERATOR) if s else None) for s in scalars
        ]
