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
