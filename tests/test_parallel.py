"""Mesh-sharded pipelines on the 8-device virtual CPU mesh.

The reference has no distributed runtime (SURVEY.md section 2.5); these
tests validate the TPU-native replacement: shard_map data parallelism with
ICI collectives for aggregation/MSM and the sharded pairing product.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from celo_bls_snark_tpu.hostmath.params import R, G1_GENERATOR
from celo_bls_snark_tpu.hostmath import curves as hc
from celo_bls_snark_tpu.parallel import mesh as pmesh
from celo_bls_snark_tpu.ops import bls as dbls
from celo_bls_snark_tpu.ops import curve as dc

random.seed(20240820)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual devices"
    return pmesh.make_mesh(jax.devices()[:8])


class TestShardedAggregation:
    def test_sharded_msum_g1(self, mesh):
        pts = [hc.G1.mul(random.randrange(1, R), G1_GENERATOR) for _ in range(16)]
        out = pmesh.sharded_msum_g1(mesh, dc.g1_pack(pts))
        assert dc.g1_unpack(out)[0] == hc.G1.msum(pts)

    def test_sharded_msm_g1(self, mesh):
        pts = [hc.G1.mul(random.randrange(1, R), G1_GENERATOR) for _ in range(16)]
        scalars = [random.randrange(R) for _ in range(16)]
        bits = jnp.asarray(dbls.scalars_to_bits(scalars))
        out = pmesh.sharded_msm_g1(mesh, bits, dc.g1_pack(pts))
        exp = hc.G1.msum([hc.G1.mul(s, p) for s, p in zip(scalars, pts)])
        assert dc.g1_unpack(out)[0] == exp

    def test_sharded_msm_pippenger(self, mesh):
        """The prover-shaped MSM across the mesh: 199 points (uneven last
        shard, forcing per-chip padding) vs the host oracle."""
        B = 199
        pts = [hc.G1.mul(random.randrange(1, R), G1_GENERATOR) for _ in range(B)]
        scalars = [random.randrange(R) for _ in range(B - 2)] + [0, 1]
        out = pmesh.sharded_msm_pippenger(mesh, pts, scalars, c=4, L=4)
        exp = hc.G1.msum(
            [hc.G1.mul(s, p) if s else None for s, p in zip(scalars, pts)]
        )
        assert out == exp


@pytest.mark.slow
class TestShardedPairing:
    def test_sharded_pairing_check(self, mesh):
        a = 3141592
        aP = hc.G1.mul(a, G1_GENERATOR)
        from celo_bls_snark_tpu.hostmath.params import G2_GENERATOR

        ps = [aP, hc.G1.neg(aP)] * 4
        qs = [G2_GENERATOR] * 8
        p_dev = dbls.pack_g1_affine(ps)
        q_dev = dbls.pack_g2_affine(qs)
        ok = pmesh.sharded_pairing_check(mesh, p_dev, q_dev)
        assert bool(np.asarray(ok)[0])
