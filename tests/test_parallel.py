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


@pytest.fixture(scope="module", autouse=True)
def _fresh_compile_state():
    # By the time the full suite reaches this module it holds hundreds of
    # live XLA:CPU executables, and the big shard_map NTT compiles here
    # have aborted nondeterministically inside backend_compile twice at
    # ~90% of full-suite runs (never in isolation or in pairs). Freeing
    # the accumulated programs first removes the pressure; the module's
    # own jit caches (parallel/mesh.py _JIT_CACHE) re-trace on demand.
    jax.clear_caches()
    pmesh._JIT_CACHE.clear()
    pmesh._PW_JIT.clear()
    yield

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


class TestShardedNTT:
    """Four-step NTT across the mesh vs the single-device kernel."""

    def test_sharded_ntt_matches_single_device(self, mesh):
        from celo_bls_snark_tpu.ops.field import FR
        from celo_bls_snark_tpu.ops import ntt as dntt

        N = 256
        vals = [random.randrange(R) for _ in range(N)]
        x = jnp.asarray(FR.pack(vals))
        want = FR.unpack(dntt.ntt_fr.ntt(x))
        got = FR.unpack(pmesh.sharded_ntt(mesh, x, dntt.ntt_fr))
        assert got == want

    def test_sharded_intt_roundtrip(self, mesh):
        from celo_bls_snark_tpu.ops.field import FR
        from celo_bls_snark_tpu.ops import ntt as dntt

        N = 128
        vals = [random.randrange(R) for _ in range(N)]
        x = jnp.asarray(FR.pack(vals))
        fwd = pmesh.sharded_ntt(mesh, x, dntt.ntt_fr)
        back = FR.unpack(pmesh.sharded_ntt(mesh, fwd, dntt.ntt_fr, inverse=True))
        assert back == vals

    def test_sharded_ntt_bw6_fr(self, mesh):
        """The flagship prover's field (BW6-Fr = BLS12-377 Fq)."""
        from celo_bls_snark_tpu.hostmath.params import P
        from celo_bls_snark_tpu.ops.field import FQ
        from celo_bls_snark_tpu.ops import ntt as dntt

        N = 64
        vals = [random.randrange(P) for _ in range(N)]
        x = jnp.asarray(FQ.pack(vals))
        want = FQ.unpack(dntt.ntt_bw6.ntt(x))
        got = FQ.unpack(pmesh.sharded_ntt(mesh, x, dntt.ntt_bw6))
        assert got == want


class TestBatchedNTT:
    """ntt() on [n, B, N] transforms the last axis per batch row."""

    def test_batched_matches_per_row(self):
        from celo_bls_snark_tpu.ops.field import FR
        from celo_bls_snark_tpu.ops import ntt as dntt

        B, N = 3, 32
        rows = [[random.randrange(R) for _ in range(N)] for _ in range(B)]
        xs = [jnp.asarray(FR.pack(r)) for r in rows]
        batched = jnp.stack(xs, axis=1)  # [n, B, N]
        out = dntt.ntt_fr.ntt(batched)
        for i in range(B):
            assert FR.unpack(out[:, i, :]) == FR.unpack(dntt.ntt_fr.ntt(xs[i]))

    def test_batched_inverse_scaling(self):
        from celo_bls_snark_tpu.ops.field import FR
        from celo_bls_snark_tpu.ops import ntt as dntt

        B, N = 2, 16
        rows = [[random.randrange(R) for _ in range(N)] for _ in range(B)]
        batched = jnp.stack([jnp.asarray(FR.pack(r)) for r in rows], axis=1)
        back = dntt.ntt_fr.ntt(dntt.ntt_fr.ntt(batched), inverse=True)
        for i in range(B):
            assert FR.unpack(back[:, i, :]) == rows[i]
