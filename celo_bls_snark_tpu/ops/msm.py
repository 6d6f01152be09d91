"""Multi-scalar multiplication on device.

The Groth16 prover's MSM workload and the PublicKey/Signature::batch path
(crates/bls-crypto/src/bls/public.rs:47-65, SURVEY.md section 2.5).

TPU-first formulation: "bit-plane" MSM —
    sum_i k_i P_i = sum_b 2^b * (sum_{i : bit b of k_i} P_i)
Each bit-plane sum is a masked log-depth tree reduction (lane-parallel
point adds, no data-dependent scatter — the XLA-friendly replacement for
Pippenger's bucket scatter, SURVEY.md hard part (b)). Amortized cost is
~nbits point-adds per point; the roadmap item for Pippenger parity is a
sort-based segmented bucket reduction.

Sharding: points are batch-sharded across the mesh; per-chip partial
plane-sums combine with one all-gather (parallel/mesh.py::sharded_msm_g1
uses the dense form; msm_* here are the single-chip kernels).
"""

import numpy as np
import jax
import jax.numpy as jnp

from . import curve as dc


def _bitplane_msm(curve, bits, pts_jac):
    """bits: [nbits, B] (MSB first); pts_jac: Jacobian batch [B].
    Returns batch-1 Jacobian point."""
    nbits = bits.shape[0]
    batch = bits.shape[1:]
    inf = curve.infinity(batch)

    def plane_sum(bitrow):
        masked = curve.tree_select(bitrow != 0, pts_jac, inf)
        return curve.msum(masked)

    # accumulate MSB -> LSB with Horner doubling:
    #   acc = 2*acc + plane_sum(bit b)
    def step(acc, bitrow):
        acc = curve.double(acc)
        acc = curve.add(acc, plane_sum(bitrow))
        return acc, None

    acc, _ = jax.lax.scan(step, curve.infinity((1,)), bits)
    return acc


def msm_g1(bits, pts_jac):
    return _bitplane_msm(dc.g1, bits, pts_jac)


def msm_g2(bits, pts_jac):
    return _bitplane_msm(dc.g2, bits, pts_jac)
