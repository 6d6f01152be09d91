"""Radix-2 NTT over BLS12-377 Fr on device.

The Groth16 prover's FFT workload (SURVEY.md section 2.5: arkworks' rayon
FFT -> sharded butterfly stages). Layout: coefficients as [n_limbs, N] with
N on the lane axis; each stage is one twiddle multiply (a single wide
Montgomery kernel dispatch) plus lazy adds/subs; the permutation network
uses reshapes/rolls only — no gathers.

Host oracle: snark/groth16.py fft() (cross-validated in tests/test_ntt.py).

Sharding: with N lanes split over a mesh axis, the first log2(n_dev) stages
exchange halves across chips; run under shard_map the reshapes lower to
collective permutes (parallel/mesh.py hosts the mesh entry points).
"""

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..hostmath.params import R
from .field import FR, fr


@lru_cache(maxsize=8)
def _twiddle_table(n: int, inverse: bool):
    """Montgomery-packed powers w^0..w^(n/2-1) of the order-n root."""
    from ..snark.groth16 import _root_of_unity, BLS12_377_ENGINE

    w = _root_of_unity(BLS12_377_ENGINE, n)
    if inverse:
        w = pow(w, -1, R)
    powers = []
    acc = 1
    for _ in range(n // 2):
        powers.append(acc)
        acc = acc * w % R
    return np.asarray(FR.pack(powers))


def _bit_reverse_perm(n: int):
    k = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(k):
        rev |= ((idx >> b) & 1) << (k - 1 - b)
    return rev


def ntt(coeffs, inverse=False):
    """coeffs: [n_limbs, N] Montgomery Fr batch; returns the NTT (or
    inverse NTT, scaled by 1/N) in natural order."""
    N = coeffs.shape[-1]
    assert N & (N - 1) == 0
    stages = N.bit_length() - 1
    x = coeffs[:, _bit_reverse_perm(N)]
    master = jnp.asarray(_twiddle_table(N, inverse))  # [n, N/2]
    for s in range(stages):
        half = 1 << s          # butterfly half-width
        stride = N >> (s + 1)  # twiddle stride into the master table
        # twiddles for one block: master[:, ::stride][:, :half], tiled
        tw = master[:, ::stride]  # [n, half]
        x4 = x.reshape(x.shape[0], N // (2 * half), 2, half)
        u = x4[:, :, 0, :]
        v = x4[:, :, 1, :]
        # v * w  (one wide kernel dispatch: [n, blocks*half])
        vflat = v.reshape(x.shape[0], -1)
        twflat = jnp.tile(tw, (1, N // (2 * half)))
        vw = fr.mul(vflat, twflat).reshape(v.shape)
        out_hi = fr.add(u, vw)
        out_lo = fr.sub(u, vw)
        x = jnp.stack([out_hi, out_lo], axis=2).reshape(x.shape[0], N)
    if inverse:
        ninv = FR.const(pow(N, -1, R), (1,))
        x = fr.mul(x, jnp.broadcast_to(ninv, x.shape))
    return x


def coset_ntt(coeffs, g: int):
    """NTT of coeffs(g*X): scale coefficient i by g^i, then NTT."""
    N = coeffs.shape[-1]
    scale = []
    acc = 1
    for _ in range(N):
        scale.append(acc)
        acc = acc * g % R
    gs = jnp.asarray(FR.pack(scale))
    return ntt(fr.mul(coeffs, gs))


def coset_intt(evals, g: int):
    """Inverse of coset_ntt."""
    N = evals.shape[-1]
    x = ntt(evals, inverse=True)
    ginv = pow(g, -1, R)
    scale = []
    acc = 1
    for _ in range(N):
        scale.append(acc)
        acc = acc * ginv % R
    gs = jnp.asarray(FR.pack(scale))
    return fr.mul(x, gs)
