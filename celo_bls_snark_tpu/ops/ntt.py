"""Radix-2 NTT on device, over any prime field with enough 2-adicity.

The Groth16 prover's FFT workload (SURVEY.md section 2.5: arkworks' rayon
FFT -> sharded butterfly stages). Instances: BLS12-377 Fr (253-bit,
2-adicity 47) and BW6-761 Fr (= BLS12-377 Fq, 377-bit, 2-adicity 46) — the
latter is the field of the flagship epoch-circuit prover.

Layout: coefficients as [n_limbs, N] with N on the lane axis; each stage is
one twiddle multiply (a single wide Montgomery kernel dispatch) plus lazy
adds/subs; the permutation network uses reshapes only — no gathers.

Host oracle: snark/groth16.py fft() (cross-validated in tests).
"""

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..hostmath.params import R, P
from .field import FR, FQ, fr, fq


def _bit_reverse_perm(n: int):
    k = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(k):
        rev |= ((idx >> b) & 1) << (k - 1 - b)
    return rev


class NttOps:
    """NTT over one prime field. `root_fn(n)` returns a primitive n-th root
    of unity (host int)."""

    def __init__(self, field_ops, spec, modulus, root_fn):
        self.f = field_ops
        self.spec = spec
        self.r = modulus
        self.root_fn = root_fn
        self._twiddles = lru_cache(maxsize=8)(self._twiddle_table)

    def _twiddle_table(self, n: int, inverse: bool):
        """Montgomery-packed powers w^0..w^(n/2-1) of the order-n root."""
        w = self.root_fn(n)
        if inverse:
            w = pow(w, -1, self.r)
        powers = []
        acc = 1
        for _ in range(n // 2):
            powers.append(acc)
            acc = acc * w % self.r
        return np.asarray(self.spec.pack(powers))

    def ntt(self, coeffs, inverse=False):
        """coeffs: [n_limbs, N] Montgomery batch; returns the NTT (or
        inverse NTT, scaled by 1/N) in natural order."""
        f, spec = self.f, self.spec
        N = coeffs.shape[-1]
        assert N & (N - 1) == 0
        stages = N.bit_length() - 1
        x = coeffs[:, _bit_reverse_perm(N)]
        master = jnp.asarray(self._twiddles(N, inverse))  # [n, N/2]
        for s in range(stages):
            half = 1 << s          # butterfly half-width
            stride = N >> (s + 1)  # twiddle stride into the master table
            tw = master[:, ::stride]  # [n, half]
            x4 = x.reshape(x.shape[0], N // (2 * half), 2, half)
            u = x4[:, :, 0, :]
            v = x4[:, :, 1, :]
            # v * w  (one wide kernel dispatch: [n, blocks*half])
            vflat = v.reshape(x.shape[0], -1)
            twflat = jnp.tile(tw, (1, N // (2 * half)))
            vw = f.mul(vflat, twflat).reshape(v.shape)
            out_hi = f.add(u, vw)
            out_lo = f.sub(u, vw)
            x = jnp.stack([out_hi, out_lo], axis=2).reshape(x.shape[0], N)
        if inverse:
            ninv = spec.const(pow(N, -1, self.r), (1,))
            x = f.mul(x, jnp.broadcast_to(ninv, x.shape))
        return x

    def _coset_scale(self, N, g):
        scale = []
        acc = 1
        for _ in range(N):
            scale.append(acc)
            acc = acc * g % self.r
        return jnp.asarray(self.spec.pack(scale))

    def coset_ntt(self, coeffs, g: int):
        """NTT of coeffs(g*X): scale coefficient i by g^i, then NTT."""
        gs = self._coset_scale(coeffs.shape[-1], g)
        return self.ntt(self.f.mul(coeffs, gs))

    def coset_intt(self, evals, g: int):
        """Inverse of coset_ntt."""
        x = self.ntt(evals, inverse=True)
        gs = self._coset_scale(evals.shape[-1], pow(g, -1, self.r))
        return self.f.mul(x, gs)


def _bls_fr_root(n: int):
    from ..snark.groth16 import _root_of_unity, BLS12_377_ENGINE

    return _root_of_unity(BLS12_377_ENGINE, n)


def _bw6_fr_root(n: int):
    from ..snark.api import BW6_761_ENGINE
    from ..snark.groth16 import _root_of_unity

    return _root_of_unity(BW6_761_ENGINE, n)


ntt_fr = NttOps(fr, FR, R, _bls_fr_root)
ntt_bw6 = NttOps(fq, FQ, P, _bw6_fr_root)


# --- module-level BLS-Fr entry points (back-compat) ------------------------

def ntt(coeffs, inverse=False):
    return ntt_fr.ntt(coeffs, inverse)


def coset_ntt(coeffs, g: int):
    return ntt_fr.coset_ntt(coeffs, g)


def coset_intt(evals, g: int):
    return ntt_fr.coset_intt(evals, g)
