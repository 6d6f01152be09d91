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
        self._coset_cache = {}
        self._fourstep_tw_cache = {}
        self._master_dev_cache = {}

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

    def _four_step_split(self, N: int):
        k = N.bit_length() - 1
        N1 = 1 << ((k + 1) // 2)
        return N1, N // N1

    def _four_step_tw(self, N: int, inverse: bool) -> np.ndarray:
        """Host-precomputed inter-step twiddles for the four-step path:
        numpy [n, N] with t[j2*N1 + k1] = w^(±j2*k1). Host-built (N
        geometric-row mulmods, cached) because the on-device alternative
        is a 2^20-index lane gather — the op class with known axon
        miscompiles (one wrong lane observed in exactly that
        formulation)."""
        key = (N, inverse)
        if key not in self._fourstep_tw_cache:
            N1, N2 = self._four_step_split(N)
            w = self.root_fn(N)
            if inverse:
                w = pow(w, -1, self.r)
            vals = []
            wj2 = 1  # w^j2
            for _ in range(N2):
                acc = 1
                for _ in range(N1):
                    vals.append(acc)
                    acc = acc * wj2 % self.r
                wj2 = wj2 * w % self.r
            self._fourstep_tw_cache[key] = np.asarray(self.spec.pack(vals))
        return self._fourstep_tw_cache[key]

    def master_table(self, N: int, inverse: bool):
        """Device twiddle table for a length-N transform — pass as the
        `master` argument of ntt() inside jit so the table is a traced
        INPUT, not a baked HLO literal (a [n, N/2] constant at N=2^20 is
        tens of MB and overflows the axon remote-compile request).

        For N at or above the four-step threshold the table is EXTENDED:
        [n, N/2 + N] = powers || four-step twiddle matrix (ntt() splits
        it). The device array is cached so repeated prover calls do not
        re-transfer ~150 MB over the tunnel."""
        key = (N, inverse)
        dev = self._master_dev_cache.get(key)
        if dev is None:
            base = self._twiddles(N, inverse)
            if N >= self._GATHER_MIN_N:
                base = np.concatenate(
                    [base, self._four_step_tw(N, inverse)], axis=1
                )
            dev = self._master_dev_cache[key] = jnp.asarray(base)
        return dev

    # The reshape/strided-slice butterfly below is MISCOMPILED by the axon
    # TPU backend at N >= 2^20 (verified 2026-08-19: stage half=64 writes
    # wrong values into the last 128 lanes — out-of-thin-air limb patterns
    # like [0]*16 + [-4779] that no well-formed stage can produce, while
    # every primitive passes standalone and an explicit-gather formulation
    # of the SAME butterfly is exact). Large single-batch transforms route
    # through the four-step decomposition (regular transposes + batched
    # sqrt(N)-point sub-transforms — never hits the miscompiled shape and
    # avoids _ntt_gather's 3 lane-axis gathers per stage, which made the
    # round-4 BW6-Fr NTT ~100x off compute-bound; VERDICT r4 Weak #5).
    _GATHER_MIN_N = 1 << 20

    def _ntt_four_step(self, coeffs, inverse, master, tw4):
        """Bailey four-step: X[k1 + N1*k2] = NTT_N2( w_N^(j2*k1) *
        NTT_N1(x[j1*N2 + j2]) ). Sub-transforms run through the batched
        reshape-butterfly path; sub-twiddle tables are strided slices of
        the length-N master (w_N1 = w^N2, w_N2 = w^N1); the inter-step
        twiddle tw4 [n, N] (t[j2*N1+k1] = w^(j2*k1)) is host-precomputed
        (master_table) — an on-device 2^20-lane gather from the master
        produced one wrong lane on the axon backend (dense host-oracle
        check, round 5)."""
        f = self.f
        n = coeffs.shape[0]
        N = coeffs.shape[-1]
        N1, N2 = self._four_step_split(N)
        m1 = master[:, ::N2]                  # [n, N1/2] = w_N1 powers
        m2 = master[:, ::N1][:, : N2 // 2]    # [n, N2/2] = w_N2 powers
        x = coeffs.reshape(n, N1, N2)
        # inner transforms over j1 (length N1), one per j2 column
        y = self.ntt(jnp.moveaxis(x, -2, -1), inverse=inverse, master=m1)
        # twiddle w^(j2*k1); y axes [.., j2, k1] — flat index j2*N1 + k1
        yt = f.mul(y.reshape(n, N), tw4).reshape(n, N2, N1)
        # outer transforms over j2 (length N2), one per k1 row
        z = self.ntt(jnp.moveaxis(yt, -2, -1), inverse=inverse, master=m2)
        # z axes [.., k1, k2]; k = k1 + N1*k2 -> arrange [k2, k1]
        return jnp.moveaxis(z, -2, -1).reshape(n, N)

    def _ntt_gather(self, coeffs, inverse, master):
        """Gather-indexed butterfly (platform-bug workaround, see above):
        u/v extraction and hi/lo recombination via jnp.take with indices
        computed from iota — no [.., 2, half] reshape-slices, no stack."""
        f, spec = self.f, self.spec
        n = coeffs.shape[0]
        N = coeffs.shape[-1]
        stages = N.bit_length() - 1
        x = coeffs[..., _bit_reverse_perm(N)]
        halfN = N // 2
        io2 = jax.lax.iota(jnp.int32, halfN)
        ioN = jax.lax.iota(jnp.int32, N)
        for s in range(stages):
            half = 1 << s
            stride = N >> (s + 1)
            tw = master[:, ::stride]  # [n, half]
            g = io2 // half
            j = io2 - g * half
            u_idx = g * (2 * half) + j
            u = jnp.take(x, u_idx, axis=-1)
            v = jnp.take(x, u_idx + half, axis=-1)
            twflat = jnp.tile(tw, (1, N // (2 * half)))
            vw = f.mul(v, twflat)
            cat = jnp.concatenate([f.add(u, vw), f.sub(u, vw)], axis=-1)
            g2 = ioN // half
            j2 = ioN - g2 * half
            src = (g2 >> 1) * half + j2 + (g2 & 1) * halfN
            x = jnp.take(cat, src, axis=-1)
        if inverse:
            ninv = spec.const(pow(N, -1, self.r), (1,))
            x = f.mul(x, jnp.broadcast_to(ninv, x.shape))
        return x

    def ntt(self, coeffs, inverse=False, master=None):
        """coeffs: [n_limbs, *batch, N] Montgomery array; transforms the
        LAST axis (independently per leading batch index) and returns the
        NTT (or inverse NTT, scaled by 1/N) in natural order. `master`
        optionally supplies the twiddle table (see master_table)."""
        from .field import _on_tpu

        f, spec = self.f, self.spec
        n = coeffs.shape[0]
        N = coeffs.shape[-1]
        lead = coeffs.shape[1:-1]  # leading batch dims (may be empty)
        assert N & (N - 1) == 0
        large = not lead and N >= self._GATHER_MIN_N and _on_tpu()
        traced = isinstance(coeffs, jax.core.Tracer)
        if large and traced and (
            master is None or master.shape[-1] == N // 2
        ):
            # Embedding the ~100MB+ table as an HLO constant through the
            # axon remote-compile service CORRUPTS it (round-5 dense
            # host-oracle finding: the identical four-step returned
            # 2048/2048 wrong outputs with the captured-constant table
            # and 0/512 wrong with the table as a traced argument).
            raise ValueError(
                "large single-batch NTT inside jit requires the EXTENDED "
                "master table passed as a traced argument: "
                "master=master_table(N, inverse)"
            )
        if master is None:
            master = (
                self.master_table(N, inverse)
                if large
                else jnp.asarray(self._twiddles(N, inverse))  # [n, N/2]
            )
        tw4 = None
        if master.shape[-1] == N // 2 + N:  # extended table (master_table)
            master, tw4 = master[:, : N // 2], master[:, N // 2 :]
        if large:
            import os

            if os.environ.get("CELO_NTT_LARGE", "fourstep") == "gather":
                return self._ntt_gather(coeffs, inverse, master)
            if tw4 is None:  # eager caller with a plain master
                tw4 = jnp.asarray(self._four_step_tw(N, inverse))
            return self._ntt_four_step(coeffs, inverse, master, tw4)
        stages = N.bit_length() - 1
        x = coeffs[..., _bit_reverse_perm(N)]
        bcast = (n, *([1] * len(lead)), N // 2)
        for s in range(stages):
            half = 1 << s          # butterfly half-width
            stride = N >> (s + 1)  # twiddle stride into the master table
            tw = master[:, ::stride]  # [n, half]
            x4 = x.reshape(n, *lead, N // (2 * half), 2, half)
            u = x4[..., 0, :]
            v = x4[..., 1, :]
            # v * w  (one wide 1-D kernel dispatch over all batch dims)
            vflat = v.reshape(n, -1)
            twflat = jnp.broadcast_to(
                jnp.tile(tw, (1, N // (2 * half))).reshape(bcast),
                (n, *lead, N // 2),
            ).reshape(n, -1)
            vw = f.mul(vflat, twflat).reshape(v.shape)
            out_hi = f.add(u, vw)
            out_lo = f.sub(u, vw)
            x = jnp.stack([out_hi, out_lo], axis=-2).reshape(n, *lead, N)
        if inverse:
            ninv = spec.const(pow(N, -1, self.r), (1,))
            flat = x.reshape(n, -1)
            x = f.mul(flat, jnp.broadcast_to(ninv, flat.shape)).reshape(x.shape)
        return x

    def coset_scale(self, N, g):
        """Device [n, N] vector of g^i — like master_table, pass as a
        traced argument inside jit (a 2^20 BW6-Fr literal is >100MB)."""
        key = (N, g)
        if key not in self._coset_cache:
            scale = []
            acc = 1
            for _ in range(N):
                scale.append(acc)
                acc = acc * g % self.r
            self._coset_cache[key] = np.asarray(self.spec.pack(scale))
        return jnp.asarray(self._coset_cache[key])

    def coset_ntt(self, coeffs, g: int, master=None, scale=None):
        """NTT of coeffs(g*X): scale coefficient i by g^i, then NTT."""
        gs = scale if scale is not None else self.coset_scale(coeffs.shape[-1], g)
        return self.ntt(self.f.mul(coeffs, gs), master=master)

    def coset_intt(self, evals, g: int, master=None, scale=None):
        """Inverse of coset_ntt. `master` must be the INVERSE twiddle
        table; `scale` the coset_scale of g^-1."""
        x = self.ntt(evals, inverse=True, master=master)
        gs = (
            scale
            if scale is not None
            else self.coset_scale(evals.shape[-1], pow(g, -1, self.r))
        )
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
