"""Pinpoint the round-5 four-step round-trip failure: canonical-input
inverse vs host ifft, lazy-input forward vs host fft, and the exact
round-trip the bench runs — each sampled against python-int oracles.

Run on TPU: python scripts/debug_ntt_lazy.py
"""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from celo_bls_snark_tpu.ops import ntt as dntt
from celo_bls_snark_tpu.snark.groth16 import fft, ifft


def main():
    ops = dntt.ntt_fr
    r = ops.r
    N = 1 << 20
    random.seed(17)
    vals = [random.randrange(r) for _ in range(N)]
    x = jnp.asarray(ops.spec.pack(vals))
    m_f = ops.master_table(N, False)
    m_i = ops.master_table(N, True)
    w = ops.root_fn(N)
    rng = np.random.default_rng(3)
    ks = rng.integers(0, N, 256)

    fwd = jax.jit(lambda a, m: ops.ntt(a, master=m))
    inv = jax.jit(lambda a, m: ops.ntt(a, inverse=True, master=m))

    def sample_eq(out_dev, ref, tag):
        got = ops.spec.unpack(np.asarray(out_dev)[:, ks])
        bad = [int(k) for k, g in zip(ks, got) if g != ref[int(k)]]
        print(f"{tag}: {len(bad)}/256 mismatches {bad[:6]}", flush=True)
        return not bad

    # 1) canonical input, INVERSE transform vs host ifft
    ref_i = ifft(vals, w, r)
    sample_eq(inv(x, m_i), ref_i, "inv(canonical)")

    # 2) LAZY input, forward transform: x3 = 3x - 3 with drifted limbs
    lazy = x * 3 - jnp.asarray(ops.spec.pack([3] * N))
    vals3 = [(3 * v - 3) % r for v in vals]
    ref_f3 = fft(vals3, w, r)
    sample_eq(fwd(lazy, m_f), ref_f3, "fwd(lazy)")

    # 3) the bench round-trip: inv(fwd(x)) == x
    y = fwd(x, m_f)
    back = inv(y, m_i)
    got = ops.spec.unpack(np.asarray(back)[:, ks])
    bad = [int(k) for k, g in zip(ks, got) if g != vals[int(k)]]
    print(f"roundtrip: {len(bad)}/256 mismatches {bad[:6]}", flush=True)

    # 4) inverse fed the CANONICALIZED forward output
    from celo_bls_snark_tpu.ops.field import fr as frops

    y_can = jax.jit(frops.canon2p)(y)
    back2 = inv(y_can, m_i)
    got2 = ops.spec.unpack(np.asarray(back2)[:, ks])
    bad2 = [int(k) for k, g in zip(ks, got2) if g != vals[int(k)]]
    print(f"roundtrip(canon mid): {len(bad2)}/256 mismatches {bad2[:6]}",
          flush=True)
    print("DONE")


if __name__ == "__main__":
    main()
