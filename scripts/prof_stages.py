"""Per-stage wall-clock profile of the aggregate-verification bench on TPU.

Times each device stage of bench.py's verify() separately: signature msum,
to_affine (inversion chain), Miller loops, GT tree product, final
exponentiation — to direct the optimization work.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import jax.numpy as jnp

from celo_bls_snark_tpu.hostmath.params import R, G2_GENERATOR, G1_GENERATOR
from celo_bls_snark_tpu.hostmath import curves as hc
from celo_bls_snark_tpu.ops import bls as dbls
from celo_bls_snark_tpu.ops import curve as dc
from celo_bls_snark_tpu.ops import pairing as dp
from celo_bls_snark_tpu.ops import tower as tw


def _sync(out):
    """block_until_ready does NOT sync on the axon platform; fetching one
    scalar to host is the only reliable barrier."""
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])


def timeit(name, fn, *args, iters=3):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt*1e3:9.2f} ms")
    return out


def main():
    B = int(os.environ.get("N", "1024"))
    # synthetic but well-formed points: multiples of the generators
    ks = list(range(2, B + 2))
    sig_pts = [hc.G1.mul(k, G1_GENERATOR) for k in ks]
    h_pts = [hc.G1.mul(k + 7, G1_GENERATOR) for k in ks]
    pk = hc.G2.mul(12345, G2_GENERATOR)

    sig_jac = dc.g1_pack(sig_pts)
    hashes_aff = dbls.pack_g1_affine(h_pts)
    apk_aff = dbls.pack_g2_affine([pk] * B)
    negg2 = dbls.pack_g2_affine([hc.G2.neg(G2_GENERATOR)])

    msum = jax.jit(dc.g1.msum)
    to_aff = jax.jit(dc.g1.to_affine)
    miller = jax.jit(dp.miller_loop_batch)
    product = jax.jit(dp.f12_product)
    finexp = jax.jit(dp.final_exponentiation)

    asig = timeit(f"msum g1 [{B}]", msum, sig_jac)
    asig_aff = timeit("to_affine [1]", to_aff, asig)
    p_all = jax.tree.map(lambda s, h: jnp.concatenate([s, h], axis=-1), asig_aff, hashes_aff)
    q_all = jax.tree.map(lambda g, k: jnp.concatenate([g, k], axis=-1), negg2, apk_aff)
    f = timeit(f"miller [{B+1}]", miller, p_all, q_all)
    fp = timeit("f12_product", product, f)
    e = timeit("final_exp [1]", finexp, fp)

    # small-width miller (the grouped-path shape)
    for W in (16, 17, 32):
        pw = jax.tree.map(lambda x: x[..., : W], p_all)
        qw = jax.tree.map(lambda x: x[..., : W], q_all)
        timeit(f"miller [{W}]", miller, pw, qw)


if __name__ == "__main__":
    main()
