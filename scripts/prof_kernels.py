"""TPU microbenchmarks of the prover's device kernels.

Times the primitive field/curve kernels at the shapes the flagship prover
actually dispatches, to locate the 354s h-poly + ~750s MSM device time
(E2E r3 stage breakdown): wide Montgomery muls (NTT stages), madd scans
(Pippenger bucket accumulation / fixed-base), and to_affine inversions.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import jax.numpy as jnp

from celo_bls_snark_tpu.ops.field import FQ, FQ761, fq, fq761
from celo_bls_snark_tpu.ops import curve as dc


def _sync(out):
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])


def timeit(name, fn, *args, iters=3):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:10.2f} ms", flush=True)
    return dt


def main():
    import random

    random.seed(3)

    # --- wide Montgomery mul (the NTT stage kernel) ---
    for spec, ops, label in ((FQ, fq, "fq377"), (FQ761, fq761, "fq761")):
        p = spec.modulus
        for logN in (16, 18, 20):
            N = 1 << logN
            a = jnp.asarray(spec.pack([random.randrange(p) for _ in range(256)] * (N // 256)))
            b = jnp.asarray(spec.pack([random.randrange(p) for _ in range(256)] * (N // 256)))
            f = jax.jit(ops.mul)
            dt = timeit(f"{label}.mul [n,{N}]", f, a, b)
            # per-element throughput
            print(f"   -> {N/dt/1e6:8.1f} M muls/s")

    # --- one full NTT at 2^20 over BW6-Fr (the h-poly unit) ---
    from celo_bls_snark_tpu.ops import ntt as dntt

    N = 1 << 20
    vals = [random.randrange(FQ.modulus) for _ in range(4096)] * (N // 4096)
    x = jnp.asarray(FQ.pack(vals))
    master = dntt.ntt_bw6.master_table(N, False)
    ntt_fn = jax.jit(lambda v, m: dntt.ntt_bw6.ntt(v, master=m))
    timeit(f"ntt_bw6 [{N}]", ntt_fn, x, master)

    # --- madd at Pippenger scan widths (BW6 G1) ---
    from celo_bls_snark_tpu.hostmath import bw6 as hbw6

    base = hbw6.G1_GENERATOR
    for L in (4096, 32768, 131072):
        pts = [hbw6.G1.mul(2 + i, base) for i in range(64)] * (L // 64)
        aff = dc.pack_affine(FQ761, pts)
        jac = dc.bw6_g1.infinity((L,))
        f = jax.jit(dc.bw6_g1.madd)
        dt = timeit(f"bw6_g1.madd [{L}]", f, jac, aff)
        print(f"   -> {L/dt/1e6:8.2f} M madds/s")

    # --- to_affine at the setup unpack width ---
    jacL = dc.bw6_g1.infinity((65536,))
    pts = [hbw6.G1.mul(2 + i, base) for i in range(64)] * (65536 // 64)
    aff = dc.pack_affine(FQ761, pts)
    jacL = dc.bw6_g1.madd(jacL, aff)
    f = jax.jit(dc.bw6_g1.to_affine)
    dt = timeit("bw6_g1.to_affine [65536]", f, jacL, iters=1)
    print(f"   -> est {dt*3.5e6/65536:.0f}s for 3.5M setup points")


if __name__ == "__main__":
    main()
