"""Uncontended timing of the prover's two device stages at flagship size:
the d=2^20 h-poly pipeline and one 500k-point BW6 G1 Pippenger MSM.
Run alone (no concurrent pytest/dryrun — the axon host has 4 CPUs)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import random

import numpy as np


def main():
    from celo_bls_snark_tpu.hostmath.params import P
    from celo_bls_snark_tpu.snark.accel import get_accel
    from celo_bls_snark_tpu.snark.api import BW6_761_ENGINE
    from celo_bls_snark_tpu.utils import profiling

    random.seed(9)
    accel = get_accel("bw6_761")
    d = 1 << 20
    gen = BW6_761_ENGINE.fr_generator
    a = [random.randrange(P) for _ in range(4096)] * (d // 4096)

    for it in range(3):
        profiling.reset()
        t0 = time.perf_counter()
        h = accel.compute_h_evals(a, a, a, d, gen)
        dt = time.perf_counter() - t0
        print(f"compute_h 2^20 call {it}: {dt:.1f}s")
        for name, ent in sorted(profiling.report().items()):
            print(f"   {name:24s} {ent['total_s']:8.2f}s")

    # MSM at 500k, c picked by auto, then c=16
    from celo_bls_snark_tpu.hostmath import bw6 as hbw6

    B = 500_000
    base = [hbw6.G1.mul(2 + i, hbw6.G1_GENERATOR) for i in range(256)]
    pts = base * (B // 256) + base[: B % 256]
    scalars = [random.randrange(P) for _ in range(B)]
    for it in range(3):
        profiling.reset()
        t0 = time.perf_counter()
        out = accel.g1.msm(pts, scalars, c=16, cache_key="prof")
        dt = time.perf_counter() - t0
        print(f"msm 500k c=16 call {it}: {dt:.1f}s")
        for name, ent in sorted(profiling.report().items()):
            print(f"   {name:24s} {ent['total_s']:8.2f}s")


if __name__ == "__main__":
    main()
