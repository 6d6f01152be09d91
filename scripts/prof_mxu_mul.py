"""A/B the fused-CIOS Pallas multiply vs the MXU-reduction variant
(_make_pallas_mul_mxu) on the chip: correctness mod p (canonical + lazy
inputs) and a 16-deep dependent-chain throughput measurement at the
MSM madd working shape.

Run: python scripts/prof_mxu_mul.py  (TPU; ~2 compiles of a few minutes)
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from celo_bls_snark_tpu.ops.field import (
    FQ, FQ761, _make_pallas_mul, _make_pallas_mul_mxu,
)
from celo_bls_snark_tpu.utils.profiling import device_sync

K = 16  # dependent muls per timed dispatch


def chain(mulfn, k):
    def f(a, b):
        acc = a
        for _ in range(k):
            acc = mulfn(acc, b)
        return acc

    return jax.jit(f)


def run(spec, B):
    p = spec.modulus
    random.seed(7)
    xs = [random.randrange(p) for _ in range(B)]
    ys = [random.randrange(p) for _ in range(B)]
    a = jnp.asarray(spec.pack(xs))
    b = jnp.asarray(spec.pack(ys))
    lazy = a * 2 - jnp.asarray(spec.pack([5] * B))  # value 2x - 5, drifted
    base = _make_pallas_mul(spec)
    mxu = _make_pallas_mul_mxu(spec)
    # correctness: single mul, canonical and lazy inputs, vs host ints
    for tag, aa, vals in (("canonical", a, xs),
                          ("lazy", lazy, [(2 * x - 5) % p for x in xs])):
        o1 = np.asarray(jax.jit(base)(aa, b))
        o2 = np.asarray(jax.jit(mxu)(aa, b))
        exp = [v * y % p for v, y in zip(vals, ys)]
        g1 = [spec.from_mont(o1[:, i]) for i in range(0, B, max(1, B // 64))]
        g2 = [spec.from_mont(o2[:, i]) for i in range(0, B, max(1, B // 64))]
        e = [exp[i] for i in range(0, B, max(1, B // 64))]
        print(f"{spec.name} {tag}: base {'OK' if g1 == e else 'BAD'} "
              f"mxu {'OK' if g2 == e else 'BAD'}", flush=True)
        assert g1 == e and g2 == e
    # throughput: K-deep dependent chain
    for name, fn in (("cios", chain(base, K)), ("mxu", chain(mxu, K))):
        out = fn(a, b)
        device_sync(out)
        t0 = time.perf_counter()
        out = fn(a, b)
        device_sync(out)
        dt = time.perf_counter() - t0
        print(f"{spec.name} {name}: {dt/K*1e3:.2f} ms/mul at B={B} "
              f"({dt/K/B*1e9:.1f} ns/mul/lane)", flush=True)


def main():
    run(FQ761, 6 * 16384)   # the BW6 madd stacked-mul shape
    run(FQ, 6 * 16384)
    print("DONE")


if __name__ == "__main__":
    main()
