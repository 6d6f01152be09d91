"""Microbenchmark: Pallas Montgomery-mul kernel block-size sweep on TPU.

Measures ns/field-mul/lane for the fq377 (25-limb) kernel at different
grid block widths, to locate the register-pressure sweet spot (accumulator
state is ~(2n+27) vector registers per 128-lane strip; too-large blocks
spill to VMEM).

Usage: python scripts/prof_field.py [B] [blk1 blk2 ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from celo_bls_snark_tpu.ops import field as F
from celo_bls_snark_tpu.hostmath.params import P


def make_mul(spec, blk):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = spec.n
    p_limbs = [int(x) for x in spec.p_limbs]
    off_limbs = [int(x) for x in spec.offset_limbs]
    n0inv = np.uint32(spec.n0inv)

    def kernel(a_ref, b_ref, o_ref):
        s = blk // 128

        def normalize(ref):
            x = ref[...].reshape(n, s, 128)
            out = []
            carry = jnp.zeros((s, 128), jnp.int32)
            for k in range(n):
                v = x[k] + np.int32(off_limbs[k]) + carry
                carry = v >> F.LIMB_BITS
                out.append((v - (carry << F.LIMB_BITS)).astype(jnp.uint32))
            return out

        a = normalize(a_ref)
        b = normalize(b_ref)
        z = jnp.zeros((s, 128), jnp.uint32)
        t = [z] * (n + 2)
        for i in range(n):
            ai = a[i]
            for j in range(n):
                prod = ai * b[j]
                t[j] = t[j] + (prod & F.LIMB_MASK)
                t[j + 1] = t[j + 1] + (prod >> F.LIMB_BITS)
            m = (t[0] * n0inv) & F.LIMB_MASK
            for j in range(n):
                prod2 = m * np.uint32(p_limbs[j])
                t[j] = t[j] + (prod2 & F.LIMB_MASK)
                t[j + 1] = t[j + 1] + (prod2 >> F.LIMB_BITS)
            t[1] = t[1] + (t[0] >> F.LIMB_BITS)
            t = t[1:] + [z]
        out = []
        carry = z
        for k in range(n):
            v = t[k] + carry
            out.append((v & F.LIMB_MASK).astype(jnp.int32))
            carry = v >> F.LIMB_BITS
        o_ref[...] = jnp.stack(out).reshape(n, blk)

    def mul(a, b):
        B = a.shape[-1]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, B), jnp.int32),
            grid=(B // blk,),
            in_specs=[
                pl.BlockSpec((n, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        )(a, b)

    return mul


def bench(fn, a, b, iters=20, chain=8):
    # chain dependent muls so the device stays busy per-dispatch
    @jax.jit
    def run(a, b):
        x = a
        for _ in range(chain):
            x = fn(x, b)
        return x

    out = run(a, b)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(a, b)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (iters * chain)
    return dt, out


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 16
    blks = [int(x) for x in sys.argv[2:]] or [256, 512, 1024, 2048, 4096, 8192]
    spec = F.FQ
    rng = np.random.default_rng(0)
    vals_a = [int(rng.integers(0, 1 << 62)) * 0 + int.from_bytes(rng.bytes(47), "little") % P for _ in range(256)]
    vals_b = [int.from_bytes(rng.bytes(47), "little") % P for _ in range(256)]
    a = jnp.asarray(np.tile(spec.pack(vals_a), (1, B // 256)))
    b = jnp.asarray(np.tile(spec.pack(vals_b), (1, B // 256)))

    # correctness reference: same 8-mul chain through the existing kernel
    x = a[:, :256]
    for _ in range(8):
        x = F.fq.mul(x, b[:, :256])
    ref_np = np.asarray(x)

    for blk in blks:
        if B % blk:
            continue
        fn = make_mul(spec, blk)
        dt, out = bench(fn, a, b)
        ok = all(
            spec.from_mont(np.asarray(out[:, i])) % P == spec.from_mont(ref_np[:, i]) % P
            for i in range(16)
        )
        rate = B / dt
        print(
            f"blk={blk:5d}  {dt*1e6:8.1f} us/call  {dt/B*1e9:7.2f} ns/mul/lane  "
            f"{rate/1e6:8.1f} M muls/s  ok={ok}"
        )


if __name__ == "__main__":
    main()
