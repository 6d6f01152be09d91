"""2^20-point MSM and 2^20 NTT throughput on device, with correctness.

BASELINE.md row 3: "MSM / NTT throughput measured at 1 chip — 2^20-point
BLS12-377 G1 Pippenger MSM + 2^20 radix-2 NTT over Fr". 2^20 is also the
exact evaluation-domain size of the flagship epoch-circuit prover
(~514k constraints -> next power of two), so these numbers ARE the
per-stage speed of the Groth16 prover hot loops
(reference workload: crates/epoch-snark/src/api/prover.rs:78, backed by
arkworks VariableBaseMSM / domain FFT).

Correctness oracles (2^20 host Pippenger / host FFT would take minutes in
Python, so):
  - MSM: points are P_i = (a+i)*G built by host affine chain-adds, so the
    exact answer is ((sum_i s_i*(a+i)) mod r)*G — ONE host scalar-mul.
  - NTT: intt(ntt(x)) == x at full size, plus Horner evaluation of the
    polynomial at omega^j for a few spot indices j.

Usage: python scripts/bench_msm_ntt.py [log2_size] [--bw6]
Emits one JSON line per kernel.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax
import jax.numpy as jnp

if jax.default_backend() == "cpu":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from celo_bls_snark_tpu.hostmath.params import R, G1_GENERATOR
from celo_bls_snark_tpu.hostmath import curves as hc
from celo_bls_snark_tpu.ops.field import FQ, FR, fq, fr
from celo_bls_snark_tpu.ops import curve as dc, msm as dmsm, ntt as dntt


def _emit(metric, value, unit, extra=None):
    line = {"metric": metric, "value": round(value, 1), "unit": unit}
    if extra:
        line.update(extra)
    print(json.dumps(line), flush=True)


def gen_chain_points(host_curve, gen, a, n):
    """P_i = (a+i)*gen via one mul + n-1 affine chain adds (host)."""
    pts = [host_curve.mul(a, gen)]
    for _ in range(n - 1):
        pts.append(host_curve.add(pts[-1], gen))
    return pts


def pack_affine_raw(spec, f, pts):
    """numpy-fast host->device affine packing: raw limbs + one device
    from_raw kernel per coordinate."""
    xs = spec.pack_raw([p[0] for p in pts])
    ys = spec.pack_raw([p[1] for p in pts])
    to_mont = jax.jit(f.from_raw)
    return (to_mont(jnp.asarray(xs)), to_mont(jnp.asarray(ys)))


def bench_msm(lg, reps=3, bw6=False):
    B = 1 << lg
    rng = np.random.default_rng(20260817)
    if bw6:
        from celo_bls_snark_tpu.hostmath import bw6 as hbw6
        from celo_bls_snark_tpu.hostmath.params import P as BW_FR
        from celo_bls_snark_tpu.ops.field import FQ761

        host_curve, gen, r, nbits = hbw6.G1, hbw6.G1_GENERATOR, BW_FR, 377
        curve, spec, tag = dc.bw6_g1, FQ761, "bw6_g1"
        from celo_bls_snark_tpu.ops.field import fq761 as fops
    else:
        host_curve, gen, r, nbits = hc.G1, G1_GENERATOR, R, 253
        curve, spec, tag = dc.g1, FQ, "bls12_377_g1"
        fops = fq

    t0 = time.perf_counter()
    a = int(rng.integers(1, 1 << 62))
    pts = gen_chain_points(host_curve, gen, a, B)
    scalars = [
        int.from_bytes(rng.bytes(32 if not bw6 else 48), "little") % r
        for _ in range(B)
    ]
    print(f"# [{tag}] generated {B} points in {time.perf_counter()-t0:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    pts_dev = pack_affine_raw(spec, fops, pts)
    jax.block_until_ready(pts_dev)
    print(f"# [{tag}] packed to device in {time.perf_counter()-t0:.1f}s",
          flush=True)

    c = 16
    L = 1 << max(3, min(15, B.bit_length() - 5))  # ops/msm.py heuristic
    fn = dmsm._pippenger_jit(id(curve), curve, c, L)

    # warm (compile) + correctness
    t0 = time.perf_counter()
    perm, lin, lane, valid, _ = dmsm.plan_msm(scalars, nbits, c, L)
    plan_s = time.perf_counter() - t0
    out = fn(pts_dev, perm, lin, lane, valid)
    jax.block_until_ready(out)
    got = dc.unpack_jac(curve, spec, out)[0]
    expect_k = sum(s * (a + i) for i, s in enumerate(scalars)) % r
    expect = host_curve.mul(expect_k, gen) if expect_k else None
    assert got == expect, f"MSM 2^{lg} mismatch"
    print(f"# [{tag}] correctness OK (plan {plan_s:.2f}s)", flush=True)

    # timed: host plan + device execute, fresh scalars each rep
    times = []
    for _ in range(reps):
        sc = [int.from_bytes(rng.bytes(48), "little") % r for _ in range(B)]
        t0 = time.perf_counter()
        perm, lin, lane, valid, _ = dmsm.plan_msm(sc, nbits, c, L)
        out = fn(pts_dev, perm, lin, lane, valid)
        np.asarray(out[0][0])  # true sync point on axon
        times.append(time.perf_counter() - t0)
    best = min(times)
    _emit(f"msm_{tag}_2e{lg}", B / best, "points/s",
          {"wall_s": round(best, 3), "c": c, "L": L,
           "backend": jax.default_backend()})


def bench_ntt(lg, reps=5, field="bls_fr"):
    N = 1 << lg
    rng = np.random.default_rng(20260818)
    if field == "bls_fr":
        nttops, spec, fops, r = dntt.ntt_fr, FR, fr, R
        nbytes = 32
    else:
        from celo_bls_snark_tpu.hostmath.params import P

        nttops, spec, fops, r = dntt.ntt_bw6, FQ, fq, P
        nbytes = 48
    vals = [int.from_bytes(rng.bytes(nbytes), "little") % r for _ in range(N)]

    t0 = time.perf_counter()
    raw = jnp.asarray(spec.pack_raw(vals))
    x = jax.jit(fops.from_raw)(raw)
    # twiddle tables as traced args, not baked literals (axon 413 limit)
    m_fwd = nttops.master_table(N, False)
    m_inv = nttops.master_table(N, True)
    # same AOT tags + shapes as the prover's h-poly programs
    from celo_bls_snark_tpu.utils.aotcache import AotJit

    eng = "bls12_377" if field == "bls_fr" else "bw6_761"
    fwd_fn = AotJit(f"ntt_f_{eng}", lambda v, m: nttops.ntt(v, master=m))
    inv_fn = AotJit(f"ntt_i_{eng}",
                    lambda v, m: nttops.ntt(v, inverse=True, master=m))
    fwd = lambda v: fwd_fn(v, m_fwd)
    inv = lambda v: inv_fn(v, m_inv)
    y = fwd(x)
    back = inv(y)
    jax.block_until_ready(back)
    print(f"# [ntt {field}] compiled+ran in {time.perf_counter()-t0:.1f}s",
          flush=True)

    # correctness: roundtrip at full size + Horner spot evaluation
    back_ints = spec.unpack(np.asarray(back)[:, :64])
    assert back_ints == vals[:64], "iNTT(NTT(x)) != x (head)"
    tail = spec.unpack(np.asarray(back)[:, -64:])
    assert tail == vals[-64:], "iNTT(NTT(x)) != x (tail)"
    w = nttops.root_fn(N)
    y_np = np.asarray(y)
    for j in (0, 1, N // 2 + 3):
        pt = pow(w, j, r)
        acc = 0
        for cf in reversed(vals):
            acc = (acc * pt + cf) % r
        assert spec.unpack(y_np[:, j : j + 1])[0] == acc, f"NTT[{j}] wrong"
    print(f"# [ntt {field}] correctness OK", flush=True)

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fwd(x)
        np.asarray(out[0][0])
        times.append(time.perf_counter() - t0)
    best = min(times)
    _emit(f"ntt_{field}_2e{lg}", N / best, "elements/s",
          {"wall_s": round(best, 4), "backend": jax.default_backend()})


def main():
    lg = 20
    for arg in sys.argv[1:]:
        if arg.isdigit():
            lg = int(arg)
    bench_ntt(lg, field="bls_fr")
    bench_ntt(lg, field="bw6_fr")
    bench_msm(lg)
    if "--bw6" in sys.argv:
        bench_msm(lg, bw6=True)


if __name__ == "__main__":
    main()
