"""Multi-device scaling efficiency of the sharded MSM and four-step NTT
(BASELINE.md north-star #2: >=80% efficiency at >=2 devices; VERDICT r4
Next #5 — the repo had multi-device correctness everywhere but not one
measured scaling number).

Runs on a virtual CPU mesh (the only multi-device rig available — real
hardware is one chip), so absolute numbers are a proxy; what the
measurement exercises for real is the collective layout (psum bucket
reduction for Pippenger, the one all_to_all of the four-step NTT) and
any serialization points in the sharded code path.

Method: the SAME sharded kernel runs on meshes of 1/2/4/8 devices over a
fixed problem size; efficiency(D) = T(1) / (T(D)) / D'... reported as
speedup(D) = T(1)/T(D) and efficiency = speedup/D.

Usage: python scripts/bench_scaling.py [log2_msm] [log2_ntt]
Writes perf/scaling_r05.txt-style lines to stdout.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
import jax.extend.backend as _jeb

_jeb.clear_backends()

import numpy as np
import jax.numpy as jnp


def main():
    from celo_bls_snark_tpu.hostmath.params import R
    from celo_bls_snark_tpu.hostmath import curves as hc
    from celo_bls_snark_tpu.hostmath.params import G1_GENERATOR
    from celo_bls_snark_tpu.ops import ntt as dntt
    from celo_bls_snark_tpu.parallel import mesh as pmesh

    # CPU-mesh-affordable defaults: the conv-path field mul is ~100x the
    # TPU kernel, so sizes are chosen to finish in minutes while still
    # being >=64 points per device at D=8
    log_msm = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    log_ntt = int(sys.argv[2]) if len(sys.argv) > 2 else 18
    Bm = 1 << log_msm
    Bn = 1 << log_ntt
    rng = np.random.default_rng(7)

    # --- MSM workload: 2^log_msm G1 points (generator multiples are too
    # slow to build on host at this size; sampled small multiples of G
    # keep host setup seconds-cheap while the device work is identical)
    mults = [hc.G1.mul(k, G1_GENERATOR) for k in range(1, 33)]
    pts = [mults[i] for i in rng.integers(0, 32, Bm)]
    scalars = [int.from_bytes(rng.bytes(31), "little") % R for i in range(Bm)]

    devices = jax.devices()
    assert len(devices) >= 8, devices
    results = {}
    print(f"# MSM 2^{log_msm} BLS12-377 G1 sharded Pippenger")
    for D in (1, 2, 4, 8):
        mesh = pmesh.make_mesh(devices[:D])
        t_best = None
        for _ in range(3):
            t0 = time.perf_counter()
            out = pmesh.sharded_msm_pippenger(mesh, pts, scalars)
            dt = time.perf_counter() - t0
            t_best = dt if t_best is None else min(t_best, dt)
        results[D] = t_best
        eff = results[1] / (t_best * D)
        print(f"msm D={D}: {t_best:7.2f}s  speedup {results[1]/t_best:5.2f}x"
              f"  efficiency {100*eff:5.1f}%", flush=True)

    # --- NTT workload: 2^log_ntt BLS-Fr four-step with one all_to_all
    ops = dntt.ntt_fr
    vals = [int.from_bytes(rng.bytes(31), "little") % R for _ in range(Bn)]
    x = np.asarray(ops.spec.pack(vals))
    print(f"# NTT 2^{log_ntt} BLS12-377 Fr sharded four-step")
    results = {}
    for D in (1, 2, 4, 8):
        mesh = pmesh.make_mesh(devices[:D])
        t_best = None
        for _ in range(3):
            t0 = time.perf_counter()
            out = pmesh.sharded_ntt(mesh, jnp.asarray(x), nttops=ops)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            t_best = dt if t_best is None else min(t_best, dt)
        results[D] = t_best
        eff = results[1] / (t_best * D)
        print(f"ntt D={D}: {t_best:7.2f}s  speedup {results[1]/t_best:5.2f}x"
              f"  efficiency {100*eff:5.1f}%", flush=True)


if __name__ == "__main__":
    main()
