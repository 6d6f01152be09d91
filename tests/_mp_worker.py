"""Worker for tests/test_distributed_mp.py: one process of a 2-process
CPU job (4 virtual devices each -> an 8-device global mesh). Drives the
framework's own bring-up (parallel/distributed.py init_distributed +
global_mesh) and two sharded kernels (msum, four-step NTT) against host
oracles, exercising REAL cross-process collectives (gloo).

Usage: python tests/_mp_worker.py <process_id> <coordinator_port>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()
# the repo root, so the package imports when run as a bare script
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid = int(sys.argv[1])
    port = int(sys.argv[2])

    from celo_bls_snark_tpu.parallel.distributed import (
        init_distributed, global_mesh, process_count, is_coordinator,
    )

    init_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert process_count() == 2
    assert is_coordinator() == (pid == 0)

    mesh = global_mesh()
    assert mesh.devices.size == 8, mesh

    import random

    import jax.numpy as jnp

    from celo_bls_snark_tpu.hostmath.params import R, G1_GENERATOR
    from celo_bls_snark_tpu.hostmath import curves as hc
    from celo_bls_snark_tpu.parallel import mesh as pmesh
    from celo_bls_snark_tpu.ops import curve as dc
    from celo_bls_snark_tpu.ops import ntt as dntt

    random.seed(20260819)  # same on both processes -> same global inputs

    # 1) sharded G1 sum across the 2-process mesh
    pts = [hc.G1.mul(random.randrange(1, R), G1_GENERATOR) for _ in range(16)]
    out = pmesh.sharded_msum_g1(mesh, dc.g1_pack(pts))
    got = dc.g1_unpack(out)[0]
    want = hc.G1.msum(pts)
    assert got == want, (pid, got, want)

    # 2) sharded four-step NTT (one cross-process all_to_all) vs the
    # single-device kernel run locally
    from celo_bls_snark_tpu.ops.field import FR

    N = 256
    vals = [random.randrange(R) for _ in range(N)]
    x = jnp.asarray(FR.pack(vals))
    want_ntt = FR.unpack(dntt.ntt_fr.ntt(x))
    got_ntt = FR.unpack(pmesh.sharded_ntt(mesh, x, dntt.ntt_fr))
    assert list(got_ntt) == list(want_ntt), pid

    # 3) REAL prover stages across the 2-process mesh: the flagship
    # Groth16 prover's own code path (snark/accel.py), its collectives
    # crossing the process boundary — h-poly coset pipeline at 2^12 and a
    # sharded Pippenger MSM — vs host python-int oracles.
    from celo_bls_snark_tpu.snark.accel import DeviceAccel
    from celo_bls_snark_tpu.snark.groth16 import (
        BLS12_377_ENGINE, _root_of_unity, fft, ifft,
    )

    accel = DeviceAccel("bls12_377")
    accel.set_mesh(mesh)
    d_h = 1 << 12
    gen = BLS12_377_ENGINE.fr_generator
    a_e = [random.randrange(R) for _ in range(d_h)]
    b_e = [random.randrange(R) for _ in range(d_h)]
    c_e = [random.randrange(R) for _ in range(d_h)]
    h_sharded = accel.compute_h_evals(a_e, b_e, c_e, d_h, gen)
    omega = _root_of_unity(BLS12_377_ENGINE, d_h)
    coeffs = [ifft(e, omega, R) for e in (a_e, b_e, c_e)]
    gpow = [1] * d_h
    for i in range(1, d_h):
        gpow[i] = gpow[i - 1] * gen % R
    ac, bc, cc = (
        fft([cf_i * g % R for cf_i, g in zip(cf, gpow)], omega, R)
        for cf in coeffs
    )
    tinv = pow((pow(gen, d_h, R) - 1) % R, -1, R)
    hc_ = [(xx * yy - zz) % R * tinv % R for xx, yy, zz in zip(ac, bc, cc)]
    hs = ifft(hc_, omega, R)
    ginv = pow(gen, -1, R)
    gipow = [1] * d_h
    for i in range(1, d_h):
        gipow[i] = gipow[i - 1] * ginv % R
    h_expected = [cf * g % R for cf, g in zip(hs, gipow)][: d_h - 1]
    assert h_sharded == h_expected, (pid, "mp h-poly != host oracle")

    B_msm = 512
    mpts = [hc.G1.mul(3 + 2 * i, G1_GENERATOR) for i in range(B_msm)]
    msc = [random.randrange(R) for _ in range(B_msm)]
    got_msm = accel.g1.msm(mpts, msc, c=6, L=16)  # mesh-routed
    exp_msm = hc.G1.msm(msc, mpts, c=8)
    assert got_msm == exp_msm, (pid, "mp prover MSM != host oracle")

    print(f"MP_WORKER_OK pid={pid}")


if __name__ == "__main__":
    main()
