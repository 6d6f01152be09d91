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

    print(f"MP_WORKER_OK pid={pid}")


if __name__ == "__main__":
    main()
