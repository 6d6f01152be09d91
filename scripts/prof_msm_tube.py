"""Fine-grained timing of ONE prover-scale MSM's host feeding tube.

Round-4 finding (VERDICT Weak #3): prover.msm_a = 140s with only ~9s of
device time; msm.plan/msm.pack_bases account for ~36s across 4 MSMs —
leaving ~60s/MSM unaccounted. This script replays the exact msm_pippenger
call path on the a_query of the saved e2e proving key with a stopwatch
around EVERY substep. Run on the TPU (axon) backend:

    python scripts/prof_msm_tube.py [which]   # which in {a, h}
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def tick(label, t0=[None]):
    now = time.perf_counter()
    if t0[0] is not None:
        print(f"  {label:38s} {now - t0[0]:8.2f}s", flush=True)
    t0[0] = now


def main():
    import jax
    import jax.numpy as jnp

    from celo_bls_snark_tpu.snark.serialize_pk import pk_from_bytes
    from celo_bls_snark_tpu.hostmath.params import P as BW_FR
    from celo_bls_snark_tpu.ops import msm as dmsm
    from celo_bls_snark_tpu.ops import curve as dc
    from celo_bls_snark_tpu.ops.field import FQ761

    which = sys.argv[1] if len(sys.argv) > 1 else "a"
    tick(None)
    with open("/root/repo/.e2e_pk.bin", "rb") as f:
        pk = pk_from_bytes(f.read(), "bw6_761", compressed=False,
                           validate=False)
    tick("load_pk")
    bases = pk.a_query if which == "a" else pk.h_query
    B0 = len(bases)
    print(f"which={which} B0={B0} backend={jax.default_backend()}")
    rng = np.random.default_rng(7)
    # scalars the way the prover holds them: python ints mod r
    scalars = [
        int.from_bytes(rng.bytes(48), "little") % BW_FR for _ in range(B0)
    ]
    tick("make scalars")

    # --- the create_proof_no_zk wrapper line ---
    scalars2 = [s % BW_FR for s in scalars]
    tick("[s % r for s in scalars]")
    scalars3 = [int(s) for s in scalars2]
    tick("[int(s)] (accel.msm wrapper)")
    blist = list(bases)
    tick("list(bases)")

    nbits, c = 377, 14
    L = 1 << max(3, min(15, B0.bit_length() - 5))
    print(f"c={c} L={L}")
    perm, lin, lane, valid, B = dmsm.plan_msm(scalars3, nbits, c, L)
    tick("plan_msm")
    pts = blist + [None] * (B - B0)
    pts_aff = dc.pack_affine(FQ761, pts)
    tick("pack_affine (host Montgomery)")
    pts_dev = jax.tree.map(jnp.asarray, pts_aff)
    jax.block_until_ready(pts_dev)
    tick("H2D bases")
    args_dev = [jnp.asarray(x) for x in (perm, lin, lane, valid)]
    jax.block_until_ready(args_dev)
    tick("H2D plan arrays")
    fn = dmsm._pippenger_jit(id(dc.bw6_g1), dc.bw6_g1, c, L)
    tick("_pippenger_jit lookup")
    out = fn(pts_dev, *args_dev)
    jax.block_until_ready(out)
    tick("device run 1 (incl AOT load)")
    out = fn(pts_dev, *args_dev)
    jax.block_until_ready(out)
    tick("device run 2 (warm)")
    res = dc.unpack_jac(dc.bw6_g1, FQ761, out)[0]
    tick("unpack result")
    print("result x mod 1e9:", res[0] % 10**9 if res else None)


if __name__ == "__main__":
    main()
