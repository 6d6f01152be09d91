"""Fast on-chip smoke suite — the regression net for TPU-only miscompiles.

The pytest suite runs on CPU, so backend bugs like the axon reshape/
strided-slice butterfly miscompile at N >= 2^20 (fixed by gather indexing,
commit 8354989) or the CPU-cache segfaults are invisible to it. This
script runs the hot kernels AT the shapes that broke, each with a
correctness assert against the python-int host oracle, in a few minutes
warm. Run it before every end-of-round snapshot:

    python scripts/tpu_smoke.py            # full (default sizes)
    SMOKE_LG_NTT=18 SMOKE_LG_MSM=14 python scripts/tpu_smoke.py  # quicker

Checks (each prints one PASS line; any failure raises):
  1. 2^20 NTT round-trip + spot-check, BLS12-377 Fr AND BW6-761 Fr
  2. 2^16 Pippenger MSM, BLS12-377 G1 and G2, vs host Pippenger
  3. batched pairing check: valid signatures accept AND a forged
     signature rejects (one flipped lane)
  4. batched hash-to-G1 (direct + composite CRH) vs the host oracle
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import jax.numpy as jnp

LG_NTT = int(os.environ.get("SMOKE_LG_NTT", "20"))
LG_MSM = int(os.environ.get("SMOKE_LG_MSM", "16"))
B_PAIR = int(os.environ.get("SMOKE_B_PAIR", "256"))
B_HASH = int(os.environ.get("SMOKE_B_HASH", "256"))

T0 = time.perf_counter()


def _ok(name):
    print(f"PASS {name:40s} [{time.perf_counter() - T0:7.1f}s]", flush=True)


def check_ntt():
    from celo_bls_snark_tpu.ops import ntt as dntt
    from celo_bls_snark_tpu.utils.aotcache import AotJit

    N = 1 << LG_NTT
    random.seed(101)
    for label, ops, r, eng in (
        ("ntt_fr (BLS12-377 Fr)", dntt.ntt_fr, dntt.R, "bls12_377"),
        ("ntt_bw6 (BW6-761 Fr)", dntt.ntt_bw6, dntt.P, "bw6_761"),
    ):
        vals = [random.randrange(r) for _ in range(N)]
        x = jnp.asarray(ops.spec.pack(vals))
        # same tags + shapes as the prover's h-poly programs
        # (snark/accel.py _ensure_h_jits): the smoke run exercises and/or
        # populates the EXACT production executables in the AOT cache
        fwd_fn = AotJit(f"ntt_f_{eng}",
                        lambda v, m, o=ops: o.ntt(v, master=m))
        inv_fn = AotJit(f"ntt_i_{eng}",
                        lambda v, m, o=ops: o.ntt(v, inverse=True, master=m))
        fwd = fwd_fn(x, ops.master_table(N, False))
        back = inv_fn(fwd, ops.master_table(N, True))
        jax.block_until_ready(back)
        # full round-trip equality + spot-check 4 forward outputs vs a
        # direct host evaluation of the DFT sum
        back_ints = ops.spec.unpack(back)
        assert back_ints == vals, f"{label}: iNTT(NTT(x)) != x"
        w = ops.root_fn(N)
        y = ops.spec.unpack(fwd)
        for j in random.sample(range(N), 2):
            wj = pow(w, j, r)
            acc, p = 0, 1
            for v in vals:
                acc = (acc + v * p) % r
                p = p * wj % r
            assert y[j] == acc, f"{label}: NTT[{j}] wrong"
        _ok(f"NTT 2^{LG_NTT} {label}")


def check_msm():
    from celo_bls_snark_tpu.hostmath.params import R, G1_GENERATOR, G2_GENERATOR
    from celo_bls_snark_tpu.hostmath import curves as hc
    from celo_bls_snark_tpu.ops import msm as dmsm
    from celo_bls_snark_tpu.ops import curve as dc
    from celo_bls_snark_tpu.ops import bls as dbls

    B = 1 << LG_MSM
    random.seed(202)
    # distinct pseudorandom base points via cheap small multiples
    pts = [hc.G1.mul(3 + 2 * i, G1_GENERATOR) for i in range(B)]
    scalars = [random.randrange(R) for _ in range(B)]
    got = dmsm.msm_pippenger(pts, scalars)
    exp = hc.G1.msm(scalars, pts, c=12)
    assert got == exp, "G1 Pippenger MSM mismatch"
    _ok(f"MSM 2^{LG_MSM} BLS12-377 G1")

    Bg2 = B // 4  # G2 host oracle is 3x the field cost
    pts2 = [hc.G2.mul(5 + 2 * i, G2_GENERATOR) for i in range(Bg2)]
    sc2 = [random.randrange(R) for _ in range(Bg2)]
    got2 = dmsm.msm_pippenger(
        pts2, sc2, curve=dc.g2,
        pack_fn=dbls.pack_g2_affine, unpack_fn=dc.g2_unpack,
    )
    exp2 = hc.G2.msm(sc2, pts2, c=12)
    assert got2 == exp2, "G2 Pippenger MSM mismatch"
    _ok(f"MSM 2^{LG_MSM - 2} BLS12-377 G2")


def check_pairing():
    from celo_bls_snark_tpu.hostmath.params import R, G2_GENERATOR
    from celo_bls_snark_tpu.hostmath import curves as hc
    from celo_bls_snark_tpu.bls import PrivateKey, PublicKey, SIG_DOMAIN
    from celo_bls_snark_tpu.hash_to_curve import composite_hash_to_g1_cip22
    from celo_bls_snark_tpu.utils.rngs import XorShiftRng
    from celo_bls_snark_tpu.ops import bls as dbls
    from celo_bls_snark_tpu.ops import curve as dc

    rng = XorShiftRng(b"smoke-pairing-01")
    h2c = composite_hash_to_g1_cip22()
    sks = [PrivateKey.generate(rng) for _ in range(8)]
    apk = PublicKey.aggregate([sk.to_public() for sk in sks])
    sk_sum = sum(sk.sk for sk in sks) % R
    msgs = [b"smoke block %06d" % i for i in range(B_PAIR)]
    hashes = [h2c.hash(SIG_DOMAIN, m, b"") for m in msgs]
    sigs = [hc.G1.mul(sk_sum, h) for h in hashes]
    sigs_jac = jax.tree.map(jnp.asarray, dc.g1_pack(sigs))
    hashes_jac = jax.tree.map(jnp.asarray, dc.g1_pack(hashes))
    apk_aff = jax.tree.map(jnp.asarray, dbls.pack_g2_affine([apk.pt]))
    def fn(s, h, pk):
        return dbls.batch_verify_grouped_aot(s, h, pk, 1)
    ok = bool(np.asarray(fn(sigs_jac, hashes_jac, apk_aff))[0])
    assert ok, "valid batched pairing check rejected"
    # forge one signature: swap lanes 0 and 1
    bad = jax.tree.map(
        lambda x: x.at[..., 0].set(x[..., 1]), sigs_jac
    )
    bad_ok = bool(np.asarray(fn(bad, hashes_jac, apk_aff))[0])
    assert not bad_ok, "forged signature accepted"
    _ok(f"pairing batch {B_PAIR} (accept + reject)")


def check_hash():
    from celo_bls_snark_tpu.bls import SIG_DOMAIN
    from celo_bls_snark_tpu.hash_to_curve.try_and_increment_cip22 import (
        TryAndIncrementCIP22, composite_hash_to_g1_cip22,
    )
    from celo_bls_snark_tpu.hashers.direct import DirectHasher
    from celo_bls_snark_tpu.ops.hash_to_g1 import (
        hash_to_g1_direct_cip22_batch, hash_to_g1_composite_cip22_batch,
    )

    msgs = [b"smoke hash message %06d" % i for i in range(B_HASH)]
    host_d = TryAndIncrementCIP22(DirectHasher(), "g1", True)
    exp = [host_d.hash(SIG_DOMAIN, m, b"") for m in msgs]
    got = hash_to_g1_direct_cip22_batch(SIG_DOMAIN, msgs, b"")
    assert got == exp, "direct hash-to-G1 mismatch"
    _ok(f"hash-to-G1 direct batch {B_HASH}")

    msgs_c = msgs[: B_HASH // 4]
    host_c = composite_hash_to_g1_cip22()
    exp_c = [host_c.hash(SIG_DOMAIN, m, b"") for m in msgs_c]
    got_c = hash_to_g1_composite_cip22_batch(SIG_DOMAIN, msgs_c, b"")
    assert got_c == exp_c, "composite hash-to-G1 mismatch"
    _ok(f"hash-to-G1 composite batch {len(msgs_c)}")


def main():
    print(f"backend={jax.default_backend()} "
          f"ntt=2^{LG_NTT} msm=2^{LG_MSM} pair={B_PAIR} hash={B_HASH}",
          flush=True)
    check_pairing()
    check_hash()
    check_msm()
    check_ntt()
    print(f"SMOKE OK in {time.perf_counter() - T0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
