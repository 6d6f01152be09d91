"""Hashing-INCLUDED batch verification throughput on the TPU.

The reference's `batch_verify` includes message hashing
(crates/bls-crypto/src/bls/signature.rs:101-117: hash every message to G1,
then one (n+1)-pairing product); round-2's headline bench measured the
pairing path with hashes precomputed on the host. This bench times the
full pipeline on device: batched try-and-increment hash-to-G1
(ops/hash_to_g1.py: Blake2s CRH + Blake2Xs XOF + Tonelli-Shanks
decompression + cofactor mul) flowing straight into the grouped pairing
check (ops/bls.py).

Prints ONE JSON line: hashing-included verifications/s on one chip.
"""

import json
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

from celo_bls_snark_tpu.hostmath.params import R
from celo_bls_snark_tpu.hostmath import curves as hc
from celo_bls_snark_tpu.bls import PrivateKey, PublicKey, SIG_DOMAIN
from celo_bls_snark_tpu.hash_to_curve.try_and_increment_cip22 import (
    TryAndIncrementCIP22,
)
from celo_bls_snark_tpu.hashers.direct import DirectHasher
from celo_bls_snark_tpu.utils.rngs import XorShiftRng
from celo_bls_snark_tpu.ops import bls as dbls
from celo_bls_snark_tpu.ops import curve as dc
from celo_bls_snark_tpu.ops.hash_to_g1 import hash_to_g1_device


def main():
    B = int(os.environ.get("BENCH_HASH_MESSAGES", "16384"))
    n_validators = int(os.environ.get("BENCH_VALIDATORS", "100"))
    rng = XorShiftRng(b"hashbench-seed01")
    sks = [PrivateKey.generate(rng) for _ in range(n_validators)]
    apk = PublicKey.aggregate([sk.to_public() for sk in sks])
    sk_sum = sum(sk.sk for sk in sks) % R

    msgs = [b"block payload %08d" % i for i in range(B)]

    # signatures: sig_i = sk_sum * H(m_i) — host-precomputed ONCE (signing
    # is the signers' cost; the verifier pipeline being timed is
    # hash + aggregate + pairing). Host hashing here only builds inputs.
    h2c = TryAndIncrementCIP22(DirectHasher(), "g1", True)
    hashes_host = [h2c.hash(SIG_DOMAIN, m, b"") for m in msgs]
    sigs = [hc.G1.mul(sk_sum, h) for h in hashes_host]
    sigs_jac = jax.tree.map(jnp.asarray, dc.g1_pack(sigs))
    apk_aff = jax.tree.map(jnp.asarray, dbls.pack_g2_affine([apk.pt]))

    # jit the pairing stage ONCE — calling batch_verify_grouped_device
    # eagerly dispatches every Miller-loop primitive separately over the
    # device tunnel (this was the round-3 regression: 29.4 verifs/s came
    # from eager dispatch latency, not compute)
    def pair_fn(s, h, pk):
        return dbls.batch_verify_grouped_aot(s, h, pk, 1)

    from celo_bls_snark_tpu.utils.profiling import (
        device_sync, report, reset, stage,
    )

    profile = os.environ.get("BENCH_HASH_PROFILE") == "1"

    def verify_with_hashing():
        with stage("bench.hash"):
            hashes_jac, has = hash_to_g1_device(SIG_DOMAIN, msgs, b"",
                                                compat=True, num_counters=24)
            if profile:
                device_sync(hashes_jac)
        assert has.all(), "fallback lane in bench batch"
        with stage("bench.pairing"):
            ok = pair_fn(sigs_jac, hashes_jac, apk_aff)
            out = bool(np.asarray(ok)[0])
        return out

    # warmup (compiles all stages) + correctness
    ok = verify_with_hashing()
    if not ok:
        raise RuntimeError("hashing-included verification failed")

    n_iter = 3
    reset()
    t0 = time.perf_counter()
    for _ in range(n_iter):
        ok = verify_with_hashing()
    dt = (time.perf_counter() - t0) / n_iter
    if not ok:
        raise RuntimeError("hashing-included verification failed (timed)")
    rate = B / dt
    if profile:
        print("--- stage breakdown (over %d iters) ---" % n_iter)
        for name, ent in sorted(report().items()):
            if "total_s" in ent:
                print(f"{name:24s} {ent['total_s']:8.2f}s  x{ent['calls']}")

    print(json.dumps({
        "metric": "bls12377_verifications_per_s_hashing_included",
        "value": round(rate, 1),
        "unit": "verifs/s/chip",
        "vs_baseline": round(rate / 1e6, 5),
        "batch": B,
    }), flush=True)

    # --- composite-hasher line: the production sign-path hash (Pedersen
    # CRH on device, ops/pedersen.py) feeding the same counter scan ------
    from celo_bls_snark_tpu.hashers.composite import composite_hasher
    from celo_bls_snark_tpu.ops import pedersen as ped

    h2c_c = TryAndIncrementCIP22(composite_hasher(), "g1", True)
    hashes_host_c = [h2c_c.hash(SIG_DOMAIN, m, b"") for m in msgs]
    sigs_c = [hc.G1.mul(sk_sum, h) for h in hashes_host_c]
    sigs_c_jac = jax.tree.map(jnp.asarray, dc.g1_pack(sigs_c))

    def verify_with_hashing_composite():
        crh = ped.bh_crh_digests(msgs)
        crh_u8 = np.frombuffer(b"".join(crh), dtype=np.uint8).reshape(B, 48)
        hashes_jac, has = hash_to_g1_device(
            SIG_DOMAIN, msgs, b"", compat=True, num_counters=24,
            crh_u8=crh_u8,
        )
        assert has.all(), "fallback lane in composite bench batch"
        ok = pair_fn(sigs_c_jac, hashes_jac, apk_aff)
        return bool(np.asarray(ok)[0])

    ok = verify_with_hashing_composite()
    if not ok:
        raise RuntimeError("composite hashing-included verification failed")
    t0 = time.perf_counter()
    for _ in range(n_iter):
        ok = verify_with_hashing_composite()
    dt = (time.perf_counter() - t0) / n_iter
    if not ok:
        raise RuntimeError("composite hashing-included verification failed")
    print(json.dumps({
        "metric": "bls12377_verifications_per_s_hashing_included_composite",
        "value": round(B / dt, 1),
        "unit": "verifs/s/chip",
        "vs_baseline": round(B / dt / 1e6, 5),
        "batch": B,
    }), flush=True)


if __name__ == "__main__":
    main()
