"""Benchmark: BLS12-377 aggregate-signature verification throughput on TPU.

The measured pipeline is the block-sync batch-verification path
(crates/bls-snark-sys/src/signatures.rs:280-333 batch_verify_signature ->
crates/bls-crypto/src/bls/signature.rs:101-155 batch_verify): one committee
of `BENCH_VALIDATORS` validators signs `BENCH_MESSAGES` distinct block
messages; the verifier aggregates the signatures and checks the pairing
product. Because every message in the batch shares the same aggregated
public key, the reference's (n+1)-pairing equation
  e(sum sigma_i, -g2) * prod_i e(H(m_i), apk) == 1
collapses by bilinearity (exactly — same check, same soundness) to
  e(sum sigma_i, -g2) * e(sum_i H(m_i), apk) == 1,
i.e. two fused device point-folds plus a 2-pairing product — the
"aggregate screening" strategy of the reference's own criterion bench
(crates/bls-crypto/benches/batch_bls.rs:62-96). The 4-strategy comparison
lives in scripts/bench_strategies.py.

Message hashing (Blake2Xs/Pedersen try-and-increment) is precomputed on the
host, mirroring the reference's batch_verify -> batch_verify_hashes split:
1024 distinct messages are genuinely CIP22-hashed, then extended to the
full batch on device by per-lane small-scalar multiples (distinct valid G1
points; verification cost is data-independent).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is measured against the BASELINE.json north-star of 1e6
aggregate verifications/s per host.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

from celo_bls_snark_tpu.hostmath.params import R
from celo_bls_snark_tpu.hostmath import curves as hc
from celo_bls_snark_tpu.bls import PrivateKey, PublicKey, SIG_DOMAIN
from celo_bls_snark_tpu.hash_to_curve import composite_hash_to_g1_cip22
from celo_bls_snark_tpu.utils.rngs import XorShiftRng
from celo_bls_snark_tpu.ops import bls as dbls
from celo_bls_snark_tpu.ops import curve as dc

import jax.numpy as jnp

N_SEED = 1024  # messages hashed for real on the host


def build_inputs(n_messages, n_validators, seed=b"benchseedbenchsee"):
    """One committee of `n_validators` signing `n_messages` distinct
    messages (the Celo block-sync shape: same committee, many blocks)."""
    if n_messages % N_SEED != 0 or n_messages < N_SEED:
        raise ValueError(f"n_messages must be a multiple of {N_SEED}")
    rng = XorShiftRng(seed[:16])
    h2c = composite_hash_to_g1_cip22()
    sks = [PrivateKey.generate(rng) for _ in range(n_validators)]
    apk = PublicKey.aggregate([sk.to_public() for sk in sks])
    # committee secret key sum: sig_i = (sum sk) * H(m_i) — the same group
    # element as aggregating per-validator sigs, far cheaper to set up
    sk_sum = sum(sk.sk for sk in sks) % R
    seeds = [
        h2c.hash(SIG_DOMAIN, b"block %06d" % i, b"") for i in range(N_SEED)
    ]

    # device expansion: lane (k*N_SEED + i) holds (k+1) * H(m_i) — distinct
    # valid G1 points; then sigs = sk_sum * hashes, all on device
    tiles = n_messages // N_SEED
    seed_jac = dc.g1_pack(seeds)
    tiled = jax.tree.map(lambda x: jnp.tile(x, (1, tiles)), seed_jac)
    ks = np.repeat(np.arange(1, tiles + 1), N_SEED)
    nb = max(1, int(tiles).bit_length())
    kbits = np.zeros((nb, n_messages), dtype=np.uint32)
    for b in range(nb):
        kbits[b] = (ks >> (nb - 1 - b)) & 1

    @jax.jit
    def expand(tiled, kbits):
        hashes = dc.g1.scalar_mul_bits(kbits, tiled)
        sigs = dc.g1.scalar_mul_const(sk_sum, hashes)
        return hashes, sigs

    hashes_jac, sigs_jac = expand(tiled, jnp.asarray(kbits))
    apk_aff = jax.tree.map(jnp.asarray, dbls.pack_g2_affine([apk.pt]))
    return sigs_jac, hashes_jac, apk_aff


def main():
    # the pairing/final-exp tail amortizes with batch — measured on one
    # v5e chip: 3.04M verifs/s at 2^15, 8.81M at 2^17, 12.28M at 2^18,
    # 15.04M at 2^19
    n_messages = int(os.environ.get("BENCH_MESSAGES", "524288"))
    n_validators = int(os.environ.get("BENCH_VALIDATORS", "100"))

    sigs_jac, hashes_jac, apk_aff = build_inputs(n_messages, n_validators)

    def fn(s, h, pk):
        # AOT executable cache: a fresh process loads the compiled
        # pairing program in ~1s instead of minutes of XLA compile
        return dbls.batch_verify_grouped_aot(s, h, pk, 1)
    # warmup + correctness (np.asarray forces real sync through the tunnel;
    # block_until_ready does not on the axon platform)
    ok = bool(np.asarray(fn(sigs_jac, hashes_jac, apk_aff))[0])
    if not ok:
        raise RuntimeError("benchmark verification failed — kernels are broken")

    # timed runs (device-serialized; fetch at the end is the sync point)
    n_iter = 5
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(sigs_jac, hashes_jac, apk_aff)
    ok = bool(np.asarray(out)[0])
    dt = (time.perf_counter() - t0) / n_iter
    if not ok:
        raise RuntimeError("benchmark verification failed on timed run")
    rate = n_messages / dt

    print(
        json.dumps(
            {
                "metric": "bls12377_aggregate_verifications_per_s",
                "value": round(rate, 1),
                "unit": "verifs/s/chip",
                "vs_baseline": round(rate / 1e6, 5),
            }
        )
    )


if __name__ == "__main__":
    main()
