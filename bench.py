"""Benchmark: BLS12-377 aggregate-signature verification throughput on TPU.

The BDN18 batched path (reference: crates/bls-crypto/src/bls/signature.rs
batch_verify_hashes, n+1 pairings instead of 2n): one aggregate signature
over N committee messages is verified with N+1 lane-parallel Miller loops,
a log-depth GT product, and a single final exponentiation — plus the
on-device aggregation of the N per-committee signatures.

Message hashing (Blake2Xs/Pedersen try-and-increment) is precomputed on the
host, mirroring the reference's batch_verify -> batch_verify_hashes split.

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

from celo_bls_snark_tpu.hostmath.params import R, G2_GENERATOR
from celo_bls_snark_tpu.hostmath import curves as hc
from celo_bls_snark_tpu.bls import PrivateKey, PublicKey, SIG_DOMAIN
from celo_bls_snark_tpu.hash_to_curve import composite_hash_to_g1_cip22
from celo_bls_snark_tpu.utils.rngs import XorShiftRng
from celo_bls_snark_tpu.ops.field import FQ
from celo_bls_snark_tpu.ops import bls as dbls
from celo_bls_snark_tpu.ops import curve as dc
from celo_bls_snark_tpu.ops import pairing as dp
from celo_bls_snark_tpu.ops import tower as tw

import jax.numpy as jnp


def build_inputs(n_messages=1024, n_validators=100, seed=b"benchseedbenchsee"):
    """One validator committee of `n_validators` signing `n_messages`
    distinct messages (the Celo block-sync shape: same committee, many
    blocks — crates/bls-snark-sys/src/signatures.rs:280-333)."""
    rng = XorShiftRng(seed[:16])
    h2c = composite_hash_to_g1_cip22()
    sks = [PrivateKey.generate(rng) for _ in range(n_validators)]
    apk = PublicKey.aggregate([sk.to_public() for sk in sks])
    # committee secret key sum: sig_i = (sum sk) * H(m_i) — same group
    # element as aggregating per-validator sigs, far cheaper to set up
    sk_sum = sum(sk.sk for sk in sks) % R
    hashes = []
    sigs = []
    for i in range(n_messages):
        msg = b"block %06d" % i
        h = h2c.hash(SIG_DOMAIN, msg, b"")
        hashes.append(h)
        sigs.append(hc.G1.mul(sk_sum, h))
    return apk, hashes, sigs


def main():
    n_messages = int(os.environ.get("BENCH_MESSAGES", "1024"))
    n_validators = int(os.environ.get("BENCH_VALIDATORS", "100"))

    apk, hashes, sigs = build_inputs(n_messages, n_validators)

    # device inputs
    sig_jac = dc.g1_pack(sigs)
    hashes_aff = dbls.pack_g1_affine(hashes)
    apk_aff = dbls.pack_g2_affine([apk.pt] * n_messages)
    negg2 = dbls.pack_g2_affine([hc.G2.neg(G2_GENERATOR)])

    def verify(sig_jac, hashes_aff, apk_aff):
        # aggregate the N signatures on device, then the (n+1)-pairing check
        asig = dc.g1.msum(sig_jac)
        asig_aff = dc.g1.to_affine(asig)
        p_all = jax.tree.map(
            lambda s, h: jnp.concatenate([s, h], axis=-1), asig_aff, hashes_aff
        )
        q_all = jax.tree.map(
            lambda g, pk: jnp.concatenate([g, pk], axis=-1), negg2, apk_aff
        )
        f = dp.miller_loop_batch(p_all, q_all)
        f = dp.f12_product(f)
        e = dp.final_exponentiation(f)
        return tw.f12_is_one(e)

    fn = jax.jit(verify)
    out = fn(sig_jac, hashes_aff, apk_aff)
    ok = bool(np.asarray(out)[0])
    assert ok, "benchmark verification failed — kernels are broken"

    # timed runs
    n_iter = 3
    t0 = time.time()
    for _ in range(n_iter):
        out = fn(sig_jac, hashes_aff, apk_aff)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n_iter
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
