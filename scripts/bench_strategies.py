"""The 4-strategy batch-BLS comparison on TPU — the device counterpart of
crates/bls-crypto/benches/batch_bls.rs:16-97.

Workload (reference shape): NUM_BLOCKS committees of NUM_VALIDATORS fresh
validators each sign their block's message; per block we hold the
individual (pk, sig) pairs, the per-block aggregates (apk_b, asig_b), and
the grand aggregate asig = sum_b asig_b.

Strategies (same pairing equations as the reference, each one fused device
program with ONE batched final exponentiation):
  1. per-epoch aggregate screening   — per block: e(asig_b, -g2) e(H_b, apk_b) == 1
  2. all-epoch aggregate screening   — one check: e(asig, -g2) prod_b e(H_b, apk_b) == 1
     (Signature::batch_verify, signature.rs:101-155)
  3. per-epoch batch verification    — per block, random exponents r_i:
     e(sum_i r_i sig_i, -g2) e(H_b, sum_i r_i pk_i) == 1 (Batch::verify,
     batch.rs:44-84, exponent sizing batch.rs:20-28)
  4. per-epoch individual            — every (b, i): e(sig_bi, -g2) e(H_b, pk_bi) == 1
     (Batch::verify_each, batch.rs:87-96)

Prints one JSON line per strategy:
  {"strategy": ..., "seconds": S, "messages_per_s": R}
"""

import json
import os
import secrets
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import jax.numpy as jnp

from celo_bls_snark_tpu.hostmath.params import R, G2_GENERATOR
from celo_bls_snark_tpu.ops import pairing as dp
from celo_bls_snark_tpu.bls import SIG_DOMAIN
from celo_bls_snark_tpu.bls.batch import byte_count_from_target_batch_size, SECURITY_BOUND
from celo_bls_snark_tpu.hash_to_curve import composite_hash_to_g1_cip22
from celo_bls_snark_tpu.ops import bls as dbls
from celo_bls_snark_tpu.ops import msm as dmsm
from celo_bls_snark_tpu.ops import curve as dc

B = int(os.environ.get("BENCH_BLOCKS", "300"))
V = int(os.environ.get("BENCH_VALIDATORS", "20"))


def interleave(a, b):
    """Lane-interleave two equal-batch trees: [B],[B] -> [2B] (a0 b0 a1 b1...)."""
    return jax.tree.map(
        lambda x, y: jnp.stack([x, y], axis=-1).reshape(*x.shape[:-1], -1),
        a,
        b,
    )


def build_inputs():
    h2c = composite_hash_to_g1_cip22()
    msgs = [b"block %06d" % b for b in range(B)]
    extras = [b"extra %04d" % b for b in range(B)]
    hashes = [
        h2c.hash(SIG_DOMAIN, m, e) for m, e in zip(msgs, extras)
    ]
    # fresh committee per block (reference: PrivateKey::generate per entry)
    sks = [secrets.randbelow(R - 1) + 1 for _ in range(B * V)]
    skbits = jnp.asarray(dbls.scalars_to_bits(sks))

    g2gen = dc.g2_pack([G2_GENERATOR] * (B * V))
    # lane b*V+i holds H_b (for sig_bi = sk_bi * H_b)
    h_per_val = dc.g1_pack([hashes[b] for b in range(B) for _ in range(V)])

    @jax.jit
    def derive(skbits, g2gen, h_per_val):
        pk_jac = dc.g2.scalar_mul_bits(skbits, g2gen)
        sig_jac = dc.g1.scalar_mul_bits(skbits, h_per_val)
        apk_b = dc.g2.msum_groups(pk_jac, B)
        asig_b = dc.g1.msum_groups(sig_jac, B)
        asig = dc.g1.msum(asig_b)
        return pk_jac, sig_jac, apk_b, asig_b, asig

    pk_jac, sig_jac, apk_b, asig_b, asig = derive(skbits, g2gen, h_per_val)
    h_aff = dc.g1.to_affine(dc.g1_pack(hashes))
    return dict(
        pk_jac=pk_jac, sig_jac=sig_jac, apk_b=apk_b, asig_b=asig_b,
        asig=asig, h_aff=h_aff, h_per_val=h_per_val,
        msgs=msgs, extras=extras,
    )


def make_hasher(inp):
    """Device hashing of the B block messages — timed as part of every
    strategy (the reference's batch_verify hashes every message:
    signature.rs:101-117; round 4 timed only the pairing math)."""
    from celo_bls_snark_tpu.ops.hash_to_g1 import hash_to_g1_device
    from celo_bls_snark_tpu.ops import pedersen as ped

    msgs, extras = inp["msgs"], inp["extras"]

    to_aff = jax.jit(dc.g1.to_affine)
    rep = jax.jit(
        lambda t: jax.tree.map(lambda x: jnp.repeat(x, V, axis=-1), t)
    )

    def hash_blocks():
        crh = ped.bh_crh_digests(msgs)
        crh_u8 = np.frombuffer(b"".join(crh), dtype=np.uint8).reshape(B, -1)
        jac, has = hash_to_g1_device(
            SIG_DOMAIN, msgs, extras, compat=True, num_counters=24,
            crh_u8=crh_u8,
        )
        assert has.all(), "fallback lane in strategies bench"
        return jac

    return hash_blocks, to_aff, rep


def make_strategies(inp):
    negg2_B = jax.tree.map(jnp.asarray, dbls.neg_g2_gen_affine(B))
    negg2_1 = jax.tree.map(jnp.asarray, dbls.neg_g2_gen_affine(1))
    negg2_BV = jax.tree.map(jnp.asarray, dbls.neg_g2_gen_affine(B * V))

    @jax.jit
    def per_epoch_aggregate(asig_b, apk_b, h_aff):
        p = interleave(dc.g1.to_affine(asig_b), h_aff)
        q = interleave(negg2_B, dc.g2.to_affine(apk_b))
        return jnp.all(dbls.verify_pairs_device(p, q))

    @jax.jit
    def all_epoch_aggregate(asig, apk_b, h_aff):
        p = jax.tree.map(
            lambda a, h: jnp.concatenate([a, h], axis=-1),
            dc.g1.to_affine(asig), h_aff,
        )
        q = jax.tree.map(
            lambda g, pk: jnp.concatenate([g, pk], axis=-1),
            negg2_1, dc.g2.to_affine(apk_b),
        )
        return dp.pairing_check_product(p, q)[0]

    @jax.jit
    def per_epoch_batch(expdigits, sig_jac, pk_jac, h_aff):
        # the device Batch::verify pipeline: Straus grouped MSMs + one
        # batched pairing pass, per-epoch results (ops/bls.py)
        return jnp.all(dbls.strict_batch_verify_device(
            expdigits, sig_jac, pk_jac, h_aff, B, c=4
        ))

    @jax.jit
    def per_epoch_individual(sig_jac, pk_jac, h_per_val):
        p = interleave(
            dc.g1.to_affine(sig_jac), dc.g1.to_affine(h_per_val)
        )
        q = interleave(negg2_BV, dc.g2.to_affine(pk_jac))
        return jnp.all(dbls.verify_pairs_device(p, q))

    exp_size = byte_count_from_target_batch_size(V, SECURITY_BOUND)
    exps = [
        int.from_bytes(secrets.token_bytes(exp_size), "little") % R
        for _ in range(B * V)
    ]
    expdigits = jnp.asarray(dmsm.window_digits(exps, 8 * exp_size, 4))

    # every strategy hashes the B block messages on device first — the
    # timed quantity now matches the reference's batch_verify semantics
    hash_blocks, to_aff, rep = make_hasher(inp)

    return [
        ("per-epoch aggregate screening",
         lambda: per_epoch_aggregate(
             inp["asig_b"], inp["apk_b"], to_aff(hash_blocks()))),
        ("all epoch aggregate screening",
         lambda: all_epoch_aggregate(
             inp["asig"], inp["apk_b"], to_aff(hash_blocks()))),
        ("per-epoch batch verification",
         lambda: per_epoch_batch(
             expdigits, inp["sig_jac"], inp["pk_jac"],
             to_aff(hash_blocks()))),
        ("per-epoch individual verification",
         lambda: per_epoch_individual(
             inp["sig_jac"], inp["pk_jac"], rep(hash_blocks()))),
    ]


def main():
    inp = build_inputs()
    for name, fn in make_strategies(inp):
        ok = bool(np.asarray(fn()))
        assert ok, f"strategy {name!r} failed verification"
        n_iter = 3
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = fn()
        assert bool(np.asarray(out))
        dt = (time.perf_counter() - t0) / n_iter
        print(json.dumps({
            "strategy": name,
            "seconds": round(dt, 4),
            "messages_per_s": round(B / dt, 1),
        }))


if __name__ == "__main__":
    main()
