"""Per-stage wall-clock profile of the device hash-to-G1 pipeline
(ops/hash_to_g1.py) — identifies where the hashing-included verification
time goes (CRH pack/run, XOF+parse+Legendre, host select, Tonelli-Shanks
finish + cofactor, pairing check).

Usage: python scripts/prof_hash.py [batch] [num_counters]
"""

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

from celo_bls_snark_tpu.bls import SIG_DOMAIN
from celo_bls_snark_tpu.ops import blake2s as db
from celo_bls_snark_tpu.ops import curve as dc
from celo_bls_snark_tpu.ops import hash_to_g1 as hg
from celo_bls_snark_tpu.ops.hash_to_g1 import (
    _candidate_points, _tonelli_shanks_finish, _select_greatest, _JITS,
)
from celo_bls_snark_tpu.hostmath.params import G1_COFACTOR
from celo_bls_snark_tpu.hash_to_curve.common import hash_length, G1_BYTES


def bench(label, fn, iters=3):
    fn()  # warm (compile)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:34s} {dt*1e3:10.1f} ms", flush=True)
    return out, dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    domain = SIG_DOMAIN
    compat = True
    msgs = [b"block payload %08d" % i for i in range(B)]
    hash_bytes = hash_length(G1_BYTES)
    print(f"B={B} C={C} lanes={B*C} backend={jax.default_backend()}", flush=True)

    words, _ = bench("pack crh msgs (host)",
                     lambda: db.pack_messages(msgs))

    mlen = len(msgs[0])
    crh_fn = jax.jit(lambda w: db.blake2s_batch(
        w, mlen, digest_size=32,
        node_offset=db._xof_node_offset(hash_bytes), person=domain))
    crh, _ = bench("crh blake2s (device)", lambda: crh_fn(words))
    crh_np = np.asarray(crh)

    def build_xof():
        crh_bytes = [crh_np[:, i].astype("<u4").tobytes() for i in range(B)]
        xof_msgs = [bytes([c]) + crh_bytes[i]
                    for c in range(C) for i in range(B)]
        return db.pack_messages(xof_msgs), len(xof_msgs[0])

    (xof_words, msg_len), _ = bench("build+pack xof msgs (host)",
                                    lambda: build_xof())

    xof_fn = jax.jit(lambda w: db.blake2xs_batch(
        w, msg_len, hash_bytes, person=domain))
    xw, _ = bench("xof blake2xs (device)", lambda: xof_fn(xof_words))

    parse_fn = jax.jit(lambda w: hg._parse_candidates(w, compat))
    _, _ = bench("parse candidates (device)", lambda: parse_fn(xw))

    stage_a = jax.jit(lambda w: _candidate_points(
        db.blake2xs_batch(w, msg_len, hash_bytes, person=domain), compat))
    (x, greatest, valid, w_, t), _ = bench("stage_a xof+parse+legendre",
                                           lambda: stage_a(xof_words))

    def select():
        valid_np = np.asarray(valid).reshape(C, B)
        first = np.argmax(valid_np, axis=0)
        return jnp.asarray((first * B + np.arange(B)).astype(np.int32))

    sel, _ = bench("host select (sync+argmax)", lambda: select())

    def _stage_b(x, greatest, w, t, sel):
        xs = jnp.take(x, sel, axis=-1)
        ws = jnp.take(w, sel, axis=-1)
        ts = jnp.take(t, sel, axis=-1)
        gs = jnp.take(greatest, sel, axis=-1)
        y = _tonelli_shanks_finish(ts, ws)
        y = _select_greatest(y, gs)
        pt = dc.g1.from_affine((xs, y))
        return dc.g1.scalar_mul_const(G1_COFACTOR, pt)

    sb = jax.jit(_stage_b)
    _, _ = bench("stage_b ts-finish+cofactor",
                 lambda: sb(x, greatest, w_, t, sel))

    # whole pipeline for reference
    def full():
        out, has = hg.hash_to_g1_device(domain, msgs, b"", compat, C)
        jax.block_until_ready(out)
        return out

    bench("FULL hash_to_g1_device", full)


if __name__ == "__main__":
    main()
