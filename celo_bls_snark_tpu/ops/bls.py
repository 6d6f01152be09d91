"""Device-side BLS verification pipelines (the batched/TPU counterparts of
crates/bls-crypto/src/bls/{public,signature,batch}.rs).

Message hashing (Blake2/Pedersen try-and-increment) is control-flow-heavy
and byte-oriented; it runs on the host (hash_to_curve package) — the device
consumes message HASH POINTS. This mirrors the reference's split between
`batch_verify` and the lower-level `batch_verify_hashes`
(signature.rs:101-155): the hot pairing/aggregation math is batched on
device, the byte-plumbing stays on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..hostmath.params import G2_GENERATOR
from ..hostmath import curves as hostcurves
from .field import FQ, fq
from . import curve as dc
from . import tower as tw
from . import pairing as dp


def pack_g1_affine(points):
    """Host affine G1 points (None = infinity -> (0,0)) -> (x, y) arrays."""
    xs = [0 if p is None else p[0] for p in points]
    ys = [0 if p is None else p[1] for p in points]
    return (FQ.pack(xs), FQ.pack(ys))


def pack_g2_affine(points):
    xs0 = [0 if p is None else p[0][0] for p in points]
    xs1 = [0 if p is None else p[0][1] for p in points]
    ys0 = [0 if p is None else p[1][0] for p in points]
    ys1 = [0 if p is None else p[1][1] for p in points]
    return (
        (FQ.pack(xs0), FQ.pack(xs1)),
        (FQ.pack(ys0), FQ.pack(ys1)),
    )


def neg_g2_gen_affine(batch=1):
    """-g2 as a device affine batch (for the e(sigma, -g2) leg)."""
    neg = hostcurves.G2.neg(G2_GENERATOR)
    return pack_g2_affine([neg] * batch)


def batch_verify_hashes_device(sig_aff, pubkeys_aff, hashes_aff):
    """e(sigma, -g2) * prod_i e(H_i, pk_i) == 1 (BDN18, n+1 pairings, one
    final exponentiation) — signature.rs:125-155, fully batched.

    sig_aff:     (x, y) arrays with batch 1
    pubkeys_aff: G2 affine batch [B]
    hashes_aff:  G1 affine batch [B]
    Returns a boolean array of shape [1].
    """
    negg2 = jax.tree.map(
        lambda a: jnp.asarray(a), neg_g2_gen_affine(1)
    )
    p_all = jax.tree.map(
        lambda s, h: jnp.concatenate([s, h], axis=-1), sig_aff, hashes_aff
    )
    q_all = jax.tree.map(
        lambda g, pk: jnp.concatenate([g, pk], axis=-1), negg2, pubkeys_aff
    )
    return dp.pairing_check_product(p_all, q_all)


def batch_verify_grouped_device(sigs_jac, hashes_jac, apks_aff, groups: int):
    """Block-sync batch verification with per-group hash aggregation — the
    TPU-native form of `batch_verify_signature` (bls-snark-sys
    signatures.rs:280-333 -> signature.rs:101-155).

    Lanes are grouped by distinct (aggregated) public key: groups equal
    contiguous blocks of B = lanes/groups messages each, message i of group
    g signed by apk_g. Within a group the pairing legs share Q = apk_g, so
      prod_i e(H_i, apk_g) == e(sum_i H_i, apk_g)
    and the reference's (n+1)-pairing equation collapses EXACTLY (same
    bilinearity identity, not an approximation) to G+1 pairings:
      e(sum_all sigs, -g2) * prod_g e(Hsum_g, apk_g) == 1.
    Device cost per message: ~2 projective adds instead of a Miller loop.

    sigs_jac / hashes_jac: G1 projective batches [G*B]; apks_aff: G2 affine
    batch [G]. Returns a boolean array of shape [1].
    """
    combined = jax.tree.map(
        lambda s, h: jnp.concatenate([s, h], axis=-1), sigs_jac, hashes_jac
    )
    # [sig groups | hash groups] -> 2G partial sums in one fused fold
    partials = dc.g1.msum_groups(combined, 2 * groups, fold_lanes=1024)
    sig_parts = jax.tree.map(lambda x: x[..., :groups], partials)
    hsums = jax.tree.map(lambda x: x[..., groups:], partials)
    asig = dc.g1.msum(sig_parts) if groups > 1 else sig_parts
    p_jac = jax.tree.map(
        lambda a, h: jnp.concatenate([a, h], axis=-1), asig, hsums
    )
    p_aff = dc.g1.to_affine(p_jac)
    negg2 = jax.tree.map(lambda a: jnp.asarray(a), neg_g2_gen_affine(1))
    q_aff = jax.tree.map(
        lambda g, pk: jnp.concatenate([g, pk], axis=-1), negg2, apks_aff
    )
    return dp.pairing_check_product(p_aff, q_aff)


_GROUPED_AOT = {}


def batch_verify_grouped_aot(sigs_jac, hashes_jac, apks_aff, groups: int):
    """batch_verify_grouped_device through the cross-process AOT
    executable cache — the pairing program is minutes of XLA compile on
    the axon service per fresh process otherwise (bench.py, the smoke
    suite and the hash-verify bench all dispatch this exact program)."""
    fn = _GROUPED_AOT.get(groups)
    if fn is None:
        from ..utils.aotcache import AotJit

        fn = _GROUPED_AOT[groups] = AotJit(
            f"bls_grouped_{groups}",
            lambda s, h, pk: batch_verify_grouped_device(s, h, pk, groups),
        )
    return fn(sigs_jac, hashes_jac, apks_aff)


def batch_verify_messages_device(sigs_jac, apks_aff, domain, messages,
                                 extra_data=b"", groups: int = 1,
                                 composite: bool = False,
                                 num_counters: int = 24,
                                 compat: bool = True):
    """The reference's `Signature::batch_verify` INCLUDING message hashing
    (signature.rs:101-117) as one device pipeline: batched CIP22
    try-and-increment hash-to-G1 (ops/hash_to_g1.py; Pedersen CRH when
    `composite`) feeding the grouped (G+1)-pairing check. The rare
    no-valid-counter lanes (prob ~0.58^num_counters) fall back to the
    host hasher and are merged on device.

    sigs_jac: G1 projective [len(messages)]; apks_aff: G2 affine
    [groups]; messages: equal-length byte strings, group g owning the
    contiguous lanes [g*B, (g+1)*B). extra_data: shared bytes or a
    per-message list. Returns a boolean array of shape [1]."""
    from .hash_to_g1 import hash_to_g1_device

    if composite:
        from . import pedersen as ped

        crh = ped.bh_crh_digests(messages)
        crh_u8 = np.frombuffer(b"".join(crh), dtype=np.uint8).reshape(
            len(messages), -1
        )
    else:
        crh_u8 = None
    hashes_jac, has = hash_to_g1_device(
        domain, messages, extra_data, compat=compat,
        num_counters=num_counters, crh_u8=crh_u8,
    )
    if not has.all():
        from ..hash_to_curve.try_and_increment_cip22 import (
            TryAndIncrementCIP22,
        )

        if composite:
            from ..hashers.composite import composite_hasher

            h2c = TryAndIncrementCIP22(composite_hasher(), "g1", compat)
        else:
            from ..hashers.direct import DirectHasher

            h2c = TryAndIncrementCIP22(DirectHasher(), "g1", compat)
        idx = np.nonzero(~has)[0]
        pts = []
        for i in idx:
            e = extra_data if isinstance(extra_data, bytes) else extra_data[i]
            pt, _ = h2c.hash_with_attempt_cip22(domain, messages[i], e)
            pts.append(pt)
        patch = jax.tree.map(jnp.asarray, dc.g1_pack(pts))
        hashes_jac = jax.tree.map(
            lambda full, part: full.at[..., jnp.asarray(idx)].set(part),
            hashes_jac, patch,
        )
    return batch_verify_grouped_aot(sigs_jac, hashes_jac, apks_aff, groups)


def _interleave(a, b):
    """Lane-interleave two equal-batch trees: [B],[B] -> [2B]."""
    return jax.tree.map(
        lambda x, y: jnp.stack([x, y], axis=-1).reshape(*x.shape[:-1], -1),
        a,
        b,
    )


def strict_batch_verify_device(expdigits, sigs_jac, pks_jac, hashes_aff,
                               groups: int, c: int = 4):
    """Many strict (rogue-key-defended) batch verifications in ONE device
    program — the TPU form of running `Batch::verify` per epoch
    (batch.rs:44-84 via bls-snark-sys batch_verify_strict,
    signatures.rs:336-404).

    Per group g (one message/epoch, V entries):
      e(sum_i r_i sig_i, -g2) * e(H_g, sum_i r_i pk_i) == 1
    with per-entry random exponents r_i. The two random-linear
    combinations run as Straus grouped MSMs (ops/msm.py — shared Horner
    doubling at group width), the 2G pairing legs share one batched
    Miller pass and one final exponentiation.

    expdigits: [nw, G*V] int32 window digits of the random exponents
               (msm.window_digits, MSB-first, base 2^c);
    sigs_jac / pks_jac: projective G1/G2 batches [G*V];
    hashes_aff: G1 affine batch [G] (the per-epoch message hashes).
    Returns bool [G] — per-epoch results, matching the reference's
    per-batch result array."""
    from . import msm as dmsm

    bsig = dmsm.straus_msm_groups(dc.g1, expdigits, sigs_jac, groups, c)
    bpk = dmsm.straus_msm_groups(dc.g2, expdigits, pks_jac, groups, c)
    negg2 = jax.tree.map(jnp.asarray, neg_g2_gen_affine(groups))
    p = _interleave(dc.g1.to_affine(bsig), hashes_aff)
    q = _interleave(negg2, dc.g2.to_affine(bpk))
    return verify_pairs_device(p, q)


def verify_pairs_device(p_aff, q_aff):
    """Independent 2-pairing checks, fully batched: lanes 2i and 2i+1 form
    check i, e(P_{2i}, Q_{2i}) * e(P_{2i+1}, Q_{2i+1}) == 1. One batched
    Miller pass + ONE batched final exponentiation for ALL checks — the
    device form of running PublicKey::verify (public.rs:90-117) over many
    independent (sig, pk, hash) triples at once. Returns bool [B/2]."""
    f = dp.miller_loop_batch(p_aff, q_aff)
    even = jax.tree.map(lambda x: x[..., 0::2], f)
    odd = jax.tree.map(lambda x: x[..., 1::2], f)
    e = dp.final_exponentiation(tw.f12_mul(even, odd))
    return tw.f12_is_one(e)


def aggregate_g2_device(pubkeys_jac):
    """Sum of a projective G2 batch -> batch-1 point (PublicKey::aggregate)."""
    return dc.g2.msum(pubkeys_jac)


def aggregate_g1_device(sigs_jac):
    """Sum of a projective G1 batch -> batch-1 point (Signature::aggregate)."""
    return dc.g1.msum(sigs_jac)


def scalars_to_bits(scalars, nbits=253):
    """List of python ints -> [nbits, B] uint32 MSB-first bit array."""
    B = len(scalars)
    bits = np.zeros((nbits, B), dtype=np.uint32)
    for j, k in enumerate(scalars):
        for i in range(nbits):
            bits[i, j] = (k >> (nbits - 1 - i)) & 1
    return bits


def msm_g1_device(bits, points_jac):
    """Batched scalar-mul + tree-sum MSM (double-and-add form).

    bits: [nbits, B]; points_jac: G1 projective batch [B]. Returns batch-1
    projective point = sum_i scalar_i * P_i.
    The Pippenger bucketed version (windowed, mesh-sharded) lives in
    ops/msm.py; this dense form is the small-batch path
    (PublicKey::batch / Signature::batch semantics, public.rs:47-65).
    """
    prods = dc.g1.scalar_mul_bits(bits, points_jac)
    return dc.g1.msum(prods)


def msm_g2_device(bits, points_jac):
    prods = dc.g2.scalar_mul_bits(bits, points_jac)
    return dc.g2.msum(prods)
