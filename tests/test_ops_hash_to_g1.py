"""Device batched hash-to-G1 vs the host try-and-increment oracle.

The device path (ops/hash_to_g1.py) must reproduce
TryAndIncrementCIP22(DirectHasher) bit-for-bit: same CRH/XOF bytes, same
counter selection, same decompressed point, same cofactor multiple
(reference semantics try_and_increment_cip22.rs:81-134 + direct.rs).
"""

import conftest  # noqa: F401

import pytest

from celo_bls_snark_tpu.bls import SIG_DOMAIN
from celo_bls_snark_tpu.hash_to_curve.try_and_increment_cip22 import (
    TryAndIncrementCIP22,
)
from celo_bls_snark_tpu.hashers.direct import DirectHasher
from celo_bls_snark_tpu.ops.hash_to_g1 import hash_to_g1_direct_cip22_batch


@pytest.mark.parametrize("compat", [True, False])
def test_device_matches_host_oracle(compat):
    msgs = [b"device hash-to-g1 message %02d" % i for i in range(6)]
    extra = b"\x07\x08"
    host = TryAndIncrementCIP22(DirectHasher(), "g1", compat)
    expected = [host.hash(SIG_DOMAIN, m, extra) for m in msgs]
    got = hash_to_g1_direct_cip22_batch(
        SIG_DOMAIN, msgs, extra, compat=compat
    )
    assert got == expected


def test_counter_selection_matches_host():
    """The device picks the same first-success counter as the host loop
    (exercised implicitly above; here we assert the attempt indices on a
    batch big enough to see counters > 0)."""
    msgs = [b"counter-check message %03d" % i for i in range(24)]
    host = TryAndIncrementCIP22(DirectHasher(), "g1", True)
    attempts = [
        host.hash_with_attempt_cip22(SIG_DOMAIN, m, b"")[1] for m in msgs
    ]
    assert max(attempts) > 0  # the batch exercises retries
    got = hash_to_g1_direct_cip22_batch(SIG_DOMAIN, msgs, b"")
    expected = [
        host.hash_with_attempt_cip22(SIG_DOMAIN, m, b"")[0] for m in msgs
    ]
    assert got == expected


def test_fallback_path():
    """num_counters=1 forces ~58% of messages through the host fallback —
    results must still match the oracle exactly."""
    msgs = [b"fallback message %02d" % i for i in range(8)]
    host = TryAndIncrementCIP22(DirectHasher(), "g1", True)
    expected = [host.hash(SIG_DOMAIN, m, b"") for m in msgs]
    got = hash_to_g1_direct_cip22_batch(
        SIG_DOMAIN, msgs, b"", num_counters=1
    )
    assert got == expected


@pytest.mark.parametrize("compat", [True, False])
def test_composite_device_matches_host_oracle(compat):
    """The COMPOSITE (Bowe-Hopwood CRH) device pipeline — the reference's
    production sign-path hash — vs TryAndIncrementCIP22(CompositeHasher)
    (try_and_increment_cip22.rs:30-32, composite.rs:80-95)."""
    from celo_bls_snark_tpu.hash_to_curve.try_and_increment_cip22 import (
        composite_hash_to_g1_cip22,
    )
    from celo_bls_snark_tpu.ops.hash_to_g1 import (
        hash_to_g1_composite_cip22_batch,
    )

    msgs = [b"composite device h2g message %02d" % i for i in range(5)]
    extra = b"\x01\x02"
    host = composite_hash_to_g1_cip22(compat)
    expected = [host.hash(SIG_DOMAIN, m, extra) for m in msgs]
    got = hash_to_g1_composite_cip22_batch(
        SIG_DOMAIN, msgs, extra, compat=compat
    )
    assert got == expected


def test_round2_merge_path():
    """A batch big enough that some messages always need counters > 8
    forces the round-2 fused dispatch and the numpy scatter merge
    (num_counters > C1). Bit-exact vs the host loop."""
    msgs = [b"round2 merge msg %04d" % i for i in range(512)]
    host = TryAndIncrementCIP22(DirectHasher(), "g1", True)
    attempts = [
        host.hash_with_attempt_cip22(SIG_DOMAIN, m, b"")[1] for m in msgs
    ]
    assert max(attempts) >= 8  # round 2 genuinely exercised
    got = hash_to_g1_direct_cip22_batch(SIG_DOMAIN, msgs, b"",
                                        num_counters=24)
    expected = [
        host.hash_with_attempt_cip22(SIG_DOMAIN, m, b"")[0] for m in msgs
    ]
    assert got == expected


def test_per_message_extra_data_and_device_batch_verify():
    """Round-5 additions: per-message extra_data through the device
    pipeline, and the full batch_verify-with-hashing device entry
    (ops/bls.py batch_verify_messages_device — the reference's
    Signature::batch_verify semantics, signature.rs:101-117)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from celo_bls_snark_tpu.bls import PrivateKey, PublicKey
    from celo_bls_snark_tpu.hostmath.params import R
    from celo_bls_snark_tpu.hostmath import curves as hc
    from celo_bls_snark_tpu.utils.rngs import XorShiftRng
    from celo_bls_snark_tpu.ops.hash_to_g1 import hash_to_g1_device
    from celo_bls_snark_tpu.ops import bls as dbls, curve as dc
    from celo_bls_snark_tpu.ops.field import FQ

    B = 16
    msgs = [b"m %06d" % i for i in range(B)]
    extras = [b"e %04d" % i for i in range(B)]
    h2c = TryAndIncrementCIP22(DirectHasher(), "g1", True)
    exp = [h2c.hash(SIG_DOMAIN, m, e) for m, e in zip(msgs, extras)]
    jac, has = hash_to_g1_device(
        SIG_DOMAIN, msgs, extras, compat=True, num_counters=24
    )
    assert has.all()
    assert dc.unpack_jac(dc.g1, FQ, jac) == exp

    rng = XorShiftRng(b"devmsgverify0001")
    sks = [PrivateKey.generate(rng) for _ in range(5)]
    apk = PublicKey.aggregate([sk.to_public() for sk in sks])
    sk_sum = sum(sk.sk for sk in sks) % R
    sigs = [hc.G1.mul(sk_sum, h) for h in exp]
    sigs_jac = jax.tree.map(jnp.asarray, dc.g1_pack(sigs))
    apk_aff = jax.tree.map(jnp.asarray, dbls.pack_g2_affine([apk.pt]))
    ok = dbls.batch_verify_messages_device(
        sigs_jac, apk_aff, SIG_DOMAIN, msgs, extras, groups=1
    )
    assert bool(np.asarray(ok)[0])
    bad = jax.tree.map(lambda x: x.at[..., 0].set(x[..., 1]), sigs_jac)
    bad_ok = dbls.batch_verify_messages_device(
        bad, apk_aff, SIG_DOMAIN, msgs, extras, groups=1
    )
    assert not bool(np.asarray(bad_ok)[0])
