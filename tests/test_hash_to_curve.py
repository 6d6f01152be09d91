"""Golden-vector tests for try-and-increment hash-to-curve.

Mirrors crates/bls-crypto/src/hash_to_curve/mod.rs compat_tests /
non_compat_tests (10+10 G1 vectors pinned to the pre-Donut deployment, 10
CIP22 vectors, 10 non-compat G2 vectors).
"""

import pytest

from celo_bls_snark_tpu.hash_to_curve import (
    TryAndIncrement,
    composite_hash_to_g1,
    composite_hash_to_g1_cip22,
    hash_length,
)
from celo_bls_snark_tpu.hashers.composite import composite_hasher
from celo_bls_snark_tpu.utils.rngs import XorShiftRng
from celo_bls_snark_tpu.utils.serialization import g1_to_bytes, g2_to_bytes

import vectors as V


def test_hash_length():
    assert hash_length(48) == 64
    assert hash_length(96) == 96


def _run_vectors(hasher, expected, serialize):
    rng = XorShiftRng(V.XORSHIFT_SEED_5D)
    for exp in expected:
        domain, msg, extra = V.generate_test_data(rng)
        pt = hasher.hash(domain, msg, extra)
        assert serialize(pt).hex() == exp


def test_hash_to_g1_compat_vectors():
    _run_vectors(composite_hash_to_g1(compat=True), V.HASH_TO_G1_COMPAT, g1_to_bytes)


def test_hash_to_g1_cip22_vectors():
    _run_vectors(
        composite_hash_to_g1_cip22(compat=True), V.HASH_TO_G1_CIP22, g1_to_bytes
    )


def test_hash_to_g1_noncompat_vectors():
    _run_vectors(
        composite_hash_to_g1(compat=False), V.HASH_TO_G1_NONCOMPAT, g1_to_bytes
    )


def test_hash_to_g2_noncompat_vectors():
    hasher = TryAndIncrement(composite_hasher(), "g2", compat=False)
    _run_vectors(hasher, V.HASH_TO_G2_NONCOMPAT, g2_to_bytes)


def test_direct_hash_to_g1_works():
    from celo_bls_snark_tpu.hash_to_curve import direct_hash_to_g1

    pt, attempt = direct_hash_to_g1().hash_with_attempt(b"domain12", b"msg", b"extra")
    from celo_bls_snark_tpu.hostmath import curves
    from celo_bls_snark_tpu.hostmath.params import R

    assert curves.G1.is_on_curve(pt)
    assert curves.G1.mul(R, pt) is None  # in the prime subgroup
