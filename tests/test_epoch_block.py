"""Epoch-block encoding golden vectors.

The hex strings are the pinned encodings from
crates/epoch-snark/src/epoch_block.rs:243-246 (with/without entropy,
padded, pre-Donut) — they also pin the G2 generator, the pubkey bit
encoding and the BE-bits->LE-bytes conversion in one shot.
"""

from celo_bls_snark_tpu.bls import PublicKey
from celo_bls_snark_tpu.hostmath.params import G2_GENERATOR
from celo_bls_snark_tpu.snark.epoch_block import EpochBlock, hash_first_last_epoch_block

import vectors_epoch as VE


def _gen_pubkeys(n):
    return [PublicKey(G2_GENERATOR) for _ in range(n)]


def test_encode_to_bytes_with_entropy():
    epoch = EpochBlock(
        120, 5, bytes([255] * 16), bytes([254] * 16), 3, 10, _gen_pubkeys(10)
    )
    assert epoch.encode_first_epoch_to_bytes_cip22().hex() == VE.WITH_ENTROPY


def test_encode_to_bytes_without_entropy():
    epoch = EpochBlock(120, 5, None, None, 3, 10, _gen_pubkeys(10))
    assert epoch.encode_first_epoch_to_bytes_cip22().hex() == VE.WITHOUT_ENTROPY


def test_encode_to_bytes_before_donut():
    epoch = EpochBlock(120, 10, None, None, 3, 10, _gen_pubkeys(10))
    assert epoch.encode_to_bytes().hex() == VE.BEFORE_DONUT


def test_encode_to_bytes_padded():
    epoch = EpochBlock(
        120, 5, bytes([255] * 16), bytes([254] * 16), 3, 11, _gen_pubkeys(10)
    )
    assert epoch.encode_first_epoch_to_bytes_cip22().hex() == VE.WITH_ENTROPY_PADDED
    assert len(VE.WITH_ENTROPY) + 190 == len(VE.WITH_ENTROPY_PADDED)


def test_hash_first_last_is_512_bits():
    first = EpochBlock(0, 0, None, bytes(16), 1, 4, _gen_pubkeys(4))
    last = EpochBlock(3, 0, bytes(16), None, 1, 4, _gen_pubkeys(4))
    bits = hash_first_last_epoch_block(first, last)
    assert len(bits) == 512


def test_hash_to_g1_cip22_lands_in_subgroup():
    from celo_bls_snark_tpu.hostmath import curves
    from celo_bls_snark_tpu.hostmath.params import R

    epoch = EpochBlock(1, 0, bytes(16), bytes(16), 1, 4, _gen_pubkeys(4))
    pt = epoch.hash_to_g1_cip22()
    assert curves.G1.is_on_curve(pt)
    assert curves.G1.mul(R, pt) is None
