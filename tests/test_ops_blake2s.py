"""Batched device Blake2s/Blake2Xs vs the pure-Python oracle."""

import secrets

import jax
import numpy as np

from celo_bls_snark_tpu.ops import blake2s as dblake
from celo_bls_snark_tpu.utils.blake2s import blake2s
from celo_bls_snark_tpu.hashers.direct import DirectHasher


def _digest_from_words(words, n):
    return np.asarray(words).astype("<u4").tobytes()[:n]


class TestBlake2sBatch:
    def test_single_block_matches_oracle(self):
        msgs = [secrets.token_bytes(37) for _ in range(5)]
        words = dblake.pack_messages(msgs)
        out = np.asarray(jax.jit(
            lambda w: dblake.blake2s_batch(w, 37, person=b"ULforxof")
        )(words))
        for i, m in enumerate(msgs):
            assert _digest_from_words(out[:, i], 32) == blake2s(
                m, person=b"ULforxof"
            )

    def test_multi_block_matches_oracle(self):
        msgs = [secrets.token_bytes(150) for _ in range(3)]
        words = dblake.pack_messages(msgs)
        out = np.asarray(jax.jit(
            lambda w: dblake.blake2s_batch(w, 150)
        )(words))
        for i, m in enumerate(msgs):
            assert _digest_from_words(out[:, i], 32) == blake2s(m)

    def test_exact_block_boundary(self):
        msgs = [secrets.token_bytes(64) for _ in range(2)]
        words = dblake.pack_messages(msgs)
        out = np.asarray(dblake.blake2s_batch(words, 64))
        for i, m in enumerate(msgs):
            assert _digest_from_words(out[:, i], 32) == blake2s(m)

    def test_direct_hash_batch_matches_direct_hasher(self):
        """The full CRH->XOF pipeline (DirectHasher.hash) for a batch,
        including a non-multiple-of-32 output length."""
        hasher = DirectHasher()
        domain = b"ULforxof"
        for out_len in (64, 63):
            msgs = [secrets.token_bytes(80) for _ in range(4)]
            got = dblake.direct_hash_batch(msgs, out_len, domain)
            want = [hasher.hash(domain, m, out_len) for m in msgs]
            assert got == want
