"""Batched Blake2s / Blake2Xs on device.

The hashing leg of the sign/verify hot path (DirectHasher,
crates/bls-crypto/src/hashers/direct.rs:23-79): at 10^6+ verifications/s
the host's per-message Python hashing becomes the bottleneck even though
every pairing runs on device. Here a batch of B equal-length messages is
hashed as ONE vectorized program: the Blake2s state is eight uint32 [B]
lanes, the 10 rounds x 8 G-functions unroll into straight-line VPU ops
(adds/xors/rotates), and XLA fuses the whole compression.

Blake2Xs (the XOF) runs its per-output-block Blake2s instances over the
same message with different node offsets — each instance is one more
vectorized call over the batch, so a 64-byte XOF is ~3 fused compressions
regardless of B.

Bit-exactness oracle: utils/blake2s.py (pure-Python, parameter-block
controlled) — tests/test_ops_blake2s.py pins equality against it and the
reference's pinned Blake2Xs vectors.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.blake2s import IV, SIGMA

MASK32 = 0xFFFFFFFF


def _rotr(x, n):
    return (x >> np.uint32(n)) | (x << np.uint32(32 - n))


_SIGMA_ARR = np.asarray(SIGMA, dtype=np.int32)  # [10, 16]


def _compress(h, m, t, last):
    """h: [8, B] uint32; m: [16, B] uint32; t: python-int byte counter;
    last: python bool. Returns new [8, B] h.

    Rounds run as a lax.scan whose xs are the 10 per-round message
    schedules pre-built with STATIC sigma indexing (no gathers inside the
    loop), and the working state is carried as 16 separate rows (no
    .at[].set updates). The rolled form matters on both backends: a fully
    unrolled 10-round graph sends XLA:CPU's LLVM codegen into the weeds
    (observed: >1h compiles) and costs ~8 min of axon-TPU compile per
    (msg_len, person) variant; this form compiles in seconds everywhere
    and the loop body is one fused VPU block."""
    B = h.shape[1]
    # [10, 16, B]: round r's message schedule, static permutation
    ms_all = jnp.stack(
        [jnp.stack([m[j] for j in SIGMA[r]]) for r in range(10)]
    )
    v = [h[i] for i in range(8)] + [
        jnp.broadcast_to(jnp.uint32(IV[i]), (B,)) for i in range(8)
    ]
    v[12] = v[12] ^ jnp.uint32(t & MASK32)
    v[13] = v[13] ^ jnp.uint32((t >> 32) & MASK32)
    if last:
        v[14] = v[14] ^ jnp.uint32(MASK32)

    def round_body(carry, ms):
        v = list(carry)

        def g(a, b, c, d, x, y):
            va = v[a] + v[b] + x
            vd = _rotr(v[d] ^ va, 16)
            vc = v[c] + vd
            vb = _rotr(v[b] ^ vc, 12)
            va = va + vb + y
            vd = _rotr(vd ^ va, 8)
            vc = vc + vd
            vb = _rotr(vb ^ vc, 7)
            v[a], v[b], v[c], v[d] = va, vb, vc, vd

        g(0, 4, 8, 12, ms[0], ms[1])
        g(1, 5, 9, 13, ms[2], ms[3])
        g(2, 6, 10, 14, ms[4], ms[5])
        g(3, 7, 11, 15, ms[6], ms[7])
        g(0, 5, 10, 15, ms[8], ms[9])
        g(1, 6, 11, 12, ms[10], ms[11])
        g(2, 7, 8, 13, ms[12], ms[13])
        g(3, 4, 9, 14, ms[14], ms[15])
        return tuple(v), None

    v, _ = jax.lax.scan(round_body, tuple(v), ms_all)
    return h ^ jnp.stack(v[:8]) ^ jnp.stack(v[8:])


def _param_h0(digest_size, fanout, depth, leaf_size, node_offset, person):
    """Initial state words from the parameter block (host-side constants;
    layout identical to utils/blake2s.py::blake2s)."""
    param = bytearray(32)
    param[0] = digest_size
    param[2] = fanout & 0xFF
    param[3] = depth & 0xFF
    param[4:8] = leaf_size.to_bytes(4, "little")
    param[8:14] = node_offset.to_bytes(6, "little")
    param[15] = 32 if (fanout == 0 and depth == 0) else 0  # inner_size
    param[24:32] = person.ljust(8, b"\x00")
    return [
        IV[i] ^ int.from_bytes(param[i * 4 : i * 4 + 4], "little")
        for i in range(8)
    ]


def pack_messages(messages):
    """Equal-length byte strings -> uint32 word array [n_words, B]
    (zero-padded to whole 64-byte blocks)."""
    L = len(messages[0])
    assert all(len(m) == L for m in messages)
    nblocks = max(1, (L + 63) // 64)
    buf = np.zeros((len(messages), nblocks * 64), dtype=np.uint8)
    if L:
        buf[:, :L] = np.frombuffer(b"".join(messages), dtype=np.uint8).reshape(
            len(messages), L
        )
    words = buf.view("<u4").T.copy()  # [16*nblocks, B]
    return jnp.asarray(words)


def blake2s_batch(words, msg_len, digest_size=32, fanout=1, depth=1,
                  leaf_size=0, node_offset=0, person=b""):
    """Batched Blake2s over equal-length unkeyed messages.

    words: [16*nblocks, B] uint32 (pack_messages); msg_len: real byte
    length (static). Returns [8, B] uint32 state words; the digest is the
    first `digest_size` bytes of their little-endian concatenation."""
    B = words.shape[1]
    h0 = _param_h0(digest_size, fanout, depth, leaf_size, node_offset, person)
    h = jnp.broadcast_to(
        jnp.asarray(np.asarray(h0, dtype=np.uint32))[:, None], (8, B)
    )
    nblocks = max(1, (msg_len + 63) // 64)
    assert words.shape[0] == 16 * nblocks
    t = 0
    for blk in range(nblocks):
        m = words[16 * blk : 16 * (blk + 1)]
        last = blk == nblocks - 1
        t = msg_len if last else t + 64
        h = _compress(h, m, t, last)
    return h


def blake2xs_batch(words, msg_len, xof_digest_length, person=b""):
    """Batched Blake2Xs XOF (direct.rs:41-79): one Blake2s instance per
    32-byte output block, fanout=0/depth=0/leaf=32/inner=32, node_offset =
    block_index | xof_digest_length << 32. Returns [n_hashes, 8, B] uint32
    — digest bytes per lane are the LE words truncated to
    xof_digest_length total bytes."""
    num_hashes = (xof_digest_length + 31) // 32
    outs = []
    for i in range(num_hashes):
        if i == num_hashes - 1 and xof_digest_length % 32 != 0:
            hash_length = xof_digest_length % 32
        else:
            hash_length = 32
        node_offset = i | ((xof_digest_length & 0xFF) << 32) | (
            ((xof_digest_length >> 8) & 0xFF) << 40
        )
        outs.append(
            blake2s_batch(
                words, msg_len, digest_size=hash_length, fanout=0, depth=0,
                leaf_size=32, node_offset=node_offset, person=person,
            )
        )
    return jnp.stack(outs)


def direct_hash_batch(messages, output_size_in_bytes, domain):
    """DirectHasher.hash over a batch of equal-length messages
    (direct.rs: crh then xof). Returns a list of digest byte strings."""
    words = pack_messages(messages)
    msg_len = len(messages[0])

    @jax.jit
    def run(w):
        crh = blake2s_batch(
            w, msg_len, digest_size=32,
            node_offset=_xof_node_offset(output_size_in_bytes),
            person=domain,
        )
        # CRH digests (32 bytes = 8 words) become the XOF message: one
        # 64-byte block, upper half zero
        zeros = jnp.zeros_like(crh)
        xof_words = jnp.concatenate([crh, zeros], axis=0)
        return blake2xs_batch(xof_words, 32, output_size_in_bytes, domain)

    out = np.asarray(run(words))  # [n_hashes, 8, B]
    B = out.shape[2]
    digests = []
    for lane in range(B):
        buf = b""
        remaining = output_size_in_bytes
        for i in range(out.shape[0]):
            blockbytes = out[i, :, lane].astype("<u4").tobytes()
            take = min(32, remaining)
            buf += blockbytes[:take]
            remaining -= take
        digests.append(buf)
    return digests


def _xof_node_offset(xof_digest_length):
    return ((xof_digest_length & 0xFF) << 32) | (
        ((xof_digest_length >> 8) & 0xFF) << 40
    )
