"""Batched Bowe-Hopwood Pedersen CRH on device.

The reference's production sign-path CRH (CompositeHasher,
crates/bls-crypto/src/hashers/composite.rs:16-32,80-86) is a fixed-base
MSM over Edwards-BW6-761: per 3-bit chunk (b0, b1, b2) of the LSB-first
message bits, accumulate (1 + b0 + 2*b1) * (-1)^b2 * G_{seg,j} with the
ChaCha-derived generator table of hashers/composite.py. arkworks
parallelizes the segment sums with rayon (`parallel` feature); here the
whole batch runs as one device program:

  - HOST plan: messages -> per-chunk table indices (the 1..4 multiple)
    and sign bits, numpy-vectorized (np.unpackbits);
  - HOST table (cached): 4 odd multiples per chunk position, affine with
    td = d*x*y premultiplied (ops/edwards.py mixed-add form), plus one
    identity slot for chunk padding;
  - DEVICE: chunks laid out column-major [K steps x Lc lanes]; one
    K-step lax.scan of gather + conditional-negate + unified mixed adds
    over Lc*B flat lanes, then a log2(Lc) tree fold — the same
    scan-then-fold shape as ops/msm.py's fixed-base kernel.

Output parity: crh bytes = serialized x-coordinate, 48 bytes LE
(composite.rs:80-86). Oracle: hashers/composite.py::bh_pedersen_crh.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..hostmath import curves as hcurves
from ..hashers.composite import (
    CHUNK_SIZE,
    NUM_WINDOWS,
    WINDOW_SIZE,
    crh_parameters,
)
from .field import FQ, fq
from . import edwards as ed

_CAPACITY_CHUNKS = NUM_WINDOWS * WINDOW_SIZE

# device-resident packed tables, keyed by chunk count (message length)
_TABLE_CACHE = {}
_JITS = {}


def n_chunks_for(msg_len: int) -> int:
    return (msg_len * 8 + CHUNK_SIZE - 1) // CHUNK_SIZE


def bh_plan(messages):
    """Equal-length byte strings -> (idx [N, B] int32, sign [N, B] bool).
    idx[ci] = 4*ci + (b0 + 2*b1) indexes the multiples table; sign = b2
    selects negation. numpy-vectorized."""
    B = len(messages)
    L = len(messages[0])
    assert all(len(m) == L for m in messages)
    N = n_chunks_for(L)
    buf = np.frombuffer(b"".join(messages), dtype=np.uint8).reshape(B, L)
    bits = np.unpackbits(buf, axis=1, bitorder="little")  # [B, 8L]
    pad = N * CHUNK_SIZE - bits.shape[1]
    if pad:
        bits = np.concatenate([bits, np.zeros((B, pad), np.uint8)], axis=1)
    bits = bits.reshape(B, N, CHUNK_SIZE)
    m = bits[:, :, 0].astype(np.int32) + 2 * bits[:, :, 1].astype(np.int32)
    idx = m.T + 4 * np.arange(N, dtype=np.int32)[:, None]  # [N, B]
    sign = bits[:, :, 2].T.astype(bool)  # [N, B]
    return idx, sign


def bh_table(n_chunks: int):
    """Packed device table for the first n_chunks chunk positions:
    (x, y, td) arrays [n, 4*n_chunks + 1]; entry 4*ci + (m-1) holds
    m * G_ci for m in 1..4, the final slot is the identity (used by
    chunk padding). Host-built once per message length, cached."""
    if n_chunks > _CAPACITY_CHUNKS:
        raise ValueError(
            f"message needs {n_chunks} chunks > capacity {_CAPACITY_CHUNKS}"
        )
    key = n_chunks
    tbl = _TABLE_CACHE.get(key)
    if tbl is not None:
        return tbl
    params = crh_parameters()
    pts = []
    for ci in range(n_chunks):
        g = params[ci // WINDOW_SIZE][ci % WINDOW_SIZE]
        acc = g
        for m in range(4):
            pts.append(hcurves.ed_to_affine(acc))
            if m < 3:
                acc = hcurves.ed_add(acc, g)
    pts.append((0, 1))  # identity slot
    packed = jax.tree.map(jnp.asarray, ed.pack_affine_td(pts))
    _TABLE_CACHE[key] = packed
    return packed


def _bh_device(table, idx, sign, Lc: int):
    """idx/sign [N_pad, B] with N_pad = K*Lc; returns extended batch [B]."""
    N_pad, B = idx.shape
    K = N_pad // Lc
    idx3 = idx.reshape(K, Lc * B)
    sign3 = sign.reshape(K, Lc * B)

    def step(acc, xs):
        ix, sg = xs
        x2, y2, td2 = jax.tree.map(
            lambda t: jnp.take(t, ix, axis=-1), table
        )
        x2 = fq.select(sg, fq.neg(x2), x2)
        td2 = fq.select(sg, fq.neg(td2), td2)
        return ed.madd(acc, (x2, y2, td2)), None

    acc, _ = jax.lax.scan(step, ed.identity((Lc * B,)), (idx3, sign3))
    # tree-fold the Lc chunk lanes
    w = Lc
    while w > 1:
        h = w // 2
        lo = jax.tree.map(lambda t: t.reshape(t.shape[0], w, B)[:, :h].reshape(t.shape[0], h * B), acc)
        hi = jax.tree.map(lambda t: t.reshape(t.shape[0], w, B)[:, h:].reshape(t.shape[0], h * B), acc)
        acc = ed.add(lo, hi)
        w = h
    return acc


def bh_crh_device(messages, Lc: int = 8):
    """Batched CRH evaluation: equal-length messages -> device extended
    TE point batch [B]. Lc = chunk lanes processed per scan step."""
    idx, sign = bh_plan(messages)
    N, B = idx.shape
    table = bh_table(N)
    id_slot = 4 * N
    pad = (-N) % Lc
    if pad:
        idx = np.concatenate(
            [idx, np.full((pad, B), id_slot, np.int32)], axis=0
        )
        sign = np.concatenate([sign, np.zeros((pad, B), bool)], axis=0)
    key = ("bh", N, Lc)
    fn = _JITS.get(key)
    if fn is None:
        from ..utils.aotcache import AotJit

        fn = _JITS[key] = AotJit(
            f"bh_crh_{N}_{Lc}", lambda t, i, s: _bh_device(t, i, s, Lc)
        )
    return fn(table, jnp.asarray(idx), jnp.asarray(sign))


def bh_crh_digests(messages, Lc: int = 8):
    """Batched composite-CRH digests: the serialized x-coordinates,
    48 bytes LE each (composite.rs:80-86). Returns a list of bytes."""
    out = ed.unpack_extended(bh_crh_device(messages, Lc))
    return [int(x).to_bytes(48, "little") for x, _y in out]
