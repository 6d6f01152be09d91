"""Batched try-and-increment hash-to-G1 fully on device.

Completes the device hashing tail (round-2 VERDICT item 6): ops/blake2s.py
already ran the Blake2s/Blake2Xs XOF on device, but square roots, point
decompression and the cofactor multiply stayed host-Python, so batch
verification WITH message hashing was host-bound. Here the whole CIP22
try-and-increment (crates/bls-crypto/src/hash_to_curve/
try_and_increment_cip22.rs:81-134, with the DirectHasher of direct.rs)
runs as one vectorized device program:

  1. one batched Blake2s CRH per message (device),
  2. Blake2Xs XOF for the first C counters of EVERY message at once
     (device; a counter succeeds with prob ~0.42, so C=16 leaves
     ~2e-4 of messages to the host fallback path),
  3. candidate parsing (377-bit x + compat/normal sign flags) as uint32
     bit-slicing into field limbs,
  4. validity = (x < p) AND (x^3 + 1 is a QR): one shared exponentiation
     t^((s-1)/2) feeds both the Euler/Legendre test (45 more squarings)
     and the Tonelli-Shanks start,
  5. first-valid-counter selection per message (the try-and-increment
     semantics), then the table-based Tonelli-Shanks correction (2-adic
     dlog digit extraction, 110 squarings + 6 subgroup-table matches)
     on the surviving lanes only,
  6. sign selection (lexicographically greatest root iff the flag bit is
     set — hostmath/curves.py get_point_from_x parity) and the G1
     cofactor multiply.

Bit-exactness oracle: hash_to_curve/try_and_increment_cip22.py with the
DirectHasher (tests/test_ops_hash_to_g1.py).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..hostmath.params import P, G1_COFACTOR
from ..hostmath import curves as hcurves
from .field import FQ, fq, LIMB_BITS, LIMB_MASK, int_to_limbs, _sub_limbs_u32
from . import curve as dc
from . import blake2s as db

TWO_ADICITY = 46
_S = (P - 1) >> TWO_ADICITY  # odd
assert _S % 2 == 1


def _nonresidue_z() -> int:
    """z = g^s for a quadratic nonresidue g — the order-2^46 Tonelli-Shanks
    constant."""
    g = 2
    while pow(g, (P - 1) // 2, P) == 1:
        g += 1
    return pow(g, _S, P)


_Z = _nonresidue_z()
_HALF_P_LIMBS = int_to_limbs((P - 1) // 2, FQ.n).astype(np.uint32)
_P_LIMBS = FQ.p_limbs.astype(np.uint32)

# jit cache: hash_to_g1_device is called per batch; re-wrapping its stages
# in fresh jax.jit objects every call would recompile every call
_JITS = {}


def _parse_candidates(xof_words, compat: bool):
    """XOF state words [2, 8, B] uint32 (two 32-byte Blake2s blocks, LE)
    -> (x_raw int32 limbs [n, B], greatest bool [B], infinity_flag [B],
        x_lt_p [B], x_is_zero [B]).

    Candidate layout parity: 48 LE bytes; x keeps bits [0, 377)
    (REPR_SHAVE mask); sign bit 377 in compat mode (deployed Celo,
    try_and_increment.rs:106-120) or flag bit 383; infinity flag bit 382
    (hash_to_curve/common.py)."""
    w = jnp.concatenate([xof_words[0], xof_words[1]], axis=0)  # [16, B] LE
    w = w[:12]  # first 48 bytes
    lo = (w & jnp.uint32(LIMB_MASK)).astype(jnp.uint32)
    hi = (w >> jnp.uint32(LIMB_BITS)).astype(jnp.uint32)
    limbs = jnp.stack(
        [lo[i // 2] if i % 2 == 0 else hi[i // 2] for i in range(24)]
    )  # [24, B] 16-bit limbs of the 384-bit candidate
    # flags (before masking): bit 377 = limb 23 bit 9; 382 -> bit 14; 383 -> 15
    sign_compat = (limbs[23] >> 9) & 1
    sign_normal = (limbs[23] >> 15) & 1
    infinity = ((limbs[23] >> 14) & 1) != 0
    greatest = (sign_compat if compat else sign_normal) != 0
    # REPR_SHAVE: keep 377 = 16*23 + 9 bits
    limbs = limbs.at[23].set(limbs[23] & jnp.uint32(0x1FF))
    # pad with the guard limb to FQ.n
    pad = jnp.zeros((FQ.n - 24, limbs.shape[1]), dtype=jnp.uint32)
    x_raw = jnp.concatenate([limbs, pad], axis=0)
    # x < p via subtraction borrow
    p_bc = jnp.broadcast_to(jnp.asarray(_P_LIMBS)[:, None], x_raw.shape)
    _, borrow = _sub_limbs_u32(x_raw, p_bc)
    x_lt_p = borrow != 0
    x_is_zero = jnp.all(x_raw == 0, axis=0)
    return x_raw.astype(jnp.int32), greatest, infinity, x_lt_p, x_is_zero


def _sqrt_prep(t):
    """Shared exponentiation for Legendre + Tonelli-Shanks:
    w = t^((s-1)/2); tt0 = w^2 * t  (= t^s); legendre = tt0^(2^45) == 1.
    Returns (w, tt0, is_qr)."""
    w = fq.pow_const(t, (_S - 1) // 2)
    wt = fq.mul(w, t)
    tt0 = fq.mul(wt, w)
    e = jax.lax.fori_loop(0, TWO_ADICITY - 1, lambda _, x: fq.sq(x), tt0)
    one = FQ.ones(tuple(t.shape[1:]))
    is_qr = fq.eq(e, one)
    return w, tt0, is_qr


_TS_DIGIT = 8  # bits per extracted 2-adic dlog digit
_TS_TABLES = None


def _ts_tables():
    """Host-precomputed tables for the table-based Tonelli-Shanks:
    the 2-Sylow dlog e of u = t^s (u = z^e, e < 2^46) is extracted 8 bits
    at a time by matching u^(2^(38-8j)) against the order-2^8 subgroup
    (Bernstein, "Faster square roots in annoying finite fields"), and the
    root correction z^(-e/2) is assembled from per-digit gathers.

    Returns (match38_raw [n, 256], match40_raw [n, 64],
             upd[j] Montgomery [n, 256] = zinv^(d*2^(8j)),
             half[j] Montgomery [n, 256] = zinv^(d*2^(8j-1)) with
             half[0][d] = zinv^(d>>1))."""
    global _TS_TABLES
    if _TS_TABLES is not None:
        return _TS_TABLES
    zinv = pow(_Z, -1, P)
    n = FQ.n

    # NOTE: cached as NUMPY arrays — this builder may first run inside a
    # jit trace, and memoizing device arrays created there would leak
    # tracers into later traces. jnp conversion happens at use time.
    def raw_pack(vals):
        return np.stack([int_to_limbs(v, n) for v in vals], axis=-1).astype(
            np.int32
        )

    match38 = raw_pack([pow(_Z, (k << 38), P) for k in range(256)])
    match40 = raw_pack([pow(_Z, (k << 40), P) for k in range(64)])
    upd, half = [], []
    ndig = (TWO_ADICITY + _TS_DIGIT - 1) // _TS_DIGIT  # 6
    for j in range(ndig):
        upd.append(np.asarray(FQ.pack(
            [pow(zinv, d << (8 * j), P) for d in range(256)]
        )))
        if j == 0:
            half.append(np.asarray(FQ.pack(
                [pow(zinv, d >> 1, P) for d in range(256)]
            )))
        else:
            half.append(np.asarray(FQ.pack(
                [pow(zinv, d << (8 * j - 1), P) for d in range(256)]
            )))
    _TS_TABLES = (match38, match40, upd, half)
    return _TS_TABLES


def _ts_match(u_pow, table_raw):
    """u_pow (Montgomery, lazy) vs raw canonical table [n, K]: returns the
    matching index [B] (the digit). Limb-wise running AND keeps the
    intermediate at [K, B] bools."""
    u_raw = fq.to_raw(u_pow)  # [n, B] canonical
    table_raw = jnp.asarray(table_raw)
    K = table_raw.shape[1]
    acc = jnp.ones((K,) + tuple(u_raw.shape[1:]), dtype=bool)
    for i in range(FQ.n):
        acc = acc & (table_raw[i][:, None] == u_raw[i][None, :])
    return jnp.argmax(acc, axis=0).astype(jnp.int32)


def _tonelli_shanks_finish(t, w):
    """Table-based Tonelli-Shanks from the shared prefix (w = t^((s-1)/2)):
    returns r with r^2 == t (for QR t; garbage otherwise).

    r = t^((s+1)/2) * z^(-e/2) where t^s = z^e in the order-2^46 2-Sylow
    subgroup. e is recovered 8 bits at a time (110 squarings + 6 table
    matches total) instead of the classic quadratic correction loop
    (~990 squarings) — ~8x less work on the stage-b winner lanes."""
    match38, match40, upd, half = _ts_tables()
    r = fq.mul(w, t)        # t^((s+1)/2)
    u = fq.mul(r, w)        # t^s = z^e
    c_acc = None
    ndig = (TWO_ADICITY + _TS_DIGIT - 1) // _TS_DIGIT  # 6
    for j in range(ndig):
        nsq = TWO_ADICITY - _TS_DIGIT * (j + 1)  # 38,30,22,14,6,-2
        if nsq > 0:
            up = jax.lax.fori_loop(0, nsq, lambda _, x: fq.sq(x), u)
            d = _ts_match(up, match38)
        else:
            d = _ts_match(u, match40)  # last 6 bits, order-2^6 subgroup
        if j < ndig - 1:
            u = fq.mul(u, jnp.take(jnp.asarray(upd[j]), d, axis=-1))
        hj = jnp.take(jnp.asarray(half[j]), d, axis=-1)
        c_acc = hj if c_acc is None else fq.mul(c_acc, hj)
    return fq.mul(r, c_acc)


def _select_greatest(y, greatest):
    """Pick y or p-y so the result is the lexicographically greatest root
    iff `greatest` (get_point_from_x parity). The comparison is on the
    FIELD value, so the Montgomery form is stripped first (to_raw)."""
    y_can = fq.to_raw(y).astype(jnp.uint32)
    half = jnp.broadcast_to(jnp.asarray(_HALF_P_LIMBS)[:, None], y_can.shape)
    # y > (p-1)/2  <=>  y - ((p-1)/2 + 1) has no borrow <=> (p-1)/2 - y borrows
    _, borrow = _sub_limbs_u32(half, y_can)
    y_is_big = borrow != 0
    want_flip = y_is_big != greatest
    return fq.select(want_flip, fq.neg(y), y)


def _candidate_points(xof_words, compat: bool):
    """Per (message, counter) lane: decompressed pre-cofactor point + valid
    mask. Returns (x_mont, y_mont, valid, w, t) — y needs the
    Tonelli-Shanks finish; this stage only computes validity."""
    x_raw, greatest, infinity, x_lt_p, x_is_zero = _parse_candidates(
        xof_words, compat
    )
    x = fq.from_raw(x_raw)
    t = fq.add(fq.mul(fq.sq(x), x), FQ.ones(tuple(x.shape[1:])))  # x^3 + 1
    w, tt0, is_qr = _sqrt_prep(t)
    valid = x_lt_p & is_qr & ~(x_is_zero & infinity)
    return x, greatest, valid, w, t


def _pow2ceil(v: int) -> int:
    return 1 << max(0, (v - 1).bit_length())


def _fused_round(crh_u8, ed, c_lo: int, nc: int, domain: bytes,
                 compat: bool):
    """ONE fully-fused device round for counters [c_lo, c_lo+nc) over the
    messages whose CRH digests are the rows of crh_u8 [m, crh_len] (32 for
    the DirectHasher, 48 for the composite Pedersen CRH): Blake2Xs XOF,
    candidate parse, Legendre validity, IN-JIT first-valid-counter
    selection, Tonelli-Shanks finish, sign select and cofactor multiply —
    a single dispatch and a single [m]-wide result, no per-lane host
    round-trips (the eager take/sync glue used to cost more than the
    whole compute over the device tunnel).

    Returns (jac [m] numpy tree, has [m] numpy bool); lanes with
    has=False hold garbage points."""
    from ..hash_to_curve.common import hash_length, G1_BYTES

    hash_bytes = hash_length(G1_BYTES)  # 64
    m, crh_len = crh_u8.shape
    edlen = ed.shape[-1]
    msg_len = 1 + edlen + crh_len
    nblocks = max(1, (msg_len + 63) // 64)
    buf = np.zeros((nc * m, nblocks * 64), dtype=np.uint8)
    buf[:, 0] = np.repeat(
        np.arange(c_lo, c_lo + nc, dtype=np.uint16).astype(np.uint8), m
    )
    if edlen:
        # ed: [edlen] (shared) or [m, edlen] (per-message extra_data)
        buf[:, 1 : 1 + edlen] = (
            np.tile(ed, (nc, 1)) if ed.ndim == 2 else ed
        )
    buf[:, 1 + edlen : msg_len] = np.tile(crh_u8, (nc, 1))
    xof_words = jnp.asarray(buf.view("<u4").T.copy())  # [(16*nblk), nc*m]

    key = ("fused_round", msg_len, domain, compat, nc, m)
    fn = _JITS.get(key)
    if fn is None:
        def _fn(wds, _mlen=msg_len, _dom=domain, _compat=compat,
                _nc=nc, _m=m):
            xof = db.blake2xs_batch(wds, _mlen, hash_bytes, person=_dom)
            x, greatest, valid, w, t = _candidate_points(xof, _compat)
            vmat = valid.reshape(_nc, _m)
            first = jnp.argmax(vmat, axis=0).astype(jnp.int32)
            has = jnp.any(vmat, axis=0)
            lanes = first * _m + jnp.arange(_m, dtype=jnp.int32)
            xs = jnp.take(x, lanes, axis=-1)
            ws = jnp.take(w, lanes, axis=-1)
            ts = jnp.take(t, lanes, axis=-1)
            gs = jnp.take(greatest, lanes)
            y = _tonelli_shanks_finish(ts, ws)
            y = _select_greatest(y, gs)
            pt = dc.g1.from_affine((xs, y))
            return dc.g1.scalar_mul_const(G1_COFACTOR, pt), has

        from ..utils.aotcache import AotJit

        fn = _JITS[key] = AotJit(
            f"h2g_round_{msg_len}_{domain.hex()}_{int(compat)}_{nc}_{m}",
            _fn,
        )
    jac, has = fn(xof_words)
    # jac stays DEVICE-resident (round-4 fetched it to numpy here: a
    # D2H+H2D round-trip of the full point batch per call on a
    # ~10 MB/s tunnel); only the 1-byte-per-message mask crosses.
    return jac, np.asarray(has)


def hash_to_g1_device(domain: bytes, messages, extra_data: bytes = b"",
                      compat: bool = True, num_counters: int = 16,
                      crh_u8=None):
    """Device try-and-increment core: returns (jac_points, has_mask) with
    the hashed points as a DEVICE projective batch and a numpy bool mask of
    messages whose first valid counter fell inside [0, num_counters).
    Lanes with has=False hold garbage — route them to the host fallback
    (hash_to_g1_direct_cip22_batch does).

    crh_u8: optional precomputed inner-hash bytes [B, crh_len] uint8 —
    the CIP22 CRH step. When None, the DirectHasher CRH (batched device
    Blake2s) runs here; pass the composite Pedersen digests
    (ops/pedersen.py::bh_crh_digests) for the CompositeHasher path.

    Counter strategy: a counter is valid with prob ~0.42, so evaluating
    all `num_counters` for every message wastes ~C/2.4x of the dominant
    cost (the per-candidate Legendre exponentiation); but every extra
    device round costs tunnel round-trips that rival the compute. The
    scan is therefore TWO fused rounds, each one jit dispatch
    (_fused_round: XOF -> validity -> in-jit selection -> sqrt ->
    cofactor): counters [0, 8) for every message, then the remaining
    counters for only the (expected ~1.8%) unresolved messages, padded
    to a fixed cap so the jit is reused. First-valid-counter semantics
    are preserved exactly — a message hits round 2 iff every round-1
    counter was invalid, and the rounds' counter ranges are disjoint."""
    B = len(messages)
    C = num_counters
    n = FQ.n
    if isinstance(extra_data, (bytes, bytearray)):
        ed = np.frombuffer(bytes(extra_data), dtype=np.uint8)
    else:
        # per-message extra_data: list of B equal-length byte strings
        assert len(extra_data) == B
        ed = np.frombuffer(b"".join(extra_data), dtype=np.uint8).reshape(
            B, -1
        )

    # 1) device CRH per message (DirectHasher Blake2s unless the caller
    #    supplied precomputed inner hashes)
    from ..hash_to_curve.common import hash_length, G1_BYTES

    hash_bytes = hash_length(G1_BYTES)
    if crh_u8 is None:
        words = db.pack_messages(messages)
        key = ("crh", len(messages[0]), domain)
        fn = _JITS.get(key)
        if fn is None:
            from ..utils.aotcache import AotJit

            mlen = len(messages[0])
            fn = _JITS[key] = AotJit(
                f"h2g_crh_{mlen}_{domain.hex()}",
                lambda wds: db.blake2s_batch(
                    wds, mlen, digest_size=32,
                    node_offset=db._xof_node_offset(hash_bytes), person=domain,
                ),
            )
        crh_np = np.asarray(fn(words))  # [8, B]
        crh_u8 = (
            crh_np.T.astype("<u4").copy().view(np.uint8).reshape(B, 32)
        )  # [B, 32] LE digest bytes
    else:
        crh_u8 = np.asarray(crh_u8, dtype=np.uint8)
        assert crh_u8.shape[0] == B

    # 2) round 1: counters [0, C1) for every message, fully fused
    from ..utils.profiling import stage

    # round-1 counter width: per-candidate cost is dominated by the
    # Legendre exponentiation over C1*B lanes; with miss prob 0.58 the
    # two-round lane cost C1 + 0.58^C1*(C-C1) minimizes at C1~5
    # (6.25*B vs 8.2*B at the round-4 default of 8)
    C1 = min(int(os.environ.get("CELO_H2G_ROUND1", "5")), C)
    with stage("h2g.round1"):
        jac, has = _fused_round(crh_u8, ed, 0, C1, domain, compat)

    # 3) round 2: remaining counters for the unresolved tail only,
    # merged ON DEVICE (select-and-set; duplicate pad indices write
    # identical values, so the scatter is deterministic)
    if C > C1 and not has.all():
        has = np.array(has, copy=True)
        pending = np.nonzero(~has)[0]
        cap = min(_pow2ceil(len(pending)), max(32, _pow2ceil(B // 16)))
        with stage("h2g.round2"):
            for i in range(0, len(pending), cap):
                chunk = pending[i : i + cap]
                m = len(chunk)
                idx = (np.concatenate([chunk, np.full(cap - m, chunk[0])])
                       if m < cap else chunk)
                jac2, has2 = _fused_round(
                    crh_u8[idx], ed[idx] if ed.ndim == 2 else ed,
                    C1, C - C1, domain, compat,
                )
                mfn = _JITS.get(("merge", cap))
                if mfn is None:
                    from ..utils.aotcache import AotJit

                    def _merge(full, part, idxa, ok):
                        cur = jax.tree.map(
                            lambda f: jnp.take(f, idxa, axis=-1), full
                        )
                        sel = jax.tree.map(
                            lambda p, c: jnp.where(ok[None], p, c), part, cur
                        )
                        return jax.tree.map(
                            lambda f, s: f.at[..., idxa].set(s), full, sel
                        )

                    mfn = _JITS[("merge", cap)] = AotJit(
                        f"h2g_merge_{cap}", _merge
                    )
                jac = mfn(jac, jac2, jnp.asarray(idx.astype(np.int32)),
                          jnp.asarray(has2))
                has[chunk[has2[:m]]] = True

    return jac, has


def hash_to_g1_direct_cip22_batch(domain: bytes, messages, extra_data: bytes = b"",
                                  compat: bool = True, num_counters: int = 16):
    """Batched CIP22 try-and-increment over the DirectHasher, end-to-end on
    device. messages: equal-length byte strings. Returns a list of host
    affine G1 points (the rare no-counter-found lanes fall back to the host
    path — same semantics, prob ~0.58^num_counters per message).

    Reference semantics: TryAndIncrementCIP22(DirectHasher).hash
    (try_and_increment_cip22.rs:81-134, direct.rs:23-79)."""
    from ..hash_to_curve.try_and_increment_cip22 import TryAndIncrementCIP22
    from ..hashers.direct import DirectHasher

    out_jac, has = hash_to_g1_device(
        domain, messages, extra_data, compat, num_counters
    )
    pts = dc.unpack_jac(dc.g1, FQ, out_jac)

    # host fallback for messages with no valid counter in [0, C)
    if not has.all():
        h2c = TryAndIncrementCIP22(DirectHasher(), "g1", compat)
        for i in np.nonzero(~has)[0]:
            pts[i], _ = h2c.hash_with_attempt_cip22(
                domain, messages[i], extra_data
            )
    return pts


def hash_to_g1_composite_cip22_batch(domain: bytes, messages,
                                     extra_data: bytes = b"",
                                     compat: bool = True,
                                     num_counters: int = 16):
    """Batched CIP22 try-and-increment over the COMPOSITE hasher — the
    reference's production sign-path hash — end-to-end on device: the
    Bowe-Hopwood Pedersen CRH (ops/pedersen.py) feeds its 48-byte
    x-coordinate digests into the Blake2Xs counter scan.

    Reference semantics: TryAndIncrementCIP22(CompositeHasher).hash
    (try_and_increment_cip22.rs:81-134 with composite.rs:80-95)."""
    from ..hash_to_curve.try_and_increment_cip22 import TryAndIncrementCIP22
    from ..hashers.composite import composite_hasher
    from . import pedersen as ped

    crh = ped.bh_crh_digests(messages)
    crh_u8 = np.frombuffer(b"".join(crh), dtype=np.uint8).reshape(
        len(messages), 48
    )
    out_jac, has = hash_to_g1_device(
        domain, messages, extra_data, compat, num_counters, crh_u8=crh_u8
    )
    pts = dc.unpack_jac(dc.g1, FQ, out_jac)

    if not has.all():
        h2c = TryAndIncrementCIP22(composite_hasher(), "g1", compat)
        for i in np.nonzero(~has)[0]:
            pts[i], _ = h2c.hash_with_attempt_cip22(
                domain, messages[i], extra_data
            )
    return pts
