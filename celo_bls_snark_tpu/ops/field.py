"""Batched prime-field arithmetic for TPU: lazy-redundant 16-bit limbs,
Montgomery form, guard-limb headroom.

Layout: a field-element batch is an int32 array of shape [n_limbs, B] —
limbs on the leading (sublane) axis, batch on the 128-lane axis.

Design (the key to both compile time and runtime on TPU):

  LAZY REDUNDANT REPRESENTATION. add/sub/neg/small-scalar ops are plain
  elementwise int32 arithmetic — ONE vector op each, no carry chains in the
  XLA graph. Limbs may grow to |l| < 2^26 and the represented value may
  drift into (-512p, 512p). All normalization happens INSIDE the Montgomery
  multiply (where it is a handful of unrolled vector ops in a Pallas kernel
  or two small scans on CPU).

  GUARD LIMB. Each field gets one extra 16-bit limb beyond its modulus
  (e.g. 25 limbs for the 377-bit Fq), so R/p >= 2^23. Montgomery inputs of
  value < 1024p then still give outputs < 2p (CIOS bound c^2·p < R), which
  is what makes the lazy contract sound:
    - mul/sq outputs: canonical limbs (< 2^16), value < 2p;
    - any audited formula chain between muls stays within (-512p, 512p)
      and |limb| < 2^26; the multiply pre-adds a constant 512p offset and
      renormalizes, erasing the drift.

  Equality/zero tests are mod-p semantic: they canonicalize via one
  Montgomery multiply by 1 (output < 2p -> compare against {0, p}).

Three multiply backends, dispatched on jax.default_backend():
  - Pallas fused CIOS kernel (TPU): input normalization + 16-bit CIOS fully
    unrolled in one kernel; ~25 ns/mul/lane at batch 8k.
  - "conv" loop-free path (CPU/tests): normalization via two tiny scans +
    schoolbook column products via constant gathers + carry-lookahead.
Host oracle: hostmath/fp.py (tests/test_ops_field.py).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..hostmath.params import P, R, BW6_P

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1
LAZY_P_BUDGET = 256  # |value| < LAZY_P_BUDGET * p between multiplies


def int_to_limbs(v: int, n: int) -> np.ndarray:
    out = np.zeros(n, dtype=np.int32)
    for i in range(n):
        out[i] = (v >> (LIMB_BITS * i)) & LIMB_MASK
    return out


def limbs_to_int(limbs) -> int:
    v = 0
    for i, l in enumerate(np.asarray(limbs, dtype=np.int64)):
        v += int(l) << (LIMB_BITS * i)
    return v


class FieldSpec:
    """Compile-time constants for one prime field (with guard limb)."""

    def __init__(self, modulus: int, name: str):
        self.modulus = modulus
        self.name = name
        self.bits = modulus.bit_length()
        # +1 guard limb: R/p >= 2^23 so lazy values < 1024p keep CIOS < 2p
        self.n = (self.bits + LIMB_BITS - 1) // LIMB_BITS + 1
        self.mont_r = (1 << (LIMB_BITS * self.n)) % modulus
        self.mont_r2 = self.mont_r * self.mont_r % modulus
        self.n0inv = (-pow(modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        nprime = (-pow(modulus, -1, 1 << (LIMB_BITS * self.n))) % (
            1 << (LIMB_BITS * self.n)
        )
        self.p_limbs = int_to_limbs(modulus, self.n)
        self.nprime_limbs = int_to_limbs(nprime, self.n)
        self.offset_limbs = int_to_limbs(LAZY_P_BUDGET * modulus, self.n)
        # CIOS soundness: inputs < 2*BUDGET*p must give outputs < 2p
        assert (2 * LAZY_P_BUDGET) ** 2 * modulus < (1 << (LIMB_BITS * self.n)), name

    # --- host-side conversions (I/O boundary only) ------------------------
    def to_mont(self, v: int) -> np.ndarray:
        return int_to_limbs(v * self.mont_r % self.modulus, self.n)

    def from_mont(self, limbs) -> int:
        return limbs_to_int(limbs) * pow(self.mont_r, -1, self.modulus) % self.modulus

    def pack(self, values) -> np.ndarray:
        """Iterable of ints -> [n, B] int32 Montgomery array (canonical).
        One host mulmod per value + one bytes pass (the per-limb Python
        shifting of int_to_limbs was the prover's marshaling bottleneck —
        ~15us/element vs ~1.5us here at 761 bits)."""
        m, r = self.modulus, self.mont_r
        return self._limbs_from_ints([int(v) * r % m for v in values])

    def _limbs_from_ints(self, ints) -> np.ndarray:
        """List of canonical ints in [0, p) -> [n, B] int32 limbs via one
        bytes pass."""
        nb = 2 * self.n
        buf = b"".join(v.to_bytes(nb, "little") for v in ints)
        return (
            np.frombuffer(buf, dtype="<u2")
            .reshape(-1, self.n)
            .T.astype(np.int32)
        )

    def pack_raw(self, values) -> np.ndarray:
        """Iterable of ints in [0, p) -> RAW (non-Montgomery) [n, B] limbs,
        via one bytes pass — numpy-fast for large batches. Convert to
        Montgomery form on device with ops.from_raw (one kernel call)."""
        return self._limbs_from_ints([int(v) for v in values])

    def unpack_raw(self, arr) -> list:
        """RAW canonical [n, B] limbs -> list of ints (numpy-fast)."""
        a = np.asarray(arr).astype(np.uint16).astype("<u2")
        buf = a.T.tobytes()
        nb = 2 * self.n
        return [
            int.from_bytes(buf[i * nb : (i + 1) * nb], "little")
            for i in range(a.shape[-1])
        ]

    def unpack(self, arr) -> list:
        """[n, ...] -> flat list of ints (standard form, mod p applied).
        Handles lazy-redundant limbs (int32, possibly NEGATIVE from the
        offset-subtraction ops): the value splits into a low-16 plane and
        an offset-biased high plane (hi + 2^15, always in [0, 2^16)), each
        recombined with one bytes pass, then one host mulmod by R^-1."""
        flat = np.asarray(arr, dtype=np.int64).reshape(self.n, -1)
        B = flat.shape[1]
        nb = 2 * self.n
        lo = (flat & 0xFFFF).astype("<u2").T.tobytes()
        hi = ((flat >> 16) + (1 << 15)).astype("<u2").T.tobytes()
        bias = sum(1 << (15 + 16 * (i + 1)) for i in range(self.n))
        rinv, m = pow(self.mont_r, -1, self.modulus), self.modulus
        ifb = int.from_bytes
        return [
            (ifb(lo[i * nb : (i + 1) * nb], "little")
             + (ifb(hi[i * nb : (i + 1) * nb], "little") << 16) - bias)
            * rinv % m
            for i in range(B)
        ]

    def zeros(self, batch_shape) -> jnp.ndarray:
        return jnp.zeros((self.n, *batch_shape), dtype=jnp.int32)

    def ones(self, batch_shape) -> jnp.ndarray:
        return self.const(1, batch_shape)

    def const(self, v: int, batch_shape=(1,)) -> jnp.ndarray:
        c = jnp.asarray(self.to_mont(v % self.modulus), dtype=jnp.int32)
        return jnp.broadcast_to(
            c.reshape(self.n, *([1] * len(batch_shape))), (self.n, *batch_shape)
        )


FQ = FieldSpec(P, "fq377")
FR = FieldSpec(R, "fr253")
FQ761 = FieldSpec(BW6_P, "fq761")


# ---------------------------------------------------------------------------
# Carry helpers for the conv (CPU) path
# ---------------------------------------------------------------------------

def _carry_lookahead(v, carry_in_one: bool = False):
    """Loop-free carry propagation for NONNEGATIVE limbs < 2^17 (uint32)."""
    if carry_in_one:
        v = v.at[0].add(1)
    g = (v >> LIMB_BITS).astype(jnp.uint32)
    p = ((v & LIMB_MASK) == LIMB_MASK).astype(jnp.uint32)

    def op(a, b):
        ga, pa = a
        gb, pb = b
        return (gb | (pb & ga), pa & pb)

    G, _ = jax.lax.associative_scan(op, (g, p), axis=0)
    carries = jnp.concatenate([jnp.zeros_like(G[:1]), G[:-1]], axis=0)
    out = ((v & LIMB_MASK) + carries) & LIMB_MASK
    return out, G[-1]


def _carry_normalize_u32(t):
    """Full carry propagation for uint32 columns < 2^25."""
    t = jnp.asarray(t)
    hi = t >> LIMB_BITS
    v = (t & LIMB_MASK).at[1:].add(hi[:-1])
    out, carry = _carry_lookahead(v)
    return out, carry + hi[-1]


def _sub_limbs_u32(a, b):
    """(a - b) on canonical uint32 limbs; returns (diff, borrow)."""
    a, b = jnp.broadcast_arrays(a, b)
    w = a + (LIMB_MASK - b)
    out, carry_out = _carry_lookahead(w, carry_in_one=True)
    return out, 1 - carry_out


def _normalize_lazy_scan(a, offset_np):
    """Lazy int32 limbs -> canonical uint32 limbs of (value + 512p).

    One sequential signed ripple (lax.scan) — exact for any |limb| < 2^26.
    """
    t = a + jnp.asarray(offset_np).reshape(a.shape[0], *([1] * (a.ndim - 1)))

    def step(carry, row):
        v = row + carry
        c = v >> LIMB_BITS  # arithmetic shift: floor division
        return c, (v - (c << LIMB_BITS)).astype(jnp.uint32)

    carry, out = jax.lax.scan(step, jnp.zeros_like(t[0]), t)
    # value + 512p in (0, 1024p) < R, so carry out is always 0
    return out


def _conv_idx(n: int, width: int) -> np.ndarray:
    idx = np.full((n, width), n, np.int32)
    for i in range(n):
        for k in range(width):
            if 0 <= k - i < n:
                idx[i, k] = k - i
    return idx


def _full_cols(a, b, n: int, idx_np: np.ndarray, width: int):
    """Unnormalized uint32 column sums of a*b over `width` columns
    (+ the spill column at index `width`). Inputs: canonical uint32."""
    prod = a[:, None, :] * b[None, :, :]
    lo = prod & LIMB_MASK
    hi = prod >> LIMB_BITS
    zpad = jnp.zeros_like(lo[:, :1])
    lo_p = jnp.concatenate([lo, zpad], axis=1)
    hi_p = jnp.concatenate([hi, zpad], axis=1)
    B = a.shape[-1]
    idx = jnp.broadcast_to(jnp.asarray(idx_np[:, :width])[:, :, None], (n, width, B))
    cols_lo = jnp.take_along_axis(lo_p, idx, axis=1).sum(axis=0, dtype=jnp.uint32)
    cols_hi = jnp.take_along_axis(hi_p, idx, axis=1).sum(axis=0, dtype=jnp.uint32)
    cols = cols_lo.at[1:].add(cols_hi[:-1])
    return cols, cols_hi[-1]


# ---------------------------------------------------------------------------
# Pallas fused kernel: lazy-normalize + CIOS (TPU execution path)
# ---------------------------------------------------------------------------

_PALLAS_MAX_BLK = 8192


def _make_pallas_mul(spec: "FieldSpec"):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = spec.n
    p_limbs = [int(x) for x in spec.p_limbs]
    off_limbs = [int(x) for x in spec.offset_limbs]
    n0inv = np.uint32(spec.n0inv)

    def kernel(a_ref, b_ref, o_ref):
        blk = a_ref.shape[1]
        s = blk // 128

        def normalize(ref):
            """lazy int32 [n, blk] -> list of canonical uint32 [s, 128]."""
            x = ref[...].reshape(n, s, 128)
            out = []
            carry = jnp.zeros((s, 128), jnp.int32)
            for k in range(n):
                v = x[k] + np.int32(off_limbs[k]) + carry
                carry = v >> LIMB_BITS  # arithmetic shift
                out.append((v - (carry << LIMB_BITS)).astype(jnp.uint32))
            return out

        a = normalize(a_ref)
        b = normalize(b_ref)
        z = jnp.zeros((s, 128), jnp.uint32)
        t = [z] * (n + 2)
        for i in range(n):
            ai = a[i]
            for j in range(n):
                prod = ai * b[j]
                t[j] = t[j] + (prod & LIMB_MASK)
                t[j + 1] = t[j + 1] + (prod >> LIMB_BITS)
            m = (t[0] * n0inv) & LIMB_MASK
            for j in range(n):
                prod2 = m * np.uint32(p_limbs[j])
                t[j] = t[j] + (prod2 & LIMB_MASK)
                t[j + 1] = t[j + 1] + (prod2 >> LIMB_BITS)
            t[1] = t[1] + (t[0] >> LIMB_BITS)
            t = t[1:] + [z]
        # final carry normalization; result < 2p fits n limbs
        out = []
        carry = z
        for k in range(n):
            v = t[k] + carry
            out.append((v & LIMB_MASK).astype(jnp.int32))
            carry = v >> LIMB_BITS
        o_ref[...] = jnp.stack(out).reshape(n, blk)

    def mul(a, b):
        B = a.shape[-1]
        # cap VMEM/register footprint: wide-limb fields get smaller blocks
        cap = _PALLAS_MAX_BLK if n <= 32 else _PALLAS_MAX_BLK // 4
        blk = B if B <= cap else cap
        while B % blk:
            blk //= 2
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, B), jnp.int32),
            grid=(B // blk,),
            in_specs=[
                pl.BlockSpec((n, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        )(a, b)

    return mul


def _make_pallas_mul_mxu(spec: "FieldSpec", interpret: bool = False):
    """Montgomery multiply with the REDUCTION on the MXU.

    Separated Montgomery form: T = a*b (per-lane, VPU);
    m = (T mod R) * N' mod R and m*p are products with a SHARED CONSTANT
    operand (N' = -p^-1 mod R and p), so they run as bf16 matmuls over
    8-bit limb pieces on the systolic array — exactly (pieces <= 255 are
    exact in bf16; products <= 255^2 with <= 2n <= 98 accumulation terms
    stay < 2^24, the f32 mantissa). Only the n^2 per-lane a*b MACs stay
    on the VPU: ~2x fewer vector ops per multiply than the fused CIOS
    kernel for the 761-bit field, with the reduction riding the
    otherwise-idle MXU.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = spec.n
    off_limbs = [int(x) for x in spec.offset_limbs]
    n2 = 2 * n

    def pieces8(v16: int, count: int):
        return [(v16 >> (8 * k)) & 0xFF for k in range(count)]

    # weight matrices over 8-bit pieces (bf16, tiny constants)
    np8 = []
    for l in spec.nprime_limbs:
        np8 += pieces8(int(l), 2)
    p8 = []
    for l in spec.p_limbs:
        p8 += pieces8(int(l), 2)
    # W1[k, i] = n'8[k - i] for k < 2n (low product only: mod R)
    W1 = np.zeros((n2, n2), dtype=np.float32)
    for k in range(n2):
        for i in range(n2):
            if 0 <= k - i < n2:
                W1[k, i] = np8[k - i]
    # W2[k, i] = p8[k - i], full product (k < 4n)
    W2 = np.zeros((2 * n2, n2), dtype=np.float32)
    for k in range(2 * n2):
        for i in range(n2):
            if 0 <= k - i < n2:
                W2[k, i] = p8[k - i]
    W1 = W1.astype(np.float32)
    W2 = W2.astype(np.float32)

    def kernel(a_ref, b_ref, w1_ref, w2_ref, o_ref):
        blk = a_ref.shape[1]
        s = blk // 128

        def normalize(ref):
            x = ref[...].reshape(n, s, 128)
            out = []
            carry = jnp.zeros((s, 128), jnp.int32)
            for k in range(n):
                v = x[k] + np.int32(off_limbs[k]) + carry
                carry = v >> LIMB_BITS
                out.append((v - (carry << LIMB_BITS)).astype(jnp.uint32))
            return out

        a = normalize(a_ref)
        b = normalize(b_ref)
        z = jnp.zeros((s, 128), jnp.uint32)
        # phase A (VPU): 16-bit-radix column sums of a*b, 2n+1 columns
        t = [z] * (n2 + 1)
        for i in range(n):
            ai = a[i]
            for j in range(n):
                prod = ai * b[j]
                t[i + j] = t[i + j] + (prod & LIMB_MASK)
                t[i + j + 1] = t[i + j + 1] + (prod >> LIMB_BITS)
        # normalize the LOW n columns to canonical 16-bit limbs (T mod R)
        tlow = []
        carry = z
        for k in range(n):
            v = t[k] + carry
            tlow.append(v & LIMB_MASK)
            carry = v >> LIMB_BITS
        t[n] = t[n] + carry  # fold the low-half carry into column n
        t[:n] = tlow  # the ripple below must see the NORMALIZED lows
        # (using the raw columns would double-count the folded carry)

        def to_pieces_bf16(limbs16):
            # n canonical 16-bit limbs -> [2n, blk] bf16 8-bit pieces.
            # Mosaic has no u32->bf16 cast; go via int32 -> f32 -> bf16
            # (all values <= 255, every step exact).
            rows = []
            for v in limbs16:
                for piece in (v & 0xFF, v >> 8):
                    rows.append(
                        piece.astype(jnp.int32)
                        .astype(jnp.float32)
                        .astype(jnp.bfloat16)
                    )
            return jnp.stack(rows).reshape(n2, blk)

        def matmul_u32(W, X):
            out = jax.lax.dot_general(
                W, X, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # f32 -> i32 is exact here (integer values < 2^24)
            return out.astype(jnp.int32).astype(jnp.uint32)

        # phase B (MXU): m = (T mod R) * N' mod R
        w1 = w1_ref[...].astype(jnp.bfloat16)
        w2 = w2_ref[...].astype(jnp.bfloat16)
        m8 = matmul_u32(w1, to_pieces_bf16(tlow))  # [2n, blk] radix-2^8
        m8 = m8.reshape(n2, s, 128)
        m16 = []
        carry = z
        for j in range(n):
            v = m8[2 * j] + (m8[2 * j + 1] << 8) + carry
            m16.append(v & LIMB_MASK)
            carry = v >> LIMB_BITS
        # carry beyond n limbs is dropped: m is mod R by construction
        # phase C (MXU): m * p, full product in 16-bit-radix columns
        mp8 = matmul_u32(w2, to_pieces_bf16(m16))  # [4n, blk]
        mp8 = mp8.reshape(2 * n2, s, 128)
        # final: (T + m*p) / R with one ripple over 2n+1 columns
        out = []
        carry = z
        for k in range(n2 + 1):
            v = t[k] + carry
            if 2 * k < 2 * n2:
                v = v + mp8[2 * k]
            if 2 * k + 1 < 2 * n2:
                v = v + (mp8[2 * k + 1] << 8)
            carry = v >> LIMB_BITS
            if k >= n:
                out.append((v & LIMB_MASK).astype(jnp.int32))
        # columns n..2n-1 hold (T + m*p)/R < 2p; column 2n rippled to 0
        o_ref[...] = jnp.stack(out[:n]).reshape(n, blk)

    def mul(a, b):
        B = a.shape[-1]
        cap = _PALLAS_MAX_BLK if n <= 32 else _PALLAS_MAX_BLK // 4
        blk = B if B <= cap else cap
        while B % blk:
            blk //= 2
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, B), jnp.int32),
            grid=(B // blk,),
            in_specs=[
                pl.BlockSpec((n, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(W1.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(W2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            interpret=interpret,
        )(a, b, jnp.asarray(W1), jnp.asarray(W2))

    return mul


def _make_pallas_redc(spec: "FieldSpec"):
    """Montgomery-reduction-only kernel: lazy x -> canonical limbs of
    x * R^-1 mod p, value < 2p. HALF a multiply (no a*b phase) — serves
    zero tests (x == 0 mod p iff REDC(x) in {0, p}) and Montgomery->raw
    stripping (to_raw)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = spec.n
    p_limbs = [int(x) for x in spec.p_limbs]
    off_limbs = [int(x) for x in spec.offset_limbs]
    n0inv = np.uint32(spec.n0inv)

    def kernel(a_ref, o_ref):
        blk = a_ref.shape[1]
        s = blk // 128

        x = a_ref[...].reshape(n, s, 128)
        a = []
        carry = jnp.zeros((s, 128), jnp.int32)
        for k in range(n):
            v = x[k] + np.int32(off_limbs[k]) + carry
            carry = v >> LIMB_BITS
            a.append((v - (carry << LIMB_BITS)).astype(jnp.uint32))

        z = jnp.zeros((s, 128), jnp.uint32)
        t = a + [z, z]
        for _ in range(n):
            m = (t[0] * n0inv) & LIMB_MASK
            for j in range(n):
                prod = m * np.uint32(p_limbs[j])
                t[j] = t[j] + (prod & LIMB_MASK)
                t[j + 1] = t[j + 1] + (prod >> LIMB_BITS)
            t[1] = t[1] + (t[0] >> LIMB_BITS)
            t = t[1:] + [z]
        out = []
        carry = z
        for k in range(n):
            v = t[k] + carry
            out.append((v & LIMB_MASK).astype(jnp.int32))
            carry = v >> LIMB_BITS
        o_ref[...] = jnp.stack(out).reshape(n, blk)

    def redc(a):
        B = a.shape[-1]
        cap = _PALLAS_MAX_BLK if n <= 32 else _PALLAS_MAX_BLK // 4
        blk = B if B <= cap else cap
        while B % blk:
            blk //= 2
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, B), jnp.int32),
            grid=(B // blk,),
            in_specs=[
                pl.BlockSpec((n, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        )(a)

    return redc


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


# ---------------------------------------------------------------------------
# Field-op namespaces
# ---------------------------------------------------------------------------

def make_field_ops(spec: FieldSpec):
    n = spec.n
    p_np = spec.p_limbs.astype(np.uint32)
    idx_np = _conv_idx(n, 2 * n)
    pallas_mul_holder = []
    pallas_redc_holder = []

    # --- lazy ops: single elementwise int32 instructions ------------------
    def add(a, b):
        return a + b

    def sub(a, b):
        return a - b

    def neg(a):
        return -a

    def mul_small(a, k: int):
        # audited ceiling: 12 * (sum of a few canonical limbs) < 2^26,
        # the lazy-normalize bound (largest user: BW6 G2's b3 = 12)
        assert 0 <= k <= 12
        return a * np.int32(k)

    def select(c, a, b):
        a, b = jnp.broadcast_arrays(a, b)
        return jnp.where(c[None], a, b)

    # --- multiply (erases lazy drift; output canonical < 2p) --------------
    def _mul_conv_core(a, b):
        batch = a.shape[1:]
        an = _normalize_lazy_scan(a, spec.offset_limbs)
        bn = _normalize_lazy_scan(b, spec.offset_limbs)
        T, extraT = _full_cols(an, bn, n, idx_np, 2 * n)
        t_low, _ = _carry_normalize_u32(T[:n])
        nprime = jnp.broadcast_to(
            jnp.asarray(spec.nprime_limbs.astype(np.uint32))[:, None], (n, *batch)
        )
        m_cols, _ = _full_cols(t_low, nprime, n, idx_np, n)
        m, _ = _carry_normalize_u32(m_cols)
        p_bc = jnp.broadcast_to(jnp.asarray(p_np)[:, None], (n, *batch))
        mN, extraM = _full_cols(m, p_bc, n, idx_np, 2 * n)
        total = jnp.concatenate([T + mN, (extraT + extraM)[None]], axis=0)
        norm, _carry = _carry_normalize_u32(total)
        # (T + m*p)/R < 2p < 2^(16n): columns n..2n-1 hold the result
        return norm[n : 2 * n].astype(jnp.int32)

    _CONV_CHUNK = 8192

    def mul_conv(a, b):
        batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
        a = jnp.broadcast_to(a, (n, *batch))
        b = jnp.broadcast_to(b, (n, *batch))
        # the column-sum formulation materializes [n, n, B] intermediates;
        # chunk wide 1-D batches through lax.map so the CPU path stays
        # bounded (~n^2 * CHUNK words) at any width — an un-chunked
        # 6*2^16-wide curve add under an 8-device shard_map was 80+ GB
        B = int(np.prod(batch)) if batch else 1
        if len(batch) == 1 and B > _CONV_CHUNK:
            pad = (-B) % _CONV_CHUNK
            if pad:
                a = jnp.pad(a, ((0, 0), (0, pad)))
                b = jnp.pad(b, ((0, 0), (0, pad)))
            nch = (B + pad) // _CONV_CHUNK
            a2 = jnp.moveaxis(a.reshape(n, nch, _CONV_CHUNK), 1, 0)
            b2 = jnp.moveaxis(b.reshape(n, nch, _CONV_CHUNK), 1, 0)
            out = jax.lax.map(lambda ab: _mul_conv_core(ab[0], ab[1]), (a2, b2))
            out = jnp.moveaxis(out, 0, 1).reshape(n, nch * _CONV_CHUNK)
            return out[:, :B] if pad else out
        return _mul_conv_core(a, b)

    def mul(a, b):
        if _on_tpu():
            batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
            assert len(batch) == 1, "field batch must be 1-D"
            a = jnp.broadcast_to(a, (n, *batch))
            b = jnp.broadcast_to(b, (n, *batch))
            B = batch[0]
            pad = (-B) % 128
            if pad:
                a = jnp.pad(a, ((0, 0), (0, pad)))
                b = jnp.pad(b, ((0, 0), (0, pad)))
            if not pallas_mul_holder:
                import os

                use_mxu = os.environ.get("CELO_MUL_MXU", "0") == "1"
                pallas_mul_holder.append(
                    _make_pallas_mul_mxu(spec) if use_mxu
                    else _make_pallas_mul(spec)
                )
            out = pallas_mul_holder[0](a, b)
            return out[:, :B] if pad else out
        return mul_conv(a, b)

    def mul_many(pairs):
        """Many independent products in ONE kernel dispatch (batch concat)."""
        if len(pairs) == 1:
            return [mul(pairs[0][0], pairs[0][1])]
        batch = jnp.broadcast_shapes(
            *[jnp.broadcast_shapes(a.shape[1:], b.shape[1:]) for a, b in pairs]
        )
        A = jnp.concatenate(
            [jnp.broadcast_to(a, (n, *batch)) for a, _ in pairs], axis=-1
        )
        Bm = jnp.concatenate(
            [jnp.broadcast_to(b, (n, *batch)) for _, b in pairs], axis=-1
        )
        C = mul(A, Bm)
        w = batch[-1]
        return [C[..., i * w : (i + 1) * w] for i in range(len(pairs))]

    def sq(a):
        return mul(a, a)

    # --- Montgomery reduction (REDC): half a multiply ----------------------
    def redc_many(vals):
        """Stacked REDC: lazy values -> canonical limbs of v*R^-1 mod p,
        each < 2p, ONE half-mul kernel call for k values (TPU), or the
        conv mul-by-raw-one on CPU."""
        batch = jnp.broadcast_shapes(*[v.shape[1:] for v in vals])
        if _on_tpu():
            assert len(batch) == 1, "field batch must be 1-D"
            A = jnp.concatenate(
                [jnp.broadcast_to(v, (n, *batch)) for v in vals], axis=-1
            )
            B = A.shape[-1]
            pad = (-B) % 128
            if pad:
                A = jnp.pad(A, ((0, 0), (0, pad)))
            if not pallas_redc_holder:
                pallas_redc_holder.append(_make_pallas_redc(spec))
            out = pallas_redc_holder[0](A)
            out = out[:, :B] if pad else out
            w = batch[-1]
            return [out[..., i * w : (i + 1) * w] for i in range(len(vals))]
        one_raw = jnp.zeros((n, *batch), dtype=jnp.int32).at[0].set(1)
        return [mul_conv(jnp.broadcast_to(v, (n, *batch)), one_raw) for v in vals]

    # --- mod-p semantic predicates (canonicalize via one half-multiply) ---
    def canon2p(a):
        """Lazy value -> canonical limbs with value < 2p (mod p preserved):
        Montgomery-multiply by R (the Montgomery form of 1)."""
        return mul(a, spec.ones(a.shape[1:]))

    def is_zero(a):
        return is_zero_many([a])[0]

    def eq(a, b):
        return is_zero(a - b)

    def is_zero_many(vals):
        """Stacked zero-tests (x == 0 mod p iff REDC(x) in {0, p}):
        ONE half-mul kernel call for k values."""
        batch = vals[0].shape[1:]
        outs = redc_many(vals)
        pl_ = jnp.asarray(p_np.astype(np.int32)).reshape(n, *([1] * len(batch)))
        return [
            jnp.all(z == 0, axis=0) | jnp.all(z == pl_, axis=0) for z in outs
        ]

    def reduce_2p(a):
        """Canonical-limb value < 2p (a mul/from_raw output) -> [0, p):
        one conditional subtract. Needed wherever EXACT zero limbs carry
        meaning (the affine-infinity (0,0) encoding: from_raw of a zero
        coordinate may come back as p, whose limbs are nonzero)."""
        z = a.astype(jnp.uint32)
        diff, borrow = _sub_limbs_u32(
            z, jnp.broadcast_to(jnp.asarray(p_np)[:, None], z.shape)
        )
        return jnp.where((borrow != 0)[None], z, diff).astype(jnp.int32)

    def to_canonical(a):
        """Full reduction to [0, p): canon2p then one conditional subtract.
        Boundary op (serialization / host export)."""
        return reduce_2p(canon2p(a).astype(jnp.uint32))

    # --- raw (non-Montgomery) boundary: numpy-fast bulk I/O ---------------
    _r2_raw = int_to_limbs(spec.mont_r2, n)

    def from_raw(a):
        """RAW canonical limbs (value < p) -> Montgomery form:
        mont_mul(v, R^2) = v*R. One kernel call."""
        r2 = jnp.asarray(_r2_raw).reshape(n, *([1] * (a.ndim - 1)))
        return mul(a, jnp.broadcast_to(r2, a.shape))

    def to_raw(a):
        """Montgomery (lazy ok) -> RAW canonical limbs in [0, p):
        REDC(v*R) = v (half a multiply), then one conditional subtract."""
        return reduce_2p(redc_many([a])[0])

    def pow_const(a, e: int):
        """a^e for a fixed python-int exponent.

        Large exponents use 4-bit fixed windows: precompute a^0..a^15 once
        (14 muls), then scan MSB-first over windows with 4 squarings + ONE
        table-indexed multiply each. The previous bit-scan executed a full
        multiply per bit (select-after-mul, branch-free), i.e. 2 muls/bit;
        windows cost 5 muls/4 bits — 1.6x fewer kernel-muls for the
        ~330-bit Legendre/Tonelli-Shanks/inverse exponents that dominate
        the device hash-to-G1 path."""
        if e == 0:
            return spec.ones(a.shape[1:])
        if e.bit_length() <= 8:
            result = None
            base = a
            while e > 0:
                if e & 1:
                    result = base if result is None else mul(result, base)
                e >>= 1
                if e:
                    base = sq(base)
            return result
        W = 4
        nb = e.bit_length()
        nw = (nb + W - 1) // W
        digits = [(e >> (W * (nw - 1 - i))) & ((1 << W) - 1) for i in range(nw)]
        pows = [spec.ones(a.shape[1:]), a]
        for _ in range(2, 1 << W):
            pows.append(mul(pows[-1], a))
        table = jnp.stack(pows)  # [16, n, B]
        res = table[digits[0]]  # top window: static index

        def step(res, d):
            for _ in range(W):
                res = sq(res)
            res = mul(res, jax.lax.dynamic_index_in_dim(
                table, d, axis=0, keepdims=False))
            return res, None

        res, _ = jax.lax.scan(
            step, res, jnp.asarray(digits[1:], dtype=jnp.int32)
        )
        return res

    def inv(a):
        """a^(p-2): batched, branch-free. inv(0) = 0."""
        return pow_const(a, spec.modulus - 2)

    def legendre_is_qr(a):
        l = pow_const(a, (spec.modulus - 1) // 2)
        return eq(l, spec.ones(a.shape[1:]))

    class Ops:
        pass

    ops = Ops()
    ops.spec = spec
    ops.n = n
    ops.add = add
    ops.sub = sub
    ops.neg = neg
    ops.mul = mul
    ops.mul_conv = mul_conv
    ops.mul_many = mul_many
    ops.sq = sq
    ops.mul_small = mul_small
    ops.redc_many = redc_many
    ops.is_zero = is_zero
    ops.is_zero_many = is_zero_many
    ops.eq = eq
    ops.select = select
    ops.canon2p = canon2p
    ops.reduce_2p = reduce_2p
    ops.to_canonical = to_canonical
    ops.from_raw = from_raw
    ops.to_raw = to_raw
    ops.pow_const = pow_const
    ops.inv = inv
    ops.legendre_is_qr = legendre_is_qr
    ops.zeros = spec.zeros
    ops.ones = spec.ones
    ops.const = spec.const
    return ops


fq = make_field_ops(FQ)
fr = make_field_ops(FR)
fq761 = make_field_ops(FQ761)

_OPS_BY_SPEC = {FQ.name: fq, FR.name: fr, FQ761.name: fq761}


def ops_for(spec: FieldSpec):
    """Field-op namespace for one of the module's FieldSpec singletons."""
    return _OPS_BY_SPEC[spec.name]
