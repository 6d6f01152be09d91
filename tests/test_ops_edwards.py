"""Device twisted-Edwards ops + Bowe-Hopwood Pedersen CRH kernel vs the
host python-int oracle and the reference's pinned composite-CRH vectors
(crates/bls-crypto/src/hashers/composite.rs:105-189 test module)."""

import secrets

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import vectors as V
from celo_bls_snark_tpu.hostmath.params import P
from celo_bls_snark_tpu.hostmath import curves as hc
from celo_bls_snark_tpu.ops.field import FQ
from celo_bls_snark_tpu.ops import edwards as ed
from celo_bls_snark_tpu.ops import pedersen as ped
from celo_bls_snark_tpu.hashers.composite import (
    bh_pedersen_crh,
    composite_hasher,
)


def _rand_ed_points(k, seed=1234):
    rng = np.random.RandomState(seed)
    pts = []
    while len(pts) < k:
        x = int.from_bytes(rng.bytes(48), "little") % P
        pt = hc.ed_get_point_from_x(x, bool(rng.randint(2)))
        if pt is not None:
            pts.append(hc.ed_from_affine(pt))
    return pts


def _pack_ext(pts):
    """Host extended tuples -> device (X, Y, T, Z) Montgomery [n, B]."""
    cols = list(zip(*pts))
    return tuple(jnp.asarray(FQ.pack([c % P for c in col])) for col in cols)


def _unpack_ext_affine(dev):
    return ed.unpack_extended(dev)


class TestEdwardsOps:
    def test_add_vs_host(self):
        a = _rand_ed_points(8, seed=7)
        b = _rand_ed_points(8, seed=8)
        got = _unpack_ext_affine(
            jax.jit(ed.add)(_pack_ext(a), _pack_ext(b))
        )
        exp = [hc.ed_to_affine(hc.ed_add(x, y)) for x, y in zip(a, b)]
        assert got == exp

    def test_add_identity_and_double(self):
        a = _rand_ed_points(4, seed=9)
        ident = [hc.ED_IDENTITY] * 4
        got = _unpack_ext_affine(jax.jit(ed.add)(_pack_ext(a), _pack_ext(ident)))
        assert got == [hc.ed_to_affine(x) for x in a]
        # unified formula must handle P + P
        got2 = _unpack_ext_affine(jax.jit(ed.add)(_pack_ext(a), _pack_ext(a)))
        assert got2 == [hc.ed_to_affine(hc.ed_double(x)) for x in a]

    def test_madd_vs_host(self):
        a = _rand_ed_points(8, seed=10)
        b = _rand_ed_points(8, seed=11)
        b_aff = [hc.ed_to_affine(x) for x in b]
        td = jax.tree.map(jnp.asarray, ed.pack_affine_td(b_aff))
        got = _unpack_ext_affine(jax.jit(ed.madd)(_pack_ext(a), td))
        exp = [hc.ed_to_affine(hc.ed_add(x, y)) for x, y in zip(a, b)]
        assert got == exp

    def test_neg(self):
        a = _rand_ed_points(4, seed=12)
        got = _unpack_ext_affine(jax.jit(ed.neg)(_pack_ext(a)))
        exp = [hc.ed_to_affine(hc.ed_neg(x)) for x in a]
        assert got == exp


class TestBoweHopwoodDevice:
    def test_crh_vs_host_oracle(self):
        msgs = [secrets.token_bytes(32) for _ in range(6)] + [b"\x00" * 32, b"\xff" * 32]
        got = _unpack_ext_affine(ped.bh_crh_device(msgs))
        exp = [hc.ed_to_affine(bh_pedersen_crh(m)) for m in msgs]
        assert got == exp

    def test_crh_odd_length_and_lc(self):
        # 17 bytes = 136 bits -> 46 chunks (chunk padding exercised), and a
        # lane count that doesn't divide the chunk count
        msgs = [secrets.token_bytes(17) for _ in range(3)]
        got = _unpack_ext_affine(ped.bh_crh_device(msgs, Lc=4))
        exp = [hc.ed_to_affine(bh_pedersen_crh(m)) for m in msgs]
        assert got == exp

    def test_digests_match_pinned_vector(self):
        # the reference's composite CRH pinned vector (composite.rs tests)
        msg = V.xorshift_bytes(V.XORSHIFT_SEED_5D, 32)
        digests = ped.bh_crh_digests([msg, msg])
        host = composite_hasher().crh(b"", msg, 96)
        assert digests[0] == digests[1] == host
        assert digests[0].hex() == V.COMPOSITE_CRH_RANDOM
