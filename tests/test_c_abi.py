"""C ABI boundary layer: load libbls_snark_tpu.so via ctypes and exercise
the extern "C" surface end-to-end (sign/verify/aggregate + the pinned
epoch-SNARK verification), mirroring how the Celo client consumes
bls-snark-sys."""

import ctypes
import os
import re
import subprocess

import pytest

HERE = os.path.dirname(__file__)
LIB_DIR = os.path.join(HERE, "..", "celo_bls_snark_tpu", "ffi", "c_abi")
LIB_PATH = os.path.join(LIB_DIR, "libbls_snark_tpu.so")


@pytest.fixture(scope="module")
def lib():
    if not os.path.exists(LIB_PATH):
        r = subprocess.run(["make", "-C", LIB_DIR], capture_output=True, text=True)
        if r.returncode != 0:
            pytest.skip(f"cannot build C ABI library: {r.stderr[-500:]}")
    l = ctypes.CDLL(LIB_PATH)
    for fn in [
        "init",
        "private_key_to_public_key",
        "sign_message",
        "sign_pop",
        "verify_signature",
        "verify_pop",
        "aggregate_public_keys",
        "aggregate_signatures",
        "deserialize_private_key",
        "serialize_private_key",
    ]:
        getattr(l, fn).restype = ctypes.c_bool
    assert l.init()
    return l


def _out_buf():
    return ctypes.POINTER(ctypes.c_uint8)(), ctypes.c_int32()


def _take(lib, ptr, ln) -> bytes:
    data = bytes(bytearray(ptr[i] for i in range(ln.value)))
    lib.free_vec(ptr, ln)
    return data


class TestCABI:
    def test_sign_verify_roundtrip(self, lib):
        from celo_bls_snark_tpu.bls import PrivateKey
        from celo_bls_snark_tpu.utils.rngs import XorShiftRng

        sk = PrivateKey.generate(XorShiftRng(b"c-abi-test-seed!"))
        sk_bytes = sk.to_bytes()

        ptr, ln = _out_buf()
        assert lib.private_key_to_public_key(
            sk_bytes, len(sk_bytes), ctypes.byref(ptr), ctypes.byref(ln)
        )
        pk_bytes = _take(lib, ptr, ln)
        assert len(pk_bytes) == 96

        msg, extra = b"hello from C", b""
        ptr, ln = _out_buf()
        assert lib.sign_message(
            sk_bytes, len(sk_bytes), msg, len(msg), extra, len(extra),
            True, True, ctypes.byref(ptr), ctypes.byref(ln),
        )
        sig_bytes = _take(lib, ptr, ln)
        assert len(sig_bytes) == 48

        assert lib.verify_signature(
            pk_bytes, len(pk_bytes), msg, len(msg), extra, len(extra),
            sig_bytes, len(sig_bytes), True, True,
        )
        assert not lib.verify_signature(
            pk_bytes, len(pk_bytes), b"other", 5, extra, len(extra),
            sig_bytes, len(sig_bytes), True, True,
        )

    def test_snark_verify_pinned(self, lib):
        import vectors_snark

        def grab(name):
            return bytes.fromhex(getattr(vectors_snark, name))

        class EpochBlockFFI(ctypes.Structure):
            _fields_ = [
                ("index", ctypes.c_uint16),
                ("round", ctypes.c_uint8),
                ("epoch_entropy", ctypes.c_char_p),
                ("parent_entropy", ctypes.c_char_p),
                ("maximum_non_signers", ctypes.c_uint32),
                ("pubkeys_num", ctypes.c_uint32),
                ("maximum_validators", ctypes.c_uint32),
                ("pubkeys", ctypes.c_char_p),
            ]

        vk = grab("ENTROPY_VK")
        proof = grab("ENTROPY_PROOF")
        first = EpochBlockFFI(
            0, 0, bytes.fromhex("01" * 16), bytes.fromhex("02" * 16),
            1, 4, 4, grab("ENTROPY_FIRST_PUBKEYS"),
        )
        last = EpochBlockFFI(
            2, 0, bytes.fromhex("03" * 16), bytes.fromhex("02" * 16),
            1, 4, 4, grab("ENTROPY_LAST_PUBKEYS"),
        )
        lib.verify.restype = ctypes.c_bool
        lib.verify.argtypes = [
            ctypes.c_char_p, ctypes.c_uint32, ctypes.c_char_p, ctypes.c_uint32,
            EpochBlockFFI, EpochBlockFFI,
        ]
        assert lib.verify(vk, len(vk), proof, len(proof), first, last)
        # swapped epochs must fail
        assert not lib.verify(vk, len(vk), proof, len(proof), last, first)
