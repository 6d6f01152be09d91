"""Timed Groth16 end-to-end over the in-circuit BLS verification gadget.

Parity target: crates/epoch-snark/examples/proof.rs (timed trusted_setup /
prove / verify for a validator-set circuit). Round-1 scope: the circuit is
the BlsVerifyGadget core (bitmap-gated aggregate + in-circuit pairing
check) over BW6-761 — the building block the full ValidatorSetUpdate
circuit loops over; the epoch state-rotation loop lands with the remaining
layer-3 gadgets (ROADMAP.md).

Usage: python -m celo_bls_snark_tpu.examples.proof [num_validators] [max_non_signers]
"""

import sys
import time

from ..relations.r1cs import ConstraintSystem
from ..gadgets.vars import Boolean, FpVar
from ..gadgets.curve_vars import G1Var, G2Var
from ..gadgets import bls as gbls
from ..bls import PrivateKey, SIG_DOMAIN
from ..hash_to_curve import composite_hash_to_g1_cip22
from ..hostmath import curves as hc
from ..hostmath.params import P
from ..snark import groth16 as g16
from ..snark.api import BW6_761_ENGINE
from ..utils.rngs import XorShiftRng


def synthesize(cs, pks, bitmap_vals, msg_hash, asig, max_non_signers):
    pk_vars = [G2Var.new_witness(cs, pk) for pk in pks]
    bitmap = [Boolean.new_witness(cs, b) for b in bitmap_vals]
    msg_var = G1Var.new_witness(cs, msg_hash)
    sig_var = G1Var.new_witness(cs, asig)
    gbls.verify(cs, pk_vars, bitmap, msg_var, sig_var, FpVar.const(cs, max_non_signers))


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    num_validators = int(argv[0]) if len(argv) > 0 else 4
    max_non_signers = int(argv[1]) if len(argv) > 1 else 1

    rng = XorShiftRng(b"proof-example-rs")
    h2c = composite_hash_to_g1_cip22()
    sks = [PrivateKey.generate(rng) for _ in range(num_validators)]
    pks = [sk.to_public().pt for sk in sks]
    msg = b"validator set epoch message"
    h = h2c.hash(SIG_DOMAIN, msg, b"")
    bitmap_vals = [True] * (num_validators - max_non_signers) + [False] * max_non_signers
    asig = hc.G1.msum(
        [hc.G1.mul(sk.sk, h) for sk, b in zip(sks, bitmap_vals) if b]
    )

    E = BW6_761_ENGINE

    t0 = time.time()
    cs_setup = ConstraintSystem(P, "setup")
    synthesize(cs_setup, [None] * num_validators, [False] * num_validators, None, None, max_non_signers)
    print(
        f"synthesized (setup mode): {cs_setup.num_constraints} constraints, "
        f"{cs_setup.num_witness} witnesses [{time.time()-t0:.1f}s]",
        flush=True,
    )

    t0 = time.time()
    pk = g16.generate_parameters(cs_setup, E, rng)
    print(f"trusted setup: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    cs = ConstraintSystem(P, "prove")
    synthesize(cs, pks, bitmap_vals, h, asig, max_non_signers)
    assert cs.is_satisfied(), "witness generation produced an unsatisfied system"
    print(f"witness synthesis: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    proof = g16.create_proof_no_zk(pk, cs, E)
    print(f"prove: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    ok = g16.verify_proof(pk.vk, proof, [], E)
    print(f"verify: {ok} [{time.time()-t0:.1f}s]", flush=True)
    assert ok
    print("GROTH16 PROOF OF IN-CIRCUIT BLS VERIFICATION over BW6-761: OK")


if __name__ == "__main__":
    main()
