"""Flagship end-to-end on the TPU: trusted_setup -> prove -> verify of the
full ValidatorSetUpdate circuit (the reference's e2e.rs config: 4
validators, 1 fault, 2 transitions), with the setup/prover MSM+NTT stages
on device (snark/accel.py) and the proving key persisted across runs.

Usage: python scripts/run_e2e.py [validators] [transitions]
Writes the key to .e2e_pk.bin (uncompressed, ~100s of MB) and prints
per-stage wall-clocks.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    from celo_bls_snark_tpu.snark.api import (
        Parameters, trusted_setup, prove, verify_parsed,
    )
    from celo_bls_snark_tpu.snark.fixtures import generate_test_data
    from celo_bls_snark_tpu.snark.serialize_pk import pk_to_bytes, pk_from_bytes
    from celo_bls_snark_tpu.utils.rngs import XorShiftRng

    faults = int(os.environ.get("E2E_FAULTS", "1"))
    two_snark = bool(int(os.environ.get("E2E_TWO_SNARK", "0")))
    num_validators = int(sys.argv[1]) if len(sys.argv) > 1 else 3 * faults + 1
    num_transitions = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    suffix = ".2snark" if two_snark else ""
    pk_path = os.environ.get("E2E_PK_PATH", f"/root/repo/.e2e_pk{suffix}.bin")

    print(f"config: validators={num_validators} faults={faults} "
          f"transitions={num_transitions} two_snark={two_snark} "
          f"backend={jax.default_backend()}")

    t0 = time.perf_counter()
    if os.path.exists(pk_path):
        with open(pk_path, "rb") as f:
            pk = pk_from_bytes(f.read(), "bw6_761", compressed=False,
                               validate=False)
        helper_pk = None
        if two_snark:
            with open(pk_path + ".helper", "rb") as f:
                helper_pk = pk_from_bytes(f.read(), "bls12_377",
                                          compressed=False, validate=False)
        params = Parameters(epochs=pk, hash_to_bits=helper_pk)
        print(f"setup: loaded {pk_path} in {time.perf_counter()-t0:.1f}s")
    else:
        params = trusted_setup(
            num_validators, num_transitions, faults,
            XorShiftRng(b"e2e-trusted-setp"), device=True,
            hashes_in_bls12_377=two_snark,
        )
        t1 = time.perf_counter()
        print(f"setup: {t1-t0:.1f}s "
              f"({len(params.epochs.a_query)} vars, "
              f"{len(params.epochs.h_query)+1} domain)")
        with open(pk_path, "wb") as f:
            f.write(pk_to_bytes(params.epochs, "bw6_761", compressed=False))
        if two_snark:
            with open(pk_path + ".helper", "wb") as f:
                f.write(pk_to_bytes(params.hash_to_bits, "bls12_377",
                                    compressed=False))
        print(f"setup: saved to {pk_path} in {time.perf_counter()-t1:.1f}s")

    t2 = time.perf_counter()
    first_epoch, transitions, last_epoch = generate_test_data(
        num_validators, faults, num_transitions
    )
    print(f"fixtures: {time.perf_counter()-t2:.1f}s")

    # prove twice: the first call pays the per-process XLA compiles (the
    # axon persistent cache does not round-trip TPU executables), the
    # second is the warm steady-state a proving service runs at
    repeats = int(os.environ.get("E2E_PROVE_REPEAT", "2"))
    from celo_bls_snark_tpu.utils.profiling import report, reset

    def dump_stages(header):
        print(f"--- {header} ---")
        for name, ent in sorted(report().items()):
            if "total_s" in ent:
                print(f"{name:32s} {ent['total_s']:9.2f}s  x{ent['calls']}")
        reset()

    for it in range(repeats):
        t3 = time.perf_counter()
        proof = prove(
            params, num_validators, first_epoch, transitions,
            max_transitions=num_transitions, device=True,
        )
        t4 = time.perf_counter()
        tag = "cold (incl. compile)" if it == 0 else "warm"
        print(f"prove[{it}] {tag}: {t4-t3:.1f}s")
        dump_stages(f"stage breakdown prove[{it}]")

    ok = verify_parsed(params.epochs.vk, first_epoch, last_epoch, proof)
    bad = verify_parsed(params.epochs.vk, first_epoch, first_epoch, proof)
    t5 = time.perf_counter()
    print(f"verify: {t5-t4:.2f}s ok={ok} tamper-rejected={not bad}")
    assert ok and not bad

    dump_stages("stage breakdown (verify + residue)")
    print("E2E PASS")


if __name__ == "__main__":
    main()
