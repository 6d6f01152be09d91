"""Regenerate tests/golden_matrices.json — the pinned A/B/C matrix
fingerprints of the deployed-shape circuits (the epochs.rs:592-597
regression guard). Run ONLY after a deliberate circuit change; existing
proving/verifying keys stop matching whenever these digests move.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    from dataclasses import replace

    from celo_bls_snark_tpu.hostmath.params import P
    from celo_bls_snark_tpu.relations.r1cs import ConstraintSystem
    from celo_bls_snark_tpu.snark.epochs import ValidatorSetUpdate
    from celo_bls_snark_tpu.snark.matrix_hash import matrices_hashes
    from celo_bls_snark_tpu.utils.config import get_config, set_config

    golden = {}
    base = get_config()
    # pin BOTH sign-bit modes (compat 377 = deployed Celo, 383 = the
    # reference's non-compat feature) so circuit drift in either config
    # is caught the way epochs.rs:592-597 catches it
    for name, bit in (
        ("validator_set_update_3v_3e", 377),
        ("validator_set_update_3v_3e_bit383", 383),
    ):
        set_config(replace(base, compat_sign_bit=bit))
        cs = ConstraintSystem(P, "setup")
        ValidatorSetUpdate.empty(3, 3).generate_constraints(cs)
        golden[name] = matrices_hashes(cs)
    set_config(base)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "golden_matrices.json",
    )
    with open(path, "w") as f:
        json.dump(golden, f, indent=2)
        f.write("\n")
    print(f"wrote {path}: {golden}")


if __name__ == "__main__":
    main()
