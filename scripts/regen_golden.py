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
    from celo_bls_snark_tpu.hostmath.params import P
    from celo_bls_snark_tpu.relations.r1cs import ConstraintSystem
    from celo_bls_snark_tpu.snark.epochs import ValidatorSetUpdate
    from celo_bls_snark_tpu.snark.matrix_hash import matrices_hashes

    cs = ConstraintSystem(P, "setup")
    ValidatorSetUpdate.empty(3, 3).generate_constraints(cs)
    golden = {"validator_set_update_3v_3e": matrices_hashes(cs)}

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
