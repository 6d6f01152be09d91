"""Constraint-count reporter.

Parity with crates/epoch-snark/examples/constraints.rs: print the R1CS
size for a given configuration. Round-1 scope reports the BLS-verify core
(per-epoch cost driver of the ValidatorSetUpdate circuit) with namespace
attribution, the ConstraintLayer-equivalent breakdown.

Usage: python -m celo_bls_snark_tpu.examples.constraints [num_validators]
"""

import sys

from ..relations.r1cs import ConstraintSystem
from ..gadgets.vars import Boolean, FpVar
from ..gadgets.curve_vars import G1Var, G2Var
from ..gadgets import bls as gbls
from ..hostmath.params import P


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    num_validators = int(argv[0]) if argv else 10

    cs = ConstraintSystem(P, "setup")
    pk_vars = [G2Var.new_witness(cs, None) for _ in range(num_validators)]
    bitmap = [Boolean.new_witness(cs, None) for _ in range(num_validators)]
    msg_var = G1Var.new_witness(cs, None)
    sig_var = G1Var.new_witness(cs, None)
    gbls.verify(cs, pk_vars, bitmap, msg_var, sig_var, FpVar.const(cs, 1))

    print(f"validators: {num_validators}")
    print(f"constraints: {cs.num_constraints}")
    print(f"instance variables: {cs.num_instance}")
    print(f"witness variables: {cs.num_witness}")
    print("\nby namespace:")
    for ns, count in sorted(
        cs.constraint_counts_by_namespace().items(), key=lambda kv: -kv[1]
    ):
        print(f"  {count:8d}  {ns or '(root)'}")


if __name__ == "__main__":
    main()
