"""Post-optimization timing of the prover's host stages (no cProfile
overhead). Companion to prof_prove.py."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    from celo_bls_snark_tpu.hostmath.params import P as BW_FR
    from celo_bls_snark_tpu.relations.r1cs import ConstraintSystem
    from celo_bls_snark_tpu.snark.api import _to_epoch_data, _to_update
    from celo_bls_snark_tpu.snark.epochs import ValidatorSetUpdate
    from celo_bls_snark_tpu.snark.fixtures import generate_test_data
    from celo_bls_snark_tpu.hostmath import curves as hcurves

    nv = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    nt = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    first, transitions, _ = generate_test_data(nv, 1, nt)
    updates = [_to_update(t) for t in transitions]
    asig_pt = hcurves.G1.msum([t.aggregate_signature.pt for t in transitions])
    circuit = ValidatorSetUpdate(_to_epoch_data(first), updates, nv, asig_pt)

    cs = ConstraintSystem(BW_FR, "prove")
    t0 = time.perf_counter()
    circuit.generate_constraints(cs)
    t_syn = time.perf_counter() - t0
    print(f"synthesis      {t_syn:8.2f}s   ({cs.num_constraints} constraints)")

    t0 = time.perf_counter()
    csr = cs.to_csr()
    t_csr = time.perf_counter() - t0
    print(f"to_csr         {t_csr:8.2f}s   (nnz={sum(len(m[1]) for m in csr)})")

    t0 = time.perf_counter()
    evals = cs.evaluate_abc()
    t_ev = time.perf_counter() - t0
    print(f"evaluate_abc   {t_ev:8.2f}s")

    t0 = time.perf_counter()
    bad = cs.which_is_unsatisfied_from_evals(*evals)
    t_sat = time.perf_counter() - t0
    assert bad is None, bad
    print(f"sat-from-evals {t_sat:8.2f}s")

    # cross-check against the slow oracle on a sample
    assert cs.which_is_unsatisfied() is None

    from celo_bls_snark_tpu.ops.field import FQ761

    n = 65536
    pts = [(i + 1, i + 2) for i in range(n)]
    t0 = time.perf_counter()
    from celo_bls_snark_tpu.ops import curve as dc

    dc.pack_affine(FQ761, pts)
    t_pp = time.perf_counter() - t0
    z = cs.num_instance + cs.num_witness
    print(f"pack_affine    {t_pp:8.2f}s for {n} -> est {t_pp * z / n:.1f}s per {z}-point base pack")


if __name__ == "__main__":
    main()
