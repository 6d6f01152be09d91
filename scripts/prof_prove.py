"""cProfile breakdown of the host-Python side of the flagship prover.

Times the stages of snark/api.py::prove at the e2e config (4 validators,
2 transitions) WITHOUT any device work: witness synthesis, satisfaction
check, matrix export, and the A/B/C evaluation loops of groth16._compute_h.
These are the suspects for the 884s prove wall-clock (VERDICT round 2,
Weak #3). Run: python scripts/prof_prove.py [validators] [transitions]
"""

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def profiled(name, fn, top=12):
    t0 = time.perf_counter()
    pr = cProfile.Profile()
    pr.enable()
    out = fn()
    pr.disable()
    dt = time.perf_counter() - t0
    print(f"\n=== {name}: {dt:.2f}s ===")
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(top)
    print("\n".join(s.getvalue().splitlines()[4 : 4 + top + 8]))
    return out, dt


def main():
    from celo_bls_snark_tpu.hostmath.params import P as BW_FR
    from celo_bls_snark_tpu.relations.r1cs import ConstraintSystem
    from celo_bls_snark_tpu.snark.api import (
        _to_epoch_data, _to_update, _to_dummy_update,
    )
    from celo_bls_snark_tpu.snark.epochs import ValidatorSetUpdate
    from celo_bls_snark_tpu.snark.fixtures import generate_test_data
    from celo_bls_snark_tpu.hostmath import curves as hcurves

    faults = 1
    nv = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    nt = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    first, transitions, _last = generate_test_data(nv, faults, nt)
    updates = [_to_update(t) for t in transitions]
    asig_pt = hcurves.G1.msum(
        [t.aggregate_signature.pt for t in transitions]
    )
    circuit = ValidatorSetUpdate(
        _to_epoch_data(first), updates, nv, asig_pt, hash_helper=None
    )

    cs = ConstraintSystem(BW_FR, "prove")
    _, t_syn = profiled("witness synthesis", lambda: circuit.generate_constraints(cs))
    print(f"constraints={cs.num_constraints} vars={cs.num_instance + cs.num_witness}")

    _, t_sat = profiled("satisfaction check", cs.which_is_unsatisfied)

    (A, B, C), t_mat = profiled("to_matrices", cs.to_matrices)

    r = BW_FR
    z = cs.full_assignment()

    def evals():
        nc = cs.num_constraints
        a_evals = [0] * nc
        b_evals = [0] * nc
        c_evals = [0] * nc
        for j in range(nc):
            a_evals[j] = sum(coeff * z[col] for coeff, col in A[j]) % r
            b_evals[j] = sum(coeff * z[col] for coeff, col in B[j]) % r
            c_evals[j] = sum(coeff * z[col] for coeff, col in C[j]) % r
        return a_evals

    _, t_ev = profiled("A/B/C eval loops", evals)

    # marshaling cost: pack a full-size scalar vector and point vector
    from celo_bls_snark_tpu.ops.field import FQ, FQ761

    def pack_scalars():
        return FQ.pack_raw([x for x in z])

    _, t_ps = profiled("FQ.pack_raw(z)", pack_scalars)

    n = min(len(z), 4096)
    pts = [(i + 1, i + 2) for i in range(n)]  # limb conversion cost only

    def pack_points():
        from celo_bls_snark_tpu.ops import curve as dc

        return dc.pack_affine(FQ761, pts)

    _, t_pp = profiled(f"pack_affine FQ761 [{n}] (Montgomery)", pack_points)
    est = t_pp * (len(z) / n)
    print(f"\n--- summary (validators={nv} transitions={nt}) ---")
    print(f"synthesis      {t_syn:8.2f}s")
    print(f"satisfaction   {t_sat:8.2f}s")
    print(f"to_matrices    {t_mat:8.2f}s")
    print(f"A/B/C evals    {t_ev:8.2f}s")
    print(f"pack_raw(z)    {t_ps:8.2f}s")
    print(f"pack_affine    {t_pp:8.2f}s for {n} -> est {est:.1f}s per {len(z)}-point MSM base pack")


if __name__ == "__main__":
    main()
