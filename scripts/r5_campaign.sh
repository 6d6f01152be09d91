#!/bin/bash
# Round-5 measurement campaign. Run ONLY with frozen kernel sources
# (any ops/ edit invalidates the AOT fingerprint and turns the runs
# into compile benchmarks). One TPU job at a time; generous timeouts —
# a TPU process killed mid-dispatch wedges the remote execute service
# for ~30 min (observed twice this round).
set -u
cd /root/repo

echo "== campaign start $(date -u)"

# 1) reproducibility: 3 fresh-process e2e runs, warm AOT
for i in 1 2 3; do
  E2E_PROVE_REPEAT=2 timeout 3400 python scripts/run_e2e.py \
    > perf/e2e_r05_final$i.log 2>&1
  echo "e2e final$i rc=$? $(date -u)"
done

# 2) fresh trusted setup (new pk path; measures setup wall-clock with
#    the device batch-inversion affine path; deleted afterwards)
E2E_PK_PATH=/root/repo/.e2e_pk_r5fresh.bin E2E_PROVE_REPEAT=1 \
  timeout 5000 python scripts/run_e2e.py > perf/e2e_r05_setup.log 2>&1
echo "setup rc=$? $(date -u)"
rm -f /root/repo/.e2e_pk_r5fresh.bin

# 3) MSM/NTT kernel throughput
timeout 3400 python scripts/bench_msm_ntt.py 20 --bw6 \
  > perf/msm_ntt_r05.txt 2>&1
echo "msm_ntt rc=$? $(date -u)"

# 4) hashing-included verification (+ stage breakdown)
BENCH_HASH_PROFILE=1 timeout 3400 python scripts/bench_hash_verify.py \
  > perf/hash_verify_r05.txt 2>&1
echo "hash_verify rc=$? $(date -u)"

# 5) 4-strategy comparison (now times device hashing per strategy)
timeout 3400 python scripts/bench_strategies.py \
  > perf/strategies_r05.txt 2>&1
echo "strategies rc=$? $(date -u)"

# 6) smoke suite (AOT-warm after the above)
timeout 3400 python scripts/tpu_smoke.py > perf/tpu_smoke_r05.txt 2>&1
echo "smoke rc=$? $(date -u)"

# 7) headline bench (populates the AOT entry the driver's run will hit)
timeout 3400 python bench.py > perf/bench_r05.txt 2>&1
echo "bench rc=$? $(date -u)"

echo "== campaign done $(date -u)"
