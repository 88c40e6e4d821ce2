#!/bin/bash
# Operating-point sweep: coarse-aperture candidates on the real chip.
# One TPU job at a time; device lane only (E2E_CALLS=0).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/farms_jax_cache
out=/tmp/op_sweep.jsonl
: > $out
for pa in "2 0" "8 2" "16 2" "8 1"; do
  set -- $pa
  echo "# P=$1 A=$2" >> $out
  FARMS_BENCH_PHASES=$1 FARMS_BENCH_APHASES=$2 FARMS_BENCH_E2E_CALLS=0 \
    timeout 2400 python bench.py >> $out 2>/tmp/op_sweep_err.log
done
echo DONE >> $out
