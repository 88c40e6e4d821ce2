#!/bin/bash
# Sequential TPU jobs: accuracy frontier for sub-phase combos + device-lane
# rates. Run detached (nohup); logs to /tmp/phase_sweep.log.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/farms_jax_cache

python scripts/accuracy_sweep.py --stream bar --chunks 65536 \
    --phases 1 2 4 8 --out ACCURACY_phases.json
python scripts/accuracy_sweep.py --stream bar --chunks 131072 \
    --phases 2 4 --out ACCURACY_phases2.json

for combo in "65536 4" "65536 8" "131072 2" "131072 4"; do
  set -- $combo
  echo "== chunk=$1 P=$2 =="
  FARMS_BENCH_CHUNK=$1 FARMS_BENCH_PHASES=$2 FARMS_BENCH_E2E_CALLS=0 \
    timeout 1800 python bench.py 2>&1 | grep -v WARNING | tail -1
done
echo ALL_DONE
