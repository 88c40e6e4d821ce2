#!/bin/bash
# Sequential TPU job queue for when the tunnel recovers:
# 1. driver bench at the new operating point (device + e2e lanes)
# 2. scatter-formulation microbench
# 3. e2e stage breakdown (compact2 upload in effect)
# 4. full BASELINE harness -> BENCHMARKS.json
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/farms_jax_cache

# wait (max ~3h) for the device to answer a trivial program
for i in $(seq 1 120); do
  if timeout 90 python -c "
import jax, jax.numpy as jnp
print(float(jnp.sum(jnp.ones((8,128)))))" >/dev/null 2>&1; then
    echo TPU_UP; break
  fi
  sleep 90
done

timeout 1800 python bench.py 2>&1 | grep -v WARNING | tail -1
timeout 900 python scripts/_prof_scatter.py 2>&1 | grep -v WARNING
timeout 900 python scripts/_prof_e2e2.py 2>&1 | grep -v WARNING
timeout 5400 python -m farms_tpu.bench.harness --configs all \
  2>&1 | grep -v WARNING | tee /tmp/harness_all.jsonl
echo ALL_DONE
