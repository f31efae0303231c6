#!/bin/bash
# Sequenced TPU measurement runner for the two round-4 tables that still
# read TBD when the axon tunnel is down:
#   * Q-Former / BUTD family throughput -> docs/performance.md
#     ("All model families, measured"), via scripts/bench_families.py
#   * low-load serving latency (bucketed vs single shape) ->
#     docs/serving.md, via SERVE_MODE=lowload scripts/bench_serve.py
#
# One command, strictly serial (the box has ONE host core; concurrent
# benchmarks corrupt each other): probe the tunnel first, then run each
# measurement with a generous timeout. All JSON lines land in
# $OUT (default /tmp/tpu_measurements.log).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
OUT="${OUT:-/tmp/tpu_measurements.log}"

probe() {
  timeout 240 python -c "
import jax, numpy as np, jax.numpy as jnp
jax.devices()
x = jnp.ones((128, 128), jnp.bfloat16)
print('TPU_OK', np.asarray(x @ x).sum())" 2>&1 | grep -q TPU_OK
}

echo "== $(date) probe ==" >> "$OUT"
if ! probe; then
  echo "PROBE_FAILED $(date)" >> "$OUT"
  exit 1
fi
echo "PROBE_OK $(date)" >> "$OUT"

echo "== $(date) bench_families ==" >> "$OUT"
timeout 3600 python scripts/bench_families.py >> "$OUT" 2>&1
echo "families_exit=$?" >> "$OUT"

echo "== $(date) bench_serve lowload ==" >> "$OUT"
SERVE_MODE=lowload timeout 3600 python scripts/bench_serve.py 60 >> "$OUT" 2>&1
echo "lowload_exit=$?" >> "$OUT"
echo "== $(date) done ==" >> "$OUT"
