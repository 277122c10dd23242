#!/bin/bash
# TPU measurement queue — run when the axon tunnel is back up.
# Each step is independently timeout-guarded; results append to /tmp/tpu_queue.log.
# Usage: bash tools/tpu_queue.sh [log_file]
set -u
LOG="${1:-/tmp/tpu_queue.log}"
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ($(date -u +%H:%M:%S))" | tee -a "$LOG"
  timeout 2400 "$@" 2>&1 | tail -6 | tee -a "$LOG"
}

# 0. availability
run python -c "import jax; print(jax.devices())"

# 1. standalone kernel SOL: groups sweep
for g in 1 2 4 8; do
  POSEIDON_GROUPS=$g run python tools/sol_bench.py
done

# 2. flagship bench: groups ablation
POSEIDON_GROUPS=1 run python bench.py
POSEIDON_GROUPS=8 run python bench.py
POSEIDON_GROUPS=4 run python bench.py

# 3. fold shape n=2^11
BENCH_NUM_ROWS=2048 BENCH_BATCH=256 POSEIDON_GROUPS=8 run python bench.py
BENCH_NUM_ROWS=2048 BENCH_BATCH=256 POSEIDON_GROUPS=1 run python bench.py

# 4. BN254 config (unaffected by GL groups; regression check)
BENCH_CONFIG=bn254 BENCH_NUM_ROWS=32 run python bench.py

echo "=== queue done ($(date -u +%H:%M:%S))" | tee -a "$LOG"
