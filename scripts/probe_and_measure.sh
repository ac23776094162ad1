#!/usr/bin/env bash
# Poll the axon TPU relay; on first successful contact, run the full
# measurement sweep (scripts/measure_all.sh). Designed to sit in tmux for
# hours: the relay comes and goes (see docs/BENCHMARKS.md relay notes).
set -u
cd "$(dirname "$0")/.."
mkdir -p measurements
n=0
while true; do
  n=$((n+1))
  echo "[probe $n] $(date -u +%H:%M:%S) probing TPU..."
  if timeout "${PROBE_TIMEOUT:-420}" python - <<'EOF'
import jax, jax.numpy as jnp
d = jax.devices()
x = jnp.ones((256, 256))
y = (x @ x).block_until_ready()
print("TPU OK:", d, float(y[0, 0]))
EOF
  then
    echo "[probe $n] relay UP — starting measure_all.sh"
    bash scripts/measure_all.sh 2>&1 | tee measurements/last_sweep.log
    echo "SWEEP_DONE $(date -u +%H:%M:%S)" | tee measurements/SWEEP_DONE
    break
  fi
  echo "[probe $n] relay down; sleeping 120s"
  sleep 120
done
