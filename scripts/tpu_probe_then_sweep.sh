#!/bin/bash
# Probe the axon TPU every 9 min; when a tiny op round-trips, launch the
# measurement sweep (scripts/run_tpu_sweep.sh) once and exit.
# Probe failures (timeout) are expected during backend outages.
set -u
cd "$(dirname "$0")/.."
PLOG=${PLOG:-/tmp/tpu_probe3.log}
while true; do
  date -u >> "$PLOG"
  if timeout 150 python - >> "$PLOG" 2>&1 <<'EOF'
import jax, jax.numpy as jnp
x = jnp.arange(8)
assert int(jax.device_get((x * 2).ravel()[0])) == 0
print("TPU OK", jax.devices())
EOF
  then
    echo "TPU recovered -> launching sweep" >> "$PLOG"
    bash scripts/run_tpu_sweep.sh
    exit 0
  fi
  sleep 540
done
