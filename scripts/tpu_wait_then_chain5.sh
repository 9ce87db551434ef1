#!/bin/bash
# Wait for the tunneled TPU to accept a claim, then run the round-5 chain.
# Each probe is bounded; failures log and retry — the tunnel sometimes
# drops for minutes-to-hours at a time (BASELINE.md tunnel notes).
cd /root/repo
for i in $(seq 1 120); do
  if timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128))
print('TPU_OK', (x@x).sum(), jax.devices())
" 2>/tmp/tpu_probe_err.log; then
    echo "tpu up after attempt $i $(date -u +%H:%M:%S)"
    exec bash scripts/round5_chain.sh
  fi
  echo "attempt $i failed $(date -u +%H:%M:%S)"; tail -2 /tmp/tpu_probe_err.log
  sleep 60
done
echo "TPU never came up"
exit 1
