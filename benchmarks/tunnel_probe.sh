#!/bin/bash
# Probe the axon TPU tunnel until it answers, then exit 0.
# Serial probes, one at a time, 240 s timeout each, 10 min spacing —
# killed probes are plain hung clients (no in-flight compile to wedge:
# the arange-sum graph is trivially cached server-side).
set -u
cd "$(dirname "$0")/.."
mkdir -p logs
while true; do
  if timeout 240 python -c "
import jax, jax.numpy as jnp
assert int(jnp.arange(1024, dtype=jnp.int32).sum()) == 523776
print('tunnel up:', jax.devices())
" >> logs/tunnel_probe.log 2>&1; then
    date -u +"%H:%M:%S tunnel UP" >> logs/tunnel_probe.log
    touch logs/tunnel_up.flag
    exit 0
  fi
  date -u +"%H:%M:%S still wedged" >> logs/tunnel_probe.log
  sleep 600
done
