#!/bin/bash
# Probe the axon tunnel every 15 min with a tiny matmul; exit when it answers.
LOG=/root/repo/logs/tunnel_probe.log
for i in $(seq 1 48); do
  if timeout 240 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((128,128), jnp.bfloat16)
y = np.asarray((x@x)[:2,:2])
print('ok', float(y[0,0]))
" >> "$LOG" 2>&1; then
    echo "$(date +%H:%M:%S) TUNNEL RECOVERED" >> "$LOG"
    exit 0
  fi
  echo "$(date +%H:%M:%S) still wedged (probe $i)" >> "$LOG"
  sleep 900
done
echo "$(date +%H:%M:%S) gave up after 48 probes" >> "$LOG"
exit 1
