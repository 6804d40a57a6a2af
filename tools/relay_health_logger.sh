#!/bin/bash
# Log TPU relay health once a minute to /tmp/relay_health.log so a human (or
# the build loop) can see exactly when the axon relay recovers from a wedge.
# Probe runs in a killable subprocess because the wedge mode is a silent hang.
while true; do
  ts=$(date -u +%H:%M:%S)
  out=$(timeout 60 python -c "import jax, jax.numpy as jnp; jax.block_until_ready(jnp.zeros((128,))+1); print('HEALTHY', jax.devices()[0].platform)" 2>/dev/null)
  if [[ "$out" == *HEALTHY* ]]; then
    echo "$ts HEALTHY" >> /tmp/relay_health.log
  else
    echo "$ts WEDGED" >> /tmp/relay_health.log
  fi
  sleep 60
done
