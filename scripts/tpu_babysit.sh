#!/bin/bash
# Wait until the TPU chip is claimable, then run the queued round-3 record
# runs (scripts/r3_records2.sh). Retries the claim probe every 5 minutes;
# gives up after ~4 h. Never kills a client mid-claim (wedges the relay).
cd /root/repo
for attempt in $(seq 1 48); do
  echo "[babysit] claim probe attempt $attempt at $(date -u +%H:%M:%S)"
  timeout 600 python -c "
import jax, time
t0 = time.time()
d = jax.devices()
print('devices', d, 'after', round(time.time()-t0, 1), 's', flush=True)
import jax.numpy as jnp
x = jnp.ones((256, 256))
print('matmul ok', float((x @ x)[0, 0]), flush=True)
" && { echo "[babysit] chip up — launching r3_records2.sh"; bash scripts/r3_records2.sh; exit $?; }
  echo "[babysit] probe failed/timed out; sleeping 300 s"
  sleep 300
done
echo "[babysit] gave up after 48 attempts"
exit 1
