#!/bin/bash
# Wait until the TPU chip is claimable, then run the queued round-3 record
# runs (scripts/r3_records2.sh). The probe uses a CLIENT-SIDE claim timeout
# (scripts/tpu_claim_probe.py) so it gives up cleanly — never SIGKILL a
# client mid-claim (killed clients are the suspected cause of wedged
# grants on this relay). Retries every 5 minutes; gives up after ~8 h.
cd /root/repo
for attempt in $(seq 1 64); do
  echo "[babysit] claim probe attempt $attempt at $(date -u +%H:%M:%S)"
  if PALLAS_AXON_POOL_IPS= CLAIM_PROBE_TIMEOUT_S=300 \
      timeout -k 30 600 python scripts/tpu_claim_probe.py; then
    echo "[babysit] chip up — launching r3_records2.sh"
    bash scripts/r3_records2.sh
    exit $?
  fi
  echo "[babysit] probe gave up; sleeping 300 s"
  sleep 300
done
echo "[babysit] gave up after 64 attempts"
exit 1
