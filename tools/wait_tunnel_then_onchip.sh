#!/bin/bash
# Poll the axon TPU tunnel; when it answers, run the round-3 on-chip batch.
# Safe to leave running: exits after one batch (or after ~6h of no tunnel).
cd /root/repo
mkdir -p onchip_logs
for i in $(seq 1 72); do
  if timeout 180 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" \
      > /dev/null 2>&1; then
    echo "tunnel up at $(date +%H:%M:%S) (attempt $i)" >> onchip_logs/driver.log
    bash tools/onchip_r3.sh
    exit 0
  fi
  echo "tunnel down at $(date +%H:%M:%S) (attempt $i)" >> onchip_logs/driver.log
  sleep 300
done
echo "gave up waiting for tunnel at $(date +%H:%M:%S)" >> onchip_logs/driver.log
exit 1
