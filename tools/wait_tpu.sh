#!/bin/bash
# Wait for the tunneled TPU backend to come back, then run the AdaIN chip
# probes. One chip job at a time (a killed run leaves a tunnel backlog).
cd /root/repo
for i in $(seq 1 40); do
  echo "[wait_tpu] attempt $i $(date +%H:%M:%S)"
  if timeout -k 30 900 python -c "import jax; assert jax.devices()[0].platform == 'tpu'; print('TPU READY')"; then
    set -o pipefail
    echo "[wait_tpu] running train probe"
    timeout -k 30 2400 python tools/probe_adain.py train 8 32 96 2>&1 | grep -v "cpu_aot\|^E08"
    echo "[wait_tpu] train probe exit: $?"
    echo "[wait_tpu] running infer probe"
    timeout -k 30 1800 python tools/probe_adain.py infer 256 512 2>&1 | grep -v "cpu_aot\|^E08"
    echo "[wait_tpu] infer probe exit: $?"
    exit 0
  fi
  sleep 300
done
echo "[wait_tpu] gave up"
exit 1
