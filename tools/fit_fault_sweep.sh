#!/bin/bash
# Sweep the restart-batched MF fit executable across lane counts on the
# real TPU, one subprocess per config so a worker fault cannot poison the
# next probe. Writes per-config logs under /tmp/fit_fault/.
set -u
cd /root/repo
mkdir -p /tmp/fit_fault
for lanes in 8 16 30; do
  log=/tmp/fit_fault/mf_${lanes}.log
  echo "=== lanes=$lanes compile+run ===" | tee "$log"
  timeout 2400 python -u tools/repro_fit_fault.py --lanes "$lanes" \
    >>"$log" 2>&1
  rc=$?
  echo "rc=$rc" | tee -a "$log"
done
echo SWEEP DONE
