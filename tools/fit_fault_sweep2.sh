#!/bin/bash
# Follow-up probes: separate DATA/DURATION from LANE COUNT as the fault
# trigger. Sweep 1 (synthetic noise, maxiter=200) crashed the worker at
# 8, 16, AND 30 lanes after 9-16 min of execution — so the round-3
# "30 lanes fault, 8 fine" boundary is suspect. These probes hold lanes
# fixed and vary execution length instead.
set -u
cd /root/repo
mkdir -p /tmp/fit_fault
run() {
  local name=$1; shift
  local log=/tmp/fit_fault/${name}.log
  echo "=== $name: $* ===" | tee "$log"
  timeout 2400 python -u tools/repro_fit_fault.py "$@" >>"$log" 2>&1
  echo "rc=$?" | tee -a "$log"
}
run conv_8   --lanes 8  --converging
run short_8  --lanes 8  --maxiter 20
run conv_30  --lanes 30 --converging
run conv_90  --lanes 90 --converging
echo SWEEP2 DONE
