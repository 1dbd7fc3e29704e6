#!/bin/bash
# One-command capture of every hardware measurement queued during the
# 2026-08-18 axon outage (run when the TPU tunnel is back):
#   1. headline bench + embed bench (post _best_time interleave fix)
#   2. IVF Pallas probed-scan kernel A/B vs the XLA probe loop
#      (first hardware numbers for ops/ivf_scan.py)
#   3. 4M balance A/B re-measure (the spill cap changed cmax: was 5.1k
#      with spill re-inflation, now <= 4883 at those settings)
#   4. eval sweep TPU rows (configs #1/#4)
# Each step is independently time-bounded; partial results still land.
set -x
cd "$(dirname "$0")/.."
timeout 900 python bench.py | tee /tmp/hw_bench.json
timeout 900 python bench.py --embed | tee /tmp/hw_embed.json
timeout 1800 python scripts/bench_ivf_probe.py --n 4194304 \
    | tee /tmp/hw_ivf_probe.txt
timeout 3600 python scripts/bench_ivf_tpu.py --balance 1.25 --spill 0.1 \
    | tee /tmp/hw_ivf_balance.txt
timeout 1800 python scripts/eval_baseline.py --tpu \
    | tee /tmp/hw_eval.txt
echo "DONE — fold results into PERF.md / EVAL.md"
