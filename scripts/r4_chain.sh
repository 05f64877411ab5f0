#!/bin/bash
# Round-4 post-retrain chip chain: wait for the quality_r4 training job,
# then distill ladder (3 stacked decoder2 iterations on the mixed-v2
# corpus) -> four-family flagship decision -> bench. One chip job at a
# time (the tunnel is single-job); everything logs to /tmp/r4_chain.log.
set -x
cd /root/repo
GATE=36.01258850097656

if [ -f /tmp/quality_r4.pid ]; then
  tail --pid="$(cat /tmp/quality_r4.pid)" -f /dev/null
fi

timeout 3600 python -m emx.bench.qat_finetune \
  docs/runs/quality_r4/artifact.npz docs/runs/qat_r4 12000 16 5e-5 \
  "$GATE" decoder2 mixed
timeout 3600 python -m emx.bench.qat_finetune \
  docs/runs/qat_r4/bundle.npz docs/runs/qat_r4_s2 12000 16 3e-5 \
  "$GATE" decoder2 mixed
timeout 3600 python -m emx.bench.qat_finetune \
  docs/runs/qat_r4_s2/bundle.npz docs/runs/qat_r4_s3 12000 16 2e-5 \
  "$GATE" decoder2 mixed

timeout 5400 python -m emx.bench.flagship_decision docs/runs/flagship \
  docs/runs/qat_r4/bundle.npz docs/runs/qat_r4_s2/bundle.npz \
  docs/runs/qat_r4_s3/bundle.npz --promote

timeout 1800 python bench.py
echo "R4 CHAIN DONE"
