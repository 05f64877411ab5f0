#!/bin/bash
# Round-5 flagship chain (VERDICT r4 next-1 + next-4): retrain the
# flagship from scratch on the four-family 'mixed3' corpus (filaments
# join training — the proven grains recipe; porous becomes the
# eval-only OOD probe), then gate-aligned decoder2 distillation (each
# candidate now reports the 5-family capped margin sum it will be
# judged by), then the 5-family flagship decision, then bench. One chip
# job at a time (single-job tunnel; 1-core host). Logs to
# /tmp/r5_chain.log.
set -x
cd /root/repo
GATE=36.01258850097656

timeout 10800 python - <<'EOF'
from emx.bench.quality_run import main
main("docs/runs/quality_r5", s2d=4, steps=60000, batch=16,
     norm="batch", folded_head=128, corpus="mixed3")
EOF

timeout 4500 python -m emx.bench.qat_finetune \
  docs/runs/quality_r5/artifact.npz docs/runs/qat_r5 12000 16 5e-5 \
  "$GATE" decoder2 mixed3
timeout 4500 python -m emx.bench.qat_finetune \
  docs/runs/qat_r5/bundle.npz docs/runs/qat_r5_s2 12000 16 3e-5 \
  "$GATE" decoder2 mixed3

timeout 7200 python -m emx.bench.flagship_decision docs/runs/flagship \
  docs/runs/qat_r5/bundle.npz docs/runs/qat_r5_s2/bundle.npz --promote

timeout 1800 python bench.py
echo "R5 CHAIN DONE"
