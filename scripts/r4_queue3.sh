#!/bin/bash
# Round-4 chip queue #3 (replaces the tail of r4_queue2.sh after the
# flagship re-promotion made serve_perf's appended rows stale): wait for
# the running serve_latency, then EWREC roofline, a FULL serve_perf
# sweep on the new bundle (coherent rows, one bundle), then the long
# GAN runs sized to the remaining session.
set -x
cd /root/repo

if [ -n "$1" ]; then
  tail --pid="$1" -f /dev/null
fi

timeout 1800 python -m emx.bench.ewrec_bench > docs/runs/ewrec_r4_roofline.json
timeout 1800 python -m emx.bench.ewrec_bench accuracy > docs/runs/ewrec_r4_accuracy.json

timeout 3600 python -m emx.bench.serve_perf \
  docs/runs/flagship/artifact_int8.npz docs/runs/flagship

# Partial-STEM 1/100 trained-quality anchor (VERDICT r3 weak-6):
# 60k steps (~2.3h) fits the remaining session; resumable if trimmed.
timeout 12600 python - <<'EOF'
from emx.bench.gan_quality import main
main("docs/runs/gan_quality_c100", steps=60000, batch=8, size=256,
     scale=0.5, mse_weight=100.0, coverage=100)
EOF

# 1/64 continuation from the committed 100k resume bundle: whatever
# fits before the round ends (segments every 5k steps; eval at target).
timeout 10800 python - <<'EOF'
from emx.bench.gan_quality import main
main("docs/runs/gan_quality_300k", steps=145000, batch=8, size=256,
     scale=0.5, mse_weight=100.0,
     init_from="docs/runs/gan_quality_100k/gan_state.npz")
EOF

echo "R4 QUEUE3 DONE"
