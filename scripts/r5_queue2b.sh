#!/bin/bash
# Round-5 chip queue #2b (replaces r5_queue2.sh before it left its
# wait): identical plan plus the J-invariant auto-select quality row on
# the promoted bundle (VERDICT r4 missing-1's structural fix — no-clean
# -data serving-time model-vs-classical selection), inserted after the
# latency rows and before the long GAN segments. One chip job at a
# time. Logs to /tmp/r5_queue2b.log.
set -x
cd /root/repo

if [ -f /tmp/r5_chain.pid ]; then
  tail --pid="$(cat /tmp/r5_chain.pid)" -f /dev/null
fi

# (0) Serving sweep on the (re-)promoted flagship, now including the
#     dense-folded dw->pw MXU variants (VERDICT r4 next-2); writes
#     serve_mode.json when a variant wins at matched quality. Then the
#     HTTP latency rows at concurrency 16 and 64 with the fill-window
#     batching dispatcher (VERDICT r4 next-5).
timeout 7200 python -m emx.bench.serve_perf \
  docs/runs/flagship/artifact_int8.npz docs/runs/flagship
timeout 3600 python -m emx.bench.serve_latency \
  docs/runs/flagship/artifact_int8.npz docs/runs/flagship 16 32 512
timeout 3600 python -m emx.bench.serve_latency \
  docs/runs/flagship/artifact_int8.npz docs/runs/flagship 64 16 512

# (0b) Auto-select (Noise2Self) margins across all five policy
#      families on the promoted bundle.
timeout 3600 python -m emx.bench.auto_select_check \
  docs/runs/flagship/artifact_int8.npz docs/runs/flagship/auto_select.json

# (a) 1/64 reference-faithful late phase: 25k steps from the 125k state.
timeout 9000 python - <<'EOF'
from emx.bench.gan_quality import main
main("docs/runs/gan_q64_msea", steps=150000, batch=8, size=256,
     scale=0.5, mse_weight=0.0,
     init_from="docs/runs/gan_quality_300k/gan_state.npz", coverage=64)
EOF

# (b) 1/100 continuation: 60k more fused steps, then 30k more.
timeout 14400 python - <<'EOF'
from emx.bench.gan_quality import main
main("docs/runs/gan_quality_c100", steps=120000, batch=8, size=256,
     scale=0.5, mse_weight=100.0, coverage=100)
EOF
timeout 9000 python - <<'EOF'
from emx.bench.gan_quality import main
main("docs/runs/gan_quality_c100", steps=150000, batch=8, size=256,
     scale=0.5, mse_weight=100.0, coverage=100)
EOF

echo "R5 QUEUE2B DONE"
