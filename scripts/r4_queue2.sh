#!/bin/bash
# Round-4 chip queue #2: runs after scripts/r4_chain.sh (retrain ->
# distill ladder -> 4-family decision -> bench). One chip job at a time
# (single-job tunnel; the 1-core host also serializes dispatch loops).
# Order: cheap evidence first, then the long GAN runs fill the rest of
# the session. Logs to /tmp/r4_queue2.log.
set -x
cd /root/repo

if [ -f /tmp/r4_chain.pid ]; then
  tail --pid="$(cat /tmp/r4_chain.pid)" -f /dev/null
fi

# 1) VAE-GAN recon levers (VERDICT r3 weak-7): wass anneal / 0.1.
timeout 2400 python - <<'EOF'
from emx.bench.zoo_ladder import main
main("docs/runs/zoo_ladder_ext3", 16000, 0.25, 96,
     families=["vaegan_anneal", "vaegan_wass01"])
EOF

# 2) Fused-kernel serving measurement on the (possibly re-promoted)
#    flagship bundle; writes serve_mode.json when a fused variant wins.
timeout 3600 python -m emx.bench.serve_perf \
  docs/runs/flagship/artifact_int8.npz docs/runs/flagship fused

# 3) Serving latency distribution + oversize tiling rows (VERDICT r3
#    weak-4) — honors serve_mode.json, i.e. measures the shipped graph.
timeout 2400 python -m emx.bench.serve_latency \
  docs/runs/flagship/artifact_int8.npz docs/runs/flagship 16 32 512

# 4) EWREC roofline verdict + accuracy-vs-dose (VERDICT r3 weak-8).
timeout 1800 python -m emx.bench.ewrec_bench > docs/runs/ewrec_r4_roofline.json
timeout 1800 python -m emx.bench.ewrec_bench accuracy > docs/runs/ewrec_r4_accuracy.json

# 5) Partial-STEM 1/100 trained-quality anchor (VERDICT r3 weak-6 /
#    next-5): fresh run, reference coverage contract.
timeout 18000 python - <<'EOF'
from emx.bench.gan_quality import main
main("docs/runs/gan_quality_c100", steps=100000, batch=8, size=256,
     scale=0.5, mse_weight=100.0, coverage=100)
EOF

echo "R4 QUEUE2 DONE"
