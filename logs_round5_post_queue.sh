#!/bin/bash
# Round-5 post-queue chip jobs: waits for logs_round5_queue.sh to finish,
# then runs the confound-free SIREN sphere-residual decider (prior at the
# TRUE surface radius, see configs/siren_residual_sphere_r05.yaml).
set -u
cd /root/repo
LOG=logs/round5_post_queue.log
exec >>"$LOG" 2>&1

stamp() { echo "[postq $(date +%H:%M:%S)] $*"; }

stamp "waiting for the main queue to complete ..."
while ! grep -q "queue complete" logs/round5_queue.log 2>/dev/null; do
  sleep 60
done
stamp "queue complete — starting post-queue jobs"

stamp "=== POST 1: SIREN residual decider, prior at the true radius (30k) ==="
timeout 7200 python -m neurecon_tpu.tools.supervise --stall_sec 900 --max_restarts 3 -- \
python -m neurecon_tpu.train --config configs/siren_residual_sphere_r05.yaml
stamp "post 1 rc=$?"

stamp "=== POST 1b: eval ==="
python -m neurecon_tpu.tools.make_gt_mesh --shape sphere --N 384 --out /tmp/gt_sphere.ply
timeout 3600 python -m neurecon_tpu.tools.eval_staged \
  --config configs/siren_residual_sphere_r05.yaml \
  --ckpts logs/siren_residual_sphere_r05/ckpts/00010000.pt \
          logs/siren_residual_sphere_r05/ckpts/00020000.pt \
          logs/siren_residual_sphere_r05/ckpts/final_00030000.pt \
  --gt_mesh /tmp/gt_sphere.ply --out docs/figures/staged_siren_residual_r05.jsonl
stamp "post 1b rc=$?"

stamp "=== post-queue complete ==="
