#!/bin/bash
# Round-5 third chip queue: after q5b, re-run the UNISURF-450k staged evals
# with the interval-schedule fix (checkpoint_render_kwargs) — the first pass
# rendered every checkpoint at the iteration-0 interval delta=1.0, which
# understates PSNR on late checkpoints (Chamfer was unaffected).
set -u
cd /root/repo
LOG=logs/round5c_queue.log
exec >>"$LOG" 2>&1

stamp() { echo "[q5c $(date +%H:%M:%S)] $*"; }

stamp "waiting for q5b to complete ..."
while ! grep -q "q5b complete" logs/round5b_queue.log 2>/dev/null; do sleep 30; done
stamp "q5b complete — re-running UNISURF staged evals at trained intervals"

timeout 3600 python -m neurecon_tpu.tools.eval_staged \
  --config configs/long_unisurf_sphere.yaml \
  --ckpts logs/long_unisurf_sphere/ckpts/00050000.pt \
          logs/long_unisurf_sphere/ckpts/00150000.pt \
          logs/long_unisurf_sphere/ckpts/00300000.pt \
          logs/long_unisurf_sphere/ckpts/final_00450000.pt \
  --gt_mesh /tmp/gt_sphere.ply --out docs/figures/staged_unisurf450k_fixed.jsonl
stamp "fixed evals rc=$?"
stamp "=== q5c complete ==="
