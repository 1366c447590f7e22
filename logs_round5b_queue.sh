#!/bin/bash
# Round-5 second chip queue: fires the moment the UNISURF-450k training
# process exits — staged UNISURF evals -> SIREN sphere-residual r05 decider
# (the confound-free run, prior at the TRUE surface radius) -> its evals ->
# a full bench.py pass (post lax.sort co-sort change).
set -u
cd /root/repo
LOG=logs/round5b_queue.log
exec >>"$LOG" 2>&1

stamp() { echo "[q5b $(date +%H:%M:%S)] $*"; }

stamp "waiting for the UNISURF 450k process ($(cat /tmp/unisurf450k.pid)) ..."
while kill -0 "$(cat /tmp/unisurf450k.pid)" 2>/dev/null; do sleep 30; done
stamp "UNISURF training process exited"

stamp "=== JOB 1: gt mesh + staged UNISURF-450k evals ==="
python -m neurecon_tpu.tools.make_gt_mesh --shape sphere --N 384 --out /tmp/gt_sphere.ply
timeout 3600 python -m neurecon_tpu.tools.eval_staged \
  --config configs/long_unisurf_sphere.yaml \
  --ckpts logs/long_unisurf_sphere/ckpts/00050000.pt \
          logs/long_unisurf_sphere/ckpts/00150000.pt \
          logs/long_unisurf_sphere/ckpts/00300000.pt \
          logs/long_unisurf_sphere/ckpts/final_00450000.pt \
  --gt_mesh /tmp/gt_sphere.ply --out docs/figures/staged_unisurf450k.jsonl
stamp "job 1 rc=$?"

stamp "=== JOB 2: SIREN residual decider, prior at the true radius (30k) ==="
timeout 4500 python -m neurecon_tpu.tools.supervise --stall_sec 600 --max_restarts 3 -- \
python -m neurecon_tpu.train --config configs/siren_residual_sphere_r05.yaml
stamp "job 2 rc=$?"

stamp "=== JOB 2b: eval the r05 decider checkpoints ==="
timeout 2400 python -m neurecon_tpu.tools.eval_staged \
  --config configs/siren_residual_sphere_r05.yaml \
  --ckpts logs/siren_residual_sphere_r05/ckpts/00010000.pt \
          logs/siren_residual_sphere_r05/ckpts/00020000.pt \
          logs/siren_residual_sphere_r05/ckpts/final_00030000.pt \
  --gt_mesh /tmp/gt_sphere.ply --out docs/figures/staged_siren_residual_r05.jsonl
stamp "job 2b rc=$?"

stamp "=== JOB 3: full bench.py (post co-sort change) ==="
timeout 1800 python bench.py
stamp "job 3 rc=$?"

stamp "=== q5b complete ==="
