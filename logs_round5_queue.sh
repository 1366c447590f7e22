#!/bin/bash
# Round-5 TPU job queue: serializes every on-chip measurement/run of the
# round so nothing contends for the single tunneled chip.
set -u
cd /root/repo
mkdir -p logs docs/figures
LOG=logs/round5_queue.log
exec >>"$LOG" 2>&1

stamp() { echo "[queue $(date +%H:%M:%S)] $*"; }

stamp "=== JOB 1: VolSDF pipelined bench rows (VERDICT r4 #4) ==="
timeout 3600 python - <<'EOF'
import json
import bench
for name, fn in (("VolSDF-pipelined", bench.bench_volsdf_pipelined),
                 ("VolSDF-pipelined-fused", bench.bench_volsdf_pipelined_fused)):
    try:
        rps = fn()
        print(json.dumps({
            "metric": f"{name} train throughput (512 rays/step)",
            "value": round(rps, 1), "unit": "rays/sec/chip",
            "vs_baseline": round(rps / bench.BASELINE_RAYS_PER_SEC, 2)}),
            flush=True)
    except Exception as e:
        print(f"# bench[{name}] failed: {str(e).splitlines()[0][:150]}",
              flush=True)
EOF
stamp "job 1 rc=$?"

stamp "=== JOB 2: jax.profiler trace of the production NeuS step (VERDICT r4 #5) ==="
NEURECON_PROFILE_STEPS=200:400 timeout 2400 \
python -m neurecon_tpu.train --config configs/long_neus_sphere.yaml \
  --expname prof_neus_r5 --training:num_iters 600 \
  --training:i_val -1 --training:i_backup -1 --training:i_save -1
stamp "job 2 rc=$? (trace under logs/prof_neus_r5/profile if supported)"

stamp "=== JOB 3: matched 25k A/B control, XLA grad path (VERDICT r4 #7) ==="
timeout 10800 python -m neurecon_tpu.tools.supervise --stall_sec 900 --max_restarts 3 -- \
python -m neurecon_tpu.train --config configs/long_neus_sphere.yaml \
  --expname neus25k_ab_xla --training:num_iters 25000 \
  --training:fused_nablas_vjp false --training:i_val 12500
stamp "job 3 rc=$?"

stamp "=== JOB 3b: eval the A/B control checkpoint ==="
python -m neurecon_tpu.tools.make_gt_mesh --shape sphere --N 384 --out /tmp/gt_sphere.ply
timeout 3600 python -m neurecon_tpu.tools.eval_staged \
  --config configs/long_neus_sphere.yaml \
  --ckpts logs/neus25k_ab_xla/ckpts/final_00025000.pt \
  --gt_mesh /tmp/gt_sphere.ply --out docs/figures/staged_neus25k_ab_xla.jsonl
stamp "job 3b rc=$?"

stamp "=== JOB 4: SIREN sphere-residual decider, 30k (VERDICT r4 #3) ==="
timeout 14400 python -m neurecon_tpu.tools.supervise --stall_sec 900 --max_restarts 3 -- \
python -m neurecon_tpu.train --config configs/siren_residual_sphere.yaml
stamp "job 4 rc=$?"

stamp "=== JOB 4b: eval the SIREN decider checkpoints ==="
timeout 7200 python -m neurecon_tpu.tools.eval_staged \
  --config configs/siren_residual_sphere.yaml \
  --ckpts logs/siren_residual_sphere/ckpts/00010000.pt \
          logs/siren_residual_sphere/ckpts/00020000.pt \
          logs/siren_residual_sphere/ckpts/final_00030000.pt \
  --gt_mesh /tmp/gt_sphere.ply --out docs/figures/staged_siren_residual.jsonl
stamp "job 4b rc=$?"

stamp "=== JOB 5: UNISURF reference-length 450k run (VERDICT r4 #2) ==="
timeout 28800 python -m neurecon_tpu.tools.supervise --stall_sec 900 --max_restarts 8 -- \
python -m neurecon_tpu.train --config configs/long_unisurf_sphere.yaml
stamp "job 5 rc=$?"

stamp "=== JOB 5b: staged evals for UNISURF 450k ==="
timeout 14400 python -m neurecon_tpu.tools.eval_staged \
  --config configs/long_unisurf_sphere.yaml \
  --ckpts logs/long_unisurf_sphere/ckpts/00050000.pt \
          logs/long_unisurf_sphere/ckpts/00150000.pt \
          logs/long_unisurf_sphere/ckpts/00300000.pt \
          logs/long_unisurf_sphere/ckpts/final_00450000.pt \
  --gt_mesh /tmp/gt_sphere.ply --out docs/figures/staged_unisurf450k.jsonl
stamp "job 5b rc=$?"

stamp "=== queue complete ==="
