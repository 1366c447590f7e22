"""Root-cause probe for the staged-eval PSNR collapse (TPU-only artifact).

Facts so far:
  * TPU staged eval (full res, microchunk=2048, 16 views): 34.2 -> 24.0 PSNR
    as s sharpens 290 -> 1000, while Chamfer improves.
  * CPU re-eval, same code path incl. microchunk (half res, view 0): 38.5 ->
    48.5 — model is fine, CPU microchunk path is fine.
  * TPU train-val renders (half res, random views, NO microchunk): 37-46 dB
    at late steps — TPU rendering at s=1000 is fine without microchunk.
Suspects: the lax.map microchunk path ON TPU with the flagship model, the
full-res chunk layout, or matmul precision. Matrix below separates them.
"""
import sys

import numpy as np

import jax

sys.path.insert(0, "/root/repo")
import jax.numpy as jnp

from neurecon_tpu.config import load_yaml
from neurecon_tpu.dataio import get_data
from neurecon_tpu.models.frameworks import get_model
from neurecon_tpu.ops import get_rays
from neurecon_tpu.tools.eval_rgb import psnr
from neurecon_tpu.training import render_full_image

CKPT = "/root/repo/logs/long_neus_sphere/ckpts/final_00300000.pt"


def load(H, W):
    args = load_yaml("/root/repo/configs/long_neus_sphere.yaml")
    args.data["H"] = H
    args.data["W"] = W
    model, _t, _kt, kw_test, factory = get_model(args)
    kw = {k: v for k, v in kw_test.items() if k not in ("H", "W", "rayschunk")}
    render_fn = factory(detailed_output=False, **kw)
    dataset = get_data(args)
    import pickle
    with open(CKPT, "rb") as f:
        sd = pickle.load(f)
    params = jax.tree_util.tree_map(jnp.asarray, sd["model"])
    return render_fn, dataset, params


def run(tag, H, W, microchunk, precision, views):
    render_fn, dataset, params = load(H, W)
    print(f"=== {tag}: H={H} W={W} microchunk={microchunk} "
          f"precision={precision} ===", flush=True)

    def one(i):
        _, model_input, gt = dataset[i]
        rays_o, rays_d, _ = get_rays(
            jax.random.PRNGKey(0), jnp.asarray(model_input["c2w"]),
            jnp.asarray(model_input["intrinsics"]), H, W, N_rays=-1)
        ret = render_full_image(render_fn, params, rays_o, rays_d,
                                jax.random.PRNGKey(i), rayschunk=8192,
                                microchunk=microchunk)
        m = np.asarray(model_input["object_mask"], bool)
        print(f"  view {i}: psnr {psnr(ret['rgb'], gt['rgb']):.2f} "
              f"masked {psnr(ret['rgb'], gt['rgb'], m):.2f}", flush=True)

    if precision:
        with jax.default_matmul_precision(precision):
            for i in views:
                one(i)
    else:
        for i in views:
            one(i)


# A: exact staged repro (expect bad). Per-view to see spread.
run("A_full_micro_default", 240, 320, 2048, None, [0, 1, 5, 8])
# B: full res, NO microchunk (if good -> microchunk-on-TPU is the culprit)
run("B_full_nomicro_default", 240, 320, None, None, [0, 1])
# C: half res, microchunk (CPU-good config, on TPU)
run("C_half_micro_default", 120, 160, 2048, None, [0, 1])
# D: full res, microchunk, highest precision (if good -> precision)
run("D_full_micro_highest", 240, 320, 2048, "highest", [0, 1])
print("PRECISION_PROBE_DONE", flush=True)
