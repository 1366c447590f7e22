"""RGB evaluation: render every dataset view from a checkpoint and report
PSNR (+ optional masked PSNR). This fills the reference's unimplemented
'eval script for RGB' TODO (reference README.md:173).

  python -m neurecon_tpu.tools.eval_rgb --config configs/neus.yaml \
      --load_pt logs/neus_65/ckpts/latest.pt --downscale 4
"""
from __future__ import annotations

import json
import os
import pickle

import numpy as np


def psnr(pred: np.ndarray, gt: np.ndarray, mask: np.ndarray = None) -> float:
    pred = np.clip(np.asarray(pred, np.float64), 0, 1)
    gt = np.asarray(gt, np.float64)
    if mask is not None:
        se = ((pred - gt) ** 2)[mask]
    else:
        se = (pred - gt) ** 2
    mse = se.mean()
    return float(-10.0 * np.log10(mse + 1e-12))


def main_function(args):
    import jax
    import jax.numpy as jnp

    from neurecon_tpu.dataio import get_data
    from neurecon_tpu.models.frameworks import get_model
    from neurecon_tpu.ops import get_rays
    from neurecon_tpu.training import render_full_image
    from neurecon_tpu.utils.checkpoints import sorted_ckpts
    from neurecon_tpu.utils.console import log

    model, _t, _kt, render_kwargs_test, render_factory = get_model(args)
    if args.get("load_pt", None) is None:
        ckpt_file = sorted_ckpts(os.path.join(args.training.exp_dir, "ckpts"))[-1]
    else:
        ckpt_file = args.load_pt
    with open(ckpt_file, "rb") as f:
        params = jax.tree_util.tree_map(jnp.asarray, pickle.load(f)["model"])

    if args.get("downscale", None):
        args.data["downscale"] = args.downscale
    dataset = get_data(args)
    H, W = dataset.H, dataset.W
    kwargs = {k: v for k, v in render_kwargs_test.items()
              if k not in ("H", "W", "rayschunk")}
    render_fn = render_factory(detailed_output=False, **kwargs)
    rayschunk = int(args.get("rayschunk", 4096))

    psnrs, psnrs_masked = [], []
    n_eval = min(len(dataset), int(args.get("n_eval", len(dataset))))
    for i in range(n_eval):
        _, model_input, gt = dataset[i]
        rays_o, rays_d, _ = get_rays(
            jax.random.PRNGKey(0), jnp.asarray(model_input["c2w"]),
            jnp.asarray(model_input["intrinsics"]), H, W, N_rays=-1)
        ret = render_full_image(render_fn, params, rays_o, rays_d,
                                jax.random.PRNGKey(i), rayschunk=rayschunk,
                                microchunk=int(args.get("microchunk", 0)) or None)
        p = psnr(ret["rgb"], gt["rgb"])
        psnrs.append(p)
        msg = f"view {i}: psnr={p:.2f}"
        if "object_mask" in model_input:
            pm = psnr(ret["rgb"], gt["rgb"],
                      np.asarray(model_input["object_mask"], bool))
            psnrs_masked.append(pm)
            msg += f" masked={pm:.2f}"
        log.info(msg)

    result = {"psnr_mean": float(np.mean(psnrs)), "n_views": n_eval}
    if psnrs_masked:
        result["psnr_masked_mean"] = float(np.mean(psnrs_masked))
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    from neurecon_tpu.config import parse_cli

    def extra(parser):
        parser.add_argument("--load_pt", type=str, default=None)
        parser.add_argument("--downscale", type=float, default=None)
        parser.add_argument("--rayschunk", type=int, default=4096)
        parser.add_argument("--microchunk", type=int, default=0,
                            help="rays per lax.map block inside one dispatch")
        parser.add_argument("--n_eval", type=int, default=10**9)

    config, _ = parse_cli(extra_args_fn=extra)
    main_function(config)
