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


def erode_mask(mask_hw: np.ndarray, k: int = 2) -> np.ndarray:
    """k-iteration 4-neighborhood binary erosion (no scipy dependency)."""
    m = np.asarray(mask_hw, bool)
    for _ in range(k):
        inner = m.copy()
        inner[1:] &= m[:-1]
        inner[:-1] &= m[1:]
        inner[:, 1:] &= m[:, :-1]
        inner[:, :-1] &= m[:, 1:]
        m = inner
    return m


def masked_psnr_decomposition(pred, gt, mask_flat, H, W, edge_px: int = 2):
    """Split the object-masked PSNR into an interior band and a silhouette
    edge band (mask minus its erosion): soft volume-rendered silhouettes
    against a binary-sampled GT concentrate squared error in a thin ring,
    which dominates the small masked denominator even when the interior is
    near-perfect — this measures that effect instead of guessing at it."""
    mask = np.asarray(mask_flat, bool).reshape(H, W)
    interior = erode_mask(mask, edge_px)
    edge = mask & ~interior
    pred = np.clip(np.asarray(pred, np.float64), 0, 1).reshape(H, W, -1)
    gt = np.asarray(gt, np.float64).reshape(H, W, -1)
    se = ((pred - gt) ** 2).mean(-1)
    total_se = se[mask].sum() + 1e-300
    out = {
        "psnr_interior": float(-10 * np.log10(se[interior].mean() + 1e-12))
        if interior.any() else float("nan"),
        "psnr_edge": float(-10 * np.log10(se[edge].mean() + 1e-12))
        if edge.any() else float("nan"),
        "edge_frac_of_masked_px": float(edge.sum() / max(mask.sum(), 1)),
        "edge_frac_of_masked_err": float(se[edge].sum() / total_se),
    }
    return out


def main_function(args):
    import jax
    import jax.numpy as jnp

    if args.get("fused_kernels", False):
        from neurecon_tpu.utils.io import enable_fused_kernels
        enable_fused_kernels()

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
        sd = pickle.load(f)
    params = jax.tree_util.tree_map(jnp.asarray, sd["model"])
    # render under the sampling schedule the checkpoint was trained with
    # (e.g. UNISURF's decayed interval Δ at this step)
    from neurecon_tpu.models.frameworks import checkpoint_render_kwargs
    step_kwargs = checkpoint_render_kwargs(args, int(sd.get("global_step", -1)))

    if args.get("downscale", None):
        args.data["downscale"] = args.downscale
    dataset = get_data(args)
    H, W = dataset.H, dataset.W
    kwargs = {k: v for k, v in render_kwargs_test.items()
              if k not in ("H", "W", "rayschunk")}
    render_fn = render_factory(detailed_output=False, **kwargs)
    rayschunk = int(args.get("rayschunk", 4096))

    psnrs, psnrs_masked, decomps = [], [], []
    edge_px = int(args.get("edge_px", 2))
    n_eval = min(len(dataset), int(args.get("n_eval", len(dataset))))
    for i in range(n_eval):
        _, model_input, gt = dataset[i]
        rays_o, rays_d, _ = get_rays(
            jax.random.PRNGKey(0), jnp.asarray(model_input["c2w"]),
            jnp.asarray(model_input["intrinsics"]), H, W, N_rays=-1)
        ret = render_full_image(render_fn, params, rays_o, rays_d,
                                jax.random.PRNGKey(i), rayschunk=rayschunk,
                                microchunk=int(args.get("microchunk", 0)) or None,
                                **step_kwargs)
        p = psnr(ret["rgb"], gt["rgb"])
        psnrs.append(p)
        msg = f"view {i}: psnr={p:.2f}"
        if "object_mask" in model_input:
            m = np.asarray(model_input["object_mask"], bool)
            pm = psnr(ret["rgb"], gt["rgb"], m)
            psnrs_masked.append(pm)
            dec = masked_psnr_decomposition(ret["rgb"], gt["rgb"], m, H, W,
                                            edge_px)
            decomps.append(dec)
            msg += (f" masked={pm:.2f} interior={dec['psnr_interior']:.2f} "
                    f"edge={dec['psnr_edge']:.2f} "
                    f"(edge {dec['edge_frac_of_masked_px']:.1%} of px, "
                    f"{dec['edge_frac_of_masked_err']:.1%} of err)")
        log.info(msg)

    result = {"psnr_mean": float(np.mean(psnrs)), "n_views": n_eval}
    if psnrs_masked:
        result["psnr_masked_mean"] = float(np.mean(psnrs_masked))
        result["psnr_interior_mean"] = float(np.mean(
            [d["psnr_interior"] for d in decomps]))
        result["psnr_edge_mean"] = float(np.mean(
            [d["psnr_edge"] for d in decomps]))
        result["edge_frac_of_masked_err_mean"] = float(np.mean(
            [d["edge_frac_of_masked_err"] for d in decomps]))
        result["edge_px"] = edge_px
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
        parser.add_argument("--fused_kernels", action="store_true",
                            help="enable the eval-path Pallas megakernels")
        parser.add_argument("--n_eval", type=int, default=10**9)
        parser.add_argument("--edge_px", type=int, default=2,
                            help="silhouette band width for the masked-PSNR "
                                 "interior/edge decomposition")

    config, _ = parse_cli(extra_args_fn=extra)
    main_function(config)
