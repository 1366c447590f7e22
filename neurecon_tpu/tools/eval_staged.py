"""Staged-checkpoint evaluation: PSNR (+ masked interior/edge decomposition)
and Chamfer for MANY checkpoints of one run, in ONE process.

Backend init through the device tunnel costs 60-200 s per process and every
separate eval invocation would recompile-or-reload the same programs; this
tool builds the renderer once and streams checkpoints through it — the
long-horizon protocol (PSNR/Chamfer at 25k/100k/300k) costs one setup.

  python -m neurecon_tpu.tools.eval_staged --config configs/long_neus_sphere.yaml \
      --ckpts logs/long_neus_sphere/ckpts/00025000.pt \
              logs/long_neus_sphere/ckpts/00100000.pt \
              logs/long_neus_sphere/ckpts/final_00300000.pt \
      --gt_mesh /tmp/gt_sphere.ply --out /tmp/staged.jsonl
"""
from __future__ import annotations

import json
import os
import pickle
import tempfile

import numpy as np


def evaluate_ckpts(args, ckpts, gt_mesh=None, n_eval=None, rayschunk=8192,
                   microchunk=0, mesh_N=256, n_samples=100000,
                   edge_px=2, out_path=None):
    import jax
    import jax.numpy as jnp

    from neurecon_tpu.dataio import get_data
    from neurecon_tpu.models.frameworks import (checkpoint_render_kwargs,
                                                get_model)
    from neurecon_tpu.ops import get_rays
    from neurecon_tpu.tools.eval_mesh import chamfer_distance, sample_surface
    from neurecon_tpu.tools.eval_rgb import masked_psnr_decomposition, psnr
    from neurecon_tpu.training import render_full_image
    from neurecon_tpu.utils.console import log
    from neurecon_tpu.utils.mesh import extract_mesh, read_ply

    model, _t, _kt, render_kwargs_test, render_factory = get_model(args)
    kwargs = {k: v for k, v in render_kwargs_test.items()
              if k not in ("H", "W", "rayschunk")}
    render_fn = render_factory(detailed_output=False, **kwargs)

    dataset = get_data(args)
    H, W = dataset.H, dataset.W
    n_eval = min(len(dataset), n_eval or len(dataset))

    gt_pts = None
    if gt_mesh is not None:
        vg, fg = read_ply(gt_mesh)
        gt_pts = sample_surface(vg, fg, n_samples, seed=1)

    results = []
    for ckpt in ckpts:
        with open(ckpt, "rb") as f:
            sd = pickle.load(f)
        params = jax.tree_util.tree_map(
            jnp.asarray, sd["model"] if "model" in sd else sd)
        step = int(sd.get("global_step", -1))
        row = {"ckpt": os.path.basename(ckpt), "step": step}
        # render the checkpoint under the sampling schedule it was trained
        # with at `step` (e.g. UNISURF's decayed interval Δ)
        step_kwargs = checkpoint_render_kwargs(args, step)

        psnrs, psnrs_m, decomps = [], [], []
        for i in range(n_eval):
            _, model_input, gt = dataset[i]
            rays_o, rays_d, _ = get_rays(
                jax.random.PRNGKey(0), jnp.asarray(model_input["c2w"]),
                jnp.asarray(model_input["intrinsics"]), H, W, N_rays=-1)
            ret = render_full_image(render_fn, params, rays_o, rays_d,
                                    jax.random.PRNGKey(i),
                                    rayschunk=rayschunk,
                                    microchunk=microchunk, **step_kwargs)
            psnrs.append(psnr(ret["rgb"], gt["rgb"]))
            if "object_mask" in model_input:
                m = np.asarray(model_input["object_mask"], bool)
                psnrs_m.append(psnr(ret["rgb"], gt["rgb"], m))
                decomps.append(masked_psnr_decomposition(
                    ret["rgb"], gt["rgb"], m, H, W, edge_px))
        row["psnr"] = float(np.mean(psnrs))
        # per-view spread: a collapsed mean with a healthy max flags a
        # per-view or eval-path artifact rather than a bad model (the round-3
        # staged-eval regression hunt needed exactly this)
        row["psnr_min"] = float(np.min(psnrs))
        row["psnr_max"] = float(np.max(psnrs))
        if psnrs_m:
            row["psnr_masked"] = float(np.mean(psnrs_m))
            row["psnr_interior"] = float(np.mean(
                [d["psnr_interior"] for d in decomps]))
            row["psnr_edge"] = float(np.mean([d["psnr_edge"] for d in decomps]))
            row["edge_frac_of_masked_err"] = float(np.mean(
                [d["edge_frac_of_masked_err"] for d in decomps]))

        if gt_pts is not None:
            surf_params = params["implicit_surface"]
            with tempfile.NamedTemporaryFile(suffix=".ply") as tmp:
                # NeuS/VolSDF expose an sdf; UNISURF's occupancy uses the
                # 0.5-level of the sigmoid == 0-level of the logits
                extract_mesh(
                    lambda x: model.implicit_surface.forward_query(surf_params, x),
                    volume_size=float(args.data.get("volume_size", 2.0)),
                    N=mesh_N, filepath=tmp.name)
                vp, fp = read_ply(tmp.name)
            if len(fp) == 0:
                # a collapsed model (SDF with no zero crossing inside the
                # volume, e.g. the SIREN-VolSDF failure mode) yields an empty
                # mesh; report it instead of crashing out of the whole eval
                log.warning(f"eval_staged: {ckpt}: no surface inside the "
                            f"volume (empty mesh) — chamfer skipped")
                row.update({"chamfer": None, "no_surface": True})
            else:
                pts_p = sample_surface(vp, fp, n_samples)
                cd, acc, comp = chamfer_distance(pts_p, gt_pts)
                row.update({"chamfer": cd, "accuracy": acc,
                            "completeness": comp})

        log.info(f"eval_staged: {json.dumps(row)}")
        print(json.dumps(row), flush=True)
        results.append(row)
        if out_path:
            with open(out_path, "a") as f:
                f.write(json.dumps(row) + "\n")
    return results


if __name__ == "__main__":
    from neurecon_tpu.config import parse_cli

    def extra(parser):
        parser.add_argument("--ckpts", type=str, nargs="+", required=True)
        parser.add_argument("--gt_mesh", type=str, default=None)
        parser.add_argument("--n_eval", type=int, default=None)
        parser.add_argument("--rayschunk", type=int, default=8192)
        # default OFF: these renders are forward-only (no nablas VJP), so
        # rayschunk alone bounds memory — and the lax.map micro-block path
        # miscompiles the sharp-s NeuS render on this environment's TPU
        # backend (round-3 probe: 23 dB with lax.map vs 44 dB without, same
        # params/rays; CPU identical either way; docs/methods.md)
        parser.add_argument("--microchunk", type=int, default=0)
        parser.add_argument("--fused_kernels", action="store_true",
                            help="enable the eval-path Pallas megakernels")
        parser.add_argument("--mesh_N", type=int, default=256)
        parser.add_argument("--edge_px", type=int, default=2)
        parser.add_argument("--out", type=str, default=None)

    config, _ = parse_cli(extra_args_fn=extra)
    if config.get("fused_kernels", False):
        from neurecon_tpu.utils.io import enable_fused_kernels
        enable_fused_kernels()
    evaluate_ckpts(config, config.ckpts, gt_mesh=config.get("gt_mesh"),
                   n_eval=config.get("n_eval"),
                   rayschunk=int(config.get("rayschunk", 8192)),
                   microchunk=int(config.get("microchunk", 0)),
                   mesh_N=int(config.get("mesh_N", 256)),
                   edge_px=int(config.get("edge_px", 2)),
                   out_path=config.get("out"))
