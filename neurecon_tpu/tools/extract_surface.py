"""Standalone marching-tetrahedra mesh extraction from a checkpoint.

  python -m neurecon_tpu.tools.extract_surface --load_pt ckpt.pt \
      --N 512 --volume_size 2.0 --out surface.ply

Mirrors the reference tools/extract_surface.py:6-35 (which rebuilds a default
ImplicitSurface and strips the 'implicit_surface.' prefix); here the
checkpoint stores the params pytree under 'model' / 'implicit_surface', and
an optional --config rebuilds non-default architectures.
"""
from __future__ import annotations

import argparse
import pickle


def main_function(args):
    import jax.numpy as jnp

    from neurecon_tpu.models.base import ImplicitSurface
    from neurecon_tpu.utils.mesh import extract_mesh

    with open(args.load_pt, "rb") as f:
        state_dict = pickle.load(f)
    params = state_dict["model"] if "model" in state_dict else state_dict
    surf_params = params.get("implicit_surface", params)

    surface_cfg = dict(W=args.W, D=args.D, skips=[args.skip] if args.skip >= 0 else [],
                       W_geo_feat=args.W_geo_feat, embed_multires=args.embed_multires,
                       radius_init=args.init_r)
    if args.config is not None:
        from neurecon_tpu.config import load_yaml
        cfg = load_yaml(args.config)
        s = cfg.model.surface
        surface_cfg = dict(W=s.get("W", 256), D=s.get("D", 8),
                           skips=s.get("skips", [4]),
                           W_geo_feat=cfg.model.get("W_geometry_feature", 256),
                           embed_multires=s.get("embed_multires", 6),
                           radius_init=s.get("radius_init", 1.0),
                           use_siren=s.get("use_siren", False))

    surface = ImplicitSurface(**surface_cfg)
    surf_params = {"layers": [
        {k: jnp.asarray(v) for k, v in layer.items()}
        for layer in surf_params["layers"]]}

    extract_mesh(lambda x: surface.forward_query(surf_params, x),
                 volume_size=args.volume_size, level=args.level, N=args.N,
                 filepath=args.out, chunk=args.chunk, show_progress=True)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--load_pt", type=str, required=True)
    parser.add_argument("--config", type=str, default=None,
                        help="experiment config yaml (for non-default nets)")
    parser.add_argument("--out", type=str, default="./surface.ply")
    parser.add_argument("--N", type=int, default=512)
    parser.add_argument("--volume_size", type=float, default=2.0)
    parser.add_argument("--level", type=float, default=0.0)
    parser.add_argument("--chunk", type=int, default=262144)
    parser.add_argument("--D", type=int, default=8)
    parser.add_argument("--W", type=int, default=256)
    parser.add_argument("--W_geo_feat", type=int, default=256)
    parser.add_argument("--skip", type=int, default=4)
    parser.add_argument("--init_r", type=float, default=1.0)
    parser.add_argument("--embed_multires", type=int, default=6)
    main_function(parser.parse_args())
