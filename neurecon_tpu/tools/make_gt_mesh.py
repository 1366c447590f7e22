"""Mesh an analytic synthetic-scene SDF for Chamfer evaluation.

The reference has no ground-truth meshes at all (its CD eval is an
unimplemented TODO, ref README.md:173-174); here the synthetic scenes'
exact SDFs are meshed with the same marching-tetrahedra extractor used for
learned surfaces, giving an unbiased Chamfer target for tools/eval_mesh.py.

Usage:
    python -m neurecon_tpu.tools.make_gt_mesh --shape torus --N 384 \
        --radius 0.5 --out /tmp/gt_torus.ply
"""
from __future__ import annotations

import argparse

import numpy as np

from neurecon_tpu.utils import mesh as mesh_util


def main():
    import os
    if os.environ.get("JAX_PLATFORMS"):
        # honor a forced platform even where sitecustomize overrides the env
        # var (tests run this tool in a subprocess on CPU; grabbing the TPU
        # there can collide with a concurrent training process)
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", choices=["sphere", "torus", "composite"],
                    default="sphere")
    ap.add_argument("--radius", type=float, default=0.5,
                    help="scene bounding radius (matches data.radius)")
    ap.add_argument("--N", type=int, default=384)
    ap.add_argument("--volume_size", type=float, default=1.5)
    ap.add_argument("--out", type=str, required=True)
    args = ap.parse_args()

    import jax.numpy as jnp

    # query_grid jit-compiles the query, so the SDF is written in jnp;
    # the torus proportions come from the one shared derivation in
    # dataio.synthetic (torus_radii) so GT mesh and rendered scene agree
    if args.shape == "sphere":
        def surface_fn(pts):
            return jnp.linalg.norm(pts, axis=-1) - args.radius
    elif args.shape == "composite":
        from neurecon_tpu.dataio.synthetic import composite_sdf

        def surface_fn(pts):
            return composite_sdf(pts, args.radius, xp=jnp)
    else:
        from neurecon_tpu.dataio.synthetic import torus_radii
        R_maj, r_min = torus_radii(args.radius)

        def surface_fn(pts):
            q = jnp.sqrt(pts[..., 0] ** 2 + pts[..., 2] ** 2) - R_maj
            return jnp.sqrt(q ** 2 + pts[..., 1] ** 2) - r_min

    mesh_util.extract_mesh(surface_fn, volume_size=args.volume_size,
                           N=args.N, filepath=args.out, chunk=2 ** 20)


if __name__ == "__main__":
    main()
