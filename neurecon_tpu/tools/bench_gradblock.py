"""Efficiency probe for the eikonal gradient block — is a hand-fused
custom-VJP kernel worth building?

Times grad-wrt-params of a loss over (sdf, nablas, h) =
ImplicitSurface.forward_with_nablas on flagship shapes, pulls XLA's own FLOP
count for the exact program (cost analysis), and reports achieved TF/s
against the ~35-40 TF/s ceiling a bare W=256 layer chain reaches on this
chip (docs/performance.md, shape-limit study). Honest timing for this
tunnel: K reps inside one jitted lax.scan + dependent-scalar fetch.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main(M: int = 65536, K: int = 20, fused: bool = False, tile: int = 256):
    import os

    from neurecon_tpu.models.base import ImplicitSurface

    surf = ImplicitSurface(W=256, D=8, skips=(4,), W_geo_feat=256,
                           embed_multires=6, weight_norm=True)
    params = surf.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (M, 3), jnp.float32, -1, 1)

    if fused:
        # route through the custom-VJP Pallas pair (ops/fused_nablas_vjp.py)
        os.environ["NEURECON_FUSED_NABLAS_VJP"] = "1"
        os.environ["NEURECON_FUSED_NABLAS_VJP_TILE"] = str(tile)
    else:
        os.environ["NEURECON_FUSED_NABLAS_VJP"] = "0"

    def loss(p, pts):
        sdf, nablas, h = surf.forward_with_nablas(p, pts)
        nn = jnp.linalg.norm(nablas, axis=-1)
        # touch all three outputs like the real NeuS loss does
        return (jnp.mean((nn - 1.0) ** 2) + jnp.mean(sdf ** 2)
                + 1e-3 * jnp.mean(h ** 2))

    @jax.jit
    def block(p, pts, c0):
        def body(c, _):
            l, g = jax.value_and_grad(loss)(p, pts + c * 1e-9)
            leaves = jax.tree_util.tree_leaves(g)
            return c + l + sum(jnp.sum(x_) for x_ in leaves) * 1e-12, None
        out, _ = jax.lax.scan(body, c0, None, length=K)
        return out

    # XLA cost analysis counts a scan/while body ONCE regardless of trip
    # count, so compare the K-rep program against a K=1 lowering to recover
    # the true per-rep FLOPs (empirically flops(K) ≈ flops(1), both ≈ body).
    lowered = block.lower(params, x, jnp.zeros(()))
    compiled = lowered.compile()
    flops_body = compiled.cost_analysis()["flops"]
    flops = flops_body * K

    c = block(params, x, jnp.zeros(()))
    _ = float(c)  # warm + sync
    best = float("inf")
    for t in range(3):
        t0 = time.perf_counter()
        c = block(params, x, jnp.asarray(float(t)))
        _ = float(c)
        best = min(best, time.perf_counter() - t0)

    tf_s = flops / best / 1e12
    print(json.dumps({
        "path": ("fused-vjp tile=%d" % tile) if fused else "xla",
        "M": M, "K": K, "block_s": round(best, 4),
        "per_rep_ms": round(best / K * 1e3, 3),
        "program_gflop": round(flops / 1e9, 1),
        "achieved_tf_s": round(tf_s, 1),
        "chain_ceiling_tf_s": "35-40 (measured, docs/performance.md)",
    }))


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--M", type=int, default=65536)
    ap.add_argument("--K", type=int, default=20)
    ap.add_argument("--fused", action="store_true",
                    help="use the custom-VJP fused nablas Pallas pair")
    ap.add_argument("--tile", type=int, default=256)
    a = ap.parse_args()
    main(a.M, a.K, a.fused, a.tile)
