"""On-chip A/B of eval-render accelerators on the bench.py render workload.

Rows: baseline (bench.py's render row exactly), + --cull_miss, + fused
upsampler, + both. Also PSNR between each variant's rgb and the baseline's
(the culling contract: identical up to the sigmoid-tail background
residual). Run on TPU: python -m neurecon_tpu.tools.bench_render_cull
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from neurecon_tpu.training import render_full_image
    from neurecon_tpu.models.frameworks.neus import get_model
    from neurecon_tpu.ops import get_rays_at
    from __graft_entry__ import _flagship_args

    args, _, _ = _flagship_args(N_rays=512)
    model, _, kw_train, _, render_factory = get_model(args)
    params = model.init(jax.random.PRNGKey(0))

    H, W = 360, 400
    c2w = jnp.eye(4).at[2, 3].set(-3.0)
    intr = jnp.eye(4).at[0, 0].set(500.0).at[1, 1].set(500.0) \
        .at[0, 2].set(W / 2).at[1, 2].set(H / 2)
    rays_o, rays_d = get_rays_at(jnp.arange(H * W), c2w, intr, H, W)

    def run(name, fused, cull, nablas=False, micro=2250):
        os.environ["NEURECON_FUSED_UPSAMPLE"] = "1" if fused else "0"
        os.environ["NEURECON_FUSED_NABLAS"] = "1" if nablas else "0"
        try:
            render = render_factory(detailed_output=False, calc_normal=True,
                                    **kw_train)
            best, out = float("inf"), None
            for trial in range(3):
                t0 = time.perf_counter()
                out = render_full_image(
                    render, params, rays_o, rays_d,
                    jax.random.PRNGKey(trial), rayschunk=18000,
                    microchunk=micro, microchunk_unroll=micro is not None,
                    cull_sphere_r=1.0 if cull else None)
                best = min(best, time.perf_counter() - t0)
            print(f"{name:40s} {best:7.2f} s/frame", flush=True)
            return best, out["rgb"]
        finally:
            os.environ["NEURECON_FUSED_UPSAMPLE"] = "0"
            os.environ["NEURECON_FUSED_NABLAS"] = "0"

    _, rgb_base = run("baseline (bench.py render row)", False, False)
    variants = [("+ cull_miss", False, True, False, 2250),
                ("+ fused upsampler", True, False, False, 2250),
                ("+ fused nablas", False, False, True, 2250),
                ("+ fused nablas, no microchunk", False, False, True, None),
                ("+ cull + both kernels, no microchunk",
                 True, True, True, None)]
    for name, fused, cull, nablas, micro in variants:
        try:
            _, rgb = run(name, fused, cull, nablas, micro)
            mse = float(np.mean((rgb - rgb_base) ** 2))
            psnr = -10 * np.log10(mse) if mse > 0 else float("inf")
            print(f"    vs baseline: {psnr:.1f} dB", flush=True)
        except Exception as e:
            print(f"# {name} failed: {str(e).splitlines()[0][:140]}",
                  flush=True)
    print("BENCH_RENDER_CULL_DONE", flush=True)


if __name__ == "__main__":
    main()
