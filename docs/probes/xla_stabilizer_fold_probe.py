"""XLA reassociation silently deletes sub-ulp stabilizers under jit.

Found while building the fused Pallas upsampler (round 3, continued): the
megakernel's log-space cumprod NaN'd under jit while the deoptimized path
was clean. Bisected to a 1-op repro:

    jit(lambda a: 1.0 - a + 1e-10)(1.0)  ==  0.0     (eager: 1e-10)

XLA's algebraic simplifier reassociates `(1.0 - a) + 1e-10` into
`(1.0 + 1e-10) - a` and constant-folds `1.0 + 1e-10` to `1.0f` (1e-10 is
below the ulp of 1 in f32) — the stabilizer is gone. Consequences:

  * `log(1 - a + 1e-10)` at a == 1 -> log(0) = -inf under jit (eager -23).
    This is what NaN'd the fused upsampler (via -inf * 0 inside the
    triangular matmul); guarded there with max(1-a, 0) + 1e-10.
  * The production alpha_to_w / tau_i shifted-transmittance stabilizers
    (`1 - alpha + 1e-10`, ref utils/neus/unisurf/volsdf renderers) were
    silently running WITHOUT the +1e-10 under jit: transmittance after a
    fully-opaque sample became exactly 0 instead of ~1e-10 (benign for the
    forward render, but a real divergence from the reference's torch-eager
    semantics; fixed with the same max(., 0) guard, which breaks the
    add-sub chain the simplifier needs).

Verified on jax 0.9.0 XLA:CPU (2026-08-17). Run: python <this file>.
"""
import os

# CPU by default (the ambient env pins JAX_PLATFORMS=axon and sitecustomize
# overrides env-level cpu forcing — config-level forcing wins); set
# NEURECON_PROBE_TPU=1 to check whether the TPU compiler folds it too.
import jax

if os.environ.get("NEURECON_PROBE_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


def main():
    a = jnp.full((8, 128), 1.0, jnp.float32)

    expr = lambda a: 1.0 - a + 1e-10
    print(f"1 - a + 1e-10 @ a=1: eager {float(expr(a)[0, 0]):.3e}  "
          f"jit {float(jax.jit(expr)(a)[0, 0]):.3e}")

    logf = lambda a: jnp.log(1.0 - a + 1e-10)
    print(f"log(1 - a + 1e-10) @ a=1: eager {float(logf(a)[0, 0]):.4f}  "
          f"jit {float(jax.jit(logf)(a)[0, 0]):.4f}")

    guarded = lambda a: jnp.log(jnp.maximum(1.0 - a, 0.0) + 1e-10)
    print(f"guarded jit: {float(jax.jit(guarded)(a)[0, 0]):.4f} "
          "(matches eager)")


if __name__ == "__main__":
    main()
