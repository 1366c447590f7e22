"""neurecon_tpu — a TPU-native (JAX/XLA/Pallas/pjit) multi-view neural
implicit-surface reconstruction framework.

Re-designed from scratch for TPU with the capabilities of the reference
`neurecon` project (UNISURF / NeuS / VolSDF with optional NeRF++ background
and SIREN activation): posed RGB images in, learned SDF / occupancy +
radiance fields out, with novel-view rendering (RGB / depth / normals) and
marching-cubes mesh extraction.

Architecture (TPU-first, not a port):
  * pure-functional models: parameters are pytrees, forward passes are pure
    functions; SDF gradients ("nablas") via `jax.grad` composition instead of
    torch autograd graphs.
  * every data-dependent loop of the reference (hierarchical up-samplers,
    error-bound fine sampling, secant root-finding, sphere tracing) is a
    fixed-trip masked loop with static shapes, so the entire train / render
    step compiles to a single XLA program.
  * scaling is sharding, not chunking: rays are sharded over a
    `jax.sharding.Mesh`, params replicated, gradients psum'd by XLA.
"""

__version__ = "0.1.0"
