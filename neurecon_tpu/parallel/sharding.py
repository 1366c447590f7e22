"""Multi-chip scaling via jax.sharding — the TPU-native replacement for the
reference's nn.DataParallel-over-rays (neus.py:413-414) and DDP/NCCL setup
(utils/dist_util.py, train.py:62-124).

Model: a 1-D device mesh with a 'rays' axis. Parameters and optimizer state
are REPLICATED; the ray batch is SHARDED along the ray axis. Inside one
jit-compiled train step XLA:
  * runs the renderer + loss on each device's ray shard (pure data parallel,
    no communication in the forward/backward except...)
  * all-reduces the scalar losses and the parameter gradients over ICI
    (the psum the reference gets from DDP's backward hook).
Nothing here issues explicit collectives — shardings on the inputs plus
replicated outputs are enough for the partitioner to insert them.

The same mechanism shards full-image validation renders over pixels.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from neurecon_tpu.training import TrainState, extras_stats, grad_norms_by_module


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "rays") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def ray_sharding(mesh: Mesh, ndim: int, ray_axis: int = 1,
                 axis_name: str = "rays") -> NamedSharding:
    spec = [None] * ndim
    spec[ray_axis] = axis_name
    return NamedSharding(mesh, P(*spec))


def ray_batch_shardings(mesh: Mesh, ray_batch, ray_axis: int = 1,
                        axis_name: str = "rays"):
    """Sharding pytree for a ray batch: every leaf sharded on its ray axis."""
    return jax.tree_util.tree_map(
        lambda x: ray_sharding(mesh, x.ndim, ray_axis, axis_name), ray_batch)


def shard_rays(mesh: Mesh, ray_batch, ray_axis: int = 1, axis_name: str = "rays"):
    """Place a host/replicated ray batch onto the mesh, sharded over rays."""
    sh = ray_batch_shardings(mesh, ray_batch, ray_axis, axis_name)
    return jax.tree_util.tree_map(jax.device_put, ray_batch, sh)


def make_sharded_train_step(ray_loss_fn, optimizer, mesh: Mesh,
                            ray_axis: int = 1, axis_name: str = "rays"):
    """Compile step(state, ray_batch, key) with params replicated and the ray
    batch sharded; gradients come back replicated (XLA inserts the psum).

    ray_loss_fn(params, ray_batch, key, it) -> (total, (losses, extras)).
    """
    repl = replicate(mesh)

    def step(state: TrainState, ray_batch, key):
        it = state.step

        def wrapped(params):
            return ray_loss_fn(params, ray_batch, key, it)

        (_, (losses, extras)), grads = jax.value_and_grad(
            wrapped, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"losses": {k: jnp.mean(v) for k, v in losses.items()},
                   "grad_norms": grad_norms_by_module(grads),
                   "extras_stats": extras_stats(extras)}
        if isinstance(extras, dict) and "scalars" in extras:
            metrics["scalars"] = extras["scalars"]
        return TrainState(params=params, opt_state=opt_state, step=it + 1), metrics

    # in/out shardings: state & key replicated; ray batch sharded over rays.
    # The ray-batch sharding is resolved per-leaf at call time via a wrapper
    # jit that only pins the state/key; data placement is done by the caller
    # (shard_rays) and respected by jit.
    return jax.jit(step, donate_argnums=(0,),
                   in_shardings=(repl, None, repl),
                   out_shardings=(repl, repl))


def make_sharded_train_block(ray_loss_fn, optimizer, mesh: Mesh,
                             sample_fn, ray_axis: int = 1,
                             axis_name: str = "rays", pipeline_fns=None):
    """K train steps per dispatch, sharded: one jitted lax.scan whose body
    samples a ray batch on device (from the replicated HBM dataset), pins it
    to the 'rays' mesh axis with a sharding constraint, and runs grad + adam
    (XLA inserts the gradient psum). This merges the two-dispatch sharded
    path (sample, then step) into one program and amortizes the host/tunnel
    round-trip over K steps — the sharded equivalent of the reference DDP
    loop train.py:122-210, with zero per-step host work.

    sample_fn(data, idx, key) -> ray_batch (every leaf with the ray axis at
    `ray_axis`). Returns block(state, data, idxs [K], key) -> (state,
    metrics-of-last-step).

    pipeline_fns (optional, from frameworks.get_pipeline_fns): software-
    pipelines the step. The gradient-free depth sampler for step i+1 runs in
    body i against the PRE-update params — it is then independent of step
    i's backward, and XLA overlaps the two chains (measured concurrency
    factor 1.6 for independent W=256 chains, tools/bench_roadmap). Sample
    PLACEMENT becomes one step stale; rendered values/gradients still use
    fresh params. The first step of each dispatch samples unpipelined.
    """
    repl = replicate(mesh)

    def constrain(rb):
        return jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(
                x, ray_sharding(mesh, x.ndim, ray_axis, axis_name)), rb)

    def metrics_of(losses, extras, grads):
        m = {"losses": {k2: jnp.mean(v) for k2, v in losses.items()},
             "grad_norms": grad_norms_by_module(grads),
             "extras_stats": extras_stats(extras)}
        if isinstance(extras, dict) and "scalars" in extras:
            m["scalars"] = extras["scalars"]
        return m

    def block(state: TrainState, data, idxs, key):
        def body(st, xs):
            idx, k = xs
            k_sample, k_render = jax.random.split(k)
            rb = constrain(sample_fn(data, idx, k_sample))
            it = st.step

            def wrapped(params):
                return ray_loss_fn(params, rb, k_render, it)

            (_, (losses, extras)), grads = jax.value_and_grad(
                wrapped, has_aux=True)(st.params)
            updates, opt_state = optimizer.update(grads, st.opt_state, st.params)
            params = optax.apply_updates(st.params, updates)
            return TrainState(params=params, opt_state=opt_state,
                              step=it + 1), metrics_of(losses, extras, grads)

        keys = jax.random.split(key, idxs.shape[0])
        state, metrics = jax.lax.scan(body, state, (idxs, keys))
        last = jax.tree_util.tree_map(lambda m: m[-1], metrics)
        return state, last

    def block_pipelined(state: TrainState, data, idxs, key):
        depth_sample = pipeline_fns["depth_sample"]
        loss_ws = pipeline_fns["loss_with_samples"]
        keys = jax.random.split(key, idxs.shape[0])

        def make_rb(idx, k):
            k_sample, k_render = jax.random.split(k)
            rb = constrain(sample_fn(data, idx, k_sample))
            return rb, k_render

        # prologue: step 0's samples, fresh params (not overlapped)
        rb0, kr0 = make_rb(idxs[0], keys[0])
        d0 = constrain(depth_sample(state.params, rb0, kr0))

        # body i consumes (rb_i, d_i) and produces (rb_{i+1}, d_{i+1}); the
        # final iteration recomputes its own (i.e. the last) inputs, which
        # XLA sees as live but costs 1/K of a sampler — negligible at K=50
        idx_next = jnp.concatenate([idxs[1:], idxs[-1:]])
        key_next = jnp.concatenate([keys[1:], keys[-1:]])

        def body(carry, xs):
            st, rb, d_all, k_render = carry
            idx_n, k_n = xs
            it = st.step

            def wrapped(params):
                return loss_ws(params, rb, d_all, k_render, it)

            (_, (losses, extras)), grads = jax.value_and_grad(
                wrapped, has_aux=True)(st.params)
            # next step's rays + depth samples against PRE-update params:
            # independent of the grads chain above -> overlappable
            rb_n, kr_n = make_rb(idx_n, k_n)
            d_n = constrain(depth_sample(st.params, rb_n, kr_n))
            updates, opt_state = optimizer.update(grads, st.opt_state, st.params)
            params = optax.apply_updates(st.params, updates)
            st2 = TrainState(params=params, opt_state=opt_state, step=it + 1)
            return (st2, rb_n, d_n, kr_n), metrics_of(losses, extras, grads)

        (state, *_), metrics = jax.lax.scan(
            body, (state, rb0, d0, kr0), (idx_next, key_next))
        last = jax.tree_util.tree_map(lambda m: m[-1], metrics)
        return state, last

    return jax.jit(block_pipelined if pipeline_fns else block,
                   donate_argnums=(0,),
                   in_shardings=(repl, repl, None, repl),
                   out_shardings=(repl, repl))


def make_sharded_render(render_fn, mesh: Mesh, axis_name: str = "rays"):
    """Shard a flat-ray render fn (params, rays_o, rays_d, key) -> (rgb,
    depth, extras) over pixels: the full-image validation/eval equivalent of
    the sharded train step (replaces the reference's DataParallel val path).

    The ray count must be divisible by the mesh size; callers pad.
    """
    repl = replicate(mesh)
    rs2 = NamedSharding(mesh, P(axis_name, None))
    jitted = jax.jit(render_fn, in_shardings=(repl, rs2, rs2, repl))

    def render(params, rays_o, rays_d, key):
        rays_o = jax.device_put(rays_o.reshape(-1, 3), rs2)
        rays_d = jax.device_put(rays_d.reshape(-1, 3), rs2)
        return jitted(params, rays_o, rays_d, key)

    return render
