"""Generic training-step machinery shared by all frameworks.

One `train_step` = loss + grad + adam update + per-module grad norms, compiled
to a single XLA program. The reference's host-side loop body
(train.py:195-210: forward, backward, calc_grad_norm, optimizer.step,
scheduler.step) all happens on device here; only scalar metrics come back.
"""
from __future__ import annotations

import weakref
from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from neurecon_tpu.utils.console import log


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # int32 global step


def sample_ray_batch(key, batch, H: int, W: int, N_rays: int):
    """Select N_rays random pixels from an image batch, on device.

    batch: {'c2w' [B,4,4], 'intrinsics' [B,4,4], 'rgb' [B,H*W,3],
            optional 'object_mask' / 'mask_ignore' [B,H*W]}.
    Returns a ray batch: every array has the ray axis at dim 1 — this is the
    axis the multi-chip path shards over (see neurecon_tpu/parallel).
    """
    from neurecon_tpu.ops import get_rays

    rays_o, rays_d, select_inds = get_rays(
        key, batch["c2w"], batch["intrinsics"], H, W, N_rays=N_rays)
    rb = {
        "rays_o": rays_o,
        "rays_d": rays_d,
        "target_rgb": jnp.take_along_axis(batch["rgb"], select_inds[..., None],
                                          axis=-2),
    }
    if "object_mask" in batch:
        rb["target_mask"] = jnp.take_along_axis(batch["object_mask"], select_inds,
                                                axis=-1)
    if "mask_ignore" in batch:
        rb["mask_ignore"] = jnp.take_along_axis(batch["mask_ignore"], select_inds,
                                                axis=-1)
    return rb


def grad_norms_by_module(grads) -> Dict[str, jnp.ndarray]:
    """Per-top-level-module global grad norm (ref train_util.py:5-13 logs
    per-module norms every step)."""
    out = {}
    for name, sub in grads.items():
        leaves = jax.tree_util.tree_leaves(sub)
        if leaves:
            out[name] = jnp.sqrt(sum(jnp.sum(l.astype(jnp.float32) ** 2)
                                     for l in leaves))
    return out


# intermediate tensors whose mean/min/max/norm get logged (ref train.py:250-259)
_EXTRAS_STAT_KEYS = ("radiance", "alpha", "implicit_surface",
                     "implicit_nablas_norm", "sigma_out", "radiance_out")


def extras_stats(extras) -> Dict[str, jnp.ndarray]:
    """mean/min/max/norm scalars of the render intermediates, computed on
    device so they ride the metrics fetch (ref train.py:250-259 pulls each
    tensor to host every step)."""
    out = {}
    if not isinstance(extras, dict):
        return out
    for n in _EXTRAS_STAT_KEYS:
        v = extras.get(n)
        if v is None:
            continue
        v = v.astype(jnp.float32)
        out[f"{n}.mean"] = jnp.mean(v)
        out[f"{n}.min"] = jnp.min(v)
        out[f"{n}.max"] = jnp.max(v)
        out[f"{n}.norm"] = jnp.sqrt(jnp.sum(v * v))
    return out


def make_train_step(loss_fn: Callable, optimizer: optax.GradientTransformation,
                    jit: bool = True) -> Callable:
    """loss_fn(params, batch, key, it) -> (total, (losses, extras)).

    Returns step(state, batch, key) -> (state, metrics) where metrics holds
    scalar losses, per-module grad norms, extras['scalars'], and
    mean/min/max/norm of the render intermediates."""

    def step(state: TrainState, batch, key) -> Tuple[TrainState, Dict]:
        it = state.step

        def wrapped(params):
            return loss_fn(params, batch, key, it)

        (_, (losses, extras)), grads = jax.value_and_grad(
            wrapped, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        metrics = {"losses": {k: jnp.mean(v) for k, v in losses.items()},
                   "grad_norms": grad_norms_by_module(grads),
                   "extras_stats": extras_stats(extras)}
        if isinstance(extras, dict) and "scalars" in extras:
            metrics["scalars"] = extras["scalars"]
        new_state = TrainState(params=params, opt_state=opt_state, step=it + 1)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,)) if jit else step


def fast_forward_schedule(opt_state, step: int):
    """Set every optax `count` field to `step`: used when a checkpoint
    provides parameters but no optimizer state, so the per-iteration lr
    schedule resumes at the right point (the reference recreates its
    scheduler with last_epoch=it-1, train.py:127)."""
    def fix(s):
        if hasattr(s, "_fields"):  # optax NamedTuple states
            vals = {}
            for f in s._fields:
                v = getattr(s, f)
                if f == "count":
                    vals[f] = jnp.asarray(step, getattr(v, "dtype", jnp.int32))
                else:
                    vals[f] = fix(v)
            return type(s)(**vals)
        if isinstance(s, tuple):
            return tuple(fix(x) for x in s)
        if isinstance(s, list):
            return [fix(x) for x in s]
        if isinstance(s, dict):
            return {k: fix(v) for k, v in s.items()}
        return s

    return fix(opt_state)


def init_train_state(params, optimizer, step: int = 0) -> TrainState:
    return TrainState(params=params, opt_state=optimizer.init(params),
                      step=jnp.asarray(step, jnp.int32))


_RENDER_JIT_CACHE = {}  # (render_fn token, chunk, kwargs) -> jitted renderer


def _render_cache_token(obj):
    """Identity token for the render-jit cache. A weakref where possible: the
    eviction callback drops entries when the object dies, so a recycled id()
    can never alias a new renderer/mesh even if a future refactor stops the
    cached closure from pinning them. Non-weakrefable objects fall back to
    the object itself (hashable by identity, strongly held by the key)."""
    if obj is None:
        return None
    try:
        return weakref.ref(obj, _render_cache_evict)
    except TypeError:
        return obj


def _render_cache_evict(dead_ref):
    for k in [k for k in _RENDER_JIT_CACHE if dead_ref in k]:
        _RENDER_JIT_CACHE.pop(k, None)


def render_full_image(render_fn, params, rays_o, rays_d, key,
                      rayschunk: int = 4096, mesh=None, microchunk=None,
                      microchunk_unroll: bool = False,
                      cull_sphere_r: float = None, miss_rgb: float = 0.0,
                      **render_call_kwargs):
    """Render all rays of an image with a fixed-chunk jitted renderer.

    Replaces the reference's rayschunk host loop (neus.py:385): one compile
    (static chunk size, last chunk padded), host loop over chunks, numpy
    concatenation. render_fn: (params, rays_o [N,3], rays_d [N,3], key) ->
    (rgb, depth, extras).

    `microchunk` (single-device path): inside each dispatched chunk a
    `lax.map` walks microchunk-ray blocks sequentially, so peak activation
    memory is set by the microchunk while dispatch count (the tunnel-RTT
    cost) is set by the big rayschunk. The nablas VJP of a volume render
    stores ~2.3 MB/ray of activations — chunk 16384 alone OOMs a 16 GB chip,
    chunk 4096 alone pays 4x the dispatches; 16384/2048 gets both.

    With `mesh` (a 1-D 'rays' jax.sharding.Mesh), each chunk is sharded over
    the mesh's devices — the multi-chip validation/eval path (replaces the
    reference's DataParallel val renders; the chunk size is rounded up to a
    multiple of the mesh size).

    `microchunk_unroll=True` walks the micro blocks with a Python loop inside
    the jit (straight-line XLA, static trip count) instead of `lax.map`.
    Same semantics, larger program (~n_micro x the render graph, slower
    compile) — the workaround for the TPU backend miscompiling the sharp-s
    NeuS render under a scan loop (docs/methods.md, round-3 case study);
    use it when a NeuS normal render needs micro-blocking on TPU.

    `cull_sphere_r` (eval accelerator, off by default): host-side partition
    of the frame's rays by bounding-sphere intersection — only hitting rays
    go through the network; missing rays get `miss_rgb` and zeros. Since
    eval is host-driven chunking anyway, this is the TPU-shaped form of
    empty-space skipping (two fixed-shape batches, no dynamic shapes on
    device). For a typical object view most rays miss, so the volume render
    speeds up ~(frame pixels / object pixels)x. Exact for the rgb of true
    miss rays up to the renderer's sigmoid-tail residual (~1e-6); miss-ray
    depth/extras are zeroed rather than the production soft-argmax
    (background depth is visualization-only). Not for training or for
    nerf++-outside models (their background is view-dependent).
    """
    import numpy as np

    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    N = rays_o.shape[0]

    if cull_sphere_r:
        o_np = np.asarray(rays_o, np.float64)
        d_np = np.asarray(rays_d, np.float64)
        dn = d_np / np.linalg.norm(d_np, axis=-1, keepdims=True)
        t_mid = -np.sum(o_np * dn, axis=-1)
        closest = o_np + t_mid[:, None] * dn
        # hit iff the (forward) ray comes within r of the origin
        hit = ((np.linalg.norm(closest, axis=-1) <= cull_sphere_r)
               & (t_mid + cull_sphere_r > 0))
        if not hit.all():
            hit_idx = np.nonzero(hit)[0]
            # zero hits: run one ray through to learn the output structure
            probe_idx = hit_idx if hit_idx.size else np.asarray([0])
            sub = render_full_image(
                render_fn, params, rays_o[probe_idx], rays_d[probe_idx],
                key, rayschunk=rayschunk, mesh=mesh, microchunk=microchunk,
                microchunk_unroll=microchunk_unroll, **render_call_kwargs)
            out = {}
            for k, v in sub.items():
                full = np.zeros((N,) + v.shape[1:], v.dtype)
                if k == "rgb":
                    full[...] = miss_rgb
                if hit_idx.size:
                    full[hit_idx] = v
                out[k] = full
            return out
    # deterministic renderers (surface rendering) declare uses_key=False and a
    # param_filter; the key / unused param subtrees must then NOT be program
    # parameters — unused jit parameters crash this environment's AOT compiler
    uses_key = getattr(render_fn, "uses_key", True)
    params = getattr(render_fn, "param_filter", lambda p: p)(params)
    if mesh is not None:
        n_dev = mesh.devices.size
        rayschunk = ((rayschunk + n_dev - 1) // n_dev) * n_dev
        if microchunk and microchunk > 0:
            # each lax.map block is itself sharded over the mesh (the block's
            # ray axis carries the 'rays' partition), so per-device peak
            # activation memory is microchunk/n_dev rays while dispatch count
            # stays rayschunk-sized — same memory control as single-device
            microchunk = ((int(microchunk) + n_dev - 1) // n_dev) * n_dev
    if microchunk is not None and microchunk <= 0:
        microchunk = None
    if microchunk and microchunk >= rayschunk:
        microchunk = None  # identical program; don't compile a duplicate
    if microchunk and rayschunk % microchunk:
        raise ValueError(f"rayschunk {rayschunk} must be a multiple of "
                         f"microchunk {microchunk}")
    cache_key = (_render_cache_token(render_fn), rayschunk,
                 _render_cache_token(mesh), microchunk,
                 bool(microchunk_unroll),
                 tuple(sorted(render_call_kwargs.items())))
    chunked = _RENDER_JIT_CACHE.get(cache_key)
    if chunked is None:
        if (microchunk and not microchunk_unroll
                and jax.default_backend() != "cpu"):
            # the TPU backend miscompiles the sharp-s NeuS upsampler inside a
            # lax.map/scan loop (docs/methods.md round-3 case study; bisect in
            # docs/probes/) — the unrolled mode is the validated path there
            log.warning(
                "render_full_image: microchunk uses a lax.map loop, which the "
                "TPU backend is known to miscompile for sharp-s NeuS renders "
                "(docs/methods.md); pass microchunk_unroll=True (or "
                "--microchunk_unroll) if results look degraded")
        jit_kwargs = {}
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            repl = NamedSharding(mesh, PartitionSpec())
            rs = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0], None))
            jit_kwargs["in_shardings"] = ((repl, rs, rs, repl) if uses_key
                                          else (repl, rs, rs))

        # The cached closure must not strongly pin render_fn, or the weakref
        # token above could never fire and dead renderers' compiled programs
        # would accumulate for the life of the process. Calls only happen
        # while render_fn is alive (it is this function's argument).
        try:
            _fn_ref = weakref.ref(render_fn)
        except TypeError:
            _fn_ref = (lambda _fn=render_fn: _fn)

        def call(p, o, d, k):
            if not microchunk:
                return _fn_ref()(p, o, d, k, **render_call_kwargs)
            n_micro = rayschunk // microchunk

            def body(xs):
                ob, db, i = xs
                # distinct key per block: a stochastic render_fn (perturb)
                # must not repeat the same jitter across blocks
                kb = None if k is None else jax.random.fold_in(k, i)
                return _fn_ref()(p, ob, db, kb, **render_call_kwargs)
            ob = o.reshape(n_micro, microchunk, 3)
            db = d.reshape(n_micro, microchunk, 3)
            if mesh is not None:
                # re-lay the blocks so each block's RAY axis is the sharded
                # one: the sequential lax.map walks blocks while every device
                # holds microchunk/n_dev rays of the current block
                from jax.sharding import NamedSharding, PartitionSpec
                blk = NamedSharding(
                    mesh, PartitionSpec(None, mesh.axis_names[0], None))
                ob = jax.lax.with_sharding_constraint(ob, blk)
                db = jax.lax.with_sharding_constraint(db, blk)
            if microchunk_unroll:
                blocks = [body((ob[i], db[i], i)) for i in range(n_micro)]
                return jax.tree_util.tree_map(
                    lambda *xs: jnp.concatenate(xs, 0), *blocks)
            out = jax.lax.map(body, (ob, db, jnp.arange(n_micro)))
            return jax.tree_util.tree_map(
                lambda x: x.reshape((n_micro * microchunk,) + x.shape[2:]), out)

        if uses_key:
            chunked = jax.jit(lambda p, o, d, k: call(p, o, d, k), **jit_kwargs)
        else:
            chunked = jax.jit(lambda p, o, d: call(p, o, d, None), **jit_kwargs)
        _RENDER_JIT_CACHE[cache_key] = chunked

    outs = []
    for i in range(0, N, rayschunk):
        o, d = rays_o[i:i + rayschunk], rays_d[i:i + rayschunk]
        pad = rayschunk - o.shape[0]
        if pad:
            o = jnp.concatenate([o, jnp.zeros((pad, 3))], 0)
            d = jnp.concatenate([d, jnp.ones((pad, 3))], 0)
        rgb, depth, extras = (chunked(params, o, d, key) if uses_key
                              else chunked(params, o, d))
        chunk_out = {"rgb": rgb, "depth_volume": depth}
        chunk_out.update({k: v for k, v in extras.items()
                          if k not in ("rgb", "depth_volume")})
        chunk_out = jax.device_get(chunk_out)  # ONE batched D2H per chunk
        outs.append(jax.tree_util.tree_map(
            lambda x: x[:rayschunk - pad] if pad else x, chunk_out))

    return {k: np.concatenate([o[k] for o in outs], 0) for k in outs[0]}
