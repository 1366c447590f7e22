"""Generic training-step machinery shared by all frameworks.

One `train_step` = loss + grad + adam update + per-module grad norms, compiled
to a single XLA program. The reference's host-side loop body
(train.py:195-210: forward, backward, calc_grad_norm, optimizer.step,
scheduler.step) all happens on device here; only scalar metrics come back.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # int32 global step


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


def make_train_step(loss_fn: Callable, optimizer: optax.GradientTransformation,
                    jit: bool = True) -> Callable:
    """loss_fn(params, batch, key, it) -> (total, (losses, extras)).

    Returns step(state, batch, key) -> (state, metrics) where metrics holds
    scalar losses, per-module grad norms, and any extras['scalars'].
    """

    def step(state: TrainState, batch, key) -> Tuple[TrainState, Dict]:
        it = state.step

        def wrapped(params):
            return loss_fn(params, batch, key, it)

        (_, (losses, extras)), grads = jax.value_and_grad(
            wrapped, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        metrics = {"losses": {k: jnp.mean(v) for k, v in losses.items()},
                   "grad_norms": grad_norms_by_module(grads)}
        if isinstance(extras, dict) and "scalars" in extras:
            metrics["scalars"] = extras["scalars"]
        new_state = TrainState(params=params, opt_state=opt_state, step=it + 1)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,)) if jit else step


def init_train_state(params, optimizer, step: int = 0) -> TrainState:
    return TrainState(params=params, opt_state=optimizer.init(params),
                      step=jnp.asarray(step, jnp.int32))
