"""Adafactor optimizer, from scratch in JAX.

Rebuild of the optimizer the reference binds via gin
(/root/reference/mt3/gin/model.gin:28-33: t5x.adafactor.Adafactor with
decay_rate=0.8, step_offset=0, standard logical factor rules).

Semantics follow the Adafactor paper / T5X implementation:
  * Factored second-moment statistics for parameters with >= 2 dims whose
    last two factorable dims are both >= min_dim_size_to_factor: row/col
    exponential averages of squared gradients with decay
    1 - step^-decay_rate.
  * Update clipping by RMS (clipping_threshold = 1.0).
  * Optional multiply-by-parameter-scale (on, like T5X default): the step
    size is scaled by max(eps_scale, rms(param)).
  * No first-moment accumulator (beta1 = 0), halving memory.

Factoring rules: rather than t5x's name-based logical factor rules, we
factor over the last two dimensions of any >=2-D parameter.  All MT3
parameters are stored as 2-D kernels (plus a stacked leading layer axis),
so this reproduces the same row/col statistics t5x derives from
('embed','mlp')-style rules, with the layer axis handled batch-wise.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

PyTree = Any


class AdafactorState(NamedTuple):
  step: jnp.ndarray
  # Per-leaf factored stats; entries are zero-size placeholders when unused.
  v_row: PyTree
  v_col: PyTree
  v_full: PyTree


# Minimum size of both trailing dims for factoring (t5x uses 128 in its
# heuristics); norm-scale stacks like [layers, emb] stay unfactored.
MIN_DIM_SIZE_TO_FACTOR = 128


def _factored(shape) -> bool:
  return (len(shape) >= 2
          and shape[-1] >= MIN_DIM_SIZE_TO_FACTOR
          and shape[-2] >= MIN_DIM_SIZE_TO_FACTOR)


def init(params: PyTree) -> AdafactorState:
  def row_init(p):
    if _factored(p.shape):
      return jnp.zeros(p.shape[:-1], jnp.float32)
    return jnp.zeros((1,), jnp.float32)

  def col_init(p):
    if _factored(p.shape):
      return jnp.zeros(p.shape[:-2] + p.shape[-1:], jnp.float32)
    return jnp.zeros((1,), jnp.float32)

  def full_init(p):
    if _factored(p.shape):
      return jnp.zeros((1,), jnp.float32)
    return jnp.zeros_like(p, dtype=jnp.float32)

  return AdafactorState(
      step=jnp.zeros((), jnp.int32),
      v_row=jax.tree_util.tree_map(row_init, params),
      v_col=jax.tree_util.tree_map(col_init, params),
      v_full=jax.tree_util.tree_map(full_init, params),
  )


def _rms(x: jnp.ndarray) -> jnp.ndarray:
  return jnp.sqrt(jnp.mean(jnp.square(x)))


def apply_updates(
    params: PyTree,
    grads: PyTree,
    state: AdafactorState,
    learning_rate: jnp.ndarray,
    decay_rate: float = 0.8,
    step_offset: int = 0,
    clipping_threshold: Optional[float] = 1.0,
    multiply_by_parameter_scale: bool = True,
    eps: float = 1e-30,
    eps_scale: float = 1e-3,
):
  """One Adafactor update; returns (new_params, new_state)."""
  step = state.step + 1
  # decay = 1 - (step - offset)^{-decay_rate}
  effective_step = jnp.maximum(step - step_offset, 1).astype(jnp.float32)
  beta2 = 1.0 - jnp.power(effective_step, -decay_rate)

  def update_leaf(p, g, v_row, v_col, v_full):
    g = g.astype(jnp.float32)
    g2 = jnp.square(g) + eps
    if _factored(p.shape):
      new_v_row = beta2 * v_row + (1.0 - beta2) * jnp.mean(g2, axis=-1)
      new_v_col = beta2 * v_col + (1.0 - beta2) * jnp.mean(g2, axis=-2)
      new_v_full = v_full
      # Approximate V ~ (row x col) / mean(row).
      row_mean = jnp.mean(new_v_row, axis=-1, keepdims=True)
      row_factor = jax.lax.rsqrt(new_v_row / row_mean)
      col_factor = jax.lax.rsqrt(new_v_col)
      update = g * row_factor[..., None] * col_factor[..., None, :]
    else:
      new_v_full = beta2 * v_full + (1.0 - beta2) * g2
      new_v_row, new_v_col = v_row, v_col
      update = g * jax.lax.rsqrt(new_v_full)

    if clipping_threshold is not None:
      clip = jnp.maximum(1.0, _rms(update) / clipping_threshold)
      update = update / clip

    scale = learning_rate
    if multiply_by_parameter_scale:
      scale = scale * jnp.maximum(_rms(p.astype(jnp.float32)), eps_scale)

    new_p = p.astype(jnp.float32) - scale * update
    return new_p.astype(p.dtype), new_v_row, new_v_col, new_v_full

  flat_p, treedef = jax.tree_util.tree_flatten(params)
  flat_g = treedef.flatten_up_to(grads)
  flat_row = treedef.flatten_up_to(state.v_row)
  flat_col = treedef.flatten_up_to(state.v_col)
  flat_full = treedef.flatten_up_to(state.v_full)

  out = [update_leaf(p, g, r, c, f) for p, g, r, c, f
         in zip(flat_p, flat_g, flat_row, flat_col, flat_full)]
  new_params = treedef.unflatten([o[0] for o in out])
  new_state = AdafactorState(
      step=step,
      v_row=treedef.unflatten([o[1] for o in out]),
      v_col=treedef.unflatten([o[2] for o in out]),
      v_full=treedef.unflatten([o[3] for o in out]),
  )
  return new_params, new_state


def state_logical_axes(params: PyTree,
                       params_axes: PyTree) -> AdafactorState:
  """Logical axes for optimizer state (for sharding the train state).

  Row stats drop the last axis; col stats drop the second-to-last; full
  stats mirror the param.  Zero-size placeholders are replicated ().
  """
  is_axes = lambda x: isinstance(x, tuple) and all(
      isinstance(e, str) for e in x)
  flat_axes = jax.tree_util.tree_leaves(params_axes, is_leaf=is_axes)
  flat_p, treedef = jax.tree_util.tree_flatten(params)
  assert len(flat_axes) == len(flat_p)

  rows, cols, fulls = [], [], []
  for p, a in zip(flat_p, flat_axes):
    if _factored(p.shape):
      rows.append(a[:-1])
      cols.append(a[:-2] + a[-1:])
      fulls.append(())
    else:
      rows.append(())
      cols.append(())
      fulls.append(a)
  return AdafactorState(
      step=(),
      v_row=treedef.unflatten(rows),
      v_col=treedef.unflatten(cols),
      v_full=treedef.unflatten(fulls),
  )
