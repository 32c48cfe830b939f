"""Training driver: jit'd sharded train step, LR schedule, train state.

Rebuild of the slice of the t5x Trainer MT3 uses
(/root/reference/mt3/gin/train.gin:142-159): constant LR 1e-3 with linear
warmup, Adafactor updates, loss from losses.py, all inside one jax.jit
whose in/out shardings come from the ('data','model') mesh.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Mapping, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mt3_tpu.core.config import ModelConfig, RunConfig
from mt3_tpu.models import t5
from mt3_tpu.parallel import partitioning
from mt3_tpu.train import adafactor, losses

PyTree = Any


class TrainState(NamedTuple):
  step: jnp.ndarray
  params: PyTree
  opt_state: adafactor.AdafactorState


def create_learning_rate_fn(run: RunConfig):
  """Constant LR with linear warmup (train.gin:153-159)."""
  def lr(step):
    step = jnp.asarray(step, jnp.float32)
    warmup = jnp.minimum(1.0, step / jnp.maximum(1.0, run.warmup_steps))
    return run.learning_rate * warmup
  return lr


def init_train_state(rng, model_config: ModelConfig
                     ) -> Tuple[TrainState, PyTree]:
  """Initialize params + optimizer state; returns (state, logical axes)."""
  params, params_axes = t5.init_params(rng, model_config)
  opt_state = adafactor.init(params)
  state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                     opt_state=opt_state)
  state_axes = TrainState(
      step=(),
      params=params_axes,
      opt_state=adafactor.state_logical_axes(params, params_axes))
  return state, state_axes


def train_step(state: TrainState, batch: Mapping[str, jax.Array],
               rng: jax.Array, model_config: ModelConfig,
               run_config: RunConfig,
               num_microbatches: int = 0) -> Tuple[TrainState, dict]:
  """One training step: forward, loss, grads, Adafactor update.

  num_microbatches > 1 accumulates gradients over sequential microbatch
  slices (the t5x Trainer.num_microbatches capability) to fit large
  batches in memory.
  """
  lr_fn = create_learning_rate_fn(run_config)
  step_rng = jax.random.fold_in(rng, state.step)

  def loss_fn(params, batch):
    logits = t5.forward(
        params, model_config,
        batch['encoder_input_tokens'],
        batch['decoder_input_tokens'],
        batch['decoder_target_tokens'],
        rng=step_rng if model_config.dropout_rate > 0 else None)
    total, z_term, weight_sum = losses.cross_entropy_with_z_loss(
        logits, batch['decoder_target_tokens'],
        batch['decoder_loss_weights'].astype(jnp.float32),
        label_smoothing=run_config.label_smoothing,
        z_loss=run_config.z_loss)
    metrics = losses.compute_metrics(
        logits, batch['decoder_target_tokens'],
        batch['decoder_loss_weights'].astype(jnp.float32))
    metrics.update(loss=total / jnp.maximum(weight_sum, 1e-8),
                   z_loss=z_term / jnp.maximum(weight_sum, 1e-8))
    return total, metrics

  grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
  if num_microbatches and num_microbatches > 1:
    batch_size = batch['decoder_target_tokens'].shape[0]
    if batch_size % num_microbatches:
      raise ValueError('batch size not divisible by num_microbatches')
    micro = batch_size // num_microbatches
    sliced = jax.tree_util.tree_map(
        lambda x: x.reshape((num_microbatches, micro) + x.shape[1:]),
        dict(batch))

    def accumulate(carry, microbatch):
      grads_acc, _ = carry
      (_, metrics), grads = grad_fn(state.params, microbatch)
      grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
      return (grads_acc, metrics), None

    zero_grads = jax.tree_util.tree_map(
        lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
    zero_metrics = {'accuracy': jnp.float32(0), 'weight_sum': jnp.float32(0),
                    'loss': jnp.float32(0), 'z_loss': jnp.float32(0)}
    (grads, metrics), _ = jax.lax.scan(accumulate,
                                       (zero_grads, zero_metrics), sliced)
  else:
    (_, metrics), grads = grad_fn(state.params, batch)

  lr = lr_fn(state.step)
  new_params, new_opt_state = adafactor.apply_updates(
      state.params, grads, state.opt_state, lr)
  metrics['learning_rate'] = lr
  # Observability parity with the t5x trainer: global gradient and
  # parameter norms.
  metrics['grad_norm'] = jnp.sqrt(sum(
      jnp.sum(jnp.square(g.astype(jnp.float32)))
      for g in jax.tree_util.tree_leaves(grads)))
  metrics['param_norm'] = jnp.sqrt(sum(
      jnp.sum(jnp.square(p.astype(jnp.float32)))
      for p in jax.tree_util.tree_leaves(new_params)))
  new_state = TrainState(step=state.step + 1, params=new_params,
                         opt_state=new_opt_state)
  return new_state, metrics


@dataclasses.dataclass
class Trainer:
  """Holds the compiled sharded train step and the train state."""
  model_config: ModelConfig
  run_config: RunConfig
  mesh: Optional[Any] = None
  seed: int = 0
  num_microbatches: int = 0

  def __post_init__(self):
    self._async_saver = None
    rng = jax.random.PRNGKey(self.seed)
    self.init_rng, self.dropout_rng = jax.random.split(rng)

    if self.mesh is not None:
      # Trace the initializer abstractly to recover the logical-axes
      # pytree without materializing parameters, then run it jitted with
      # sharded outputs — each device materializes only its own shard,
      # which also works when the mesh spans multiple processes (where a
      # host-side init + device_put of non-addressable shards cannot).
      captured = {}

      def _state_only(rng):
        state, axes = init_train_state(rng, self.model_config)
        captured['axes'] = axes
        return state

      jax.eval_shape(_state_only, self.init_rng)
      self.state_axes = captured['axes']
      is_axes = lambda x: isinstance(x, tuple) and all(
          isinstance(e, str) for e in x)
      state_shardings = jax.tree_util.tree_map(
          lambda a: jax.sharding.NamedSharding(
              self.mesh, partitioning.logical_to_spec(a)),
          self.state_axes, is_leaf=is_axes)
      self.state = jax.jit(
          _state_only, out_shardings=state_shardings)(self.init_rng)
      self._step_fn = jax.jit(
          functools.partial(train_step, model_config=self.model_config,
                            run_config=self.run_config,
                            num_microbatches=self.num_microbatches),
          in_shardings=(state_shardings, None, None),
          out_shardings=(state_shardings, None),
          donate_argnums=(0,))
    else:
      self.state, self.state_axes = init_train_state(
          self.init_rng, self.model_config)
      self._step_fn = jax.jit(
          functools.partial(train_step, model_config=self.model_config,
                            run_config=self.run_config,
                            num_microbatches=self.num_microbatches),
          donate_argnums=(0,))

  def shard_batch(self, batch):
    if self.mesh is None:
      return batch
    shardings = partitioning.batch_shardings(self.mesh, batch)
    if jax.process_count() > 1:
      # Multi-process: each process's pipeline yields its
      # global_batch / process_count slice of the batch; assemble the
      # global array from the per-process shards.
      return jax.tree_util.tree_map(
          lambda x, s: jax.make_array_from_process_local_data(
              s, np.asarray(x)),
          dict(batch), dict(shardings))
    return jax.device_put(batch, shardings)

  def step(self, batch) -> dict:
    self.state, metrics = self._step_fn(self.state,
                                        self.shard_batch(batch),
                                        self.dropout_rng)
    return metrics

  def save(self, directory: str, asynchronous: bool = False) -> str:
    """Checkpoint the full train state (params + optimizer + step).

    asynchronous=True overlaps the write with subsequent train steps
    (orbax AsyncCheckpointer; call finalize_saves() before exiting).
    """
    from mt3_tpu.train import checkpoint as ckpt_lib
    if asynchronous:
      if self._async_saver is None:
        self._async_saver = ckpt_lib.AsyncCheckpointSaver()
      return self._async_saver.save(directory, int(self.state.step),
                                    self.state._asdict())
    return ckpt_lib.save_checkpoint(directory, int(self.state.step),
                                    self.state._asdict())

  def finalize_saves(self) -> None:
    """Block until any pending asynchronous checkpoint completes."""
    if self._async_saver is not None:
      self._async_saver.wait()

  def load_params(self, params) -> None:
    """Warm-start from a parameter pytree: fresh optimizer, step kept.

    The finetune path (reference gin/ismir2022/finetune.gin:21-24
    restores params only, mode='specific'); also the landing point for
    GQA-converted checkpoints (checkpoint.convert_mha_to_gqa).
    """
    jax.tree_util.tree_map(
        lambda new, old: (_ for _ in ()).throw(ValueError(
            f'shape mismatch {np.shape(new)} vs {old.shape}'))
        if np.shape(new) != old.shape else None,
        params, self.state.params)
    if self.mesh is not None:
      is_axes = lambda x: isinstance(x, tuple) and all(
          isinstance(e, str) for e in x)
      shardings = jax.tree_util.tree_map(
          lambda a: jax.sharding.NamedSharding(
              self.mesh, partitioning.logical_to_spec(a)),
          self.state_axes.params, is_leaf=is_axes)
      if jax.process_count() > 1:
        # device_put cannot target non-addressable devices; build each
        # global array from the (fully host-replicated) values instead.
        params = jax.tree_util.tree_map(
            lambda x, s: jax.make_array_from_callback(
                np.shape(x), s, lambda idx, a=np.asarray(x): a[idx]),
            params, shardings)
      else:
        params = jax.device_put(params, shardings)
    else:
      params = jax.tree_util.tree_map(jnp.asarray, params)
    self.state = TrainState(step=self.state.step, params=params,
                            opt_state=self.state.opt_state)

  def restore(self, directory_or_path: str) -> int:
    """Restore the full train state; returns the restored step.

    Matches the reference's restart semantics (gin/train.gin:129-136):
    dataset state is not checkpointed — training resumes from the saved
    step with a fresh data pipeline.
    """
    from mt3_tpu.train import checkpoint as ckpt_lib
    path = (ckpt_lib.latest_checkpoint(directory_or_path)
            or directory_or_path)
    restored = ckpt_lib.restore_checkpoint(path, self.state._asdict())
    self.state = TrainState(**restored)
    return int(self.state.step)


def make_train_batch(rng: np.random.RandomState, batch_size: int,
                     inputs_length: int, targets_length: int,
                     input_depth: int, vocab_size: int) -> dict:
  """Random batch with the training feature layout, for tests/benchmarks.

  Feature names follow the model-feature contract of the reference feature
  converter (models.py:48-98).
  """
  targets = rng.randint(3, vocab_size,
                        size=(batch_size, targets_length)).astype(np.int32)
  # Autoregressive shift: input i attends target i-1; BOS = 0.
  dec_inputs = np.concatenate(
      [np.zeros((batch_size, 1), np.int32), targets[:, :-1]], axis=1)
  return {
      'encoder_input_tokens': rng.randn(
          batch_size, inputs_length, input_depth).astype(np.float32),
      'decoder_target_tokens': targets,
      'decoder_input_tokens': dec_inputs,
      'decoder_loss_weights': (targets > 0).astype(np.int32),
  }
