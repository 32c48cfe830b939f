"""Checkpoint save/restore.

Replaces the t5x checkpoint machinery the reference binds via gin
(/root/reference/mt3/gin/train.gin:129-136: save every 5000 steps, fp32)
with orbax-backed sharded pytree checkpoints.  Restart semantics match the
reference: dataset state is not checkpointed; training resumes from the
latest step with fresh data-pipeline seeds.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

PyTree = Any


def save_checkpoint(directory: str, step: int, state: PyTree) -> str:
  """Save a train state pytree under directory/step."""
  path = os.path.join(os.path.abspath(directory), f'checkpoint_{step}')
  checkpointer = ocp.StandardCheckpointer()
  checkpointer.save(path, state)
  checkpointer.wait_until_finished()
  return path


class AsyncCheckpointSaver:
  """Non-blocking checkpoint saves (training overlaps the write).

  The t5x trainer saves asynchronously so a multi-GB fp32 checkpoint
  doesn't stall the step loop; same here via orbax's AsyncCheckpointer.
  Call wait() before exiting (or rely on save() serializing with any
  still-pending previous save).
  """

  def __init__(self):
    self._checkpointer = ocp.AsyncCheckpointer(
        ocp.StandardCheckpointHandler())

  def save(self, directory: str, step: int, state: PyTree) -> str:
    path = os.path.join(os.path.abspath(directory), f'checkpoint_{step}')
    # orbax serializes overlapping saves internally; a new save waits for
    # the previous one.
    self._checkpointer.save(path, args=ocp.args.StandardSave(state))
    return path

  def wait(self) -> None:
    self._checkpointer.wait_until_finished()

  def close(self) -> None:
    self.wait()
    self._checkpointer.close()


def latest_checkpoint(directory: str) -> Optional[str]:
  # orbax requires absolute checkpoint paths.
  directory = os.path.abspath(directory)
  if not os.path.isdir(directory):
    return None
  steps = []
  for name in os.listdir(directory):
    if name.startswith('checkpoint_'):
      try:
        steps.append(int(name.split('_')[-1]))
      except ValueError:
        continue
  if not steps:
    return None
  return os.path.join(directory, f'checkpoint_{max(steps)}')


def restore_checkpoint(path: str, target: PyTree) -> PyTree:
  """Restore a checkpoint into the structure/shardings of `target`.

  `target` may be a sub-structure of what was saved (e.g. params only,
  for the finetune warm start) — missing entries are simply skipped.
  """
  path = os.path.abspath(path)  # orbax requires absolute paths
  checkpointer = ocp.StandardCheckpointer()
  try:
    return checkpointer.restore(path, target)
  except ValueError as e:
    # Sub-structure restores (params-only warm starts) land here by
    # design, but so would a genuinely mismatched checkpoint — surface
    # the original error so a wrong-checkpoint mistake isn't silent.
    import sys
    print(f'checkpoint: full restore of {path} failed '
          f'({type(e).__name__}: {e}); retrying with partial_restore '
          '(expected for params-only/sub-structure targets)',
          file=sys.stderr)
    restore_args = ocp.checkpoint_utils.construct_restore_args(target)
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
      return ckptr.restore(
          path, args=ocp.args.PyTreeRestore(
              item=target, restore_args=restore_args,
              partial_restore=True))


# ---------------------------------------------------------------------------
# T5X published-checkpoint conversion.
# ---------------------------------------------------------------------------
# Mapping from t5x parameter paths (as found in published MT3 checkpoints,
# e.g. gs://mt3/checkpoints/mt3/) to our parameter tree.  t5x DenseGeneral
# kernels are already stored flattened 2-D (reference layers.py:406-415),
# matching our layout, so conversion is renaming + per-layer stacking.
#
# t5x path template -> (our section, our leaf)
_T5X_ENCODER_LAYER = {
    'attention/query/kernel': ('attention', 'query'),
    'attention/key/kernel': ('attention', 'key'),
    'attention/value/kernel': ('attention', 'value'),
    'attention/out/kernel': ('attention', 'out'),
    'pre_attention_layer_norm/scale': ('pre_attention_norm',),
    'mlp/wi_0/kernel': ('mlp', 'wi_0'),
    'mlp/wi_1/kernel': ('mlp', 'wi_1'),
    'mlp/wo/kernel': ('mlp', 'wo'),
    'pre_mlp_layer_norm/scale': ('pre_mlp_norm',),
}
_T5X_DECODER_LAYER = {
    'self_attention/query/kernel': ('self_attention', 'query'),
    'self_attention/key/kernel': ('self_attention', 'key'),
    'self_attention/value/kernel': ('self_attention', 'value'),
    'self_attention/out/kernel': ('self_attention', 'out'),
    'pre_self_attention_layer_norm/scale': ('pre_self_attention_norm',),
    'encoder_decoder_attention/query/kernel': ('cross_attention', 'query'),
    'encoder_decoder_attention/key/kernel': ('cross_attention', 'key'),
    'encoder_decoder_attention/value/kernel': ('cross_attention', 'value'),
    'encoder_decoder_attention/out/kernel': ('cross_attention', 'out'),
    'pre_cross_attention_layer_norm/scale': ('pre_cross_attention_norm',),
    'mlp/wi_0/kernel': ('mlp', 'wi_0'),
    'mlp/wi_1/kernel': ('mlp', 'wi_1'),
    'mlp/wo/kernel': ('mlp', 'wo'),
    'pre_mlp_layer_norm/scale': ('pre_mlp_norm',),
}


def convert_t5x_param_dict(t5x_params: dict, num_encoder_layers: int,
                           num_decoder_layers: int) -> dict:
  """Convert a flat {t5x_path: array} dict to our parameter pytree.

  `t5x_params` keys are slash-joined paths under 'target', e.g.
  'encoder/layers_0/attention/query/kernel'.  Per-layer weights are stacked
  along a leading layer axis to match the lax.scan layout.
  """
  def get(path):
    if path not in t5x_params:
      import difflib
      close = difflib.get_close_matches(path, t5x_params, n=3, cutoff=0.5)
      hint = f'; closest available: {close}' if close else ''
      raise KeyError(
          f'missing t5x param: {path!r} '
          f'({len(t5x_params)} params in checkpoint{hint}; check '
          'num_encoder_layers/num_decoder_layers match the checkpoint)')
    return np.asarray(t5x_params[path])

  def set_leaf(tree, key_path, value):
    node = tree
    for k in key_path[:-1]:
      node = node.setdefault(k, {})
    node[key_path[-1]] = value

  def stack_layers(prefix, table, num_layers):
    out = {}
    collected = {tuple(ours): [] for ours in table.values()}
    for layer in range(num_layers):
      for t5x_rel, ours in table.items():
        collected[tuple(ours)].append(
            get(f'{prefix}/layers_{layer}/{t5x_rel}'))
    for ours, arrays in collected.items():
      set_leaf(out, ours, np.stack(arrays))
    return out

  params = {
      'encoder': {
          'input_proj': get('encoder/continuous_inputs_projection/kernel'),
          'layers': stack_layers('encoder', _T5X_ENCODER_LAYER,
                                 num_encoder_layers),
          'norm': get('encoder/encoder_norm/scale'),
      },
      'decoder': {
          'token_embed': get('decoder/token_embedder/embedding'),
          'layers': stack_layers('decoder', _T5X_DECODER_LAYER,
                                 num_decoder_layers),
          'norm': get('decoder/decoder_norm/scale'),
          'logits': get('decoder/logits_dense/kernel'),
      },
  }
  return params


def convert_mha_to_gqa(params: PyTree, num_heads: int, head_dim: int,
                       num_kv_heads: int,
                       allow_unfinetuned: bool = False) -> PyTree:
  """Checkpoint surgery: mean-pool K/V projection heads to num_kv_heads.

  The converted model is NOT servable as-is: mean-pooling alone
  collapses quality (measured onset F1 0.014 vs teacher 0.419 on the
  flagship model, TRAINING.md gates table) and REQUIRES a recovery
  finetune (`cli/train --init_from ... --gqa_kv_heads N`, budget >=5k
  steps).  Callers that are about to finetune (or deliberately
  measuring the collapse) must pass allow_unfinetuned=True; anything
  else raises.

  The reference checkpoints are 6-head MHA (gin/model.gin:51); the fast
  decode configuration (PERF.md GQA ledger) wants few KV heads.  Each
  group of num_heads//num_kv_heads adjacent K/V heads is averaged —
  exact when the grouped heads are identical, and the standard warm
  start for GQA distillation/finetuning otherwise (Ainslie et al. 2023).
  Query and output projections are untouched (GQA keeps all query
  heads).  Works on any attention params dict in the pytree — encoder
  self-attention, decoder self- and cross-attention, scan-stacked
  ([L, emb, h*d]) or not ([emb, h*d]).
  """
  if not allow_unfinetuned:
    raise ValueError(
        'convert_mha_to_gqa produces a warm-start checkpoint that is '
        'unusable without a recovery finetune (onset F1 collapses to '
        '~0.01; TRAINING.md).  Finetune via '
        '`cli/train --init_from <ckpt> --gqa_kv_heads N` (>=5k steps), '
        'or pass allow_unfinetuned=True if you are about to finetune '
        'or are deliberately measuring the unfinetuned conversion.')
  if num_heads % num_kv_heads:
    raise ValueError(f'{num_heads} heads not divisible by '
                     f'{num_kv_heads} KV heads')
  group = num_heads // num_kv_heads

  def pool(kernel):
    kernel = np.asarray(kernel)
    *lead, joined = kernel.shape
    if joined != num_heads * head_dim:
      raise ValueError(f'K/V kernel trailing dim {joined} != '
                       f'{num_heads} heads x {head_dim}')
    grouped = kernel.reshape(*lead, num_kv_heads, group, head_dim)
    return grouped.mean(axis=-2).reshape(*lead,
                                         num_kv_heads * head_dim)

  def walk(node):
    if isinstance(node, dict):
      if 'query' in node and 'key' in node and 'value' in node:
        return {**node, 'key': pool(node['key']),
                'value': pool(node['value'])}
      return {k: walk(v) for k, v in node.items()}
    return node

  return walk(params)


def flatten_params(params: PyTree, prefix: str = '') -> dict:
  """Flatten a nested param dict to {slash/path: leaf}."""
  out = {}
  for key, value in params.items():
    path = f'{prefix}/{key}' if prefix else key
    if isinstance(value, dict):
      out.update(flatten_params(value, path))
    else:
      out[path] = value
  return out
