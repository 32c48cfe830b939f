"""Loader for published T5X checkpoints (gs://mt3/checkpoints format).

T5X checkpoints are a `checkpoint` msgpack file (flax serialization)
whose large leaves are TensorStore spec dicts pointing at zarr arrays in
sibling directories.  This module reads that layout and feeds the flat
{path: array} dict into checkpoint.convert_t5x_param_dict to produce our
parameter pytree — the one-time migration path for users switching from
the reference with existing checkpoints, and the basis for F1-parity
validation against published weights.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def _flatten(tree: dict, prefix: str = '') -> Dict[str, object]:
  out = {}
  for key, value in tree.items():
    path = f'{prefix}/{key}' if prefix else key
    if isinstance(value, dict) and not _is_ts_spec(value):
      out.update(_flatten(value, path))
    else:
      out[path] = value
  return out


def _is_ts_spec(value) -> bool:
  return isinstance(value, dict) and 'driver' in value and (
      'kvstore' in value or 'path' in value)


def _find_target(state: dict) -> dict:
  """Locate the model-parameter ('target') subtree in a restored tree.

  Published T5X checkpoints wrap the parameters in an optimizer train
  state — typically {'version': .., 'optimizer': {'target': {..},
  'state': {'step', 'param_states': {..}}}} (t5x.checkpoints layout) —
  while minimal exports put 'target' at the top level.  Optimizer
  moments under 'state'/'param_states' are never touched (their
  TensorStore specs are not even opened).
  """
  if not isinstance(state, dict):
    raise ValueError(
        f'checkpoint msgpack root is {type(state).__name__}, expected a '
        'dict containing a "target" parameter subtree')
  if isinstance(state.get('target'), dict):
    return state['target']
  for wrapper in ('optimizer', 'checkpoint', 'train_state'):
    inner = state.get(wrapper)
    if isinstance(inner, dict):
      try:
        return _find_target(inner)
      except ValueError:
        pass
  raise ValueError(
      "no 'target' parameter subtree found in checkpoint msgpack; "
      f'top-level keys: {sorted(state)} (expected "target" directly or '
      'under "optimizer" as written by t5x.checkpoints)')


def load_t5x_checkpoint(checkpoint_dir: str,
                        restore_dtype=np.float32) -> Dict[str, np.ndarray]:
  """Read a T5X checkpoint directory -> flat {param_path: np.ndarray}.

  `checkpoint_dir` contains the msgpack file `checkpoint` plus
  `target.<dotted.param.path>/` TensorStore directories.  Only the
  'target' (model parameter) subtree is returned; optimizer state
  ('state'/'param_states', present in real training checkpoints) is
  skipped without being read.  bfloat16 leaves — inline or TensorStore —
  are upcast to `restore_dtype`.
  """
  from flax import serialization

  msgpack_path = os.path.join(checkpoint_dir, 'checkpoint')
  with open(msgpack_path, 'rb') as f:
    state = serialization.msgpack_restore(f.read())

  target = _find_target(state)
  flat = _flatten(target)

  params = {}
  for path, value in flat.items():
    if _is_ts_spec(value):
      params[path] = _read_tensorstore(checkpoint_dir, path, value,
                                       restore_dtype)
    elif isinstance(value, np.ndarray):
      params[path] = value.astype(restore_dtype)
    elif np.isscalar(value):
      params[path] = np.asarray(value, restore_dtype)
  return params


def _read_tensorstore(checkpoint_dir: str, param_path: str, spec: dict,
                      restore_dtype) -> np.ndarray:
  import tensorstore as ts

  spec = dict(spec)
  # T5X writes relative kvstore paths ('target.encoder.layers_0...');
  # anchor them at the checkpoint directory.
  kvstore = spec.get('kvstore')
  if isinstance(kvstore, dict):
    kvstore = dict(kvstore)
    path = kvstore.get('path', '')
    if path and not os.path.isabs(path) and not str(
        kvstore.get('driver', '')).startswith('gcs'):
      kvstore['path'] = os.path.join(checkpoint_dir, path)
      kvstore.setdefault('driver', 'file')
    spec['kvstore'] = kvstore
  elif 'path' in spec and not os.path.isabs(spec['path']):
    spec['path'] = os.path.join(checkpoint_dir, spec['path'])

  arr = ts.open(spec, read=True).result().read().result()
  del param_path
  return np.asarray(arr, restore_dtype)


def load_t5x_params(checkpoint_dir: str, num_encoder_layers: int,
                    num_decoder_layers: int):
  """T5X checkpoint directory -> our model parameter pytree."""
  from mt3_tpu.train import checkpoint as ckpt
  flat = load_t5x_checkpoint(checkpoint_dir)
  return ckpt.convert_t5x_param_dict(flat, num_encoder_layers,
                                     num_decoder_layers)
